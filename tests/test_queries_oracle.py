"""Local replica of the driver's correctness harness: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf0.01 parquet, compare row count + schema + order-insensitive
values (columns sorted by name, exact equality after the queries' own
rounding)."""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


QUERY_NAMES = sorted(entrymod.queries().keys())


def test_every_query_has_an_oracle():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"oracle without query: {o - q}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check, same as the driver's fallback
        return
    want = _duck(sql)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _normalize(got), _normalize(want)
    for col in g.columns:
        gs, ws = g[col], w[col]
        if gs.dtype.kind == "f" or ws.dtype.kind == "f":
            pd.testing.assert_series_equal(
                gs.astype("float64"), ws.astype("float64"),
                check_names=False, rtol=0, atol=1e-9,
            )
        else:
            assert gs.astype(str).tolist() == ws.astype(str).tolist(), (
                f"{name}: column {col} differs"
            )
