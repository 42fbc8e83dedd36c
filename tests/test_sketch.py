"""HLL sketch: accuracy vs exact, merge law, determinism."""

import pytest

from pyspark.sql import functions as F

from node_feedparser_spark.operators.sketch import (
    hll_distinct,
    hll_estimate_from_registers,
    hll_merge,
    hll_registers,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["grp", "val"])


def test_raw_branch_accuracy_large_cardinality(spark):
    # 5000 distinct values at m=256 -> raw-estimate branch; HLL p=8 is
    # ~6.5% relative error, assert a loose 15% envelope
    rows = [("g", f"v{i}") for i in range(5000)]
    r = hll_distinct(_df(spark, rows), ["grp"], "val", p=8).collect()[0]
    assert r["n_zero_buckets"] == 0
    assert abs(r["hll_estimate"] - 5000) / 5000 < 0.15


def test_linear_counting_branch_small_cardinality(spark):
    rows = [("g", f"v{i}") for i in range(40)]
    r = hll_distinct(_df(spark, rows), ["grp"], "val", p=8).collect()[0]
    assert r["n_zero_buckets"] > 0
    # linear counting is very tight at n << m
    assert abs(r["hll_estimate"] - 40) / 40 < 0.10


def test_duplicates_do_not_move_the_estimate(spark):
    once = hll_distinct(
        _df(spark, [("g", f"v{i}") for i in range(500)]), ["grp"], "val"
    ).collect()[0]
    duped = hll_distinct(
        _df(spark, [("g", f"v{i % 500}") for i in range(5000)]),
        ["grp"],
        "val",
    ).collect()[0]
    assert once["hll_estimate"] == duped["hll_estimate"]


def test_merge_of_halves_equals_whole(spark):
    # the property that makes sketches useful: per-shard registers fold
    # by max into exactly the whole-corpus sketch
    all_rows = [("g", f"v{i}") for i in range(2000)]
    whole = hll_distinct(_df(spark, all_rows), ["grp"], "val").collect()[0]
    r1 = hll_registers(_df(spark, all_rows[:1200]), ["grp"], "val")
    r2 = hll_registers(_df(spark, all_rows[800:]), ["grp"], "val")
    merged = hll_estimate_from_registers(
        hll_merge(r1.unionAll(r2), ["grp"]), ["grp"]
    ).collect()[0]
    assert merged["hll_estimate"] == whole["hll_estimate"]
    assert merged["n_registers"] == whole["n_registers"]


def test_per_group_independence(spark):
    rows = [("a", f"v{i}") for i in range(1000)] + [
        ("b", f"v{i}") for i in range(30)
    ]
    out = {r["grp"]: r for r in hll_distinct(_df(spark, rows), ["grp"], "val").collect()}
    assert abs(out["a"]["hll_estimate"] - 1000) / 1000 < 0.15
    assert abs(out["b"]["hll_estimate"] - 30) / 30 < 0.15


def test_p_bounds_validated(spark):
    with pytest.raises(ValueError):
        hll_registers(_df(spark, [("g", "v")]), ["grp"], "val", p=3)


def test_higher_p_tightens_estimate(spark):
    rows = [("g", f"v{i}") for i in range(5000)]
    df = _df(spark, rows)
    e8 = hll_distinct(df, ["grp"], "val", p=8).collect()[0]["hll_estimate"]
    e12 = hll_distinct(df, ["grp"], "val", p=12).collect()[0]["hll_estimate"]
    assert abs(e12 - 5000) <= abs(e8 - 5000)
