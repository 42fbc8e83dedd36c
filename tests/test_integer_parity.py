"""Cross-engine integer-arithmetic parity — the foundations the PQ / KMV
oracle exactness rests on, fuzzed instead of assumed.

Two disciplines are load-bearing:
- the sign-symmetric half-away-from-zero integer mean
  sign(s) * (2*|s| + n) // (2*n) (residual PQ Lloyd): Python // floors
  while DuckDB // truncates toward zero, so the naive (2s+n)//(2n)
  diverges on negative sums — hypothesis sweeps the sign/magnitude space
  and checks the repo formula agrees with DuckDB's CASE expression.
- the scalar quantization projection (pq/quantized lanes): JVM F.round
  on (x - min)/scale must equal DuckDB ROUND on the same doubles for
  arbitrary float inputs, not just the fixture table — a seeded random
  matrix with negatives, constants, and near-half-boundary values runs
  through both engines.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _py_mean(s: int, n: int) -> int:
    v = (2 * abs(s) + n) // (2 * n)
    return v if s >= 0 else -v


@given(
    s=st.integers(min_value=-(10**15), max_value=10**15),
    n=st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=300, deadline=None)
def test_sign_symmetric_mean_matches_duckdb(s, n):
    # CAST to BIGINT: bare literals bind as INT32 and 2*s would overflow —
    # the production oracles feed SUM() (HUGEINT), which cannot
    got = duckdb.sql(
        f"WITH t AS (SELECT CAST({s} AS BIGINT) AS s, CAST({n} AS BIGINT) AS n)"
        f" SELECT CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n) "
        f"ELSE -((-2 * s + n) // (2 * n)) END AS v FROM t"
    ).fetchone()[0]
    assert got == _py_mean(s, n)


@given(
    s=st.integers(min_value=-(10**12), max_value=10**12),
    n=st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=200, deadline=None)
def test_naive_floordiv_known_divergence_is_dodged(s, n):
    """Documents WHY the sign case exists: Python (2s+n)//(2n) and DuckDB
    (2s+n)//(2n) genuinely disagree for many negative sums, so any future
    'simplification' back to the naive form must fail this test."""
    duck = duckdb.sql(
        f"WITH t AS (SELECT CAST({s} AS BIGINT) AS s, CAST({n} AS BIGINT) AS n)"
        f" SELECT (2 * s + n) // (2 * n) AS v FROM t"
    ).fetchone()[0]
    py = (2 * s + n) // (2 * n)
    num = 2 * s + n
    if num >= 0:
        # non-negative numerator: floor == truncation, engines agree
        assert duck == py
        if s >= 0:
            assert py == _py_mean(s, n)
    elif num % (2 * n) != 0:
        # negative inexact division: DuckDB truncates toward zero, Python
        # floors — off by exactly one.  This is the divergence the
        # sign-symmetric formula exists to dodge.
        assert duck == py + 1
    else:
        assert duck == py  # exact division: no rounding, no divergence


def test_quantize_projection_matches_duckdb_on_fuzzed_floats(
    spark, tmp_path
):
    """Seeded random vectors — negatives, tiny scales, constant dims, and
    values engineered near .5 rounding boundaries — quantized by the
    Spark projection and the DuckDB oracle replay must be int-identical
    (this is the exactness everything in the PQ family inherits)."""
    from node_feedparser_spark.operators.similarity import (
        _quantization_stats,
        _quantize_with_stats,
    )

    rng = np.random.default_rng(7)
    n, dim = 200, 16
    mat = rng.normal(0.0, 50.0, size=(n, dim))
    mat[:, 3] = 1.25  # constant dimension -> scale 0 path
    # engineer near-half boundaries on one dimension
    mat[:50, 5] = np.floor(mat[:50, 5]) + 0.5 + rng.normal(0, 1e-9, 50)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in mat],
        }
    )
    path = str(tmp_path / "fuzz.parquet")
    pdf.to_parquet(path)

    df = spark.read.parquet(path)
    mn, sc = _quantization_stats(df, "embedding", 256)
    got = (
        _quantize_with_stats(df, mn, sc, "vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )

    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM read_parquet('{path}')),
        x AS (SELECT vec_id, unnest(v) AS x,
                     generate_subscripts(v, 1) AS pos FROM e),
        st AS (SELECT pos, MIN(x) AS mn, (MAX(x) - MIN(x)) / 255.0 AS sc
               FROM x GROUP BY pos)
        SELECT x.vec_id,
               list(CASE WHEN st.sc > 0
                         THEN CAST(ROUND((x.x - st.mn) / st.sc) AS BIGINT)
                         ELSE 0 END ORDER BY x.pos) AS qvec
        FROM x JOIN st USING (pos) GROUP BY x.vec_id ORDER BY x.vec_id
        """
    ).df()
    for i in range(n):
        assert list(got["qvec"][i]) == list(want["qvec"][i]), f"row {i}"
