"""PSI drift (curation.psi_drift): identical slices ~ 0, shifted slices
large, hand bin arithmetic, empty-bin Laplace floor, DuckDB replay."""

import math

import pytest

from node_feedparser_spark.operators.curation import psi_drift


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, value double"
    )


def test_identical_slices_near_zero(spark):
    vals = [float(i) for i in range(100)]
    out = psi_drift(_df(spark, vals), _df(spark, vals), n_bins=10).collect()
    psi = sum(r.psi_term for r in out)
    assert abs(psi) < 1e-9  # same counts -> every term exactly 0
    assert len(out) == 10
    for r in out:
        assert r.n_ref == r.n_cur


def test_shifted_distribution_flags(spark):
    ref = [float(i % 100) for i in range(500)]
    cur = [float(i % 100) + 60.0 for i in range(500)]  # hard right shift
    out = psi_drift(_df(spark, ref), _df(spark, cur), n_bins=10).collect()
    psi = sum(r.psi_term for r in out)
    assert psi > 0.25  # action threshold


def test_hand_two_bins(spark):
    # ref: 8 low, 2 high; cur: 2 low, 8 high; edge = ref median
    ref = [0.0] * 8 + [10.0] * 2
    cur = [0.0] * 2 + [10.0] * 8
    out = {
        r.bin: r
        for r in psi_drift(_df(spark, ref), _df(spark, cur), n_bins=2).collect()
    }
    # ref median of (0 x8, 10 x2) = 0.0 -> bin = value > 0.0
    pr0, pc0 = (8 + 0.5) / 11, (2 + 0.5) / 11
    pr1, pc1 = (2 + 0.5) / 11, (8 + 0.5) / 11
    assert out[0].p_ref == pytest.approx(round(pr0, 6))
    assert out[0].p_cur == pytest.approx(round(pc0, 6))
    assert out[0].psi_term == pytest.approx(
        round((pc0 - pr0) * math.log(pc0 / pr0), 6), abs=1e-9
    )
    assert out[1].psi_term == pytest.approx(
        round((pc1 - pr1) * math.log(pc1 / pr1), 6), abs=1e-9
    )


def test_bin_missing_from_one_side(spark):
    # cur entirely above every ref edge -> all mass in top bin; low bins
    # exist only on the ref side yet still get cur's Laplace floor
    ref = [float(i) for i in range(50)]
    cur = [1000.0] * 30
    out = {r.bin: r for r in psi_drift(_df(spark, ref), _df(spark, cur), n_bins=5).collect()}
    assert out[4].n_cur == 30
    for b in range(4):
        assert out[b].n_cur == 0
        assert out[b].p_cur == pytest.approx(round(0.5 / 32.5, 6))


def test_matches_duckdb_replay(spark):
    ref = [float(i % 37) for i in range(200)]
    cur = [float((i * 7) % 61) for i in range(150)]
    rdf, cdf = _df(spark, ref), _df(spark, cur)
    got = sorted(map(tuple, psi_drift(rdf, cdf, n_bins=10).collect()))
    import duckdb

    con = duckdb.connect()
    con.register("ref", rdf.toPandas())
    con.register("cur", cdf.toPandas())
    edges = ", ".join(
        f"quantile_cont(value, {i / 10}) AS _e{i}" for i in range(1, 10)
    )
    binexpr = " + ".join(
        f"CASE WHEN value > _e{i} THEN 1 ELSE 0 END" for i in range(1, 10)
    )
    want = sorted(
        map(
            tuple,
            con.execute(f"""
        WITH e AS (SELECT {edges} FROM ref),
        rb AS (SELECT CAST({binexpr} AS BIGINT) AS bin
               FROM ref CROSS JOIN e),
        cb AS (SELECT CAST({binexpr} AS BIGINT) AS bin
               FROM cur CROSS JOIN e),
        rc AS (SELECT bin, COUNT(*) AS n_ref FROM rb GROUP BY 1),
        cc AS (SELECT bin, COUNT(*) AS n_cur FROM cb GROUP BY 1),
        j AS (SELECT COALESCE(rc.bin, cc.bin) AS bin,
                     COALESCE(n_ref, 0) AS n_ref,
                     COALESCE(n_cur, 0) AS n_cur
              FROM rc FULL JOIN cc ON rc.bin = cc.bin),
        t AS (SELECT *, SUM(n_ref) OVER () AS rt, SUM(n_cur) OVER () AS ct
              FROM j)
        SELECT bin, CAST(n_ref AS BIGINT), CAST(n_cur AS BIGINT),
               ROUND((n_ref + 0.5) / (rt + 5.0), 6),
               ROUND((n_cur + 0.5) / (ct + 5.0), 6),
               ROUND(((n_cur + 0.5) / (ct + 5.0) - (n_ref + 0.5) / (rt + 5.0))
                     * LN(((n_cur + 0.5) / (ct + 5.0))
                          / ((n_ref + 0.5) / (rt + 5.0))), 6)
        FROM t
    """).fetchall(),
        )
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        for gi, wi in zip(g[3:], w[3:]):
            assert gi == pytest.approx(wi, abs=1e-9)
