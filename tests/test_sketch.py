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


# --------------------------------------------------------------------------
# count-min sketch
# --------------------------------------------------------------------------

from node_feedparser_spark.operators.sketch import (  # noqa: E402
    cms_counters,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
    histogram_quantiles,
)


def _vals(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["val"])


def test_cms_never_underestimates(spark):
    # one-sided error: estimate >= true count, for every item, even at a
    # deliberately tiny w that forces collisions
    vals = [f"v{i % 37}" for i in range(1000)]
    df = _vals(spark, vals)
    counters = cms_counters(df, "val", d=3, w=16)
    est = {
        r["val"]: r["cms_count"]
        for r in cms_estimate(
            counters, df.distinct(), "val", d=3, w=16
        ).collect()
    }
    import collections

    true = collections.Counter(vals)
    assert all(est[v] >= c for v, c in true.items())


def test_cms_exact_when_collision_free(spark):
    # few items, wide table: whp no two items share a bucket in any row,
    # so the min equals the exact count
    vals = ["a"] * 10 + ["b"] * 5 + ["c"] * 1
    df = _vals(spark, vals)
    est = {
        r["val"]: r["cms_count"]
        for r in cms_estimate(
            cms_counters(df, "val", d=4, w=512),
            df.distinct(),
            "val",
            d=4,
            w=512,
        ).collect()
    }
    assert est == {"a": 10, "b": 5, "c": 1}


def test_cms_merge_of_halves_equals_whole(spark):
    vals = [f"v{i % 50}" for i in range(800)]
    whole = cms_counters(_vals(spark, vals), "val", d=4, w=64)
    half = cms_merge(
        cms_counters(_vals(spark, vals[:500]), "val", d=4, w=64).unionAll(
            cms_counters(_vals(spark, vals[500:]), "val", d=4, w=64)
        )
    )
    a = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    b = {(r["row"], r["bucket"]): r["cnt"] for r in half.collect()}
    assert a == b


def test_cms_heavy_hitters_catches_every_true_hitter(spark):
    # 'hot' is 30% of mass; scattered cold items fill the rest
    vals = ["hot"] * 300 + [f"cold{i}" for i in range(700)]
    out = cms_heavy_hitters(_vals(spark, vals), "val", threshold=0.1, d=4, w=512)
    got = {r["val"] for r in out.collect()}
    assert "hot" in got
    hot = [r for r in out.collect() if r["val"] == "hot"][0]
    assert hot["cms_count"] >= 300
    assert abs(hot["est_frac"] - 0.3) < 0.05


def test_cms_parameter_validation(spark):
    with pytest.raises(ValueError):
        cms_counters(_vals(spark, ["x"]), "val", d=0)
    with pytest.raises(ValueError):
        cms_counters(_vals(spark, ["x"]), "val", w=4)


# --------------------------------------------------------------------------
# histogram quantiles
# --------------------------------------------------------------------------


def _gv(spark, rows):
    return spark.createDataFrame(rows, ["grp", "x"])


def test_hist_quantiles_within_one_bucket_width(spark):
    # uniform 0..1000: p50 ~ 500, p95 ~ 950; bucket width 1000/64 ~ 15.6
    rows = [("g", float(i)) for i in range(1001)]
    out = {
        r["q"]: r["quantile_est"]
        for r in histogram_quantiles(
            _gv(spark, rows), ["grp"], "x", qs=(0.5, 0.95)
        ).collect()
    }
    width = 1000 / 64
    assert abs(out[0.5] - 500) <= width
    assert abs(out[0.95] - 950) <= width


def test_hist_quantiles_degenerate_group_returns_value(spark):
    rows = [("g", 7.5)] * 20
    out = histogram_quantiles(_gv(spark, rows), ["grp"], "x", qs=(0.5,)).collect()
    assert out[0]["quantile_est"] == 7.5


def test_hist_quantiles_groups_independent(spark):
    rows = [("a", float(i)) for i in range(101)] + [
        ("b", float(1000 + 10 * i)) for i in range(101)
    ]
    out = {
        (r["grp"], r["q"]): r["quantile_est"]
        for r in histogram_quantiles(
            _gv(spark, rows), ["grp"], "x", qs=(0.5,)
        ).collect()
    }
    assert abs(out[("a", 0.5)] - 50) <= 100 / 64
    assert abs(out[("b", 0.5)] - 1500) <= 1000 / 64


def test_hist_quantiles_q_validated(spark):
    with pytest.raises(ValueError):
        histogram_quantiles(_gv(spark, [("g", 1.0)]), ["grp"], "x", qs=(1.5,))
    with pytest.raises(ValueError):
        histogram_quantiles(_gv(spark, [("g", 1.0)]), ["grp"], "x", qs=())


def test_hist_quantiles_monotone_in_q(spark):
    rows = [("g", float(i * i % 997)) for i in range(500)]
    out = histogram_quantiles(
        _gv(spark, rows), ["grp"], "x", qs=(0.25, 0.5, 0.75, 0.95)
    ).collect()
    by_q = sorted((r["q"], r["quantile_est"]) for r in out)
    ests = [e for _, e in by_q]
    assert ests == sorted(ests)
