"""Bloom-filter semi-join: one-sided guarantee, FP behavior, plan shape."""

import pytest

from pyspark.sql import functions as F

from node_feedparser_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_semi_join,
)


def _keys(spark, vals, col="k"):
    return spark.createDataFrame([(v,) for v in vals], [col])


def test_every_true_member_passes(spark):
    # the one-sided guarantee, at a tiny m that collides heavily
    members = [f"m{i}" for i in range(200)]
    filt = bloom_build(_keys(spark, members), "k", m_bits=1024, k=3)
    out = bloom_probe(_keys(spark, members), "k", filt, m_bits=1024, k=3)
    assert out.count() == len(members)


def test_non_members_rejected_when_roomy(spark):
    # m >> n: expected FP ~ (kn/m)^k ~ 2e-5 over 500 probes -> whp zero
    members = [f"m{i}" for i in range(50)]
    others = [f"x{i}" for i in range(500)]
    filt = bloom_build(_keys(spark, members), "k", m_bits=1 << 16, k=3)
    out = bloom_probe(_keys(spark, others), "k", filt, m_bits=1 << 16, k=3)
    assert out.count() == 0


def test_semi_join_flags_false_positives(spark):
    # tiny filter + many probes: FPs exist but every one carries
    # is_true_member = false, and every member carries true
    dim = _keys(spark, [f"m{i}" for i in range(100)], col="dk")
    fact = _keys(
        spark,
        [f"m{i}" for i in range(100)] + [f"x{i}" for i in range(3000)],
        col="fk",
    )
    out = bloom_semi_join(fact, "fk", dim, "dk", m_bits=1024, k=2).collect()
    true_members = {r["fk"] for r in out if r["is_true_member"]}
    assert true_members == {f"m{i}" for i in range(100)}
    fps = [r["fk"] for r in out if not r["is_true_member"]]
    assert all(f.startswith("x") for f in fps)
    # prune is effective: most non-members are gone
    assert len(fps) < 1500


def test_membership_test_is_projection_only(spark):
    # the probe side must not shuffle: the plan joins the single-row
    # filter by broadcast nested loop, and the filter itself is a
    # projection over it
    filt = bloom_build(_keys(spark, ["a", "b"]), "k")
    probed = bloom_probe(_keys(spark, ["a", "c"]), "k", filt)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_parameter_validation(spark):
    df = _keys(spark, ["a"])
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=100)
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=512)
    with pytest.raises(ValueError):
        bloom_build(df, "k", k=0)


def test_filter_state_is_inspectable(spark):
    row = bloom_build(_keys(spark, [f"m{i}" for i in range(10)]), "k").collect()[0]
    assert row["n_keys"] == 10
    # k=3 hashes x 10 keys set at most 30 bits across <= 30 words
    assert 1 <= len(row["bloom"]) <= 30
    assert all(w != 0 for w in row["bloom"].values())
