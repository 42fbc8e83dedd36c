"""Personalized PageRank (operators/graph_algo.py personalized_pagerank)."""

import pytest

from node_feedparser_spark.operators.graph_algo import personalized_pagerank


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src_id long, dst_id long, weight double")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    out = personalized_pagerank(e, s, **kw).collect()
    return {r["node"]: r["rank"] for r in out}


def test_two_cycle_hand_computed(spark):
    # seed {1}, 1<->2, two iterations:
    # r1 = (0.15, 0.85); r2 = (0.15 + 0.85^2, 0.85*0.15)
    got = _run(spark, [(1, 2, 1.0), (2, 1, 1.0)], [1])
    assert got == {1: 0.8725, 2: 0.1275}


def test_dangling_mass_restarts_at_seeds(spark):
    # 1 -> 2 with 2 dangling: its mass teleports back to the seed only
    got = _run(spark, [(1, 2, 1.0)], [1])
    assert got == {1: 0.8725, 2: 0.1275}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_isolated_seed_keeps_all_mass(spark):
    got = _run(spark, [(1, 2, 1.0)], [9])
    assert got[9] == 1.0 and got[1] == 0.0 and got[2] == 0.0


def test_empty_seed_set_rejected(spark):
    e = spark.createDataFrame([(1, 2, 1.0)], "src_id long, dst_id long, weight double")
    s = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError):
        personalized_pagerank(e, s)
