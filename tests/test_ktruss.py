"""Bounded-round k-truss peeling (operators/graph_algo.py ktruss)."""

import itertools

from node_feedparser_spark.operators.graph_algo import ktruss


def _run(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    out = ktruss(e, **kw).collect()
    return {(r["node_a"], r["node_b"]): r["support"] for r in out}


K4 = list(itertools.combinations([1, 2, 3, 4], 2))


def test_k4_clique_with_pendant_triangle_needs_two_rounds(spark):
    # K4 plus triangle (1,2,5): round 1 drops (1,5),(2,5) (support 1);
    # round 2 re-measures (1,2) at support 2 — still in the 4-truss
    edges = K4 + [(1, 5), (2, 5)]
    got = _run(spark, edges, k=4, n_rounds=2)
    assert set(got) == set(K4)
    assert all(s == 2 for s in got.values())


def test_k3_keeps_the_pendant_triangle(spark):
    edges = K4 + [(1, 5), (2, 5)]
    got = _run(spark, edges, k=3, n_rounds=2)
    assert set(got) == set(K4) | {(1, 5), (2, 5)}


def test_triangle_free_graph_empties_at_k4(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], k=4, n_rounds=2)
    assert got == {}


def test_single_round_keeps_stale_survivors(spark):
    # declared truncation: with n_rounds=1 the (1,2) edge keeps its
    # round-1 support of 3 (the pendant triangle still counted)
    edges = K4 + [(1, 5), (2, 5)]
    got = _run(spark, edges, k=4, n_rounds=1)
    assert got[(1, 2)] == 3 and set(got) == set(K4)
