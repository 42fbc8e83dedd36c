"""boruvka_mst: hand forests, lexicographic tie-breaking, parallel-edge
min-keep, multi-round contraction, disconnected forests, and exact
edge-set parity with a pure-Python Kruskal using the same (w, a, b)
total order on a seeded random graph."""

import random

import pytest

from node_feedparser_spark.operators.graph_algo import boruvka_mst


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _edges(df):
    return {(r.a, r.b, r.w) for r in df.collect()}


def _kruskal(rows):
    canon = {}
    for u, v, w in rows:
        a, b = min(u, v), max(u, v)
        if a == b:
            continue
        canon[(a, b)] = min(canon.get((a, b), w), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def test_triangle_drops_heaviest(spark):
    rows = [(1, 2, 1), (2, 3, 2), (1, 3, 5)]
    assert _edges(boruvka_mst(_df(spark, rows))) == {(1, 2, 1), (2, 3, 2)}


def test_equal_weights_tie_break_lexicographic(spark):
    # all weights equal: the unique forest under the (w, a, b) order
    rows = [(1, 2, 7), (2, 3, 7), (1, 3, 7)]
    assert _edges(boruvka_mst(_df(spark, rows))) == _kruskal(rows)
    assert _edges(boruvka_mst(_df(spark, rows))) == {(1, 2, 7), (1, 3, 7)}


def test_parallel_edges_keep_min(spark):
    rows = [(1, 2, 9), (2, 1, 3), (1, 2, 5)]
    assert _edges(boruvka_mst(_df(spark, rows))) == {(1, 2, 3)}


def test_disconnected_forest(spark):
    rows = [(1, 2, 1), (2, 3, 4), (10, 11, 2)]
    got = _edges(boruvka_mst(_df(spark, rows)))
    assert got == {(1, 2, 1), (2, 3, 4), (10, 11, 2)}
    # |V| - #components = 5 - 2
    assert len(got) == 3


def test_multi_round_contraction_chain(spark):
    # a long path forces >1 Boruvka round to finish contracting
    rows = [(i, i + 1, 100 - i) for i in range(1, 12)]
    got = _edges(boruvka_mst(_df(spark, rows)))
    assert got == _kruskal(rows)
    assert len(got) == 11


def test_kruskal_parity_randomized(spark):
    rng = random.Random(59)
    rows = [
        (rng.randrange(20), rng.randrange(20), rng.randrange(1, 15))
        for _ in range(80)
    ]
    got = _edges(boruvka_mst(_df(spark, rows)))
    assert got == _kruskal(rows)


def test_validation(spark):
    with pytest.raises(ValueError):
        boruvka_mst(None, max_rounds=0)
    assert _edges(boruvka_mst(_df(spark, [(1, 1, 5)]))) == set()
