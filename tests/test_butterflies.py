"""butterfly_counts: the complete 2x2 biclique, C(w,2) per shared pair,
credit to both endpoints, duplicate-edge collapse, no odd-cycle
contamination, and brute-force parity on a seeded random bipartite
graph."""

import itertools
import random

from node_feedparser_spark.operators.bipartite import butterfly_counts


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "left long, right long")


def _by_node(df):
    return {r.node: r.butterflies for r in df.collect()}


def _brute(pairs):
    adj = {}
    for u, r in set(pairs):
        adj.setdefault(u, set()).add(r)
    out = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        w = len(adj[u] & adj[v])
        bf = w * (w - 1) // 2
        if bf:
            out[u] = out.get(u, 0) + bf
            out[v] = out.get(v, 0) + bf
    return out


def test_single_butterfly(spark):
    # u1,u2 both connected to r1,r2: exactly one butterfly each
    got = _by_node(
        butterfly_counts(_df(spark, [(1, 10), (1, 11), (2, 10), (2, 11)]))
    )
    assert got == {1: 1, 2: 1}


def test_three_shared_neighbors_give_c32(spark):
    pairs = [(u, r) for u in (1, 2) for r in (10, 11, 12)]
    got = _by_node(butterfly_counts(_df(spark, pairs)))
    assert got == {1: 3, 2: 3}  # C(3,2)


def test_single_shared_neighbor_is_no_butterfly(spark):
    got = _by_node(
        butterfly_counts(_df(spark, [(1, 10), (2, 10), (2, 11)]))
    )
    assert got == {}


def test_duplicate_edges_collapse(spark):
    pairs = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11), (2, 11)]
    got = _by_node(butterfly_counts(_df(spark, pairs)))
    assert got == {1: 1, 2: 1}


def test_brute_force_parity(spark):
    rng = random.Random(31)
    pairs = [
        (rng.randrange(12), 100 + rng.randrange(8)) for _ in range(120)
    ]
    got = _by_node(butterfly_counts(_df(spark, pairs)))
    assert got == _brute(pairs)
