"""katz_centrality: hand walk counts on chain/cycle/star, repeated-walk
semantics a ball-size metric can't see, dyadic exactness, numpy
matrix-power parity on a seeded random digraph, validation."""

import random

import numpy as np
import pytest

from node_feedparser_spark.operators.graph_algo import katz_centrality


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src_id string, dst_id string")


def _by_node(df):
    return {r.node: r.katz for r in df.collect()}


def test_chain_walk_counts(spark):
    # a->b->c, rounds=3, beta=1/4:
    # b: w1=1 -> 1/4;  c: w1=1, w2=1 -> 1/4 + 1/16 = 0.3125
    got = _by_node(
        katz_centrality(_df(spark, [("a", "b"), ("b", "c")]), rounds=3)
    )
    assert got == {"b": 0.25, "c": 0.3125}


def test_two_cycle_repeated_walks(spark):
    # a<->b: every length-k walk exists for each k; both nodes get
    # 1/4 + 1/16 + 1/64 = 21/64 — REPEATED walks count (ball size
    # saturates at 2, Katz keeps accumulating)
    got = _by_node(
        katz_centrality(_df(spark, [("a", "b"), ("b", "a")]), rounds=3)
    )
    assert got == {"a": 21 / 64, "b": 21 / 64}


def test_star_indegree_dominance(spark):
    # 3 leaves -> hub: hub w1=3; leaves unreachable (no incoming)
    got = _by_node(
        katz_centrality(
            _df(spark, [("l1", "h"), ("l2", "h"), ("l3", "h")]), rounds=2
        )
    )
    assert got == {"h": 0.75}


def test_numpy_matrix_power_parity(spark):
    rng = random.Random(17)
    n = 12
    pairs = list(
        {
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
            for _ in range(40)
        }
    )
    pairs = [(u, v) for u, v in pairs if u != v]
    names = sorted({x for p in pairs for x in p})
    idx = {x: i for i, x in enumerate(names)}
    A = np.zeros((len(names), len(names)), dtype=np.int64)
    for u, v in pairs:
        A[idx[u], idx[v]] = 1
    ones = np.ones(len(names), dtype=np.int64)
    rounds, den = 3, 4
    acc = np.zeros(len(names), dtype=np.int64)
    w = ones
    for k in range(1, rounds + 1):
        w = A.T @ w  # walks ending at v
        acc += w * den ** (rounds - k)
    want = {
        names[i]: acc[i] / den**rounds for i in range(len(names)) if acc[i]
    }
    got = _by_node(katz_centrality(_df(spark, pairs), rounds=3, beta_den=4))
    assert got == want  # dyadic division: exact equality, no tolerance


def test_validation(spark):
    with pytest.raises(ValueError):
        katz_centrality(None, rounds=0)
    with pytest.raises(ValueError):
        katz_centrality(None, beta_den=3)
    with pytest.raises(ValueError):
        katz_centrality(None, beta_den=1)
