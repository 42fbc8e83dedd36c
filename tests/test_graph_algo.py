"""PageRank: hand graphs pin teleport/dangling/weight semantics; a pure-
Python power-iteration reference pins the general case."""

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.graph_algo import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_id string, dst_id string, weight double"
    )


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)])
    got = _ranks(pagerank(e, n_iter=5))
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_mass_is_conserved_with_dangling(spark):
    # b has no out-edges: its rank must be redistributed, not lost
    e = _edges(spark, [("a", "b", 1.0)])
    got = _ranks(pagerank(e, n_iter=7))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["b"] > got["a"]  # b receives a's full walk mass


def test_weights_split_contribution(spark):
    # one iteration from uniform: b gets 3/4 of a's damped rank, c gets 1/4
    e = _edges(spark, [("a", "b", 3.0), ("a", "c", 1.0)])
    got = _ranks(pagerank(e, n_iter=1, damping=0.85))
    n = 3
    dangling = 2 / n  # b and c hold 1/n each, no out-edges
    base = 0.15 / n + 0.85 * dangling / n
    assert got["b"] == pytest.approx(base + 0.85 * (1 / n) * 0.75, abs=1e-12)
    assert got["c"] == pytest.approx(base + 0.85 * (1 / n) * 0.25, abs=1e-12)
    assert got["a"] == pytest.approx(base, abs=1e-12)


def test_parallel_edges_combine(spark):
    dup = _edges(
        spark, [("a", "b", 2.0), ("a", "b", 1.0), ("a", "c", 1.0)]
    )
    single = _edges(spark, [("a", "b", 3.0), ("a", "c", 1.0)])
    assert _ranks(pagerank(dup, n_iter=3)) == pytest.approx(
        _ranks(pagerank(single, n_iter=3))
    )


def _py_pagerank(edges, n_iter, damping=0.85):
    """Reference power iteration; edges = [(src, dst, w)]."""
    from collections import defaultdict

    w = defaultdict(float)
    for s, d, x in edges:
        w[(s, d)] += x
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out = defaultdict(float)
    for (s, _), x in w.items():
        out[s] += x
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(rank[v] for v in nodes if out[v] == 0.0)
        nxt = {v: (1 - damping) / n + damping * dangling / n for v in nodes}
        for (s, d), x in w.items():
            nxt[d] += damping * rank[s] * (x / out[s])
        rank = nxt
    return rank


def test_matches_python_reference_on_random_graph(spark):
    import random

    rng = random.Random(42)
    rows = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}", float(rng.randint(1, 5)))
        for _ in range(200)
    ]
    got = _ranks(pagerank(_edges(spark, rows), n_iter=4))
    want = _py_pagerank(rows, n_iter=4)
    assert set(got) == set(want)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-9), v


def test_empty_edges(spark):
    e = _edges(spark, []).filter(F.lit(False))
    assert pagerank(e, n_iter=2).count() == 0
