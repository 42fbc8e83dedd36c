"""betweenness: k-source bounded Brandes — exact long path counts, 6-dp
level-wise dependency accumulation, truncation semantics, and parity with
an independent pure-Python Brandes replay."""

import hashlib

import pytest

from node_feedparser_spark.operators.graph_algo import betweenness


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_id string, dst_id string")


def _und(pairs):
    return pairs + [(b, a) for a, b in pairs]


def _sources(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def _run(spark, pairs, sources, depth):
    return {
        r["node"]: r["betweenness"]
        for r in betweenness(
            _edges(spark, pairs), _sources(spark, sources), depth
        ).collect()
    }


def _python_brandes(pairs, sources, depth):
    """Independent level-synchronous bounded Brandes with the operator's
    rounding contract (6 dp per level, 6 dp final)."""
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
    out = {}
    for s in set(sources):
        levels = [{s: 1}]
        visited = {s}
        for _ in range(depth):
            nxt = {}
            for u, sig in levels[-1].items():
                for v in adj.get(u, ()):
                    if v not in visited:
                        nxt[v] = nxt.get(v, 0) + sig
            if not nxt:
                break
            visited |= set(nxt)
            levels.append(nxt)
        deltas = [dict.fromkeys(lv, 0.0) for lv in levels]
        for t in range(len(levels) - 2, -1, -1):
            for v, sig_v in levels[t].items():
                terms = [
                    sig_v / levels[t + 1][w] * (1.0 + deltas[t + 1][w])
                    for w in adj.get(v, ())
                    if w in levels[t + 1]
                ]
                deltas[t][v] = round(sum(terms), 6) if terms else 0.0
        for t in range(1, len(levels)):
            for v, d in deltas[t].items():
                out[v] = out.get(v, 0.0) + d
    return {v: round(d, 6) for v, d in out.items()}


def test_path_center_carries_all_traffic(spark):
    pairs = _und([("a", "b"), ("b", "c")])
    got = _run(spark, pairs, ["a", "c"], 3)
    # b brokers a<->c in both directions; endpoints broker nothing
    assert got == {"a": 0.0, "b": 2.0, "c": 0.0}


def test_diamond_splits_dependency_across_equal_paths(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    got = _run(spark, pairs, ["a"], 2)
    assert got == {"b": 0.5, "c": 0.5, "d": 0.0}


def test_sigma_counts_multiply_through_merges(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    got = _run(spark, pairs, ["a"], 3)
    # two a->d paths, both continue to e: d carries both (1.0), each of
    # b/c carries half of (a,d) and half of (a,e)
    assert got == {"b": 1.0, "c": 1.0, "d": 1.0, "e": 0.0}


def test_truncation_drops_paths_past_max_depth(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _run(spark, pairs, ["a"], 2)
    # d is 3 hops out: not reached, and (a,d) dependency never counted
    assert got == {"b": 1.0, "c": 0.0}


def test_matches_independent_python_brandes(spark):
    def h(x):
        return int(hashlib.md5(x.encode()).hexdigest(), 16)

    nodes = [f"n{i}" for i in range(14)]
    pairs = [
        (u, v)
        for u in nodes
        for v in nodes
        if u != v and h(u + "|" + v) % 4 == 0
    ]
    sources = ["n0", "n3", "n7"]
    got = _run(spark, pairs, sources, 3)
    want = _python_brandes(pairs, sources, 3)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_validation_and_isolated_source(spark):
    pairs = [("a", "b")]
    with pytest.raises(ValueError):
        betweenness(
            _edges(spark, pairs), _sources(spark, ["a"]), 0
        )
    # source with no out-edges: nothing reached, empty result
    assert _run(spark, pairs, ["z"], 3) == {}
