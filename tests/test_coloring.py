"""greedy_coloring: proper-coloring + completeness invariants, bipartite
and clique color counts, determinism, max_colors guard, and bit-exact
parity with the pure-Python iterated-Luby replica."""

import hashlib
import random

import pytest

from node_feedparser_spark.operators.graph_algo import greedy_coloring


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _colors(spark, pairs, **kw):
    return {
        r.node: r.color for r in greedy_coloring(_df(spark, pairs), **kw).collect()
    }


def _python_luby(adj, active):
    act, mis, r = set(active), set(), 0
    while act:
        prio = {
            n: hashlib.md5(f"{n}:{r}".encode()).hexdigest()
            + ":" + str(n).zfill(20)
            for n in act
        }
        winners = {
            n
            for n in act
            if all(prio[n] < prio[m] for m in adj.get(n, ()) if m in act)
        }
        mis |= winners
        dead = set(winners)
        for w in winners:
            dead |= adj.get(w, set()) & act
        act -= dead
        r += 1
    return mis


def _python_coloring(pairs):
    adj, nodes = {}, set()
    for u, v in pairs:
        nodes.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    out, remaining, color = {}, set(nodes), 0
    while remaining:
        sub_adj = {
            n: {m for m in adj.get(n, ()) if m in remaining}
            for n in remaining
        }
        mis = _python_luby(sub_adj, remaining)
        for n in mis:
            out[n] = color
        remaining -= mis
        color += 1
    return out


def _check_proper(pairs, coloring):
    for u, v in pairs:
        if u != v:
            assert coloring[u] != coloring[v], (u, v)


def test_path_two_colors(spark):
    pairs = [(1, 2), (2, 3), (3, 4)]
    got = _colors(spark, pairs)
    _check_proper(pairs, got)
    assert set(got) == {1, 2, 3, 4} and max(got.values()) <= 1


def test_clique_needs_n_colors(spark):
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _colors(spark, pairs)
    _check_proper(pairs, got)
    assert sorted(got.values()) == [0, 1, 2, 3]


def test_clique_guard_raises(spark):
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    with pytest.raises(ValueError, match="colors"):
        greedy_coloring(_df(spark, pairs), max_colors=3).collect()


def test_python_parity_and_invariants(spark):
    rng = random.Random(67)
    pairs = list(
        {(rng.randrange(25), rng.randrange(25)) for _ in range(70)}
    )
    got = _colors(spark, pairs)
    assert got == _python_coloring(pairs)
    _check_proper([p for p in pairs if p[0] != p[1]], got)


def test_determinism_and_isolated(spark):
    pairs = [(1, 2)]
    nd = None
    got1 = _colors(spark, pairs)
    got2 = _colors(spark, pairs)
    assert got1 == got2
    # self-loop-only node still gets a color (loop dropped)
    got3 = _colors(spark, [(1, 1), (1, 2)])
    assert set(got3) == {1, 2}
    _check_proper([(1, 2)], got3)
