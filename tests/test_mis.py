"""luby_mis: independence + maximality invariants, isolated-node and
self-loop contracts, determinism across runs, and bit-exact parity with
a pure-Python replica computing the same md5 priorities."""

import hashlib
import random

import pytest

from node_feedparser_spark.operators.graph_algo import luby_mis


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _mis(spark, pairs, nodes=None):
    nd = (
        spark.createDataFrame([(n,) for n in nodes], "node long")
        if nodes is not None
        else None
    )
    return {r.node for r in luby_mis(_df(spark, pairs), nodes=nd).collect()}


def _python_luby(pairs, extra_nodes=()):
    adj = {}
    nodes = set(extra_nodes)
    for u, v in pairs:
        nodes.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    active, mis = set(nodes), set()
    r = 0
    while active:
        prio = {
            n: hashlib.md5(f"{n}:{r}".encode()).hexdigest()
            + ":" + str(n).zfill(20)
            for n in active
        }
        winners = {
            n
            for n in active
            if all(
                prio[n] < prio[m]
                for m in adj.get(n, ())
                if m in active
            )
        }
        mis |= winners
        dead = set(winners)
        for w in winners:
            dead |= adj.get(w, set()) & active
        active -= dead
        r += 1
    return mis


def _check_invariants(pairs, mis, all_nodes):
    adj = {}
    for u, v in pairs:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    for n in mis:  # independence
        assert not (adj.get(n, set()) & mis), n
    for n in all_nodes - mis:  # maximality
        assert adj.get(n, set()) & mis, n


def test_triangle_picks_exactly_one(spark):
    pairs = [(1, 2), (2, 3), (1, 3)]
    got = _mis(spark, pairs)
    assert len(got) == 1
    assert got == _python_luby(pairs)


def test_isolated_nodes_always_join(spark):
    got = _mis(spark, [(1, 2)], nodes=[1, 2, 5, 6])
    assert {5, 6} <= got
    assert got == _python_luby([(1, 2)], extra_nodes=[5, 6])


def test_self_loop_dropped(spark):
    got = _mis(spark, [(1, 1), (1, 2)])
    assert got == _python_luby([(1, 2)])


def test_star_center_or_leaves(spark):
    pairs = [(0, i) for i in range(1, 8)]
    got = _mis(spark, pairs)
    _check_invariants(pairs, got, set(range(8)))
    assert got == _python_luby(pairs)


def test_determinism(spark):
    pairs = [(i, (i * 3 + 1) % 15) for i in range(15)]
    assert _mis(spark, pairs) == _mis(spark, pairs)


def test_python_parity_and_invariants_randomized(spark):
    rng = random.Random(61)
    pairs = list(
        {
            (rng.randrange(30), rng.randrange(30))
            for _ in range(90)
        }
    )
    got = _mis(spark, pairs)
    want = _python_luby(pairs)
    assert got == want
    all_nodes = {x for p in pairs for x in p if p[0] != p[1]}
    edges = [p for p in pairs if p[0] != p[1]]
    _check_invariants(edges, got, all_nodes)


def test_validation(spark):
    with pytest.raises(ValueError):
        luby_mis(None, max_rounds=0)
