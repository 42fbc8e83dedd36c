"""hyperanf: max-merge of HLL registers is EXACTLY the sketch of the
union, so the neighborhood-function estimate at radius t must equal
hll_distinct over the explicitly enumerated ball membership — zero
approximation slack.  Plus directionality and radius monotonicity."""

import math

from pyspark.sql import functions as F

from node_feedparser_spark.operators.graph_algo import hyperanf
from node_feedparser_spark.operators.sketch import hll_distinct


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_id string, dst_id string")


def _balls(pairs, rounds):
    """Exact BFS balls along OUT edges, per node per radius."""
    adj = {}
    nodes = set()
    for s, d in pairs:
        nodes.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
    out = {}
    ball = {v: {v} for v in nodes}
    for t in range(1, rounds + 1):
        ball = {
            v: ball[v] | set().union(*(ball[u] for u in adj.get(v, ())), set())
            for v in nodes
        }
        for v in nodes:
            out[(v, t)] = set(ball[v])
    return out


def test_matches_hll_of_explicit_ball(spark):
    # directed path + branch: a->b->c, a->d, c->e
    pairs = [("a", "b"), ("b", "c"), ("a", "d"), ("c", "e")]
    got = {
        (r["node"], r["radius"]): (
            r["n_registers"], r["n_zero_buckets"], r["hll_estimate"]
        )
        for r in hyperanf(_edges(spark, pairs), rounds=3, p=7).collect()
    }
    balls = _balls(pairs, 3)
    members = [
        (f"{v}#{t}", m) for (v, t), s in balls.items() for m in s
    ]
    mdf = spark.createDataFrame(members, "grp string, member string")
    want_rows = hll_distinct(mdf, ["grp"], "member", p=7).collect()
    want = {}
    for r in want_rows:
        v, t = r["grp"].rsplit("#", 1)
        want[(v, int(t))] = (
            r["n_registers"], r["n_zero_buckets"], r["hll_estimate"]
        )
    assert got == want


def test_direction_and_monotonicity(spark):
    pairs = [("a", "b"), ("b", "c")]
    rows = hyperanf(_edges(spark, pairs), rounds=2, p=7).collect()
    est = {(r["node"], r["radius"]): r["hll_estimate"] for r in rows}
    regs = {(r["node"], r["radius"]): r["n_registers"] for r in rows}
    # c has no out-edges: its ball is always {c}
    assert regs[("c", 1)] == 1 and regs[("c", 2)] == 1
    # a reaches b at t=1 and c at t=2: register counts grow (no collision
    # at 3 nodes / 128 buckets is overwhelmingly likely; pin it exactly)
    assert regs[("a", 1)] == 2 and regs[("a", 2)] == 3
    # estimates are monotone in radius for every node
    for v in ("a", "b", "c"):
        assert est[(v, 2)] >= est[(v, 1)]


def test_parallel_edges_and_self_loops_are_noops(spark):
    base = [("a", "b"), ("b", "c")]
    noisy = base + [("a", "b"), ("a", "a"), ("b", "c")]
    clean = hyperanf(_edges(spark, base), rounds=2, p=7).collect()
    dirty = hyperanf(_edges(spark, noisy), rounds=2, p=7).collect()
    assert sorted(map(tuple, clean), key=str) == sorted(
        map(tuple, dirty), key=str
    )


def test_harmonic_centrality_matches_hand_computation(spark):
    from node_feedparser_spark.operators.graph_algo import (
        harmonic_centrality_anf,
    )

    # star out of a: a->{b,c,d}; plus b->c so a's 1-ball already covers c
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c")]
    anf = {
        (r["node"], r["radius"]): r["hll_estimate"]
        for r in hyperanf(_edges(spark, pairs), rounds=2, p=7).collect()
    }
    got = {
        r["node"]: (r["anf_max"], r["harmonic"], r["effective_radius"])
        for r in harmonic_centrality_anf(
            _edges(spark, pairs), rounds=2, p=7
        ).collect()
    }
    assert set(got) == {"a", "b", "c", "d"}
    for v in got:
        b1, b2 = anf[(v, 1)], anf[(v, 2)]
        # same exact fixed-point weighting as the operator: deltas x 10^4
        # as integers, one final division — no decimal rounding anywhere
        # B_0 is the sketch's own singleton estimate at p=7 (4-dp), so a
        # never-growing ball differences to exactly 0
        b0 = round(128 * math.log(128 / 127.0), 4)
        want_h = (
            round(max(b1 - b0, 0.0) * 10000) * 2
            + round(max(b2 - b1, 0.0) * 10000)
        ) / 20000.0
        want_eff = 1 if b1 >= 0.9 * b2 else 2
        assert got[v] == (b2, want_h, want_eff), v
    # the hub's truncated harmonic dominates every leaf's
    assert got["a"][1] > max(got[v][1] for v in ("b", "c", "d"))
    # sinks: ball never grows, harmonic 0, effective radius 1
    assert got["c"][1] == 0.0 and got["c"][2] == 1
    assert got["d"][1] == 0.0 and got["d"][2] == 1


def test_shared_anf_frame_matches_standalone(spark):
    """Round 4 shared-frame contract: harmonic_centrality_anf and
    effective_diameter consuming a precomputed hyperanf frame return
    exactly the standalone-path results (the cache is a cost change,
    not a semantics change), and the edges/anf argument guard raises
    when neither is given."""
    import pandas as pd
    import pytest
    from node_feedparser_spark.operators.graph_algo import (
        effective_diameter,
        harmonic_centrality_anf,
        hyperanf,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "a"), ("c", "b"),
         ("d", "c"), ("a", "e"), ("e", "a")],
        "src_id string, dst_id string",
    )
    anf = hyperanf(edges, rounds=2, p=7)

    def pdf(df):
        out = df.toPandas()
        return out.sort_values(list(out.columns), ignore_index=True)

    pd.testing.assert_frame_equal(
        pdf(harmonic_centrality_anf(edges, rounds=2, p=7)),
        pdf(harmonic_centrality_anf(rounds=2, p=7, anf=anf)),
    )
    pd.testing.assert_frame_equal(
        pdf(effective_diameter(edges, rounds=2, p=7)),
        pdf(effective_diameter(rounds=2, p=7, anf=anf)),
    )
    with pytest.raises(ValueError, match="edges or anf"):
        harmonic_centrality_anf(rounds=2, p=7)
    with pytest.raises(ValueError, match="edges or anf"):
        effective_diameter(rounds=2, p=7)
