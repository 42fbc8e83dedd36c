"""Strongly connected components (operators/scc.py) — coloring algorithm."""

import pytest

from node_feedparser_spark.operators.scc import strongly_connected_components


def _run(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long") if nodes else None
    out = strongly_connected_components(e, n)
    return {r["node"]: r["scc_id"] for r in out.collect()}


def test_two_rings_and_a_bridge(spark):
    # ring {1,2,3}, ring {4,5}, DAG edge 1 -> 4
    got = _run(spark, [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (1, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_condensation_low_to_high_needs_multiple_outer_rounds(spark):
    # condensation edges point from LOW ids to HIGH ids, so the first
    # forward coloring paints EVERYTHING with color 1 and only ring {1,2}
    # is extracted in round 1 — exercises the outer peel loop.
    got = _run(
        spark,
        [(1, 2), (2, 1), (3, 4), (4, 3), (10, 11), (11, 10), (1, 3), (3, 10)],
    )
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 10: 10, 11: 10}


def test_pure_dag_is_all_singletons(spark):
    got = _run(spark, [(1, 2), (2, 3), (1, 3)])
    assert got == {1: 1, 2: 2, 3: 3}


def test_self_loop_and_isolated_nodes(spark):
    got = _run(spark, [(7, 7), (1, 2), (2, 1)], nodes=[99])
    assert got == {1: 1, 2: 1, 7: 7, 99: 99}


def test_figure_eight_shares_one_scc(spark):
    # two cycles sharing vertex 5 collapse into one SCC
    got = _run(spark, [(5, 6), (6, 5), (5, 8), (8, 9), (9, 5)])
    assert got == {5: 5, 6: 5, 8: 5, 9: 5}


def test_long_cycle_converges(spark):
    n = 24
    edges = [(i, (i % n) + 1) for i in range(1, n + 1)]
    got = _run(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == n


def test_nonconvergence_guard(spark):
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with pytest.raises(RuntimeError):
        strongly_connected_components(e, max_outer=0)


def _cond(spark, edges, nodes=None):
    from node_feedparser_spark.operators.scc import condensation

    e = spark.createDataFrame(edges, "src long, dst long")
    n = (
        spark.createDataFrame([(x,) for x in nodes], "node long")
        if nodes
        else None
    )
    return {
        (r["src_scc"], r["dst_scc"]): r["n_edges"]
        for r in condensation(e, n).collect()
    }


def test_condensation_counts_distinct_cross_edges(spark):
    # ring {1,2,3} -> ring {4,5} via TWO distinct cross edges (one of them
    # duplicated in the input), plus an intra-ring chord that must vanish
    edges = [
        (1, 2), (2, 3), (3, 1), (4, 5), (5, 4),
        (1, 4), (1, 4), (2, 5),  # cross edges, one duplicated
        (1, 3),                  # intra-SCC chord
    ]
    assert _cond(spark, edges) == {(1, 4): 2}


def test_condensation_chain_and_self_loops(spark):
    # three singleton SCCs in a chain; self-loop dropped; isolated node
    # (from `nodes`) contributes no condensation edge
    edges = [(1, 2), (2, 3), (2, 2)]
    assert _cond(spark, edges, nodes=[1, 2, 3, 99]) == {
        (1, 2): 1,
        (2, 3): 1,
    }


def test_condensation_is_acyclic(spark):
    # two rings with edges both ways between them would merge into ONE
    # SCC — so no condensation edge may survive
    edges = [(1, 2), (2, 1), (4, 5), (5, 4), (1, 4), (5, 2)]
    assert _cond(spark, edges) == {}
