"""topological_layers: longest-path (not BFS-distance) semantics, diamond
merge, isolated vertices, multi-component layering, cycle refusal, and the
condensation composition the operator exists for."""

import pytest

from node_feedparser_spark.operators.scc import (
    condensation,
    topological_layers,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _by_node(df):
    return {r.node: r.layer for r in df.collect()}


def test_chain_layers(spark):
    got = _by_node(
        topological_layers(_edges(spark, [(1, 2), (2, 3), (3, 4)]))
    )
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_longest_path_not_bfs_distance(spark):
    # 1->3 direct AND 1->2->3: layer(3) = 2, not the BFS distance 1
    got = _by_node(
        topological_layers(_edges(spark, [(1, 3), (1, 2), (2, 3)]))
    )
    assert got == {1: 0, 2: 1, 3: 2}


def test_diamond_merges_at_max(spark):
    got = _by_node(
        topological_layers(
            _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])
        )
    )
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_isolated_vertices_and_components(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    got = _by_node(
        topological_layers(
            _edges(spark, [(1, 2), (5, 6), (6, 7)]), nodes=nodes
        )
    )
    assert got == {1: 0, 2: 1, 3: 0, 4: 0, 5: 0, 6: 1, 7: 2}


def test_cycle_raises(spark):
    with pytest.raises(ValueError, match="cycle"):
        topological_layers(
            _edges(spark, [(1, 2), (2, 3), (3, 1)]), max_rounds=10
        )


def test_depth_beyond_max_rounds_raises(spark):
    with pytest.raises(ValueError, match="max_rounds"):
        topological_layers(
            _edges(spark, [(i, i + 1) for i in range(1, 6)]), max_rounds=3
        )


def test_condensation_composition(spark):
    # two 3-cycles {1,2,3} and {4,5,6} plus a bridge 3->4: condensing
    # yields scc 1 -> scc 4; layering the condensation gives {1:0, 4:1}.
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
    )
    cond = (
        condensation(e)
        .withColumnRenamed("src_scc", "src")
        .withColumnRenamed("dst_scc", "dst")
    )
    got = _by_node(topological_layers(cond))
    assert got == {1: 0, 4: 1}


def test_self_loop_dropped_not_cyclic(spark):
    # a self-loop is dropped (matching the scc contract), not treated as
    # a cycle — the node layers normally from its real in-edges
    got = _by_node(
        topological_layers(_edges(spark, [(1, 1), (2, 1)]), max_rounds=5)
    )
    assert got == {1: 1, 2: 0}
