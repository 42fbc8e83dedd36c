"""Incremental connected components == full recompute, randomized."""

import random

from pyspark.sql import functions as F

from node_feedparser_spark.operators.components import (
    connected_components,
    incremental_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def _full(spark, pairs, nodes):
    lab = {
        r["node"]: r["component"]
        for r in connected_components(_edges(spark, pairs)).collect()
    }
    return {n: lab.get(n, n) for n in nodes}


def _fold(spark, batches, nodes):
    assign = connected_components(_edges(spark, batches[0]))
    for b in batches[1:]:
        assign = incremental_components(assign, _edges(spark, b))
    lab = {r["node"]: r["component"] for r in assign.collect()}
    return {n: lab.get(n, n) for n in nodes}


def test_incremental_equals_full_randomized(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(80)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        cut = len(pairs) // 2
        nodes = range(n)
        assert _fold(spark, [pairs[:cut], pairs[cut:]], nodes) == _full(
            spark, pairs, nodes
        )


def test_three_batch_fold(spark):
    rng = random.Random(23)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    pairs = [(a, b) for a, b in pairs if a != b]
    b = [pairs[0::3], pairs[1::3], pairs[2::3]]
    nodes = range(40)
    assert _fold(spark, b, nodes) == _full(spark, pairs, nodes)


def test_delta_introduces_new_nodes(spark):
    # batch 1: {1-2}, {5-6}; delta connects 2-100 (new) and 100-5:
    # everything merges into component 1, and 100 appears in the output
    assign = connected_components(_edges(spark, [(1, 2), (5, 6)]))
    out = {
        r["node"]: r["component"]
        for r in incremental_components(
            assign, _edges(spark, [(2, 100), (100, 5)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 5: 1, 6: 1, 100: 1}


def test_noop_delta_preserves_assignment(spark):
    # delta edges entirely inside existing components: nothing changes
    assign = connected_components(_edges(spark, [(1, 2), (2, 3), (7, 8)]))
    before = {r["node"]: r["component"] for r in assign.collect()}
    out = {
        r["node"]: r["component"]
        for r in incremental_components(
            assign, _edges(spark, [(1, 3), (7, 8)])
        ).collect()
    }
    assert out == before


def test_label_stays_min_node_id(spark):
    assign = connected_components(_edges(spark, [(10, 20)]))
    out = {
        r["node"]: r["component"]
        for r in incremental_components(
            assign, _edges(spark, [(20, 3)])
        ).collect()
    }
    assert out == {10: 3, 20: 3, 3: 3}
