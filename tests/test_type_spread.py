"""Seeded label spreading (operators/graph_algo.py type_spread)."""

from node_feedparser_spark.operators.graph_algo import type_spread


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(seeds, "node long, type string")
    return {r["node"]: r["type"] for r in type_spread(e, s, **kw).collect()}


def test_spreads_exactly_n_rounds_along_a_chain(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [(1, "A")])
    assert got == {1: "A", 2: "A", 3: "A", 4: None, 5: None}


def test_tie_breaks_lexicographic(spark):
    got = _run(spark, [(4, 5), (5, 6)], [(4, "B"), (6, "A")])
    assert got[5] == "A"


def test_majority_wins(spark):
    got = _run(
        spark,
        [(0, 1), (0, 2), (0, 3)],
        [(1, "A"), (2, "A"), (3, "B")],
    )
    assert got[0] == "A"


def test_seeds_are_clamped(spark):
    got = _run(spark, [(1, 2)], [(1, "A"), (2, "B")])
    assert got == {1: "A", 2: "B"}


def test_isolated_seed_still_emitted(spark):
    got = _run(spark, [(1, 2)], [(9, "Z")])
    assert got[9] == "Z" and got[1] is None and got[2] is None
