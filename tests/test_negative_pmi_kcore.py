"""Hand tests for negative_samples, pmi_edges and kcore."""

import math

from pyspark.sql import functions as F

from node_feedparser_spark.operators.graph_algo import (
    kcore,
    negative_samples,
    pmi_edges,
)


# ---------------------------------------------------------------- negatives


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src_id", "dst_id"])


def test_negatives_never_collide_with_positives(spark):
    pos = [(0, 1), (0, 2), (1, 0), (2, 3)]
    out = negative_samples(_edges(spark, pos), n_entities=4, k=3).collect()
    pos_set = set(pos)
    assert out, "some negatives must survive"
    for r in out:
        assert (r["src_id"], r["neg_dst"]) not in pos_set
        assert 0 <= r["neg_dst"] < 4


def test_negatives_deterministic_across_runs(spark):
    pos = [(i, (i * 7) % 11) for i in range(30)]
    a = sorted(map(tuple, negative_samples(_edges(spark, pos), 11, k=2).collect()))
    b = sorted(map(tuple, negative_samples(_edges(spark, pos), 11, k=2).collect()))
    assert a == b


def test_negatives_at_most_k_per_positive(spark):
    pos = [(i, j) for i in range(5) for j in range(5) if i != j]
    out = negative_samples(_edges(spark, pos), n_entities=50, k=2)
    per = out.groupBy("src_id", "dst_id").count().collect()
    assert all(r["count"] <= 2 for r in per)


def test_negatives_duplicate_positive_rows_collapse(spark):
    once = negative_samples(_edges(spark, [(0, 1)]), 100, k=4).collect()
    thrice = negative_samples(
        _edges(spark, [(0, 1), (0, 1), (0, 1)]), 100, k=4
    ).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, thrice))


# ---------------------------------------------------------------------- pmi


def _baskets(spark, pairs):
    return spark.createDataFrame(pairs, ["basket_id", "item_id"])


def test_pmi_hand_computed(spark):
    # 4 baskets; (a,b) together in 2; a in 3, b in 2
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "c"), (4, "d"),
    ]
    out = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["pmi"])
        for r in pmi_edges(_baskets(spark, rows), min_count=2).collect()
    }
    n_ab, pmi = out[("a", "b")]
    assert n_ab == 2
    assert pmi == round(math.log(2 * 4 / (3 * 2)), 6)
    # (a,c) co-occur once -> filtered by min_count
    assert ("a", "c") not in out


def test_pmi_mega_basket_dropped_before_pairing(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    mega = [(9, f"i{k}") for k in range(20)] + [(9, "a"), (9, "b")]
    out = pmi_edges(
        _baskets(spark, rows + mega), min_count=2, max_basket=10
    ).collect()
    # the mega-basket contributes neither pairs nor counts: N=2, n_a=n_b=2
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n_ab"]) == ("a", "b", 2)
    assert r["pmi"] == round(math.log(2 * 2 / (2 * 2)), 6)


def test_pmi_duplicate_membership_rows_collapse(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    out = pmi_edges(_baskets(spark, rows), min_count=2).collect()
    assert len(out) == 1 and out[0]["n_ab"] == 2


# -------------------------------------------------------------------- kcore


def test_kcore_peels_tail_and_keeps_core(spark):
    # 4-clique with a pendant vertex: 2-core = the clique
    clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    out = {
        r["node"]: r["degree"]
        for r in kcore(_edges(spark, clique + [("d", "tail")]), k=2).collect()
    }
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_chain_collapses_entirely(spark):
    # a path graph has no 2-core; 3 rounds suffice for this diameter
    chain = [(str(i), str(i + 1)) for i in range(5)]
    assert kcore(_edges(spark, chain), k=2, n_rounds=3).count() == 0


def test_kcore_cascade_needs_multiple_rounds(spark):
    # pendant chain off a triangle: each round peels one chain node
    tri = [("a", "b"), ("b", "c"), ("c", "a")]
    chain = [("a", "x1"), ("x1", "x2"), ("x2", "x3")]
    out1 = set(
        r["node"] for r in kcore(_edges(spark, tri + chain), k=2, n_rounds=1).collect()
    )
    out3 = set(
        r["node"] for r in kcore(_edges(spark, tri + chain), k=2, n_rounds=3).collect()
    )
    assert "x2" in out1 and out3 == {"a", "b", "c"}


def test_kcore_symmetrizes_and_ignores_direction(spark):
    # directed duplicates of the same undirected edge count once
    out = kcore(_edges(spark, [("a", "b"), ("b", "a")]), k=1, n_rounds=1)
    rows = {r["node"]: r["degree"] for r in out.collect()}
    assert rows == {"a": 1, "b": 1}
