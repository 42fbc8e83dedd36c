"""blocking_quality semantics on hand-sized inputs: canonicalization /
dedup of pair encodings, the RR/PC/PQ arithmetic, and the refactored
snm_all_candidates being exactly the pre-verify SNM candidate set."""

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.profile import blocking_quality


def test_blocking_quality_arithmetic(spark):
    # mirrored encoding + duplicate must collapse to 2 candidate pairs
    cands = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d1"), ("d3", "d2")], "a string, b string"
    )
    truth = spark.createDataFrame(
        [("d1", "d2"), ("d3", "d4")], "a string, b string"
    )
    records = spark.createDataFrame(
        [(f"d{i}",) for i in range(1, 6)], "doc_id string"
    )
    r = blocking_quality(cands, truth, records).collect()[0].asDict()
    assert r["n_records"] == 5 and r["n_total_pairs"] == 10
    assert r["n_candidates"] == 2 and r["n_truth"] == 2 and r["n_hits"] == 1
    assert r["reduction_ratio"] == pytest.approx(0.8)
    assert r["pairs_completeness"] == pytest.approx(0.5)
    assert r["pair_quality"] == pytest.approx(0.5)


def test_perfect_blocking(spark):
    pairs = spark.createDataFrame([("d1", "d2")], "a string, b string")
    records = spark.createDataFrame(
        [("d1",), ("d2",), ("d3",)], "doc_id string"
    )
    r = blocking_quality(pairs, pairs, records).collect()[0].asDict()
    assert r["pairs_completeness"] == pytest.approx(1.0)
    assert r["pair_quality"] == pytest.approx(1.0)
    assert r["reduction_ratio"] == pytest.approx(1 - 1 / 3)


def test_snm_all_candidates_superset_of_verified(spark):
    """Every verified SNM near-dup pair must come from the exposed
    candidate set (the refactor keeps blocking == blocking+verify's
    candidate stage)."""
    from node_feedparser_spark.operators.dedupe import (
        snm_all_candidates,
        snm_near_dup_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "n_chars")
    )
    cand = {
        (r["a"], r["b"]) for r in snm_all_candidates(docs).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in snm_near_dup_pairs(docs).collect()
    }
    assert verified <= cand
    assert len(cand) > len(verified)  # blocking over-generates, verify prunes
