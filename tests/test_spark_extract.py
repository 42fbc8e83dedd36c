"""Spark extraction vs the pure-Python spec: the P/R >= 0.95 gate
(BASELINE.json north_rule) plus the per-turn text-equality invariant."""


from pyspark.sql import functions as F

from node_feedparser_spark.operators.extract import (
    ERROR_PRED,
    dedupe_first_wins,
    extract_triples,
    normalize_text_udf,
)
from node_feedparser_spark.reference_extract import extract_corpus
from node_feedparser_spark.schemas import TRANSCRIPTS
from node_feedparser_spark.sources.transcripts import read_transcripts


def _spark_triples(spark, corpus_path):
    df = read_transcripts(spark, corpus_path)
    turns = dedupe_first_wins(df)
    out = extract_triples(turns).filter(F.col("pred") != ERROR_PRED)
    return out


def test_precision_recall_vs_spec(spark, corpus_path, corpus_pdf):
    got = {
        (r.conv_id, r.turn_idx, r.subj, r.pred, r.obj)
        for r in _spark_triples(spark, corpus_path).collect()
    }
    ref = extract_corpus(corpus_pdf.to_dict("records"))
    want = {
        (t["conv_id"], t["turn_idx"], t["subj"], t["pred"], t["obj"])
        for t in ref.triples
    }
    assert want, "spec produced no triples — fixture bug"
    tp = len(got & want)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(want))
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"
    # in fact the Spark path shares the spec's extractor, so demand exactness
    assert got == want


def test_per_turn_text_equality(spark, corpus_path, corpus_pdf):
    """Normalized text computed distributed == spec, per (conv_id, turn_idx),
    under stable ordering (BASELINE.json input_hint)."""
    df = read_transcripts(spark, corpus_path)
    norm = (
        dedupe_first_wins(df)
        .withColumn("norm_text", normalize_text_udf("text"))
        .select("conv_id", "turn_idx", "norm_text")
        .collect()
    )
    ref = extract_corpus(corpus_pdf.to_dict("records"))
    got = {(r.conv_id, r.turn_idx): r.norm_text for r in norm}
    assert got == ref.normalized


def test_dedupe_first_wins_spark(spark):
    from datetime import datetime

    rows = [
        ("c", 0, "u", "B later", None, datetime(2025, 1, 1, 0, 0, 2)),
        ("c", 0, "u", "A early", None, datetime(2025, 1, 1, 0, 0, 1)),
        ("c", 1, "u", "only", None, datetime(2025, 1, 1, 0, 0, 3)),
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPTS)
    out = {(r.turn_idx, r.text) for r in dedupe_first_wins(df).collect()}
    assert out == {(0, "A early"), (1, "only")}


def test_extraction_order_independent(spark, corpus_path):
    """Same triples regardless of physical partitioning (two-level
    determinism, SURVEY.md §7)."""
    df = read_transcripts(spark, corpus_path)
    a = _spark_triples(spark, corpus_path)
    b = extract_triples(dedupe_first_wins(df.repartition(17))).filter(
        F.col("pred") != ERROR_PRED
    )
    sa = {(r.conv_id, r.turn_idx, r.subj, r.pred, r.obj) for r in a.collect()}
    sb = {(r.conv_id, r.turn_idx, r.subj, r.pred, r.obj) for r in b.collect()}
    assert sa == sb
