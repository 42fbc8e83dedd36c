"""Positive exercise of the error-containment path: a poison row (null
turn_idx — a schema violation parquet can carry despite the declared
non-null field) must become an ERROR_PRED row routed to metrics, never a
task failure (reference error-resume, lib/feedparser.js:140-154;
test/bad.js:71-121)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.extract import ERROR_PRED, extract_triples
from node_feedparser_spark.plans.pipeline import build_kg
from node_feedparser_spark.sources.transcripts import read_transcripts


@pytest.fixture(scope="module")
def poisoned_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("poison")
    path = str(root / "transcripts.parquet")
    table = pa.table(
        {
            "conv_id": ["ok-1", "ok-1", "poison-1"],
            "turn_idx": pa.array([0, 1, None], type=pa.int32()),
            "role": ["user", "assistant", "user"],
            "text": ["Spark uses Arrow", "Kafka is a Broker", "fine text"],
            "tool": pa.array([None, None, None], type=pa.string()),
            "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
        }
    )
    pq.write_table(table, path)
    return path


def test_poison_row_becomes_error_row(spark, poisoned_corpus):
    turns = read_transcripts(spark, poisoned_corpus)
    out = extract_triples(turns)
    errors = out.filter(F.col("pred") == ERROR_PRED).collect()
    ok = out.filter(F.col("pred") != ERROR_PRED)
    assert len(errors) == 1
    assert errors[0]["conv_id"] == "poison-1" and errors[0]["turn_idx"] == -1
    # healthy rows still extracted
    assert ok.filter(F.col("conv_id") == "ok-1").count() >= 2


def test_fail_fast_aborts_on_poison_row(spark, poisoned_corpus):
    """Strict mode (the reference's resume_saxerror:false,
    lib/feedparser.js:76-91; test/bad.js:92-121): the first unextractable
    turn fails the job instead of flowing to the error channel."""
    turns = read_transcripts(spark, poisoned_corpus)
    with pytest.raises(Exception, match="ExtractionError|extraction failed"):
        extract_triples(turns, fail_fast=True).collect()


def test_fail_fast_clean_input_identical(spark, poisoned_corpus):
    """On input with no poison rows, strict and resume modes agree."""
    turns = read_transcripts(spark, poisoned_corpus).filter(
        F.col("turn_idx").isNotNull()
    )
    key = lambda r: (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
    strict = sorted(map(key, extract_triples(turns, fail_fast=True).collect()))
    resume = sorted(map(key, extract_triples(turns).collect()))
    assert strict == resume and strict


def test_pipeline_routes_error_to_metrics(spark, poisoned_corpus, tmp_path):
    out_dir = str(tmp_path / "kg")
    summary = build_kg(spark, poisoned_corpus, out_dir, n_buckets=4, resume=False)
    assert summary["n_triples"] >= 2
    metrics = spark.read.parquet(os.path.join(out_dir, "metrics"))
    assert metrics.agg(F.sum("n_errors")).collect()[0][0] == 1


def test_normalize_false_raw_mode(spark):
    """Reference `normalize: false` (lib/feedparser.js:77; test/api.js:51):
    dirty rows are extracted from RAW text (markup blinds the relation
    grammar but mentions survive); clean rows are identical in both modes."""
    rows = [
        ("c1", 0, "user", "<b>Spark</b> uses Arrow", None, 1),
        ("c2", 0, "user", "Kafka is a Broker", None, 2),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def keyset(df):
        return {(r.conv_id, r.subj, r.pred, r.obj) for r in df.collect()}

    norm = keyset(extract_triples(turns))
    raw = keyset(extract_triples(turns, normalize=False))
    # normalized mode repairs the markup and recovers the relation
    assert ("c1", "Spark", "uses", "Arrow") in norm
    assert ("c1", "Spark", "uses", "Arrow") not in raw
    # mentions survive raw mode; clean rows agree exactly
    assert ("c1", "conv:c1", "mentions", "Spark") in raw
    assert {t for t in norm if t[0] == "c2"} == {t for t in raw if t[0] == "c2"}
