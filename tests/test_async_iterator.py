"""S4 — async-iterator sink analog: pull-based consumption via
`DataFrame.toLocalIterator()` (SURVEY.md §3.2; reference
`for await (item of feedparser)`, lib/feedparser.js:1280-1320;
test/async-iterator.js).

Three reference behaviors, re-expressed for Spark:
- ordered pull-based iteration yields every item exactly once;
- early `break` stops consumption without draining the rest (the
  reference destroys the stream, lib/feedparser.js:1316-1318 — here the
  driver just stops pulling partitions);
- errors surface as exceptions AT THE ITERATOR, not as callbacks
  (test/async-iterator.js:24-38 'should surface errors via try/catch'):
  strict-mode extraction over a poison corpus raises from the pull, and
  resume-mode iteration over the same corpus yields error ROWS instead.
"""

import itertools

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.extract import ERROR_PRED, extract_triples
from node_feedparser_spark.sources.transcripts import read_transcripts


@pytest.fixture(scope="module")
def poison_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("iter_poison")
    path = str(root / "transcripts.parquet")
    pq.write_table(
        pa.table(
            {
                "conv_id": ["ok-1", "ok-1", "poison-1"],
                "turn_idx": pa.array([0, 1, None], type=pa.int32()),
                "role": ["user", "assistant", "user"],
                "text": ["Spark uses Arrow", "Kafka is a Broker", "fine text"],
                "tool": pa.array([None, None, None], type=pa.string()),
                "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
            }
        ),
        path,
    )
    return path


def test_ordered_pull_iteration_yields_all_exactly_once(spark, corpus_path):
    turns = read_transcripts(spark, corpus_path)
    triples = extract_triples(turns).filter(F.col("pred") != ERROR_PRED)
    ordered = triples.orderBy("conv_id", "turn_idx", "pred", "obj")
    pulled = [
        (r.conv_id, r.turn_idx, r.subj, r.pred, r.obj)
        for r in ordered.toLocalIterator()
    ]
    assert pulled == sorted(pulled, key=lambda t: (t[0], t[1]))
    assert len(pulled) == triples.count()
    assert len(set(pulled + [None])) - 1 == len(pulled)  # exactly-once


def test_early_break_stops_without_draining(spark, corpus_path):
    turns = read_transcripts(spark, corpus_path)
    triples = extract_triples(turns).filter(F.col("pred") != ERROR_PRED)
    it = triples.orderBy("conv_id", "turn_idx").toLocalIterator(
        prefetchPartitions=False
    )
    first_ten = list(itertools.islice(it, 10))
    assert len(first_ten) == 10  # consumption simply stops; no drain needed


def test_strict_mode_error_surfaces_at_the_iterator(spark, poison_path):
    turns = read_transcripts(spark, poison_path)
    it = extract_triples(turns, fail_fast=True).toLocalIterator()
    with pytest.raises(Exception, match="ExtractionError|extraction failed"):
        list(it)


def test_resume_mode_iteration_yields_error_rows_inline(spark, poison_path):
    turns = read_transcripts(spark, poison_path)
    rows = list(extract_triples(turns).toLocalIterator())
    preds = [r.pred for r in rows]
    assert ERROR_PRED in preds  # poison row became data, not an exception
    assert any(p != ERROR_PRED for p in preds)
