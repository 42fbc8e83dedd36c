"""Schema evolution at the source — the Iceberg add-column / drop-column
read analog: read_transcripts declares the TRANSCRIPTS schema on read
(schema-on-write discipline, sources/transcripts.py), so

- a NEWER writer's extra columns are projected away (add-column forward
  compat: old readers ignore new columns), and
- an OLDER writer's missing optional columns surface as NULL (drop/late
  -added-column back compat), flowing through the pipeline's existing
  null handling (null tool -> no invokes triple; null ts -> dedupe's
  nulls-first order).

The reference analog is feedparser's unknown-element tolerance: fields it
does not model are skipped, fields absent from a feed are simply null on
the item (SURVEY.md §2.2 P6)."""

import os

import pandas as pd
import pytest

from node_feedparser_spark.plans.pipeline import build_kg
from node_feedparser_spark.sources.transcripts import read_transcripts


def _base_rows():
    return pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pd.array([0, 1, 0], dtype="int32"),
            "role": ["user", "assistant", "user"],
            "text": [
                "Spark is a engine",
                "Airflow uses Postgres",
                "Kafka connects to Flink",
            ],
            "tool": [None, "search", None],
            "ts": pd.to_datetime(
                ["2026-01-01", "2026-01-02", "2026-01-03"]
            ).astype("datetime64[us]"),
        }
    )


def test_extra_columns_are_projected_away(spark, tmp_path):
    """A newer writer added columns; the declared-schema scan never sees
    them (column pruning at the parquet footer, not a post-read drop)."""
    pdf = _base_rows()
    pdf["session_id"] = ["s1", "s1", "s2"]  # new column, unknown to us
    pdf["score_v2"] = [0.1, 0.2, 0.3]
    p = str(tmp_path / "new_writer.parquet")
    pdf.to_parquet(p, index=False)

    df = read_transcripts(spark, p)
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df.count() == 3
    # and the pipeline runs end-to-end on it
    summary = build_kg(spark, p, str(tmp_path / "kg"), n_buckets=2)
    assert summary["n_triples"] > 0


def test_missing_optional_columns_read_as_null(spark, tmp_path):
    """An older writer lacks tool and ts entirely: the scan fills NULL and
    the pipeline's null paths apply (no invokes triples, nulls-first
    dedupe order) instead of failing the read."""
    pdf = _base_rows().drop(columns=["tool", "ts"])
    p = str(tmp_path / "old_writer.parquet")
    pdf.to_parquet(p, index=False)

    df = read_transcripts(spark, p)
    rows = df.collect()
    assert all(r["tool"] is None and r["ts"] is None for r in rows)
    summary = build_kg(spark, p, str(tmp_path / "kg"), n_buckets=2)
    assert summary["n_triples"] > 0
    triples = spark.read.parquet(os.path.join(str(tmp_path / "kg"), "triples"))
    assert triples.filter(triples.pred == "invokes").count() == 0


def test_missing_required_column_fails_loudly(spark, tmp_path):
    """conv_id is the identity of every downstream key: a corpus without it
    must error at read/extract time, not silently produce null-keyed
    triples."""
    pdf = _base_rows().drop(columns=["conv_id"])
    p = str(tmp_path / "broken.parquet")
    pdf.to_parquet(p, index=False)
    with pytest.raises(Exception):
        build_kg(spark, p, str(tmp_path / "kg"), n_buckets=2)
