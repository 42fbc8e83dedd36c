"""Structured Streaming extraction: incremental availableNow drains,
checkpointed resume (only new files processed), parity with batch
extraction, and the watermarked metrics side channel."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from node_feedparser_spark.datagen import generate_transcripts
from node_feedparser_spark.operators.extract import dedupe_first_wins, extract_triples
from node_feedparser_spark.sources.transcripts import read_transcripts
from node_feedparser_spark.streaming.stream_extract import (
    run_incremental,
    stream_conv_metrics,
    stream_transcripts,
)


def _write_part(df: pd.DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df = df.assign(ts=df["ts"].astype("datetime64[us]"))
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory):
    """The seed-42 corpus split into two file batches by conversation."""
    root = tmp_path_factory.mktemp("stream")
    pdf = generate_transcripts(seed=42, scale=0.5)
    convs = sorted(pdf["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    in_dir = str(root / "in")
    _write_part(pdf[pdf["conv_id"].isin(half)], os.path.join(in_dir, "part1.parquet"))
    later = pdf[~pdf["conv_id"].isin(half)]
    return root, in_dir, later


def _triples_set(spark, path):
    df = spark.read.parquet(path)
    return {
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
        for r in df.collect()
    }


def test_incremental_resume_and_batch_parity(spark, split_corpus):
    root, in_dir, later = split_corpus
    out = str(root / "out")
    ckpt = str(root / "ckpt")

    run_incremental(spark, in_dir, out, ckpt)
    first = _triples_set(spark, out)
    assert first, "first drain produced no triples"
    n_files_after_first = len(glob.glob(os.path.join(out, "*.parquet")))

    # second drain with NO new input: checkpoint says everything committed
    run_incremental(spark, in_dir, out, ckpt)
    assert _triples_set(spark, out) == first

    # new file arrives -> only it is processed, output is the union
    _write_part(later, os.path.join(in_dir, "part2.parquet"))
    run_incremental(spark, in_dir, out, ckpt)
    all_stream = _triples_set(spark, out)
    assert first < all_stream
    assert len(glob.glob(os.path.join(out, "*.parquet"))) > n_files_after_first

    # parity vs batch: exact for conversations with unique (conv_id,
    # turn_idx) keys; for fixtures that plant duplicate keys (`nest-`),
    # streaming keeps first-SEEN while batch first-wins orders by (ts, text)
    # — a documented, weaker guarantee — so there only the key set must
    # agree.
    batch = extract_triples(dedupe_first_wins(read_transcripts(spark, in_dir)))
    want = {
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
        for r in batch.collect()
    }

    def split(s):
        dup = {t for t in s if t[0].startswith("nest-")}
        return s - dup, {(t[0], t[1]) for t in dup}

    stream_exact, stream_dupkeys = split(all_stream)
    batch_exact, batch_dupkeys = split(want)
    assert stream_exact == batch_exact
    assert stream_dupkeys == batch_dupkeys


def test_bounded_state_dedupe_mode(spark, split_corpus, tmp_path):
    """bounded_state=True uses dropDuplicatesWithinWatermark: duplicates
    within the watermark delay are suppressed, and (the price of state
    eviction) rows older than the watermark are dropped.  Pin both: the
    in-window duplicate-key fixtures (`nest-`) still collapse to one row
    per key within a drain."""
    from node_feedparser_spark.streaming.stream_extract import stream_triples

    root, in_dir, _ = split_corpus
    q = (
        stream_triples(stream_transcripts(spark, in_dir), bounded_state=True)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    df = spark.read.parquet(str(tmp_path / "out"))
    assert df.count() > 0
    # one surviving extraction per duplicate key: no (conv_id, turn_idx)
    # appears with two distinct normalized texts' triples.  The fixture's
    # duplicate keys are seconds apart — well inside the 1h watermark.
    per_key = (
        df.groupBy("conv_id", "turn_idx", "subj", "pred", "obj")
        .count()
        .filter("count > 1")
    )
    assert per_key.count() == 0


def test_stream_conv_metrics(spark, split_corpus):
    root, in_dir, _ = split_corpus
    out = str(root / "metrics_out")
    ckpt = str(root / "metrics_ckpt")
    q = (
        stream_conv_metrics(stream_transcripts(spark, in_dir))
        .writeStream.format("memory")
        .queryName("conv_metrics")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM conv_metrics").collect()
    # append mode emits only watermark-expired windows; the corpus spans
    # ~115 days (datagen ts = epoch + U[0, 10^7) seconds) against a 1-day
    # window and 1-hour watermark, so the availableNow drain MUST close and
    # emit many windows — an empty result is a regression, not a timing
    # artifact.
    assert rows, "availableNow drain emitted no closed windows"
    assert {"conv_id", "window_start", "n_turns", "n_tool_turns"} == set(
        rows[0].asDict().keys()
    )
    # every emitted (conv_id, window) must agree with the batch aggregation
    # over the same input — closed-window counts are exact, not approximate.
    import pyspark.sql.functions as F

    batch = (
        read_transcripts(spark, in_dir)
        .groupBy("conv_id", F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias(
                "n_tool_turns"
            ),
        )
        .select("conv_id", F.col("w.start").alias("window_start"), "n_turns", "n_tool_turns")
    )
    want = {
        (r["conv_id"], r["window_start"]): (r["n_turns"], r["n_tool_turns"])
        for r in batch.collect()
    }
    for r in rows:
        key = (r["conv_id"], r["window_start"])
        assert key in want, f"stream emitted a window batch never saw: {key}"
        assert (r["n_turns"], r["n_tool_turns"]) == want[key], key


def test_stream_content_dedupe_matches_batch(spark, split_corpus, tmp_path):
    """Streaming exact dedupe over an availableNow drain keeps exactly one
    row per content hash and agrees with the batch exact_dedupe group set."""
    from node_feedparser_spark.functions.hashing import portable_hash60
    from node_feedparser_spark.streaming.stream_extract import stream_content_dedupe

    _, in_dir, _ = split_corpus
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    stream = stream_transcripts(spark, in_dir)
    q = (
        stream_content_dedupe(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n = got.count()
    assert n > 0
    # exactly one row per hash
    assert got.select("text_hash").distinct().count() == n
    # same hash set as batch dedupe
    batch = (
        read_transcripts(spark, in_dir)
        .withColumn("text_hash", portable_hash60("text"))
        .select("text_hash")
        .distinct()
    )
    want = {r.text_hash for r in batch.collect()}
    have = {r.text_hash for r in got.select("text_hash").collect()}
    assert have == want


def test_stream_content_dedupe_first_wins_pins_survivor(spark, tmp_path):
    """r3: survivor identity is deterministic — first ARRIVAL across
    micro-batches (a later-arriving duplicate loses even with an earlier
    ts), min-(ts, conv_id, turn_idx) within a batch."""
    import datetime as dt

    import pandas as pd

    from node_feedparser_spark.streaming.stream_extract import (
        stream_content_dedupe_first_wins,
    )

    in_dir = tmp_path / "fw_in"
    in_dir.mkdir()
    t = dt.datetime(2025, 1, 6, 9, 0, 0)

    def _write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["tool"] = pdf["tool"].astype("string")  # all-null -> keep string
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(in_dir / name, index=False)

    # file 0: duplicate hash within one batch -> min-ts row (c1b) wins
    _write("f0.parquet", [
        ("c1a", 0, "user", "dup text", None, t + dt.timedelta(seconds=10)),
        ("c1b", 1, "user", "dup text", None, t + dt.timedelta(seconds=3)),
        ("c2", 0, "user", "unique one", None, t),
    ])
    # file 1 (later micro-batch): earlier-ts duplicate arrives late -> loses
    _write("f1.parquet", [
        ("c3", 0, "user", "dup text", None, t - dt.timedelta(days=1)),
        ("c4", 0, "user", "unique two", None, t),
    ])

    out = str(tmp_path / "fw_out")
    ckpt = str(tmp_path / "fw_ckpt")
    stream = stream_transcripts(spark, str(in_dir), max_files_per_trigger=1)
    q = (
        stream_content_dedupe_first_wins(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["text"]: r["conv_id"] for r in spark.read.parquet(out).collect()}
    assert got == {"dup text": "c1b", "unique one": "c2", "unique two": "c4"}
