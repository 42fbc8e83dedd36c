"""Structured Streaming face of the extraction pipeline.

The reference is an incremental parser: items stream out as each closes,
with backpressure and resume-past-errors
(/root/reference/lib/feedparser.js:335-366, 140-154; SURVEY.md §2.8).  The
batch pipeline (plans/pipeline.py) is the north-rule deliverable; this
module is the same extraction expressed as an incremental job for
continuously-arriving transcript files:

- `readStream` over a transcript directory (schema pinned — streaming scans
  never infer);
- the SAME `extract_triples` mapInPandas stage (stateless per-turn, so it
  lifts to streaming unchanged — extraction has no window/shuffle);
- `dropDuplicates` on (conv_id, turn_idx) as the streaming first-wins:
  state-store-backed keep-first-SEEN.  Batch first-wins orders by (ts,
  text); a stream cannot sort the unbounded past, so the streaming
  guarantee is weaker (arrival order) — documented, and the batch job
  remains the source of truth for re-derivation;
- `trigger(availableNow)` + checkpoint: each invocation drains exactly the
  files not yet committed to the checkpoint — the streaming twin of the
  batch job's committed-buckets resume;
- watermarked per-conversation tumbling counts as the metrics side channel
  (the 'meta event enrichable until end' analog, SURVEY.md W4).

At scale: maxFilesPerTrigger bounds each micro-batch; state store size is
O(distinct (conv_id, turn_idx) in the retention window) — with event-time
watermarking on ts, expired state is dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_triples
from ..schemas import TRANSCRIPTS as TRANSCRIPT_SCHEMA


def stream_transcripts(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of a transcript parquet directory."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_triples(transcripts: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming extraction: watermark -> stateful first-seen dedupe ->
    stateless mapInPandas extraction (identical code path to batch)."""
    deduped = transcripts.withWatermark("ts", watermark).dropDuplicates(
        ["conv_id", "turn_idx"]
    )
    return extract_triples(deduped)


def stream_conv_metrics(
    transcripts: DataFrame, watermark: str = "1 hour", window: str = "1 day"
) -> DataFrame:
    """Per-conversation tumbling-window turn counts — the metrics/meta side
    channel.  Watermark bounds state; append mode emits a window only once
    it can no longer change (the 'meta enrichable until end' semantics)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias(
                "n_tool_turns"
            ),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("window_start"),
            "n_turns",
            "n_tool_turns",
        )
    )


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all currently-available un-committed input files into the
    triples sink, then stop (availableNow).  Re-invoking after new files
    arrive processes ONLY the new files — checkpointed resume, the
    streaming twin of plans/pipeline.py committed_buckets."""
    transcripts = stream_transcripts(spark, input_dir, max_files_per_trigger)
    triples = stream_triples(transcripts)
    q = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
