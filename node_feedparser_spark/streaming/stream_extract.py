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
- keep-first-SEEN dedupe on (conv_id, turn_idx) as the streaming
  first-wins, with an explicit state/lateness trade-off the caller picks:
    bounded_state=False (default, for availableNow drains): plain
      `dropDuplicates` with NO watermark — state grows with distinct keys
      but arbitrarily-late files (the normal case for batch-file arrival,
      where event time has nothing to do with arrival time) are never
      dropped.  Only drain-style deployments should use this.
    bounded_state=True (for continuous deployments with roughly
      event-time-ordered input): `dropDuplicatesWithinWatermark`, which
      EVICTS dedupe state once the watermark passes an entry's event time
      — and therefore also DROPS rows arriving later than the watermark
      delay.  (A plain dropDuplicates after withWatermark would never
      evict state when the event-time column is not part of the key.)
  Batch first-wins orders by (ts, text); a stream cannot sort the
  unbounded past, so both streaming modes are weaker (arrival order) —
  documented, and the batch job remains the source of truth;
- `trigger(availableNow)` + checkpoint: each invocation drains exactly the
  files not yet committed to the checkpoint — the streaming twin of the
  batch job's committed-buckets resume;
- watermarked per-conversation tumbling counts as the metrics side channel
  (the 'meta event enrichable until end' analog, SURVEY.md W4).

At scale: maxFilesPerTrigger bounds each micro-batch; with
bounded_state=True the state store is O(distinct (conv_id, turn_idx)
within the watermark delay), with the default it is O(all distinct keys)
— acceptable for periodic drains, not for an always-on stream.
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


def stream_triples(
    transcripts: DataFrame,
    watermark: str = "1 hour",
    bounded_state: bool = False,
) -> DataFrame:
    """Streaming extraction: stateful first-seen dedupe -> stateless
    mapInPandas extraction (identical code path to batch).

    bounded_state picks the dedupe state policy (module docstring): False =
    unbounded state, no late drops (availableNow drains); True = state
    evicted past the watermark, rows later than the watermark dropped
    (continuous, event-time-ordered input).
    """
    if bounded_state:
        deduped = transcripts.withWatermark(
            "ts", watermark
        ).dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    else:
        deduped = transcripts.dropDuplicates(["conv_id", "turn_idx"])
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


def stream_content_dedupe(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    bounded_state: bool = False,
) -> DataFrame:
    """Streaming exact dedupe: ONE document per 60-bit content hash
    survives — the streaming face of operators/dedupe.exact_dedupe.

    Survivor semantics (documented, r3): `dropDuplicates` keeps an
    ARBITRARY row within a micro-batch, and across batches the survivor is
    the first ARRIVAL (which need not be the min-ts row).  When the
    surviving row's identity matters — the reference's first-guid-wins rule
    (lib/feedparser.js:939) — use `stream_content_dedupe_first_wins`, which
    pins the winner deterministically.

    Same state policy split as stream_triples: bounded_state=False keeps
    dedupe state forever (exact global dedupe, availableNow drains);
    bounded_state=True evicts state past the watermark via
    dropDuplicatesWithinWatermark — duplicates arriving later than the
    watermark window are re-admitted, the standard streaming trade.
    """
    from ..functions.hashing import portable_hash60

    hashed = docs.withColumn("text_hash", portable_hash60(text_col))
    if bounded_state:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    return hashed.dropDuplicates(["text_hash"])


def stream_content_dedupe_first_wins(transcripts: DataFrame) -> DataFrame:
    """Deterministic streaming first-wins dedupe over transcript rows
    (r3): one row per content hash, the winner pinned as
    - across micro-batches: the first ARRIVAL (the reference's
      first-encountered-guid-wins document-order rule applied to a stream —
      an earlier-ts duplicate arriving later is a late duplicate, dropped);
    - within a micro-batch: the minimum of (ts, conv_id, turn_idx), nulls
      first — the batch dedupe_first_wins total order, so a single-drain
      stream equals the batch plan row for row.

    applyInPandasWithState keyed by text_hash: state is one 'seen' flag per
    distinct hash (the same O(distinct keys) the plain dropDuplicates path
    carries); each group emits at most one row, ever.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from ..functions.hashing import portable_hash60

    out_schema = StructType(
        [
            StructField("text_hash", LongType()),
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    state_schema = StructType([StructField("seen", LongType())])

    def first_wins(key, pdfs, state: GroupState):
        if state.exists:
            return  # hash already won in an earlier batch
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        winner = batch.sort_values(
            ["ts", "conv_id", "turn_idx"], na_position="first", kind="stable"
        ).iloc[[0]]
        state.update((1,))
        yield winner[
            ["text_hash", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ]

    hashed = transcripts.withColumn("text_hash", portable_hash60("text"))
    return hashed.groupBy("text_hash").applyInPandasWithState(
        first_wins,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
