"""applyInPandasWithState conversation accumulator: state survives across
micro-batches (two file drains through one checkpoint) and the final update
per conversation equals the batch ground truth."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from node_feedparser_spark.datagen import generate_transcripts
from node_feedparser_spark.streaming.stateful import conv_state_stream
from node_feedparser_spark.streaming.stream_extract import stream_transcripts


def _write_part(df: pd.DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df = df.assign(ts=df["ts"].astype("datetime64[us]"))
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _drain(spark, in_dir, ckpt, out_dir):
    # memory sink cannot recover from a checkpoint; foreachBatch + parquet
    # append is the standard update-mode materialization
    def sink(batch_df, batch_id):
        batch_df.withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(out_dir)

    from pyspark.sql import functions as F

    q = (
        conv_state_stream(stream_transcripts(spark, in_dir))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).toPandas()


def test_state_carries_across_drains(spark, tmp_path):
    pdf = generate_transcripts(seed=42, scale=0.3)
    # split each conversation's turns in half across two files so the second
    # drain MUST merge with state from the first
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    sizes = pdf.groupby("conv_id")["conv_id"].transform("size")
    rank = pdf.groupby("conv_id").cumcount()
    first = pdf[rank < (sizes // 2).clip(lower=1)]
    rest = pdf.loc[~pdf.index.isin(first.index)]
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _write_part(first, os.path.join(in_dir, "part1.parquet"))

    out1 = _drain(spark, in_dir, ckpt, out_dir)
    assert (out1.groupby("conv_id").size() >= 1).all()

    _write_part(rest, os.path.join(in_dir, "part2.parquet"))
    out2 = _drain(spark, in_dir, ckpt, out_dir)

    # the freshest update per conversation (batch ids continue across the
    # checkpointed drains) must equal the batch ground truth — state
    # merged, not restarted
    latest = (
        out2.sort_values("batch_id", kind="stable")
        .groupby("conv_id")
        .last()
    )
    truth = pdf.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"),
        n_tool_turns=("tool", lambda s: s.notna().sum()),
        max_turn_idx=("turn_idx", "max"),
    )
    merged = latest.join(truth, lsuffix="_got", rsuffix="_want")
    assert (merged["n_turns_got"] == merged["n_turns_want"]).all()
    assert (merged["n_tool_turns_got"] == merged["n_tool_turns_want"]).all()
    assert (merged["max_turn_idx_got"] == merged["max_turn_idx_want"]).all()
