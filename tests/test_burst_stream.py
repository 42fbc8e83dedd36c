"""Streaming burst detector: parity with the batch operator on in-order
data, and state carry across two checkpointed availableNow drains."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from node_feedparser_spark.operators.profile import burst_detect
from node_feedparser_spark.streaming.burst_stream import stream_bursts

T0 = datetime(2024, 1, 1)
W = 100  # bucket seconds
E0 = 1704067200  # pd.Timestamp(T0).timestamp() — UTC, divisible by W


def _events_pdf(counts_by_type):
    rows = []
    eid = 0
    for etype, counts in counts_by_type.items():
        for i, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, etype, T0 + timedelta(seconds=i * W + 50)))
                eid += 1
    return pd.DataFrame(rows, columns=["event_id", "event_type", "ts"])


def _write_part(df, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df = df.assign(ts=df["ts"].astype("datetime64[us]"))
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _drain(spark, in_dir, ckpt, out_dir):
    src = (
        spark.readStream.schema("event_id long, event_type string, ts timestamp")
        .parquet(in_dir)
    )
    q = (
        stream_bursts(src, bucket_seconds=W)
        .writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).toPandas()


def _batch_flags(spark, pdf):
    df = spark.createDataFrame(pdf)
    out = burst_detect(df, bucket_seconds=W).toPandas()
    return {
        (r.event_type, r.bucket_start_s): (r.cnt, r.trail_mean, r.trail_std)
        for r in out.itertuples()
    }


def test_single_drain_matches_batch(spark, tmp_path):
    # flat baseline + spike at bucket 8, then bucket 9 data to CLOSE it;
    # a calm second type that never flags
    pdf = _events_pdf({"error": [10] * 8 + [30, 10], "view": [5] * 10})
    _write_part(pdf, str(tmp_path / "in" / "p1.parquet"))
    got = _drain(
        spark, str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    )
    want = _batch_flags(spark, pdf)  # bucket 9 is open in the stream but
    # closed nowhere in batch either (it has no 8-bucket trail): identical
    got_k = {
        (r.event_type, r.bucket_start_s): (r.cnt, r.trail_mean, r.trail_std)
        for r in got.itertuples()
    }
    assert got_k == want
    assert list(got_k) == [("error", E0 + 8 * W)]


def test_state_carries_across_drains(spark, tmp_path):
    # first drain: 6 calm buckets; second drain: 2 more calm + spike + closer.
    # the flag can only fire if the trailing window survived the checkpoint
    first = _events_pdf({"error": [10] * 6})
    second = _events_pdf({"error": [0] * 6 + [10, 10, 40, 10]})
    second = second[second.ts >= T0 + timedelta(seconds=6 * W)]
    in_dir, ck, out = (
        str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    )
    _write_part(first, os.path.join(in_dir, "p1.parquet"))
    out1 = _drain(spark, in_dir, ck, out)
    assert len(out1) == 0  # warm-up only
    _write_part(second, os.path.join(in_dir, "p2.parquet"))
    out2 = _drain(spark, in_dir, ck, out)
    assert len(out2) == 1
    r = out2.iloc[0]
    assert (r.event_type, r.bucket_start_s, r.cnt) == ("error", E0 + 8 * W, 40)
    assert r.trail_mean == 10.0 and r.trail_std == 0.0


def test_late_events_beyond_open_bucket_dropped(spark, tmp_path):
    first = _events_pdf({"error": [10] * 3})
    late = _events_pdf({"error": [99]})  # bucket 0 again — already closed
    in_dir, ck, out = (
        str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    )
    _write_part(first, os.path.join(in_dir, "p1.parquet"))
    _drain(spark, in_dir, ck, out)
    _write_part(late, os.path.join(in_dir, "p2.parquet"))
    got = _drain(spark, in_dir, ck, out)
    assert len(got) == 0  # no flags, no crash, no state corruption
