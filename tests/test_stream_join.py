"""Watermarked stream-stream interval join (streaming/stream_join.py):
joined pairs match the batch interval semantics across checkpointed
drains, and a click later than the watermark never joins."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from node_feedparser_spark.streaming.stream_join import stream_interval_join

T0 = datetime(2024, 1, 1)


def _write(rows, cols, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df = pd.DataFrame(rows, columns=cols)
    df = df.assign(ts=df["ts"].astype("datetime64[us]"))
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _drain(spark, imp_dir, clk_dir, ckpt, out_dir, **kw):
    imp = spark.readStream.schema("ad_id string, imp_id long, ts timestamp").parquet(imp_dir)
    clk = spark.readStream.schema("ad_id string, click_id long, ts timestamp").parquet(clk_dir)
    q = (
        stream_interval_join(imp, clk, **kw)
        .writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out_dir)
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).toPandas()


def test_join_respects_interval_and_key(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    _write(
        [("a", 1, T0), ("b", 2, T0)],
        ["ad_id", "imp_id", "ts"],
        os.path.join(imp_dir, "p1.parquet"),
    )
    _write(
        [
            ("a", 10, T0 + timedelta(minutes=30)),   # in window
            ("a", 11, T0 + timedelta(minutes=90)),   # past max_delay
            ("b", 12, T0 - timedelta(minutes=1)),    # before impression
        ],
        ["ad_id", "click_id", "ts"],
        os.path.join(clk_dir, "p1.parquet"),
    )
    got = _drain(
        spark, imp_dir, clk_dir, str(tmp_path / "ck"), str(tmp_path / "out")
    )
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.ad_id, r.imp_id, r.click_id, r.delay_s) == ("a", 1, 10, 1800)


def test_pairs_join_across_checkpointed_drains(spark, tmp_path):
    # impression arrives in drain 1, its click only in drain 2: the join
    # state must survive the checkpoint for the pair to be emitted
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    _write([("a", 1, T0)], ["ad_id", "imp_id", "ts"],
           os.path.join(imp_dir, "p1.parquet"))
    _write([("z", 99, T0)], ["ad_id", "click_id", "ts"],
           os.path.join(clk_dir, "p1.parquet"))
    out1 = _drain(
        spark, imp_dir, clk_dir, str(tmp_path / "ck"), str(tmp_path / "out")
    )
    assert len(out1) == 0
    _write([("a", 10, T0 + timedelta(minutes=10))],
           ["ad_id", "click_id", "ts"], os.path.join(clk_dir, "p2.parquet"))
    out2 = _drain(
        spark, imp_dir, clk_dir, str(tmp_path / "ck"), str(tmp_path / "out")
    )
    assert len(out2) == 1 and out2.iloc[0].click_id == 10


def test_click_older_than_watermark_is_dropped(spark, tmp_path):
    # drain 1 advances BOTH event-time watermarks far ahead (the global
    # watermark is the MIN across streams): impression a's state — upper
    # bound T0+1h — is evicted, and a drain-2 click at T0+5min is late
    # beyond the watermark, so the pair must never join
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    _write([("a", 1, T0), ("z", 2, T0 + timedelta(days=10))],
           ["ad_id", "imp_id", "ts"], os.path.join(imp_dir, "p1.parquet"))
    _write([("z", 99, T0 + timedelta(days=10))],
           ["ad_id", "click_id", "ts"], os.path.join(clk_dir, "p1.parquet"))
    out1 = _drain(
        spark, imp_dir, clk_dir, str(tmp_path / "ck"), str(tmp_path / "out"),
        watermark="1 hour",
    )
    # the far-future z pair joins (and is what advances the watermark)
    assert len(out1) == 1 and out1.iloc[0].click_id == 99
    _write([("a", 10, T0 + timedelta(minutes=5))],
           ["ad_id", "click_id", "ts"], os.path.join(clk_dir, "p2.parquet"))
    out2 = _drain(
        spark, imp_dir, clk_dir, str(tmp_path / "ck"), str(tmp_path / "out"),
        watermark="1 hour",
    )
    # accumulated output unchanged: the late click never joined
    assert len(out2) == 1 and set(out2.click_id) == {99}
