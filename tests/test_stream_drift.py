"""Streaming PSI (streaming/drift_stream.py): batch parity per window,
drift injection raises PSI, incremental drains, validation."""

import datetime as dt
import math
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from node_feedparser_spark.streaming.drift_stream import stream_psi

T0 = dt.datetime(2024, 1, 1)
SCHEMA = "event_id long, ts timestamp, value double"
EDGES = [2.0, 4.0, 6.0]          # 4 bins
REF_P = [0.25, 0.25, 0.25, 0.25]  # uniform reference


def _pdf(rows):
    return pd.DataFrame(
        {
            "event_id": list(range(len(rows))),
            "ts": pd.Series(
                [T0 + dt.timedelta(minutes=m) for m, _ in rows],
                dtype="datetime64[us]",
            ),
            "value": [v for _, v in rows],
        }
    )


def _write(pdf, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def _drain(spark, in_dir, name):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        stream_psi(stream, EDGES, REF_P, window_duration="1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        r.window_start: r for r in spark.sql(f"select * from {name}").collect()
    }


def _hand_psi(values):
    n = len(values)
    psi = 0.0
    for i, r in enumerate(REF_P):
        c = sum(
            1
            for v in values
            if sum(v > e for e in EDGES) == i
        )
        p = (c + 0.5) / (n + 0.5 * 4)
        psi += (p - r) * math.log(p / r)
    return round(psi, 6)


def test_windowed_psi_matches_hand(spark, tmp_path):
    # hour 0: uniform-ish across bins -> low PSI; hour 1: all mass top bin
    h0 = [(m, float(v)) for m, v in zip(range(0, 40), [1, 3, 5, 7] * 10)]
    h1 = [(60 + m, 9.0) for m in range(30)]
    _write(_pdf(h0 + h1), str(tmp_path / "in" / "p0.parquet"))
    got = _drain(spark, str(tmp_path / "in"), "psi_t1")
    assert len(got) == 2
    w0 = got[T0]
    w1 = got[T0 + dt.timedelta(hours=1)]
    assert w0.n == 40 and w1.n == 30
    assert w0.psi == pytest.approx(_hand_psi([v for _, v in h0]), abs=1e-9)
    assert w1.psi == pytest.approx(_hand_psi([9.0] * 30), abs=1e-9)
    assert w1.psi > 0.25 > w0.psi  # drift injected in hour 1 flags


def test_incremental_drain_extends_window(spark, tmp_path):
    in_dir = str(tmp_path / "in2")
    _write(_pdf([(m, 1.0) for m in range(10)]), in_dir + "/p0.parquet")
    first = _drain(spark, in_dir, "psi_t2a")
    assert first[T0].n == 10
    # second file adds 10 more rows to the SAME window -> re-aggregated
    _write(_pdf([(m, 5.0) for m in range(10, 20)]), in_dir + "/p1.parquet")
    second = _drain(spark, in_dir, "psi_t2b")
    assert second[T0].n == 20
    assert second[T0].psi == pytest.approx(
        _hand_psi([1.0] * 10 + [5.0] * 10), abs=1e-9
    )


def test_validation(spark, tmp_path):
    stream = (
        pytest.importorskip("pyspark").sql.SparkSession.getActiveSession()
        or spark
    ).readStream.schema(SCHEMA).parquet(str(tmp_path))
    with pytest.raises(ValueError):
        stream_psi(stream, [1.0], [0.5, 0.3, 0.2])
    with pytest.raises(ValueError):
        stream_psi(stream, [1.0, 2.0], [0.5, 0.5, 0.0])
