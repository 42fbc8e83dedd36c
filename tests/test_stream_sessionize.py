"""Streaming sessionization (native session_window): batch parity,
exact-gap boundary agreement, and session extension across drains."""

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from node_feedparser_spark.operators.sessionize import sessionize_naive
from node_feedparser_spark.streaming.sessionize_stream import stream_sessionize

T0 = dt.datetime(2024, 1, 1)

EVENT_SCHEMA = "user_id string, event_id long, ts timestamp, value double"


def _events_pdf(rows):
    return pd.DataFrame(
        {
            "user_id": [u for u, _, _, _ in rows],
            "event_id": [e for _, e, _, _ in rows],
            "ts": pd.Series(
                [T0 + dt.timedelta(seconds=s) for _, _, s, _ in rows],
                dtype="datetime64[us]",
            ),
            "value": [v for _, _, _, v in rows],
        }
    )


def _write_part(pdf, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def _drain_complete(spark, in_dir, df_fn, name):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        df_fn(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}")


def _sessions(df):
    cols = ["n_events", "session_start", "session_end", "total_value"]
    return {
        (r["user_id"],) + tuple(r[c] for c in cols) for r in df.collect()
    }


def test_stream_matches_batch_off_boundary(spark, tmp_path):
    # gaps of 100 and 400 around a 300 s threshold
    rows = []
    eid = 0
    for u in ("a", "b"):
        s = 0
        for i in range(12):
            s += 100 if i % 3 else 400
            rows.append((u, eid, s, float(i)))
            eid += 1
    pdf = _events_pdf(rows)
    in_dir = str(tmp_path / "in")
    _write_part(pdf, os.path.join(in_dir, "part1.parquet"))

    got = _sessions(
        _drain_complete(
            spark, in_dir, lambda s: stream_sessionize(s, 300), "sess_parity"
        )
    )
    batch = spark.createDataFrame(pdf, EVENT_SCHEMA)
    want = _sessions(sessionize_naive(batch, gap_seconds=300))
    assert got == want


def test_exact_gap_boundary_agreement_is_pinned(spark, tmp_path):
    # diff == gap: BOTH faces keep one session — Spark's session window is
    # inclusive at its end, matching the batch diff <= gap rule; diff just
    # past gap splits in both
    pdf = _events_pdf(
        [("u", 0, 0, 1.0), ("u", 1, 300, 1.0), ("u", 2, 601, 1.0)]
    )
    in_dir = str(tmp_path / "in")
    _write_part(pdf, os.path.join(in_dir, "part1.parquet"))

    stream_n = _drain_complete(
        spark, in_dir, lambda s: stream_sessionize(s, 300), "sess_boundary"
    ).count()
    batch = spark.createDataFrame(pdf, EVENT_SCHEMA)
    batch_n = sessionize_naive(batch, gap_seconds=300).count()
    assert (batch_n, stream_n) == (2, 2)


def test_incremental_drain_extends_open_session(spark, tmp_path):
    # second file's events continue the first file's session: the merged
    # session must cover both after the second drain
    in_dir = str(tmp_path / "in")
    _write_part(
        _events_pdf([("u", 0, 0, 1.0), ("u", 1, 100, 1.0)]),
        os.path.join(in_dir, "part1.parquet"),
    )
    first = _sessions(
        _drain_complete(
            spark, in_dir, lambda s: stream_sessionize(s, 300), "sess_inc1"
        )
    )
    assert {x[1] for x in first} == {2}  # one session, 2 events

    _write_part(
        _events_pdf([("u", 2, 250, 1.0), ("u", 3, 900, 1.0)]),
        os.path.join(in_dir, "part2.parquet"),
    )
    second = _sessions(
        _drain_complete(
            spark, in_dir, lambda s: stream_sessionize(s, 300), "sess_inc2"
        )
    )
    # event at 250 extends [0,100] (gap 150 <= 300); 900 starts a new one
    assert {x[1] for x in second} == {3, 1}
