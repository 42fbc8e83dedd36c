"""Sessionization: bucketed two-level plan equals the naive single-window
plan (including sessions spanning bucket boundaries and empty buckets),
and hand-built cases pin the gap semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.sessionize import sessionize, sessionize_naive

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _df(spark, rows):
    """rows: (user_id, event_id, offset_seconds, value)"""
    data = [
        (u, e, T0 + dt.timedelta(seconds=s), float(v)) for u, e, s, v in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, value double"
    )


def _collect(df):
    return sorted(
        (
            r["user_id"], r["session_id"], r["n_events"],
            r["session_start"], r["session_end"], r["total_value"],
        )
        for r in df.collect()
    )


def test_gap_splits_sessions(spark):
    df = _df(spark, [
        (1, 0, 0, 1.0),
        (1, 1, 100, 2.0),      # same session (gap 100 <= 300)
        (1, 2, 500, 3.0),      # new session (gap 400 > 300)
        (1, 3, 700, 4.0),      # continues session 1
    ])
    got = _collect(sessionize_naive(df, gap_seconds=300))
    assert [(sid, n, tv) for _, sid, n, _, _, tv in got] == [
        (0, 2, 3.0), (1, 2, 7.0),
    ]


def test_exact_gap_does_not_split(spark):
    df = _df(spark, [(1, 0, 0, 1.0), (1, 1, 300, 1.0)])
    got = _collect(sessionize_naive(df, gap_seconds=300))
    assert len(got) == 1 and got[0][2] == 2


def test_bucketed_equals_naive_across_boundaries(spark):
    # sessions that span bucket boundaries, whole empty buckets inside a
    # pause, ties on ts broken by event_id, multiple users
    rows = []
    for u in (1, 2, 3):
        s = 0
        for i in range(60):
            # burst of 3 events, then a pause that sometimes exceeds the
            # gap and sometimes crosses several 600s buckets silently
            rows.append((u, u * 1000 + i * 3 + 0, s, 1.0))
            rows.append((u, u * 1000 + i * 3 + 1, s, 2.0))  # tie on ts
            rows.append((u, u * 1000 + i * 3 + 2, s + 30 * u, 3.0))
            s += (i % 7) * 250 + 40  # gaps from 40 s to 1540 s
    df = _df(spark, rows)
    for gap in (200, 600):
        naive = _collect(sessionize_naive(df, gap_seconds=gap))
        for width in (600, 3600):
            if width < gap:
                continue
            bucketed = _collect(
                sessionize(df, gap_seconds=gap, bucket_width_seconds=width)
            )
            assert bucketed == naive, f"gap={gap} width={width}"


def test_bucketed_equals_naive_on_corpus_events(spark):
    """Events-table shape: dense global ids, random timestamps."""
    ev = spark.range(2000).select(
        (F.col("id") % 37).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.xxhash64("id") % 200000 + 200000) % 200000
        ).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    naive = _collect(sessionize_naive(ev, gap_seconds=900))
    bucketed = _collect(sessionize(ev, gap_seconds=900, bucket_width_seconds=3600))
    assert bucketed == naive


def test_width_below_gap_rejected(spark):
    df = _df(spark, [(1, 0, 0, 1.0)])
    with pytest.raises(ValueError):
        sessionize(df, gap_seconds=3600, bucket_width_seconds=600)
