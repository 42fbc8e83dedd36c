"""SCD2 timeline: hand semantics + naive == bucketed equality."""

import datetime as dt
import random

from node_feedparser_spark.operators.timeline import (
    scd2_timeline,
    scd2_timeline_naive,
)


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, et, _ts(s), i) for i, (u, et, s) in enumerate(rows)],
        ["user_id", "event_type", "ts", "event_id"],
    )


def _canon(df):
    return sorted(
        (
            r["user_id"],
            r["interval_id"],
            r["event_type"],
            r["valid_from"],
            r["valid_to"],
            r["n_events"],
        )
        for r in df.collect()
    )


def test_hand_intervals(spark):
    ev = _mk(
        spark,
        [
            (1, "a", 0),
            (1, "a", 10),
            (1, "b", 20),
            (1, "a", 30),
            (2, "x", 5),
        ],
    )
    rows = _canon(scd2_timeline_naive(ev))
    assert rows == [
        (1, 0, "a", _ts(0), _ts(20), 2),
        (1, 1, "b", _ts(20), _ts(30), 1),
        (1, 2, "a", _ts(30), None, 1),
        (2, 0, "x", _ts(5), None, 1),
    ]


def test_current_interval_has_null_valid_to(spark):
    ev = _mk(spark, [(1, "a", 0), (1, "b", 50)])
    cur = [r for r in scd2_timeline_naive(ev).collect() if r["valid_to"] is None]
    assert len(cur) == 1 and cur[0]["event_type"] == "b"


def test_run_spanning_bucket_boundary_merges(spark):
    # same value on both sides of the bucket seam -> ONE interval
    ev = _mk(spark, [(1, "a", 10), (1, "a", 90), (1, "b", 170)])
    rows = _canon(scd2_timeline(ev, bucket_width_seconds=60))
    assert rows == [
        (1, 0, "a", _ts(10), _ts(170), 2),
        (1, 1, "b", _ts(170), None, 1),
    ]


def test_change_exactly_at_bucket_boundary(spark):
    ev = _mk(spark, [(1, "a", 10), (1, "b", 60), (1, "b", 61)])
    rows = _canon(scd2_timeline(ev, bucket_width_seconds=60))
    assert rows == [
        (1, 0, "a", _ts(10), _ts(60), 1),
        (1, 1, "b", _ts(60), None, 2),
    ]


def test_empty_bucket_gap_still_merges_runs(spark):
    # value 'a' at t=10 and t=500 with empty buckets between: still one
    # interval — continuation consults the previous NON-EMPTY bucket
    ev = _mk(spark, [(1, "a", 10), (1, "a", 500)])
    rows = _canon(scd2_timeline(ev, bucket_width_seconds=60))
    assert rows == [(1, 0, "a", _ts(10), None, 2)]


def test_null_values_form_intervals(spark):
    ev = _mk(spark, [(1, None, 0), (1, None, 10), (1, "a", 20), (1, None, 30)])
    rows = _canon(scd2_timeline_naive(ev))
    assert [r[2] for r in rows] == [None, "a", None]
    assert [r[5] for r in rows] == [2, 1, 1]
    bucketed = _canon(scd2_timeline(ev, bucket_width_seconds=15))
    assert bucketed == rows


def test_naive_equals_bucketed_randomized(spark):
    rng = random.Random(1234)
    rows = []
    for u in range(12):
        t = 0
        for _ in range(rng.randint(1, 120)):
            t += rng.randint(1, 200)
            rows.append((u, rng.choice(["a", "b", "c", None]), t))
    ev = _mk(spark, rows)
    want = _canon(scd2_timeline_naive(ev))
    for width in (30, 60, 300, 86_400):
        assert _canon(scd2_timeline(ev, bucket_width_seconds=width)) == want


def test_tiebreak_orders_equal_timestamps(spark):
    # two events at the same ts: event_id ascending decides the run order
    ev = spark.createDataFrame(
        [(1, "a", _ts(0), 0), (1, "b", _ts(10), 2), (1, "c", _ts(10), 1)],
        ["user_id", "event_type", "ts", "event_id"],
    )
    rows = _canon(scd2_timeline_naive(ev))
    assert [r[2] for r in rows] == ["a", "c", "b"]
    assert _canon(scd2_timeline(ev, bucket_width_seconds=5)) == rows
