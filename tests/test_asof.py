"""As-of join: hand cases pin inclusivity, ties, no-match NULLs and
tolerance; a brute-force reference implementation pins the general case."""

import datetime as dt

from pyspark.sql import functions as F

from node_feedparser_spark.operators.asof import asof_join, asof_join_bucketed

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _left(spark, rows):
    return spark.createDataFrame(
        [(i, u, _ts(s)) for i, u, s in rows], "event_id long, user_id long, ts timestamp"
    )


def _right(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(s), i) for u, s, i in rows],
        "user_id long, ts timestamp, click_event_id long",
    )


def test_basic_most_recent_at_or_before(spark):
    left = _left(spark, [(100, 1, 50), (101, 1, 150), (102, 1, 20)])
    right = _right(spark, [(1, 30, 7), (1, 120, 8), (1, 200, 9)])
    out = {
        r["event_id"]: (r["click_event_id"], r["asof_ts"])
        for r in asof_join(
            left, right, on="user_id", right_cols=("click_event_id",),
            tiebreak="click_event_id",
        ).collect()
    }
    assert out[100] == (7, _ts(30))
    assert out[101] == (8, _ts(120))
    assert out[102] == (None, None)  # nothing at or before -> NULLs


def test_equal_timestamp_is_inclusive_and_tie_takes_max(spark):
    left = _left(spark, [(100, 1, 50)])
    right = _right(spark, [(1, 50, 3), (1, 50, 9), (1, 10, 1)])
    row = asof_join(
        left, right, on="user_id", right_cols=("click_event_id",),
        tiebreak="click_event_id",
    ).collect()[0]
    assert row["click_event_id"] == 9 and row["asof_ts"] == _ts(50)


def test_keys_do_not_leak(spark):
    left = _left(spark, [(100, 1, 50)])
    right = _right(spark, [(2, 10, 7)])  # other user's click only
    row = asof_join(
        left, right, on="user_id", right_cols=("click_event_id",),
        tiebreak="click_event_id",
    ).collect()[0]
    assert row["click_event_id"] is None


def test_tolerance_nulls_stale_matches(spark):
    left = _left(spark, [(100, 1, 1000), (101, 1, 1010)])
    right = _right(spark, [(1, 0, 7), (1, 1005, 8)])
    out = {
        r["event_id"]: r["click_event_id"]
        for r in asof_join(
            left, right, on="user_id", right_cols=("click_event_id",),
            tiebreak="click_event_id", tolerance_seconds=60,
        ).collect()
    }
    assert out[100] is None  # 1000 s stale > 60 s tolerance
    assert out[101] == 8


def test_matches_bruteforce_on_random_data(spark):
    left = spark.range(500).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 13).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id"), F.lit(100000))
        ).alias("ts"),
    )
    right = spark.range(300).select(
        (F.col("id") % 13).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64(F.col("id") + 9999), F.lit(100000))
        ).alias("ts"),
        (F.col("id") + 5000).alias("click_event_id"),
    )
    got = {
        r["event_id"]: (r["click_event_id"], r["asof_ts"])
        for r in asof_join(
            left, right, on="user_id", right_cols=("click_event_id",),
            tiebreak="click_event_id",
        ).collect()
    }
    # brute force: max (ts, id) right row per left row
    lrows = left.collect()
    rrows = right.collect()
    for lr in lrows:
        cands = [
            rr for rr in rrows
            if rr["user_id"] == lr["user_id"] and rr["ts"] <= lr["ts"]
        ]
        want = max(
            cands, key=lambda rr: (rr["ts"], rr["click_event_id"]), default=None
        )
        if want is None:
            assert got[lr["event_id"]] == (None, None)
        else:
            assert got[lr["event_id"]] == (want["click_event_id"], want["ts"])


def _random_sides(spark):
    left = spark.range(600).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 9).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id"), F.lit(50000))
        ).alias("ts"),
    )
    right = spark.range(250).select(
        (F.col("id") % 9).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64(F.col("id") + 777), F.lit(50000))
        ).alias("ts"),
        (F.col("id") + 5000).alias("click_event_id"),
    )
    return left, right


def _pairs(df):
    return sorted(
        (r["event_id"], r["click_event_id"], r["asof_ts"]) for r in df.collect()
    )


def test_bucketed_equals_plain(spark):
    """The mega-key scale path (bounded per-(key, bucket) windows +
    boundary-seed stitch) is output-identical to the single-window plan,
    including seeds carried across empty buckets."""
    left, right = _random_sides(spark)
    kw = dict(on="user_id", right_cols=("click_event_id",), tiebreak="click_event_id")
    want = _pairs(asof_join(left, right, **kw))
    for width in (500, 3600, 100000):
        got = _pairs(asof_join_bucketed(left, right, bucket_width_seconds=width, **kw))
        assert got == want, f"width={width}"


def test_bucketed_equals_plain_with_tolerance(spark):
    left, right = _random_sides(spark)
    kw = dict(
        on="user_id", right_cols=("click_event_id",),
        tiebreak="click_event_id", tolerance_seconds=1200,
    )
    want = _pairs(asof_join(left, right, **kw))
    got = _pairs(asof_join_bucketed(left, right, bucket_width_seconds=900, **kw))
    assert got == want


def test_bucketed_requires_tiebreak(spark):
    left, right = _random_sides(spark)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join_bucketed(left, right, bucket_width_seconds=900, on="user_id")
