"""z-score burst detection (operators/profile.py burst_detect)."""

from datetime import datetime, timedelta

from node_feedparser_spark.operators.profile import burst_detect

EPOCH = datetime(2024, 1, 1)


def _events(spark, counts, group="err", bucket_seconds=100):
    """counts[i] events in bucket i, stamped mid-bucket (tz-offset safe)."""
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append((group, EPOCH + timedelta(seconds=i * bucket_seconds + 50)))
            _ = j
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_flat_baseline_spike_flags_even_with_zero_std(spark):
    df = _events(spark, [10] * 8 + [30])
    out = burst_detect(df, bucket_seconds=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cnt"] == 30 and r["trail_mean"] == 10.0 and r["trail_std"] == 0.0


def test_sub_threshold_spike_not_flagged(spark):
    # trailing window alternates 9/11 (mean 10, sample std ~1.069);
    # 12 < 10 + 2*1.069 so no flag
    df = _events(spark, [9, 11, 9, 11, 9, 11, 9, 11, 12])
    assert burst_detect(df, bucket_seconds=100).count() == 0


def test_warmup_buckets_never_flag(spark):
    # spike in bucket 5 has only 5 trailing buckets (< trail=8): no flag
    df = _events(spark, [10] * 5 + [99])
    assert burst_detect(df, bucket_seconds=100).count() == 0


def test_groups_are_independent(spark):
    calm = _events(spark, [10] * 9, group="view")
    bursty = _events(spark, [10] * 8 + [40], group="error")
    out = burst_detect(calm.union(bursty), bucket_seconds=100).collect()
    assert [r["event_type"] for r in out] == ["error"]
