"""temporal_conflicts: hand-built two-source streams pin the assertion
model (validity until same-source successor, close at the user's last
observed event), strict-overlap semantics (touching intervals don't
conflict), the same-value exclusion, and bucketing invariance."""

from datetime import datetime

from pyspark.sql import functions as F

from node_feedparser_spark.operators.timeline import temporal_conflicts


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, source long, event_id long, event_type string, ts string"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): (
            r["value_a"], r["value_b"], r["overlap_from"], r["overlap_to"]
        )
        for r in df.collect()
    }


def test_basic_conflict_and_same_value_exclusion(spark):
    # source 0: A@00:00 (until 02:00), B@02:00 (until 03:00 = user max)
    # source 1: B@01:00 (until 03:00 = user max)
    # A(00:00-02:00) x B(01:00-03:00): overlap 01:00-02:00, differ -> conflict
    # B(02:00-03:00) x B(01:00-03:00): same value -> excluded
    rows = [
        (1, 0, 10, "A", "2024-01-01 00:00:00"),
        (1, 0, 11, "B", "2024-01-01 02:00:00"),
        (1, 1, 20, "B", "2024-01-01 01:00:00"),
        (1, 1, 21, "C", "2024-01-01 03:00:00"),
    ]
    # note: source-1 C@03:00 is the user's last event -> zero-length
    # assertion, conflicts with nothing (strict overlap)
    got = _pairs(temporal_conflicts(_ev(spark, rows)))
    assert (10, 20) in got
    va, vb, ofrom, oto = got[(10, 20)]
    assert (va, vb) == ("A", "B")
    assert ofrom == datetime(2024, 1, 1, 1, 0, 0)
    assert oto == datetime(2024, 1, 1, 2, 0, 0)
    # B x B same-value excluded; zero-length C excluded
    assert all(k == (10, 20) or got[k][0] != got[k][1] for k in got)
    assert (11, 20) not in got  # B vs B
    assert not any(21 in k for k in got)  # zero-length final assertion


def test_touching_intervals_do_not_conflict(spark):
    # source 0: A valid 00:00-01:00; source 1: B valid exactly from 01:00
    rows = [
        (1, 0, 10, "A", "2024-01-01 00:00:00"),
        (1, 0, 11, "C", "2024-01-01 01:00:00"),
        (1, 1, 20, "B", "2024-01-01 01:00:00"),
        (1, 1, 21, "D", "2024-01-01 02:00:00"),
    ]
    got = _pairs(temporal_conflicts(_ev(spark, rows)))
    assert (10, 20) not in got  # handoff at the shared boundary
    assert (11, 20) in got  # C(01:00-02:00) x B(01:00-02:00)


def test_users_are_independent(spark):
    rows = [
        (1, 0, 10, "A", "2024-01-01 00:00:00"),
        (2, 1, 20, "B", "2024-01-01 00:00:00"),
        (1, 0, 11, "C", "2024-01-01 05:00:00"),
        (2, 1, 21, "D", "2024-01-01 05:00:00"),
    ]
    assert _pairs(temporal_conflicts(_ev(spark, rows))) == {}


def test_bucket_width_invariance(spark):
    # intervals span many buckets at 1-hour width: pair output identical
    rows = [
        (1, 0, 10, "A", "2024-01-01 00:00:00"),
        (1, 0, 11, "B", "2024-01-03 00:00:00"),
        (1, 1, 20, "X", "2024-01-02 00:00:00"),
        (1, 1, 21, "Y", "2024-01-04 00:00:00"),
    ]
    day = _pairs(temporal_conflicts(_ev(spark, rows)))
    hour = _pairs(
        temporal_conflicts(_ev(spark, rows), bucket_width_seconds=3600)
    )
    assert day == hour and len(day) > 0
