"""interval_coverage: overlap/touch/gap hand cases, the bucketed plan's
boundary-junction correction (spanning, exactly-touching, and
multi-bucket islands), zero-length drops, and bucketed == naive on a
seeded random workload with a tiny bucket to force many junctions."""

import random

import pytest

from node_feedparser_spark.operators.timeline import (
    interval_coverage,
    interval_coverage_naive,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, s_us long, e_us long")


def _by_key(df):
    return {
        r.key: (r.n_intervals, r.n_islands, r.covered_us)
        for r in df.collect()
    }


B = 100  # tiny bucket for tests


def test_overlap_touch_gap(spark):
    rows = [
        ("a", 0, 10), ("a", 5, 20),   # overlap -> one island [0,20)
        ("a", 20, 30),                # touching -> still one island
        ("a", 40, 50),                # gap -> second island
    ]
    want = {"a": (4, 2, 40)}
    assert _by_key(interval_coverage(_df(spark, rows), bucket_us=B)) == want
    assert _by_key(interval_coverage_naive(_df(spark, rows))) == want


def test_island_spanning_buckets_counts_once(spark):
    # one interval across three buckets: clipped to 3 pieces, 2
    # junctions subtract back to a single island
    rows = [("a", 50, 250)]
    want = {"a": (1, 1, 200)}
    assert _by_key(interval_coverage(_df(spark, rows), bucket_us=B)) == want


def test_boundary_touch_without_overlap_merges(spark):
    # [80,100) and [100,120): touch exactly at the bucket edge -> one
    # island both in the naive plan and across the bucket junction
    rows = [("a", 80, 100), ("a", 100, 120)]
    want = {"a": (2, 1, 40)}
    assert _by_key(interval_coverage(_df(spark, rows), bucket_us=B)) == want
    assert _by_key(interval_coverage_naive(_df(spark, rows))) == want


def test_gap_at_boundary_does_not_merge(spark):
    # [80,100) then [110,120): boundary touched only from the left
    rows = [("a", 80, 100), ("a", 110, 120)]
    want = {"a": (2, 2, 30)}
    assert _by_key(interval_coverage(_df(spark, rows), bucket_us=B)) == want


def test_zero_length_drops(spark):
    rows = [("a", 10, 10), ("a", 20, 30)]
    want = {"a": (1, 1, 10)}
    assert _by_key(interval_coverage(_df(spark, rows), bucket_us=B)) == want
    assert _by_key(interval_coverage_naive(_df(spark, rows))) == want


def test_bucketed_equals_naive_randomized(spark):
    rng = random.Random(41)
    rows = []
    for k in ("a", "b", "c"):
        for _ in range(60):
            s = rng.randrange(0, 2000)
            rows.append((k, s, s + rng.randrange(1, 400)))
    got_b = _by_key(interval_coverage(_df(spark, rows), bucket_us=B))
    got_n = _by_key(interval_coverage_naive(_df(spark, rows)))
    assert got_b == got_n


def test_validation():
    with pytest.raises(ValueError):
        interval_coverage(None, bucket_us=0)
