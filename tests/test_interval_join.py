"""Bucketed interval join: equality with the θ-join definition, boundary
inclusivity, bucket-width invariance, no-cartesian plan, no-dup guarantee."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.interval_join import (
    interval_join_bucketed,
    interval_join_naive,
)

T0 = dt.datetime(2026, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def data(spark):
    points = spark.createDataFrame(
        [(i, _t(s)) for i, s in enumerate(
            [0, 10, 3600, 3661, 7200, 9999, 50_000, 123_456]
        )],
        "point_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _t(0), _t(10)),          # exact boundaries
            (101, _t(5), _t(4000)),        # spans a bucket edge
            (102, _t(3600), _t(3600)),     # zero-length on a bucket edge
            (103, _t(8000), _t(60_000)),   # long interval, many buckets
            (104, _t(200_000), _t(300_000)),  # matches nothing
        ],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def _pairs(df):
    return {(r.point_id, r.iv_id) for r in df.collect()}


def test_matches_theta_join(data):
    points, intervals = data
    got = _pairs(interval_join_bucketed(points, intervals, 3600))
    want = _pairs(interval_join_naive(points, intervals))
    assert got == want
    # hand spot-checks: inclusive both ends, zero-length interval hits
    assert (0, 100) in got and (1, 100) in got       # ts=0 and ts=10
    assert (2, 102) in got                            # 3600 in [3600,3600]
    assert (6, 103) in got                            # 50k in [8k,60k]
    assert not any(iv == 104 for _, iv in got)


def test_bucket_width_invariance(data):
    points, intervals = data
    a = _pairs(interval_join_bucketed(points, intervals, 60))
    b = _pairs(interval_join_bucketed(points, intervals, 3600))
    c = _pairs(interval_join_bucketed(points, intervals, 86_400))
    assert a == b == c


def test_no_duplicate_pairs(data):
    points, intervals = data
    rows = interval_join_bucketed(points, intervals, 1800).select(
        "point_id", "iv_id"
    ).collect()
    assert len(rows) == len(set(map(tuple, rows)))


def test_plan_is_equi_join_not_nested_loop(data):
    points, intervals = data
    plan = interval_join_bucketed(points, intervals, 3600)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    naive = interval_join_naive(points, intervals)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in naive or "CartesianProduct" in naive


def test_validation(data):
    points, intervals = data
    with pytest.raises(ValueError):
        interval_join_bucketed(points, intervals, 0)
