"""Funnel conversion + cohort retention: ordering, gaps, cohort math."""

import datetime as dt

import pytest

from node_feedparser_spark.operators.sessionize import (
    cohort_retention,
    funnel_conversion,
)

T0 = dt.datetime(2024, 1, 1, 8, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def _h(hours):
    return T0 + dt.timedelta(hours=hours)


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes in order: view, click, purchase
        (1, "view", _h(0)), (1, "click", _h(1)), (1, "purchase", _h(2)),
        # u2 clicks BEFORE viewing: click must not count
        (2, "click", _h(0)), (2, "view", _h(1)), (2, "purchase", _h(2)),
        # u3 views only
        (3, "view", _h(0)),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_gap_enforced_per_hop(spark):
    rows = [
        (1, "view", _h(0)), (1, "click", _h(30)),          # > 24h: drop
        (2, "view", _h(0)), (2, "click", _h(20)), (2, "purchase", _h(50)),
        # u2's purchase is 30h after click: drop at step 3
        (3, "view", _h(0)), (3, "click", _h(10)), (3, "purchase", _h(30)),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(
            _ev(spark, rows), ["view", "click", "purchase"], max_gap_hours=24
        ).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_uses_first_qualifying_occurrence(spark):
    # u1's first click is 1h after view; a later click at 40h must not
    # reset the purchase window
    rows = [
        (1, "view", _h(0)), (1, "click", _h(1)), (1, "click", _h(40)),
        (1, "purchase", _h(26)),  # 25h after FIRST click: outside gap
    ]
    out = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(
            _ev(spark, rows), ["view", "click", "purchase"], max_gap_hours=24
        ).collect()
    }
    assert out["purchase"] == 0


def test_funnel_rates_relative_to_step1(spark):
    rows = [
        (1, "view", _h(0)), (1, "click", _h(1)),
        (2, "view", _h(0)),
        (3, "view", _h(0)), (3, "click", _h(2)),
        (4, "view", _h(0)),
    ]
    out = {r["step"]: r for r in funnel_conversion(
        _ev(spark, rows), ["view", "click"]).collect()}
    assert out["view"]["conversion_rate"] == 1.0
    assert out["click"]["conversion_rate"] == 0.5


def test_funnel_validation(spark):
    with pytest.raises(ValueError):
        funnel_conversion(_ev(spark, [(1, "view", _h(0))]), ["view"])


def test_cohort_offsets_and_rates(spark):
    # two users start week 0 (Mon 2024-01-01); one returns week 1, both
    # active week 0; a third user starts week 1
    w = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, "view", w + dt.timedelta(days=1)),
        (2, "view", w + dt.timedelta(days=2)),
        (1, "view", w + dt.timedelta(days=8)),   # week 1
        (3, "view", w + dt.timedelta(days=9)),   # cohort week 1
    ]
    out = {
        (str(r["cohort_week"]), r["week_offset"]): (
            r["n_active"],
            r["retention"],
        )
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1.0)
    assert len(out) == 3


def test_cohort_first_week_is_min_over_all_events(spark):
    w = dt.datetime(2024, 1, 1)
    rows = [
        (1, "view", w + dt.timedelta(days=10)),
        (1, "click", w + dt.timedelta(days=3)),  # earlier event wins cohort
    ]
    out = cohort_retention(_ev(spark, rows)).collect()
    assert {str(r["cohort_week"]) for r in out} == {"2024-01-01"}
