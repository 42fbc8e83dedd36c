"""Linear multi-touch attribution (asof.linear_attribution): hand credits,
window boundaries, cross-user isolation, zero-touch conversions drop."""

import datetime as dt

import pytest

from node_feedparser_spark.operators.asof import linear_attribution

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _t(h):
    return T0 + dt.timedelta(hours=h)


ROWS = [
    # user 1: 3 clicks then a 30-value purchase; one click outside 24 h
    (1, 1, "click", -30.0, 0.0),   # 30 h before -> excluded
    (2, 1, "click", -10.0, 0.0),
    (3, 1, "click", -1.0, 0.0),
    (4, 1, "click", 0.0, 0.0),     # same instant -> included (<=)
    (5, 1, "purchase", 0.0, 30.0),
    # user 2: purchase with NO clicks in window -> emits nothing
    (6, 2, "click", -25.0, 0.0),
    (7, 2, "purchase", 0.0, 99.0),
    # user 3: click AFTER purchase -> excluded
    (8, 3, "purchase", 0.0, 12.0),
    (9, 3, "click", 1.0, 0.0),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [(e, u, t, _t(h), v) for e, u, t, h, v in ROWS],
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )


def test_hand_credits(events):
    rows = linear_attribution(events, window_hours=24).collect()
    got = {(r.conversion_id, r.touch_id): (r.n_touches, r.credit) for r in rows}
    # purchase 5: clicks 2, 3, 4 in window (1 is 30 h out) -> 10 each
    assert got == {
        (5, 2): (3, 10.0),
        (5, 3): (3, 10.0),
        (5, 4): (3, 10.0),
    }


def test_no_cross_user_leak(events):
    rows = linear_attribution(events, window_hours=48).collect()
    # at 48 h, user 2's click 6 is in window for purchase 7
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conversion_id, set()).add(r.touch_id)
    assert by_conv[7] == {6}
    assert 6 not in by_conv[5]
    assert 8 not in by_conv  # click after purchase never attributes


def test_credit_conserves_value(events):
    rows = linear_attribution(events, window_hours=24).collect()
    total = sum(r.credit for r in rows if r.conversion_id == 5)
    assert total == pytest.approx(30.0)


def test_validation(events):
    with pytest.raises(ValueError):
        linear_attribution(events, window_hours=0)
