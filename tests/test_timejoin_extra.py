"""comention_edges band self-join + time_decay_weights."""

from datetime import datetime, timedelta

import pytest

from node_feedparser_spark.operators.fusion import time_decay_weights
from node_feedparser_spark.operators.interval_join import comention_edges

T0 = datetime(2024, 1, 1)


def _pts(spark, rows):
    # rows: (key, item, seconds_offset, id)
    data = [(k, it, T0 + timedelta(seconds=s), i) for k, it, s, i in rows]
    return spark.createDataFrame(
        data, "key string, item string, ts timestamp, id long"
    )


def _co(spark, rows, **kw):
    out = comention_edges(_pts(spark, rows), **kw).collect()
    return {(r["item_a"], r["item_b"]): r["n_co"] for r in out}


def test_window_and_ordering(spark):
    got = _co(
        spark,
        [("k", "x", 0, 1), ("k", "y", 50, 2), ("k", "z", 200, 3)],
        window_seconds=100,
    )
    assert got == {("x", "y"): 1}  # y-z dt=150 and x-z dt=200 exceed w


def test_bucket_boundary_pair_counted_once(spark):
    got = _co(
        spark,
        [("k", "x", 95, 1), ("k", "y", 105, 2)],
        window_seconds=100,
    )
    assert got == {("x", "y"): 1}


def test_equal_ts_id_tiebreak_and_same_item_excluded(spark):
    got = _co(
        spark,
        [("k", "x", 0, 1), ("k", "y", 0, 2), ("k", "x", 10, 3)],
        window_seconds=100,
    )
    # x@1-y@2 (tie, id order), y@2-x@3: one unordered pair each; x-x skipped
    assert got == {("x", "y"): 2}


def test_keys_are_isolated(spark):
    got = _co(
        spark,
        [("k1", "x", 0, 1), ("k2", "y", 10, 2)],
        window_seconds=100,
    )
    assert got == {}


def test_time_decay_hand_computed(spark):
    df = _pts(
        spark,
        [("u", "e", 0, 1), ("u", "e", 86_400, 2)],  # 2 and 1 days before now
    )
    now = int(T0.timestamp()) + 2 * 86_400
    out = time_decay_weights(
        df, key_cols=("key", "item"), ts="ts", now_s=now,
        half_life_seconds=86_400,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_obs"] == 2
    assert r["w_decayed"] == pytest.approx(0.25 + 0.5, abs=1e-6)
    assert r["w_latest"] == pytest.approx(0.5, abs=1e-6)


def test_time_decay_requires_now(spark):
    with pytest.raises(ValueError):
        time_decay_weights(_pts(spark, []), now_s=None)
