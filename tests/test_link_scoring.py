"""Entity-link score calibration (operators/link_scoring.py): values,
degenerate-predicate semantics, and the scale-shape plan gates (broadcast
agg-join, NO window over the edge corpus)."""

import pytest

from node_feedparser_spark.operators.link_scoring import calibrate_link_scores

EDGES = [
    # pred "invokes": weights 1.0 .. 5.0
    ("a", "invokes", "b", 1.0),
    ("a", "invokes", "c", 3.0),
    ("b", "invokes", "c", 5.0),
    # pred "mentions": weights 2.0 .. 4.0
    ("a", "mentions", "b", 2.0),
    ("c", "mentions", "a", 4.0),
    # degenerate pred: all weights equal
    ("a", "cites", "b", 7.0),
    ("b", "cites", "c", 7.0),
    # NULL pred: its own calibration group, never dropped
    ("a", None, "c", 2.0),
    ("c", None, "b", 6.0),
]


def _df(spark):
    return spark.createDataFrame(
        EDGES, "src_id string, pred string, dst_id string, weight double"
    )


def test_calibration_values(spark):
    got = {
        (r["src_id"], r["pred"], r["dst_id"]): r["confidence"]
        for r in calibrate_link_scores(_df(spark)).collect()
    }
    assert got[("a", "invokes", "b")] == pytest.approx(0.0)
    assert got[("a", "invokes", "c")] == pytest.approx(0.5)
    assert got[("b", "invokes", "c")] == pytest.approx(1.0)
    # per-predicate scales are independent: mentions' min/max differ
    assert got[("a", "mentions", "b")] == pytest.approx(0.0)
    assert got[("c", "mentions", "a")] == pytest.approx(1.0)
    # degenerate predicate -> fully confident, never 0/0
    assert got[("a", "cites", "b")] == 1.0
    assert got[("b", "cites", "c")] == 1.0
    # NULL pred edges are calibrated within their own group, not dropped
    assert got[("a", None, "c")] == pytest.approx(0.0)
    assert got[("c", None, "b")] == pytest.approx(1.0)


def test_confidence_bounds_and_weight_passthrough(spark):
    rows = calibrate_link_scores(_df(spark)).collect()
    assert len(rows) == len(EDGES)
    for r in rows:
        assert 0.0 <= r["confidence"] <= 1.0
        assert r["weight"] == dict(
            ((s, p, d), w) for s, p, d, w in EDGES
        )[(r["src_id"], r["pred"], r["dst_id"])]


def test_plan_is_broadcast_join_without_window(spark):
    plan = calibrate_link_scores(_df(spark))._jdf.queryExecution().executedPlan().toString()
    # the per-pred extrema join must broadcast (a vocabulary-sized dim) ...
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # ... and the corpus must NOT be windowed into #predicate tasks
    assert "Window" not in plan
