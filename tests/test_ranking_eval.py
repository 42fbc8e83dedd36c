"""ranking_eval: hand-computed MRR / Hits@k / mean-rank on a tiny
candidate list, including the miss convention (unscored positives count
as RR 0 / hits 0 and are excluded from mean_rank) and the deterministic
(score DESC, item ASC) tie-break."""

import pytest

from node_feedparser_spark.operators.graph_algo import ranking_eval


def _run(spark, scored_rows, truth_rows, ks=(1, 3, 10)):
    scored = spark.createDataFrame(
        scored_rows, "group_id string, item_id string, score double"
    )
    truth = spark.createDataFrame(truth_rows, "group_id string, item_id string")
    return ranking_eval(scored, truth, ks=ks).collect()[0].asDict()


def test_hand_computed_metrics(spark):
    # group g1 ranking: b(0.9)=1, a(0.5)=2, c(0.2)=3
    # group g2 ranking: x(0.7)=1, y(0.1)=2
    scored = [
        ("g1", "a", 0.5),
        ("g1", "b", 0.9),
        ("g1", "c", 0.2),
        ("g2", "x", 0.7),
        ("g2", "y", 0.1),
    ]
    # positives: g1/b rank 1, g1/c rank 3, g2/y rank 2, g2/z UNSCORED miss
    truth = [("g1", "b"), ("g1", "c"), ("g2", "y"), ("g2", "z")]
    m = _run(spark, scored, truth)
    assert m["n_truth"] == 4
    assert m["n_scored"] == 3
    assert m["mrr"] == pytest.approx((1 + 1 / 3 + 1 / 2 + 0) / 4, abs=1e-6)
    assert m["hits_1"] == pytest.approx(1 / 4, abs=1e-6)
    assert m["hits_3"] == pytest.approx(3 / 4, abs=1e-6)
    assert m["hits_10"] == pytest.approx(3 / 4, abs=1e-6)
    assert m["mean_rank"] == pytest.approx((1 + 3 + 2) / 3, abs=1e-6)


def test_tie_break_is_item_asc(spark):
    # equal scores: rank order must be item ASC -> a=1, b=2, c=3
    scored = [("g", "c", 1.0), ("g", "a", 1.0), ("g", "b", 1.0)]
    m = _run(spark, scored, [("g", "a")])
    assert m["hits_1"] == pytest.approx(1.0, abs=1e-6)
    m = _run(spark, scored, [("g", "c")])
    assert m["hits_1"] == pytest.approx(0.0, abs=1e-6)
    assert m["mean_rank"] == pytest.approx(3.0, abs=1e-6)


def test_duplicate_truth_rows_count_once(spark):
    scored = [("g", "a", 1.0), ("g", "b", 0.5)]
    m = _run(spark, scored, [("g", "a"), ("g", "a")])
    assert m["n_truth"] == 1
    assert m["mrr"] == pytest.approx(1.0, abs=1e-6)


def test_all_misses(spark):
    scored = [("g", "a", 1.0)]
    m = _run(spark, scored, [("g", "zz"), ("h", "a")])
    assert m["n_truth"] == 2
    assert m["n_scored"] == 0
    assert m["mrr"] == pytest.approx(0.0, abs=1e-6)
    assert m["hits_10"] == pytest.approx(0.0, abs=1e-6)
    assert m["mean_rank"] is None
