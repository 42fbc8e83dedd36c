"""Mann-Whitney ROC-AUC (operators/link_scoring.py roc_auc)."""

from node_feedparser_spark.operators.link_scoring import roc_auc


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "score double, label int")
    return roc_auc(df).collect()[0]


def test_hand_computed_with_cross_class_tie(spark):
    # pos {3, 2}, neg {1, 2}: pairs (3>1)+(3>2)+(2>1)+(2=2 -> 0.5) = 3.5/4
    r = _auc(spark, [(3.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)])
    assert (r["auc"], r["n_pos"], r["n_neg"]) == (0.875, 2, 2)


def test_perfect_separation(spark):
    r = _auc(spark, [(9.0, 1), (8.0, 1), (1.0, 0), (2.0, 0)])
    assert r["auc"] == 1.0


def test_inverted_scores_give_zero(spark):
    r = _auc(spark, [(1.0, 1), (9.0, 0)])
    assert r["auc"] == 0.0


def test_random_scores_give_half_on_identical_distributions(spark):
    rows = [(float(v), 1) for v in (1, 2, 3)] + [(float(v), 0) for v in (1, 2, 3)]
    r = _auc(spark, rows)
    assert r["auc"] == 0.5
