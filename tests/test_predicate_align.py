"""Extensional predicate alignment (operators/rules.predicate_align) —
Jaccard arithmetic, overlap filtering and duplicate collapse on hand
graphs."""

from node_feedparser_spark.operators.rules import predicate_align


def _align(spark, a_rows, b_rows, **kw):
    schema = "subj string, pred string, obj string"
    out = predicate_align(
        spark.createDataFrame(a_rows, schema),
        spark.createDataFrame(b_rows, schema),
        **kw,
    ).collect()
    return {(r["pred_a"], r["pred_b"]): r for r in out}


def test_identical_extension_scores_one(spark):
    a = [("x", "p", "y"), ("u", "p", "v")]
    b = [("x", "q", "y"), ("u", "q", "v")]
    got = _align(spark, a, b)
    r = got[("p", "q")]
    assert (r["n_joint"], r["n_a"], r["n_b"], r["jaccard"]) == (2, 2, 2, 1.0)


def test_partial_overlap_jaccard(spark):
    a = [("x", "p", "y"), ("u", "p", "v"), ("w", "p", "z")]
    b = [("x", "q", "y"), ("m", "q", "n")]
    got = _align(spark, a, b)
    # joint 1, union 3 + 2 - 1 = 4
    assert got[("p", "q")]["jaccard"] == 0.25


def test_disjoint_pairs_emit_nothing(spark):
    got = _align(spark, [("x", "p", "y")], [("a", "q", "b")])
    assert got == {}


def test_min_overlap_filters(spark):
    a = [("x", "p", "y"), ("u", "p", "v")]
    b = [("x", "q", "y"), ("m", "q", "n")]
    assert _align(spark, a, b, min_overlap=2) == {}
    assert ("p", "q") in _align(spark, a, b, min_overlap=1)


def test_duplicate_assertions_collapse(spark):
    # the same (subj, pred, obj) asserted twice is one extensional pair
    a = [("x", "p", "y"), ("x", "p", "y")]
    b = [("x", "q", "y")]
    r = _align(spark, a, b)[("p", "q")]
    assert (r["n_a"], r["n_joint"], r["jaccard"]) == (1, 1, 1.0)


def test_multiple_vocabulary_pairs_scored_independently(spark):
    a = [("x", "p1", "y"), ("u", "p2", "v")]
    b = [("x", "q1", "y"), ("u", "q2", "v"), ("x", "q2", "y")]
    got = _align(spark, a, b)
    assert got[("p1", "q1")]["jaccard"] == 1.0
    assert got[("p2", "q2")]["jaccard"] == 0.5  # joint 1, union 1+2-1
    assert got[("p1", "q2")]["jaccard"] == 0.5
    assert ("p2", "q1") not in got
