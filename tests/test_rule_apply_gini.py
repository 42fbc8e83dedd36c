"""rule_apply (operators/rules.py) + gini_concentration (operators/profile.py)."""

import pytest

from node_feedparser_spark.operators.profile import gini_concentration
from node_feedparser_spark.operators.rules import rule_apply


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rule_apply_infers_only_missing_heads(spark):
    t = _triples(
        spark,
        [
            ("c1", "placed", "o1"),
            ("o1", "contains", "p1"),
            ("o1", "contains", "p2"),
            ("c2", "placed", "o2"),
            ("o2", "contains", "p1"),
            ("c2", "bought", "p1"),  # already asserted -> not re-inferred
        ],
    )
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in rule_apply(t, "placed", "contains", "bought").collect()
    }
    assert got == {("c1", "bought", "p1"), ("c1", "bought", "p2")}


def test_rule_apply_distinct_over_multiple_paths(spark):
    # two different orders prove the same (c1, p1): inferred once
    t = _triples(
        spark,
        [
            ("c1", "placed", "o1"),
            ("c1", "placed", "o2"),
            ("o1", "contains", "p1"),
            ("o2", "contains", "p1"),
        ],
    )
    out = rule_apply(t, "placed", "contains", "bought").collect()
    assert len(out) == 1


def _gini(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    return gini_concentration(df).collect()[0]


def test_gini_known_values(spark):
    assert _gini(spark, [5, 5, 5, 5])["gini"] == 0.0
    assert _gini(spark, [0, 0, 0, 10])["gini"] == 0.75  # max for n=4
    r = _gini(spark, [1, 2, 3, 4])
    assert r["gini"] == pytest.approx(0.25, abs=1e-6)
    assert r["n"] == 4 and r["total"] == 10.0


def test_gini_ties_group_exactly(spark):
    # duplicated values must give the same answer as the sorted-rank formula
    vals = [1, 1, 2, 2, 10]
    r = _gini(spark, vals)
    n, s = len(vals), sum(vals)
    t = sum((i + 1) * v for i, v in enumerate(sorted(vals)))
    assert r["gini"] == pytest.approx(2 * t / (n * s) - (n + 1) / n, abs=1e-6)
