"""Unit semantics for operators/rules.py on tiny synthetic graphs:
the max_pairs celebrity guard actually bites, the PCA denominator
diverges from the standard one exactly per the AMIE definition, and
predicate_stats' functionality / dominant-prefix tie-break are pinned."""

import pytest

from node_feedparser_spark.operators.rules import mine_path_rules, predicate_stats


def _rule_graph(spark):
    rows = (
        [("x1", "p1", "hub"), ("x2", "p1", "hub"), ("x3", "p1", "hub")]
        + [("hub", "p2", "y1"), ("hub", "p2", "y2"), ("hub", "p2", "y3")]
        + [("x1", "p3", "y1"), ("x1", "p3", "y2"), ("x2", "p3", "y1")]
    )
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rule_stats_and_pca_divergence(spark):
    t = _rule_graph(spark)
    out = mine_path_rules(t, min_support=1, max_pairs=9).collect()
    assert len(out) == 1
    r = out[0].asDict()
    # body = 3 x's times 3 y's through hub; head holds for 3 of the 9
    assert (r["p1"], r["p2"], r["p3"]) == ("p1", "p2", "p3")
    assert r["support"] == 3 and r["n_body"] == 9 and r["n_head"] == 3
    assert r["conf_std"] == pytest.approx(3 / 9)
    # only x1, x2 assert ANY p3 fact -> PCA denominator is 6, not 9
    assert r["conf_pca"] == pytest.approx(3 / 6)
    assert r["head_coverage"] == pytest.approx(1.0)
    assert r["conf_pca"] > r["conf_std"]


def test_max_pairs_guard_bites(spark):
    t = _rule_graph(spark)
    # hub's in(p1)=3 times out(p2)=3 = 9 > 8: the whole connecting node
    # is dropped BEFORE the join, so no rule survives
    assert mine_path_rules(t, min_support=1, max_pairs=8).count() == 0


def test_duplicate_triples_count_once(spark):
    t = _rule_graph(spark)
    dup = t.unionAll(t)
    a = {tuple(r) for r in mine_path_rules(t, min_support=1, max_pairs=9).collect()}
    b = {tuple(r) for r in mine_path_rules(dup, min_support=1, max_pairs=9).collect()}
    assert a == b


def test_predicate_stats_semantics(spark):
    rows = [
        ("a1", "f", "b1"),
        ("a1", "f", "b1"),  # duplicate assertion collapses
        ("a2", "f", "b2"),
        ("a1", "g", "b1"),
        ("a1", "g", "b2"),
        ("c1", "g", "b1"),
        ("a1", "h", "b1"),
        ("c1", "h", "b2"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r["pred"]: r.asDict() for r in predicate_stats(t).collect()}

    f = got["f"]
    assert f["n_triples"] == 2 and f["n_subj"] == 2 and f["n_obj"] == 2
    assert f["functionality"] == pytest.approx(1.0)
    assert f["inv_functionality"] == pytest.approx(1.0)
    assert (f["domain_prefix"], f["range_prefix"]) == ("a", "b")
    assert f["domain_share"] == pytest.approx(1.0)

    g = got["g"]
    assert g["n_triples"] == 3 and g["n_subj"] == 2
    assert g["functionality"] == pytest.approx(2 / 3, abs=1e-6)
    assert g["domain_prefix"] == "a"
    assert g["domain_share"] == pytest.approx(2 / 3, abs=1e-6)

    # equal-count prefixes: tie breaks to the lexically smallest
    h = got["h"]
    assert h["domain_prefix"] == "a"
    assert h["domain_share"] == pytest.approx(0.5)


def test_schema_summary_patterns_shares_and_duplicate_collapse(spark):
    from node_feedparser_spark.operators.rules import schema_summary

    rows = [
        # pred 'p': 3 c->n patterns (one duplicated) + 1 c->r pattern
        ("c1", "p", "n1"), ("c1", "p", "n1"), ("c2", "p", "n1"),
        ("c3", "p", "n2"), ("c1", "p", "r1"),
        # pred 'q': single pattern, share 1.0
        ("s1", "q", "p9"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r["pred"], r["subj_type"], r["obj_type"]): (
            r["n_triples"], r["n_subjects"], r["n_objects"], r["share"]
        )
        for r in schema_summary(df).collect()
    }
    assert got == {
        # duplicate (c1,p,n1) collapses: 3 distinct c->n triples
        ("p", "c", "n"): (3, 3, 2, 0.75),
        ("p", "c", "r"): (1, 1, 1, 0.25),
        ("q", "s", "p"): (1, 1, 1, 1.0),
    }


def test_schema_summary_share_sums_to_one_per_pred(spark):
    from node_feedparser_spark.operators.rules import schema_summary

    rows = [(f"c{i}", "p", f"{'nor'[i % 3]}{i}") for i in range(9)]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = schema_summary(df).collect()
    # shares are 6-dp rounded, so the sum can be off by 5e-7 per pattern
    # (3 x round(1/3, 6) = 0.999999)
    assert abs(sum(r["share"] for r in out) - 1.0) <= 5e-7 * len(out)
