"""truth_fusion semantics on hand-built conflicting claims."""

import pytest

from node_feedparser_spark.operators.fusion import truth_fusion


def _rows(df):
    return {
        (r["subj"], r["pred"]): (r["obj"], r["confidence"], r["n_sources"])
        for r in df.collect()
    }


def test_majority_wins_and_counts_sources(spark):
    claims = spark.createDataFrame(
        [
            ("e1", "color", "red", "s1"),
            ("e1", "color", "red", "s2"),
            ("e1", "color", "blue", "s3"),
        ],
        ["subj", "pred", "obj", "source"],
    )
    out = _rows(truth_fusion(claims, n_iter=2))
    obj, conf, n = out[("e1", "color")]
    assert obj == "red" and n == 2
    assert conf > 0.5


def test_repeated_assertion_is_one_vote(spark):
    # s1 shouts "blue" three times; s2+s3 say "red" once each -> red wins
    claims = spark.createDataFrame(
        [
            ("e1", "color", "blue", "s1"),
            ("e1", "color", "blue", "s1"),
            ("e1", "color", "blue", "s1"),
            ("e1", "color", "red", "s2"),
            ("e1", "color", "red", "s3"),
        ],
        ["subj", "pred", "obj", "source"],
    )
    obj, _, n = _rows(truth_fusion(claims))[("e1", "color")]
    assert obj == "red" and n == 2


def test_trust_iteration_breaks_symmetric_tie(spark):
    # e1 is a 1-1 tie between s1 and s2.  s1 agrees with the corpus
    # consensus on e2/e3 (majority claims), s2 is always the lone
    # dissenter -> after one trust update s1 outranks s2 and e1 resolves
    # to s1's value, which a pure vote could only tie-break lexically
    # (and 'z' > 'a' would then LOSE: the win is trust, not the
    # tie-break).
    claims = []
    for ent in ("e2", "e3"):
        claims += [
            (ent, "p", "good", "s1"),
            (ent, "p", "good", "s4"),
            (ent, "p", "good", "s5"),
            (ent, "p", "bad", "s2"),
        ]
    claims += [("e1", "p", "z_from_s1", "s1"), ("e1", "p", "a_from_s2", "s2")]
    df = spark.createDataFrame(claims, ["subj", "pred", "obj", "source"])
    out = _rows(truth_fusion(df, n_iter=2))
    assert out[("e1", "p")][0] == "z_from_s1"


def test_deterministic_tiebreak_on_obj(spark):
    claims = spark.createDataFrame(
        [("e1", "p", "b", "s1"), ("e1", "p", "a", "s2")],
        ["subj", "pred", "obj", "source"],
    )
    # perfectly symmetric -> equal confidence -> obj asc wins
    assert _rows(truth_fusion(claims))[("e1", "p")][0] == "a"


def test_one_row_per_subject_pred(spark):
    claims = spark.createDataFrame(
        [
            ("e1", "p", "x", "s1"),
            ("e1", "q", "y", "s1"),
            ("e2", "p", "x", "s2"),
            ("e2", "p", "y", "s3"),
        ],
        ["subj", "pred", "obj", "source"],
    )
    out = truth_fusion(claims)
    assert out.count() == 3
    assert out.select("subj", "pred").distinct().count() == 3


def test_confidences_sum_to_one_per_fact(spark):
    # internal invariant via public output: a fact with a single claimed
    # value has confidence exactly 1.0 regardless of source trust
    claims = spark.createDataFrame(
        [
            ("e1", "p", "only", "s1"),
            ("e1", "p", "only", "s2"),
            ("e2", "p", "v1", "s1"),
            ("e2", "p", "v2", "s2"),
        ],
        ["subj", "pred", "obj", "source"],
    )
    out = _rows(truth_fusion(claims, n_iter=3))
    assert out[("e1", "p")][1] == pytest.approx(1.0)
