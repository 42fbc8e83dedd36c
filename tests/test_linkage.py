"""Fellegi-Sunter linkage: weight math, decisions, blocking, determinism."""

import math

import pytest

from node_feedparser_spark.operators.linkage import (
    DOC_FIELDS,
    FieldParams,
    fs_link_documents,
    fs_score_pairs,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, ["doc_a", "doc_b", "agree_len", "agree_prefix", "agree_shingle"]
    )


def test_score_is_sum_of_log_ratios(spark):
    # hand-computed: all-agree and all-disagree scores
    agree = sum(f.agree_weight for f in DOC_FIELDS)
    disagree = sum(f.disagree_weight for f in DOC_FIELDS)
    out = {
        (r["doc_a"]): (r["score"], r["decision"])
        for r in fs_score_pairs(
            _pairs(spark, [(1, 2, True, True, True), (3, 4, False, False, False)]),
            DOC_FIELDS,
        ).collect()
    }
    assert out[1][0] == round(agree, 6)
    assert out[3][0] == round(disagree, 6)
    assert out[1][1] == "match" and out[3][1] == "non_match"


def test_mixed_agreement_lands_in_possible_band(spark):
    # len agrees (weak evidence), text fields disagree -> inconclusive
    w = (
        DOC_FIELDS[0].agree_weight
        + DOC_FIELDS[1].disagree_weight
        + DOC_FIELDS[2].disagree_weight
    )
    row = fs_score_pairs(
        _pairs(spark, [(1, 2, True, False, False)]), DOC_FIELDS,
        upper=10.0, lower=-10.0,
    ).collect()[0]
    assert row["score"] == round(w, 6)
    assert row["decision"] == "possible"


def test_field_params_validated():
    with pytest.raises(ValueError):
        FieldParams("bad", m=0.2, u=0.5)  # u > m
    with pytest.raises(ValueError):
        FieldParams("bad", m=1.0, u=0.5)
    with pytest.raises(ValueError):
        fs_score_pairs(None, DOC_FIELDS, upper=-1.0, lower=1.0)


def test_weights_have_fs_signs():
    for f in DOC_FIELDS:
        assert f.agree_weight > 0 > f.disagree_weight
        assert math.isclose(f.agree_weight, math.log(f.m / f.u))


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def test_linkage_separates_dup_from_distinct(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", "s1", len(base)),
        (2, base + " today", "en", "s1", len(base) + 6),  # near-dup
        (3, "completely different text about spark shuffles and joins xyzzy",
         "en", "s1", 62),
        (4, base, "en", "s2", len(base)),  # other block: never paired w/ 1
    ]
    out = fs_link_documents(_docs(spark, rows)).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert by_pair[(1, 2)]["decision"] == "match"
    assert by_pair[(1, 3)]["decision"] == "non_match"
    assert (1, 4) not in by_pair and (4, 1) not in by_pair


def test_blocking_never_pairs_across_blocks(spark):
    rows = [
        (i, f"text body number {i}", "en" if i % 2 else "fr", "s", 20)
        for i in range(10)
    ]
    out = fs_link_documents(_docs(spark, rows)).collect()
    langs = {r[0]: "en" if r[0] % 2 else "fr" for r in rows}
    for r in out:
        assert langs[r["doc_a"]] == langs[r["doc_b"]]
        assert r["doc_a"] < r["doc_b"]


def test_deterministic_across_runs(spark):
    rows = [
        (i, f"some shared words plus token{i % 3}", "en", "s", 30)
        for i in range(8)
    ]
    a = sorted(map(tuple, fs_link_documents(_docs(spark, rows)).collect()))
    b = sorted(map(tuple, fs_link_documents(_docs(spark, rows)).collect()))
    assert a == b
