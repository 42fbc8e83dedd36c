"""Per-document term salience (operators/text_analysis.py term_salience)."""

import pytest

from node_feedparser_spark.operators.text_analysis import term_salience


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = term_salience(df, **kw).collect()
    return {
        (r["doc_id"], r["rank"]): (r["token"], r["cnt"], r["first_idx"],
                                   r["salience"])
        for r in out
    }


def test_frequency_beats_position_and_position_breaks_even_counts(spark):
    # 'alpha' appears twice (first at 1), 'bravo' once at 0, 'zulu' once at 3
    got = _run(spark, ["bravo alpha zulu alpha"], top_k=3)
    assert got[(0, 1)][0] == "alpha"   # 2 * (1 + 1/2)   = 3.0
    assert got[(0, 2)][0] == "bravo"   # 1 * (1 + 1/1)   = 2.0
    assert got[(0, 3)][0] == "zulu"    # 1 * (1 + 1/3)   = 1.333333
    assert got[(0, 1)] == ("alpha", 2, 1, 3.0)
    assert got[(0, 3)][3] == pytest.approx(4 / 3, abs=1e-6)


def test_stopwords_and_empties_excluded(spark):
    got = _run(spark, ["the the the widget  and of to"], top_k=3)
    toks = {v[0] for v in got.values()}
    assert toks == {"widget"}


def test_tie_breaks_are_lexicographic(spark):
    # both tokens: cnt 1 at pos 0/1? make identical salience: two docs
    got = _run(spark, ["mango apple mango apple"], top_k=2)
    # mango: 2*(1+1/1)=4, apple: 2*(1+1/2)=3 — distinct; now force a tie:
    got2 = _run(spark, ["x y"], top_k=2)
    # x: 1*(1+1)=2, y: 1*(1+1/2)=1.5 — still distinct. true tie needs same
    # cnt and first_idx -> impossible within a doc; assert ordering stable
    assert got[(0, 1)][0] == "mango" and got[(0, 2)][0] == "apple"
    assert got2[(0, 1)][0] == "x" and got2[(0, 2)][0] == "y"


def test_top_k_limits_per_doc(spark):
    got = _run(spark, ["a1 b2 c3 d4 e5 f6"], top_k=3)
    assert len(got) == 3
