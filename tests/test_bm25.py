"""BM25: hand-computed scores, ranking properties, edge cases."""

import math

import pytest

from node_feedparser_spark.operators.text_analysis import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_hand_computed_single_term(spark):
    rows = [
        (1, "spark spark spark"),          # tf=3, dl=3
        (2, "spark flink"),                # tf=1, dl=2
        (3, "flink beam storm heron"),     # no match, dl=4
    ]
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_docs(spark, rows), [("q", "spark")], k=5).collect()
    }
    avgdl = 9 / 3
    assert out[1] == round(_bm25(3, 2, 3, 3, avgdl), 6)
    assert out[2] == round(_bm25(1, 2, 3, 2, avgdl), 6)
    assert 3 not in out


def test_rarer_term_scores_higher(spark):
    # 'rare' appears in 1 doc, 'common' in all: doc matching rare ranks
    # above docs matching only common for a query with both terms
    rows = [
        (1, "common rare"),
        (2, "common alpha"),
        (3, "common beta"),
    ]
    out = bm25_topk(_docs(spark, rows), [("q", "common rare")], k=3).collect()
    best = min(out, key=lambda r: r["rank"])
    assert best["doc_id"] == 1


def test_length_normalization_prefers_shorter_doc(spark):
    # same tf of the query term; longer doc is penalized via dl/avgdl
    rows = [
        (1, "term " + "filler " * 20),
        (2, "term filler"),
    ]
    out = {r["doc_id"]: r["rank"] for r in bm25_topk(
        _docs(spark, rows), [("q", "term")], k=2).collect()}
    assert out[2] == 1 and out[1] == 2


def test_topk_cuts_and_ranks_contiguously(spark):
    rows = [(i, "tok " * i) for i in range(1, 9)]
    out = bm25_topk(_docs(spark, rows), [("q", "tok")], k=3).collect()
    assert sorted(r["rank"] for r in out) == [1, 2, 3]


def test_multiple_queries_independent(spark):
    rows = [(1, "apple banana"), (2, "cherry date")]
    out = bm25_topk(
        _docs(spark, rows), [("qa", "apple"), ("qc", "cherry")], k=5
    ).collect()
    got = {(r["query_id"], r["doc_id"]) for r in out}
    assert got == {("qa", 1), ("qc", 2)}


def test_duplicate_query_terms_count_once(spark):
    rows = [(1, "x y"), (2, "x z")]
    a = bm25_topk(_docs(spark, rows), [("q", "x x x")], k=5).collect()
    b = bm25_topk(_docs(spark, rows), [("q", "x")], k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_validation(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        bm25_topk(df, [], k=5)
    with pytest.raises(ValueError):
        bm25_topk(df, [("q", "a")], k=0)
