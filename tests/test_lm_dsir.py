"""Hand tests for unigram_lm_score and dsir_weights."""

import math

from pyspark.sql import functions as F

from node_feedparser_spark.operators.curation import dsir_weights
from node_feedparser_spark.operators.text_analysis import unigram_lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


# --------------------------------------------------------------- unigram LM


def test_unigram_lm_hand_computed(spark):
    # corpus: "a a b" + "a c" -> counts a=3 b=1 c=1, total=5, vocab=3
    docs = _docs(spark, [(1, "a a b", "en"), (2, "a c", "en")])
    out = {r["doc_id"]: r for r in unigram_lm_score(docs).collect()}
    t, v = 5, 3

    def p(c):
        return round(math.log((c + 1) / (t + v)), 9)

    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logp"] == round((p(3) + p(3) + p(1)) / 3, 4)
    assert out[2]["avg_logp"] == round((p(3) + p(1)) / 2, 4)


def test_unigram_lm_gibberish_scores_below_prose(spark):
    common = [(i, "the cat sat on the mat", "en") for i in range(10)]
    docs = _docs(spark, common + [(99, "zxqv jklm qwrt bnpd", "en")])
    out = {r["doc_id"]: r["avg_logp"] for r in unigram_lm_score(docs).collect()}
    assert out[99] < out[0]


def test_unigram_lm_rare_tokens_lower_score(spark):
    docs = _docs(spark, [(1, "a a a a", "en"), (2, "a a a rare", "en")])
    out = {r["doc_id"]: r["avg_logp"] for r in unigram_lm_score(docs).collect()}
    assert out[2] < out[1]


# --------------------------------------------------------------------- DSIR


def test_dsir_target_like_docs_rank_first(spark):
    tgt = [(i, "alpha beta gamma delta epsilon zeta", "en") for i in range(5)]
    src = [(10 + i, "uno dos tres cuatro cinco seis", "es") for i in range(5)]
    probe = [
        (100, "alpha beta gamma delta", "es"),  # en-looking text, es label
        (101, "uno dos tres cuatro", "es"),
    ]
    out = dsir_weights(
        _docs(spark, tgt + src + probe), F.col("lang") == "en", n_buckets=256
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[100]["weight"] > rows[101]["weight"]
    assert rows[100]["tgt_rank"] < rows[101]["tgt_rank"]
    # ranks are a permutation of 1..n
    assert sorted(r["tgt_rank"] for r in rows.values()) == list(
        range(1, len(rows) + 1)
    )


def test_dsir_weight_is_mean_gram_llr(spark):
    # one doc, one bigram, whole corpus = target -> llr = ln(2/2) = 0
    out = dsir_weights(
        _docs(spark, [(1, "x y", "en")]), F.col("lang") == "en"
    ).collect()
    assert len(out) == 1
    assert out[0]["n_grams"] == 1 and out[0]["weight"] == 0.0


def test_dsir_short_docs_drop(spark):
    # a 1-token doc has no bigram -> absent from the output
    out = dsir_weights(
        _docs(spark, [(1, "solo", "en"), (2, "two tokens", "en")]),
        F.col("lang") == "en",
    ).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_dsir_deterministic(spark):
    docs = _docs(
        spark,
        [(i, f"tok{i} tok{i + 1} tok{i + 2} shared words", "en" if i % 2 else "de")
         for i in range(20)],
    )
    a = sorted(map(tuple, dsir_weights(docs, F.col("lang") == "en").collect()))
    b = sorted(map(tuple, dsir_weights(docs, F.col("lang") == "en").collect()))
    assert a == b
