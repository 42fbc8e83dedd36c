"""Multinomial NB (operators/classify.py): hand-computed posteriors,
argmax/tie-break, resubstitution accuracy on the real corpus, DuckDB
emitter equality."""

import math

import pytest

from node_feedparser_spark.operators.classify import (
    naive_bayes_score,
    naive_bayes_sql,
)

ROWS = [
    (1, "en", "the cat sat"),
    (2, "en", "the dog sat"),
    (3, "fr", "le chat dort"),
    (4, "fr", "le chien dort"),
    (5, "en", ""),  # tokenless -> dropped from scoring
]


def _hand_nb():
    """Independent add-1 NB on ROWS (docs 1-4)."""
    docs = [(i, c, t.split(" ")) for i, c, t in ROWS if t]
    classes = sorted({c for _, c, _ in docs})
    vocab = {w for _, _, ws in docs for w in ws}
    v = len(vocab)
    n = len(ROWS)  # priors over ALL docs (incl. tokenless), like the op
    counts = {c: {} for c in classes}
    tot = {c: 0 for c in classes}
    n_cls = {c: 0 for c in classes}
    for _, c, ws in docs:
        for w in ws:
            counts[c][w] = counts[c].get(w, 0) + 1
            tot[c] += 1
    for _, c, _ in ROWS:
        n_cls[c] = n_cls.get(c, 0) + 1
    out = {}
    for i, actual, ws in docs:
        best = None
        for c in classes:
            s = round(math.log(n_cls[c] / n), 6)
            ll = sum(
                math.log((counts[c].get(w, 0) + 1) / (tot[c] + v))
                for w in ws
            )
            score = round(ll + s, 6)
            if best is None or score > best[1] or (
                score == best[1] and c < best[0]
            ):
                best = (c, score)
        out[i] = best
    return out


@pytest.fixture(scope="module")
def small(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    return {r.doc_id: r for r in naive_bayes_score(df).collect()}


def test_hand_posteriors(small):
    want = _hand_nb()
    assert set(small) == set(want)  # doc 5 dropped
    for i, (c, s) in want.items():
        assert small[i].pred == c
        assert small[i].score == pytest.approx(s, abs=2e-6)


def test_resubstitution_predicts_labels(small):
    # tiny disjoint-vocab corpus: NB must recover every label
    for i, actual, text in ROWS:
        if text:
            assert small[i].pred == actual


def test_real_corpus_accuracy(spark):
    # the synthetic corpus draws the SAME token soup for every lang label
    # (verified by inspection), so lang carries almost no textual signal;
    # resubstitution NB can only beat the 1/5 chance floor via sampling
    # noise it memorizes — assert it does that, not fantasy accuracy
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = naive_bayes_score(docs).collect()
    acc = sum(r.pred == r.lang for r in rows) / len(rows)
    assert acc > 0.25
    assert len(rows) == docs.filter("text <> ''").count()


def test_matches_duckdb_emitter(spark):
    import duckdb

    df = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.pred, r.score)
        for r in naive_bayes_score(df).collect()
    }
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = {
        int(i): (p, s)
        for i, _l, p, s in con.execute(naive_bayes_sql()).fetchall()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)
