"""BPE (operators/bpe.py): Spark train/encode vs an INDEPENDENT pure-Python
Sennrich implementation (different data structures on purpose), degenerate
runs, encode/merge invariants, pair-count kernel."""

import collections
import re

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    encode_word,
    merge_word,
    train_merges,
    word_counts,
)


# --- independent reference (list-of-lists representation, regex-free) ----


def _ref_train(texts, n_merges):
    freq = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    table = [[list(w) + [END], c] for w, c in sorted(freq.items())]
    merges = []
    for _ in range(n_merges):
        stats = collections.Counter()
        for syms, c in table:
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        top = max(stats.values())
        best = sorted(p for p, c in stats.items() if c == top)[0]
        merges.append(best)
        for row in table:
            syms = row[0]
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            row[0] = out
    return merges


def _ref_encode(word, merges):
    syms = list(word) + [END]
    changed = True
    while changed:
        changed = False
        for a, b in merges:  # rank order; restart after each applied merge
            for i in range(len(syms) - 1):
                if syms[i] == a and syms[i + 1] == b:
                    out, j = [], 0
                    while j < len(syms):
                        if (
                            j + 1 < len(syms)
                            and syms[j] == a
                            and syms[j + 1] == b
                        ):
                            out.append(a + b)
                            j += 2
                        else:
                            out.append(syms[j])
                            j += 1
                    syms = out
                    changed = True
                    break
            if changed:
                break
    return syms


CORPUS = [
    "low low low low low lower lower newest newest newest newest newest newest widest widest widest",
    "the cat sat on the mat the cat",
    "a a a a aaaa . . . . . .",
    "",
]


def test_train_matches_reference():
    vocab = collections.Counter(
        w for t in CORPUS for w in t.split(" ") if w
    )
    assert train_merges(dict(vocab), 20) == _ref_train(CORPUS, 20)


def test_merge_word_degenerate_runs():
    # greedy L2R non-overlap: 'a a a' -> ['aa', 'a']; 'a a a a' -> 2 merges
    assert merge_word(["a", "a", "a"], ("a", "a")) == ["aa", "a"]
    assert merge_word(["a", "a", "a", "a"], ("a", "a")) == ["aa", "aa"]
    assert merge_word(["x"], ("a", "a")) == ["x"]


def test_encode_word_matches_reference():
    merges = _ref_train(CORPUS, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lowest", "newest", "wider", "aaaa", ".", "zzz"]:
        assert encode_word(w, ranks) == _ref_encode(w, merges), w


def test_encode_roundtrip_property():
    merges = _ref_train(CORPUS, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "unseen", "aaaa", "...."]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END  # lossless
        assert toks[-1].endswith(END)


def test_spark_train_and_encode(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=20, top_words=1000)
    assert merges == _ref_train(CORPUS, 20)
    enc = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(CORPUS):
        words = [w for w in t.split(" ") if w]
        want = [tok for w in words for tok in encode_word(w, ranks)]
        assert enc[i].bpe_tokens == want
        assert enc[i].n_words == len(words)
        assert enc[i].n_bpe_tokens == len(want)
        # compression: BPE never produces more symbols than chars+1/word
        assert enc[i].n_bpe_tokens <= sum(len(w) + 1 for w in words)


def test_spark_train_on_real_slice(spark):
    # real corpus slice: Spark-learned merges == reference on same texts
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(40)
    )
    texts = [r.text for r in docs.select("text").collect()]
    assert bpe_train(docs, n_merges=16, top_words=100_000) == _ref_train(
        texts, 16
    )


def test_pair_counts_kernel(spark):
    df = spark.createDataFrame(
        [(0, "ab ab b")], "doc_id long, text string"
    )
    got = {
        (r.l_sym, r.r_sym): r.pair_count
        for r in bpe_pair_counts(word_counts(df)).collect()
    }
    assert got == {("a", "b"): 2, ("b", END): 3}


def test_top_words_cap_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    a = bpe_train(df, n_merges=8, top_words=5)
    b = bpe_train(df, n_merges=8, top_words=5)
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)
