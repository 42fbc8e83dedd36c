"""Shingle-containment join (operators/dedupe.py containment_pairs):
prefix-filtered result equals the brute-force containment on every case,
and the asymmetric quote relation is caught where Jaccard misses it."""

import itertools

from node_feedparser_spark.operators.dedupe import (
    containment_pairs,
    jaccard_prefix_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _shingles(text, k=3):
    toks = text.split(" ")
    if len(toks) < k:
        return {text}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute(texts, t=0.8, k=3):
    out = {}
    for (i, a), (j, b) in itertools.permutations(enumerate(texts), 2):
        sa, sb = _shingles(a, k), _shingles(b, k)
        c = len(sa & sb) / len(sa)
        if c >= t:
            out[(i, j)] = round(c, 6)
    return out


QUOTE = "the quick brown fox jumps over the lazy dog"
ARTICLE = (
    "yesterday we observed that " + QUOTE + " and then it ran away into the "
    "deep dark forest while everyone watched in complete silence for hours"
)
TEXTS = [
    QUOTE,
    ARTICLE,
    "a completely unrelated document about spark shuffles and partitions",
    QUOTE,  # exact duplicate of 0: containment 1.0 both ways
]


def test_matches_brute_force(spark):
    got = {
        (r["src"], r["dst"]): r["containment"]
        for r in containment_pairs(_docs(spark, TEXTS)).collect()
    }
    assert got == _brute(TEXTS)


def test_quote_is_asymmetric_and_invisible_to_jaccard(spark):
    docs = _docs(spark, TEXTS)
    cont = {
        (r["src"], r["dst"]) for r in containment_pairs(docs).collect()
    }
    assert (0, 1) in cont and (1, 0) not in cont  # quote ⊂ article only
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_pairs(docs, threshold=0.7).collect()
    }
    assert (0, 1) not in jac  # Jaccard can't see the quote


def test_short_doc_single_shingle(spark):
    texts = ["tiny doc", "tiny doc plus much more text here now ok fine"]
    got = {
        (r["src"], r["dst"]): r["containment"]
        for r in containment_pairs(_docs(spark, texts)).collect()
    }
    # doc 0 shingles to the whole text {"tiny doc"}, which is not a
    # 3-gram of doc 1: brute force agrees
    assert got == _brute(texts)
