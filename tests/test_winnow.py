"""Winnowing fingerprints (text_analysis.winnow_fingerprints): equality
with a pure-Python reimplementation, the MOSS matching guarantee, density
bound, short-doc contracts."""

import hashlib

import pytest

from node_feedparser_spark.operators.text_analysis import winnow_fingerprints

K, W = 5, 4


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    toks = text.split(" ")
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [text]
    hs = [_h60(g) for g in grams]
    out = set()
    n_starts = max(len(hs) - w + 1, 1)
    for s in range(n_starts):
        window = hs[s : s + w]
        m = min(window)
        pos = s + window.index(m)  # leftmost minimal = (hash, pos) min
        out.add((pos + 1, m))
    return out


DOCS = [
    (1, "a b c d e f g h i j k l m n o p"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "x y z w"),                      # < k tokens -> whole-text gram
    (4, "one two three four five"),      # exactly k tokens -> 1 gram
    (5, "rep rep rep rep rep rep rep rep rep rep"),  # all-equal hashes
    (6, ""),
]


@pytest.fixture(scope="module")
def fp(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    return got


def test_matches_pure_python(fp):
    for doc_id, text in DOCS:
        assert fp[doc_id] == _py_winnow(text), doc_id


def test_matching_guarantee(spark):
    # two docs sharing a run of >= w+k-1 tokens share >= 1 fingerprint hash
    shared = " ".join(f"s{i}" for i in range(W + K - 1))
    df = spark.createDataFrame(
        [(1, "p1 p2 p3 " + shared + " q1 q2"), (2, shared + " r1 r2 r3 r4")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    h1 = {r.fp_hash for r in rows if r.doc_id == 1}
    h2 = {r.fp_hash for r in rows if r.doc_id == 2}
    assert h1 & h2


def test_density_bound(fp):
    # at most one fingerprint per window start; at least one per ~w grams
    for doc_id, text in DOCS:
        toks = text.split(" ")
        n_grams = max(len(toks) - K + 1, 1) if len(toks) >= K else 1
        n_starts = max(n_grams - W + 1, 1)
        assert 1 <= len(fp[doc_id]) <= n_starts


def test_short_docs_single_fingerprint(fp):
    # < k tokens, == k tokens, empty text: exactly one fingerprint each
    assert len(fp[3]) == 1 and fp[3] == {(1, _h60("x y z w"))}
    assert len(fp[4]) == 1 and fp[4] == {(1, _h60("one two three four five"))}
    assert len(fp[6]) == 1 and fp[6] == {(1, _h60(""))}


def test_all_equal_hashes_leftmost(fp):
    # all grams identical -> every window's min is its leftmost position:
    # every valid start is a fingerprint
    assert fp[5] == {(i, _h60(" ".join(["rep"] * K))) for i in range(1, 4)}


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)
