"""sorted_neighborhood_pairs: merge/purge blocking — pinned against a
pure-Python replay of the same total order + gap filter + shingle
Jaccard, plus the structural cases that prove the scalable rank is the
GLOBAL rank (bucket-boundary and block-boundary pairs) and the contract
that SNM misses near-dups the sort key separates."""

import re

import pytest

from node_feedparser_spark.operators.dedupe import sorted_neighborhood_pairs


def _key(text, key_len=24):
    return re.sub(r"[^a-z0-9]", "", text.lower())[:key_len]


def _shingles(text, k=3):
    toks = text.split(" ")
    if len(toks) < k:
        return {text}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _naive(rows, window, threshold, k=3, key_len=24):
    order = sorted(rows, key=lambda r: (_key(r[1], key_len), r[0]))
    out = set()
    for i, (ida, ta) in enumerate(order):
        for j in range(i + 1, min(i + window, len(order))):
            idb, tb = order[j]
            sa, sb = _shingles(ta, k), _shingles(tb, k)
            jac = round(len(sa & sb) / len(sa | sb), 6)
            if jac >= threshold:
                out.add((min(ida, idb), max(ida, idb), j - i, jac))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _got(df):
    return {
        (r.doc_a, r.doc_b, r.rank_gap, r.jaccard) for r in df.collect()
    }


def test_matches_naive_replay_with_noise_corpus(spark):
    # clusters of near-identical texts + unrelated noise, shuffled ids
    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "alpha beta gamma delta epsilon zeta eta theta kappa",
        "nu xi omicron pi rho sigma tau upsilon",
        "nu xi omicron pi rho sigma tau phi",
        "completely different text about spark shuffles here",
        "zz unrelated tail words one two three four five",
    ]
    rows = [(i * 7 % 13, t) for i, t in enumerate(base)]
    got = _got(
        sorted_neighborhood_pairs(_df(spark, rows), window=3, threshold=0.5)
    )
    assert got == _naive(rows, window=3, threshold=0.5)
    assert got  # non-vacuous


def test_bucket_boundary_pair_found(spark):
    # adjacent in the TOTAL order but in different prefix buckets
    # (bucket_len=2: 'az...' vs 'b0...') — only a correct global rank
    # (offset prefix-sum) finds this pair
    rows = [
        (1, "az same words in this document exactly"),
        (2, "b0 same words in this document exactly"),
        (3, "zz totally different trailing content words here"),
    ]
    got = _got(
        sorted_neighborhood_pairs(
            _df(spark, rows), window=2, threshold=0.5, bucket_len=2
        )
    )
    assert (1, 2) in {(a, b) for a, b, _, _ in got}


def test_block_boundary_and_window_miss(spark):
    # five docs in known key order: k0..k4 identical tails; window=2
    # pairs only rank-adjacent docs; (k0,k2) is a true near-dup pair but
    # OUT of window — the documented SNM miss
    rows = [(i, f"k{i} shared tail words go here always same") for i in range(5)]
    got = _got(
        sorted_neighborhood_pairs(_df(spark, rows), window=2, threshold=0.4)
    )
    pairs = {(a, b) for a, b, _, _ in got}
    assert pairs == {(0, 1), (1, 2), (2, 3), (3, 4)}
    assert all(g == 1 for _, _, g, _ in got)


def test_wider_window_adds_the_missed_pair(spark):
    rows = [(i, f"k{i} shared tail words go here always same") for i in range(5)]
    got = _got(
        sorted_neighborhood_pairs(_df(spark, rows), window=3, threshold=0.4)
    )
    assert got == _naive(rows, window=3, threshold=0.4)
    assert {(a, b) for a, b, _, _ in got} == {
        (0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4),
    }


def test_window_must_be_at_least_two(spark):
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(_df(spark, [(1, "x")]), window=1)
