"""skew_profile + edit_distance_join: hand arithmetic, SymSpell blocking
completeness, transposition rejection, count-ratio gate."""

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.fuzzy import (
    deletion_keys,
    edit_distance_join,
)
from node_feedparser_spark.operators.profile import skew_profile


# ------------------------------------------------------------ skew_profile


def test_skew_profile_hand(spark):
    rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = {r.key: r for r in skew_profile(df, "k", n_partitions=10, top_k=3).collect()}
    assert got["hot"].n == 80 and got["hot"].share == 0.8
    assert got["hot"].partition_widths == 8.0
    assert got["hot"].suggested_salt == 8
    assert got["warm"].suggested_salt == 2  # ceil(0.15*10)
    assert got["cold"].suggested_salt == 1
    assert [k for k, r in sorted(got.items(), key=lambda kv: kv[1].rank)] == [
        "hot", "warm", "cold",
    ]


def test_skew_profile_topk_and_ties(spark):
    rows = [(c,) for c in "aabbcc"]
    df = spark.createDataFrame(rows, "k string")
    got = skew_profile(df, "k", n_partitions=4, top_k=2).collect()
    assert [r.key for r in got] == ["a", "b"]  # tie on n -> key asc


def test_skew_profile_validation(spark):
    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError):
        skew_profile(df, "k", n_partitions=0)


# ------------------------------------------------------- edit_distance_join


def test_deletion_keys(spark):
    keys = spark.range(1).select(deletion_keys("'abc'")).first()[0]
    assert sorted(keys) == sorted(["bc", "ac", "ab", "abc"])


def _docs(spark, words):
    return spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")


def test_substitution_insertion_deletion_found(spark):
    docs = _docs(
        spark,
        ["cat", "bat",            # substitution at FIRST char
         "account", "acount",     # deletion
         "spark", "sparkk",       # insertion
         "zebra"],                # no partner
    )
    got = {(r.w1, r.w2): r.dist for r in edit_distance_join(docs).collect()}
    assert got == {
        ("bat", "cat"): 1,
        ("account", "acount"): 1,
        ("spark", "sparkk"): 1,
    }


def test_transposition_rejected(spark):
    # 'ab'/'ba' share deletion keys but levenshtein = 2 -> verified away
    docs = _docs(spark, ["ab", "ba"])
    assert edit_distance_join(docs).count() == 0


def test_blocking_completeness_bruteforce(spark):
    # every distance-1 pair a brute-force scan finds, the join finds
    words = ["abc", "abd", "ab", "abcd", "xbc", "aXc", "zzz", "zz", "z"]
    docs = _docs(spark, words)
    got = {(r.w1, r.w2) for r in edit_distance_join(docs).collect()}

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    want = {
        (min(a, b), max(a, b))
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if lev(a, b) <= 1
    }
    assert got == want


def test_count_ratio_gate(spark):
    # NB: 'teh'/'the' would NOT qualify — transposition is levenshtein 2
    docs = _docs(spark, ["the"] * 50 + ["tha"] * 2 + ["foo"] * 5 + ["fooo"] * 5)
    all_pairs = {
        (r.w1, r.w2) for r in edit_distance_join(docs).collect()
    }
    gated = {
        (r.w1, r.w2)
        for r in edit_distance_join(docs, max_count_ratio=0.2).collect()
    }
    assert ("tha", "the") in all_pairs and ("foo", "fooo") in all_pairs
    assert gated == {("tha", "the")}  # 2/50 <= 0.2; 5/5 > 0.2


# ------------------------------------------------------ k_anonymity audit


def test_k_anonymity_hand(spark):
    from node_feedparser_spark.operators.profile import (
        k_anonymity_violations,
    )

    rows = (
        [("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "x")] * 1
        + [("b", "y")] * 9
    )
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    got = {
        (r.c1, r.c2): r.n
        for r in k_anonymity_violations(df, ["c1", "c2"], k=5).collect()
    }
    assert got == {("a", "y"): 2, ("b", "x"): 1}


def test_k_anonymity_validation(spark):
    from node_feedparser_spark.operators.profile import (
        k_anonymity_violations,
    )

    df = spark.createDataFrame([("a",)], "c1 string")
    import pytest as _pt

    with _pt.raises(ValueError):
        k_anonymity_violations(df, [], k=5)
    with _pt.raises(ValueError):
        k_anonymity_violations(df, ["c1"], k=1)
