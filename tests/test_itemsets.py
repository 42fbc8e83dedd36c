"""frequent_itemsets: hand-computed A-priori levels, exact integer
relative-support boundary, duplicate-row collapse, monotonicity
(sub-itemsets of every frequent set are frequent), brute-force parity on
seeded random baskets, and validation."""

import itertools
import random

import pytest

from node_feedparser_spark.operators.itemsets import frequent_itemsets


def _df(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def _sets(df):
    return {
        tuple(x for x in (r.k, r.i1, r.i2, r.i3) if x is not None): r.support
        for r in df.collect()
    }


def _brute(rows, num, den, max_size=3):
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    n = len(baskets)
    out = {}
    for k in range(1, max_size + 1):
        items = sorted({i for s in baskets.values() for i in s})
        for combo in itertools.combinations(items, k):
            s = sum(1 for v in baskets.values() if set(combo) <= v)
            if s * den >= num * n:
                out[(k, *combo)] = s
    return out


def test_hand_computed_levels(spark):
    # 4 baskets; {a,b} in 3, {a,b,c} in 2; d appears once
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"), (3, "b"),
        (4, "a"), (4, "d"),
    ]
    got = _sets(frequent_itemsets(_df(spark, rows), 1, 2))  # >= 50%
    assert got == {
        (1, "a"): 4, (1, "b"): 3, (1, "c"): 2,
        (2, "a", "b"): 3, (2, "a", "c"): 2, (2, "b", "c"): 2,
        (3, "a", "b", "c"): 2,
    }


def test_support_boundary_is_exact_integer(spark):
    # 3 baskets, item in exactly 1: at num/den = 1/3 the item is
    # frequent (3*1 >= 1*3); at 334/1000 it is not (1000 < 1002)
    rows = [(1, "x"), (2, "y"), (3, "z")]
    got = _sets(frequent_itemsets(_df(spark, rows), 1, 3, max_size=1))
    assert got == {(1, "x"): 1, (1, "y"): 1, (1, "z"): 1}
    got2 = _sets(frequent_itemsets(_df(spark, rows), 334, 1000, max_size=1))
    assert got2 == {}


def test_duplicate_rows_collapse(spark):
    rows = [(1, "a"), (1, "a"), (1, "a"), (2, "a")]
    got = _sets(frequent_itemsets(_df(spark, rows), 1, 1, max_size=1))
    assert got == {(1, "a"): 2}  # baskets, not occurrences


def test_monotonicity_and_brute_force_parity(spark):
    rng = random.Random(11)
    rows = [
        (b, f"i{rng.randrange(8)}")
        for b in range(60)
        for _ in range(rng.randrange(1, 6))
    ]
    got = _sets(frequent_itemsets(_df(spark, rows), 1, 10))
    assert got == _brute(rows, 1, 10)
    # monotonicity: every sub-itemset of a frequent set is frequent
    # with support at least as large
    for key, s in got.items():
        k, items = key[0], key[1:]
        for sub in itertools.combinations(items, k - 1):
            if sub:
                assert got[(k - 1, *sub)] >= s


def test_max_size_levels(spark):
    rows = [(1, "a"), (1, "b"), (1, "c")]
    assert set(_sets(frequent_itemsets(_df(spark, rows), 1, 1, max_size=1))) \
        == {(1, "a"), (1, "b"), (1, "c")}
    got2 = _sets(frequent_itemsets(_df(spark, rows), 1, 1, max_size=2))
    assert (3, "a", "b", "c") not in got2 and (2, "a", "b") in got2


def test_validation():
    with pytest.raises(ValueError):
        frequent_itemsets(None, 0, 10)
    with pytest.raises(ValueError):
        frequent_itemsets(None, 1, 10, max_size=4)
