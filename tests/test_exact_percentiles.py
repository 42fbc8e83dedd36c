"""exact_percentiles: type-1 (ceil(q*n), 1-indexed, no interpolation)
selection semantics on hand multisets — odd/even sizes, heavy ties,
single element — plus numpy parity on a seeded random workload and
validation."""

import math
import random

import numpy as np
import pytest

from node_feedparser_spark.operators.profile import exact_percentiles


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def _by_key(df):
    return {r.g: (r.n, r.p25, r.p50, r.p75) for r in df.collect()}


def _type1(sorted_vals, num, den):
    n = len(sorted_vals)
    pos = (n * num + den - 1) // den  # ceil(n*num/den), 1-indexed
    return sorted_vals[max(pos, 1) - 1]


def test_odd_size_median_is_middle(spark):
    rows = [("a", v) for v in (5, 1, 9, 3, 7)]
    # sorted: 1,3,5,7,9; pos25=ceil(5/4)=2 -> 3; pos50=3 -> 5; pos75=4 -> 7
    assert _by_key(exact_percentiles(_df(spark, rows), ["g"], "v")) == {
        "a": (5, 3, 5, 7)
    }


def test_even_size_lower_median(spark):
    rows = [("a", v) for v in (1, 2, 3, 4)]
    # pos50 = ceil(4/2) = 2 -> value 2 (LOWER median, no interpolation)
    assert _by_key(exact_percentiles(_df(spark, rows), ["g"], "v")) == {
        "a": (4, 1, 2, 3)
    }


def test_heavy_ties(spark):
    rows = [("a", 1)] * 9 + [("a", 100)]
    # p25/p50/p75 positions 3,5,8 all land inside the run of 1s
    assert _by_key(exact_percentiles(_df(spark, rows), ["g"], "v")) == {
        "a": (10, 1, 1, 1)
    }


def test_single_element(spark):
    assert _by_key(exact_percentiles(_df(spark, [("a", 42)]), ["g"], "v")) == {
        "a": (1, 42, 42, 42)
    }


def test_numpy_parity_randomized(spark):
    rng = random.Random(47)
    rows = []
    for g in ("a", "b", "c", "d"):
        for _ in range(rng.randrange(10, 200)):
            rows.append((g, rng.randrange(0, 30)))
    vals = {}
    for g, v in rows:
        vals.setdefault(g, []).append(v)
    want = {
        g: (
            len(vs),
            _type1(sorted(vs), 1, 4),
            _type1(sorted(vs), 1, 2),
            _type1(sorted(vs), 3, 4),
        )
        for g, vs in vals.items()
    }
    assert _by_key(exact_percentiles(_df(spark, rows), ["g"], "v")) == want


def test_validation():
    with pytest.raises(ValueError):
        exact_percentiles(None, [], "v")
