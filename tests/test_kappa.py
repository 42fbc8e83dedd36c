"""cohen_kappa: textbook hand values, perfect/zero/negative agreement,
the pe=1 NULL contract, NULL-label sentinel, grouped vs ungrouped, and
sklearn-formula parity (exact fractions) on seeded random labels."""

import decimal
import random
from fractions import Fraction

from node_feedparser_spark.operators.cluster_eval import cohen_kappa


def _df(spark, rows, with_group=False):
    if with_group:
        return spark.createDataFrame(rows, "g string, a string, b string")
    return spark.createDataFrame(rows, "a string, b string")


def _fp6(frac):
    num, den = frac.numerator, frac.denominator
    s = -1 if num < 0 else 1
    return s * ((2 * abs(num) * 1000000 + den) // (2 * den)) / 1000000.0


def _kappa_frac(pairs):
    n = len(pairs)
    conf = {}
    for a, b in pairs:
        conf[(a, b)] = conf.get((a, b), 0) + 1
    diag = sum(c for (a, b), c in conf.items() if a == b)
    labels = {x for p in pairs for x in p}
    rc = sum(
        sum(c for (a, _), c in conf.items() if a == l)
        * sum(c for (_, b), c in conf.items() if b == l)
        for l in labels
    )
    if n * n - rc == 0:
        return n, None
    return n, Fraction(n * diag - rc, n * n - rc)


def test_textbook_example(spark):
    # classic 2x2: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    pairs = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    n, k = _kappa_frac(pairs)
    got = cohen_kappa(_df(spark, pairs), "a", "b").collect()[0]
    assert got.n == 50
    assert got.kappa == _fp6(k)  # = 0.4 exactly for these counts
    assert got.kappa == 0.4


def test_perfect_and_negative_agreement(spark):
    perfect = [("x", "x"), ("y", "y"), ("x", "x"), ("y", "y")]
    assert cohen_kappa(_df(spark, perfect), "a", "b").collect()[0].kappa == 1.0
    # total systematic disagreement on a balanced 2-label set -> -1
    anti = [("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")]
    assert cohen_kappa(_df(spark, anti), "a", "b").collect()[0].kappa == -1.0


def test_degenerate_pe1_is_null(spark):
    rows = [("x", "x"), ("x", "x")]
    got = cohen_kappa(_df(spark, rows), "a", "b").collect()[0]
    assert got.kappa is None and got.po == 1.0 and got.pe == 1.0


def test_null_label_is_a_category(spark):
    rows = [("x", None), ("x", "x")]
    n, k = _kappa_frac([("x", "\x00null"), ("x", "x")])
    got = cohen_kappa(_df(spark, rows), "a", "b").collect()[0]
    assert got.kappa == _fp6(k)


def test_grouped_and_random_parity(spark):
    rng = random.Random(53)
    rows = []
    per_group = {}
    for g in ("g1", "g2", "g3"):
        for _ in range(200):
            a = f"l{rng.randrange(4)}"
            b = a if rng.random() < 0.6 else f"l{rng.randrange(4)}"
            rows.append((g, a, b))
            per_group.setdefault(g, []).append((a, b))
    got = {
        r.g: (r.n, r.kappa)
        for r in cohen_kappa(
            _df(spark, rows, True), "a", "b", ["g"]
        ).collect()
    }
    want = {}
    for g, pairs in per_group.items():
        n, k = _kappa_frac(pairs)
        want[g] = (n, None if k is None else _fp6(k))
    assert got == want
