"""t_closeness_violations: hand-computed total-variation distances with
absent-domain mass, strict-inequality boundary, NULL-sensitive domain
value, single-class zero distance, pure-Python parity on a seeded random
table, and argument validation."""

import decimal
import random
from fractions import Fraction

import pytest

from node_feedparser_spark.operators.profile import t_closeness_violations


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, s string")


def _by_class(df):
    return {r.g: (r.n, r.tv_distance) for r in df.collect()}


def _tv_python(rows):
    """Exact-fraction reference: tv per class over the global domain."""
    classes, global_counts = {}, {}
    for g, s in rows:
        classes.setdefault(g, {}).setdefault(s, 0)
        classes[g][s] += 1
        global_counts[s] = global_counts.get(s, 0) + 1
    n = len(rows)
    out = {}
    for g, cnts in classes.items():
        n_c = sum(cnts.values())
        tv = sum(
            abs(Fraction(cnts.get(s, 0), n_c) - Fraction(ns, n))
            for s, ns in global_counts.items()
        ) / 2
        out[g] = (n_c, tv)
    return out


def test_hand_computed_distances_and_absent_mass(spark):
    # g1 = 2xA only (B, C absent from the class: absent mass must count);
    # g2 = uniform over {A,B,C}; global = 4A,2B,2C -> q = (1/2,1/4,1/4):
    # tv(g1) = 1/2*(1/2 + 1/4 + 1/4) = 0.5
    # tv(g2) = 1/2*(|1/3-1/2| + 2*|1/3-1/4|) = 1/6
    rows = [("g1", "A")] * 2 + [
        ("g2", s) for s in ["A", "A", "B", "B", "C", "C"]
    ]
    got = _by_class(
        t_closeness_violations(_df(spark, rows), ["g"], "s", t=0.2)
    )
    assert got == {"g1": (2, 0.5)}
    # lower t: both classes violate
    got_low = _by_class(
        t_closeness_violations(_df(spark, rows), ["g"], "s", t=0.1)
    )
    assert got_low == {"g1": (2, 0.5), "g2": (6, 0.166667)}


def test_boundary_is_strict(spark):
    rows = [("g1", "A")] * 2 + [
        ("g2", s) for s in ["A", "A", "B", "B", "C", "C"]
    ]
    # tv(g1) is exactly 0.5: a class AT the bound passes
    got = _by_class(
        t_closeness_violations(_df(spark, rows), ["g"], "s", t=0.5)
    )
    assert got == {}


def test_null_sensitive_is_its_own_domain_value(spark):
    # g1 all-NULL vs g2 all-A: each class is maximally far from the
    # 50/50 global mix -> tv = 0.5 for both
    rows = [("g1", None)] * 2 + [("g2", "A")] * 2
    got = _by_class(
        t_closeness_violations(_df(spark, rows), ["g"], "s", t=0.4)
    )
    assert got == {"g1": (2, 0.5), "g2": (2, 0.5)}


def test_single_class_has_zero_distance(spark):
    rows = [("g1", "A"), ("g1", "B"), ("g1", "B")]
    got = _by_class(
        t_closeness_violations(_df(spark, rows), ["g"], "s", t=0.001)
    )
    assert got == {}


def test_parity_with_exact_fraction_reference(spark):
    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(6)}", f"s{rng.randrange(4)}")
        for _ in range(400)
    ]
    def _r6(tv):  # Spark F.round is HALF_UP; Python round() is banker's
        return float(
            (
                decimal.Decimal(tv.numerator) / decimal.Decimal(tv.denominator)
            ).quantize(decimal.Decimal("0.000001"), decimal.ROUND_HALF_UP)
        )

    want = {
        g: (n_c, _r6(tv))
        for g, (n_c, tv) in _tv_python(rows).items()
        if _r6(tv) > 0.05
    }
    got = _by_class(
        t_closeness_violations(_df(spark, rows), ["g"], "s", t=0.05)
    )
    assert got == want


def test_validation():
    with pytest.raises(ValueError):
        t_closeness_violations(None, [], "s", t=0.2)
    with pytest.raises(ValueError):
        t_closeness_violations(None, ["g"], "s", t=0.0)
    with pytest.raises(ValueError):
        t_closeness_violations(None, ["g"], "s", t=1.0)
    with pytest.raises(ValueError):
        t_closeness_violations(None, ["g"], "g", t=0.2)
