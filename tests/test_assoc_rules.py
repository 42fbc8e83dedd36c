"""association_rules: hand-checked confidence/lift, the exact integer
confidence gate, all eight rule splits from a frequent triple, and
brute-force parity on seeded random baskets."""

import itertools
import random

import pytest

from node_feedparser_spark.operators.itemsets import association_rules


def _df(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def _rules(df):
    return {
        (r.antecedent, r.consequent): (r.support, r.confidence, r.lift)
        for r in df.collect()
    }


def _brute(rows, snum, sden, cnum, cden):
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    n = len(baskets)

    def supp(combo):
        return sum(1 for v in baskets.values() if set(combo) <= v)

    items = sorted({i for s in baskets.values() for i in s})
    freq = {}
    for k in (1, 2, 3):
        for combo in itertools.combinations(items, k):
            s = supp(combo)
            if s * sden >= snum * n:
                freq[combo] = s
    out = {}
    for combo, s in freq.items():
        if len(combo) == 1:
            continue
        for asz in range(1, len(combo)):
            for ante in itertools.combinations(combo, asz):
                cons = tuple(x for x in combo if x not in ante)
                sx, sy = freq.get(ante), freq.get(cons)
                if sx is None or sy is None or s * cden < cnum * sx:
                    continue
                out[(",".join(ante), ",".join(cons))] = (
                    s,
                    _fp6(s, sx),
                    _fp6(s * n, sx * sy),
                )
    return out


def _fp6(num, den):
    """The operator's exact 6-dp HALF_UP fixed point: no float rounding."""
    return ((2 * num * 1000000 + den) // (2 * den)) / 1000000.0


def test_hand_confidence_and_lift(spark):
    # 4 baskets: {a,b} x3, {a} x1 -> rule a->b: conf 3/4, lift
    # (3*4)/(4*3) = 1.0; rule b->a: conf 1.0, lift 1.0... make b
    # appear alone once more so lift differs
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"),
        (5, "b"),
    ]
    got = _rules(association_rules(_df(spark, rows), 1, 5, 1, 2))
    # n=5, supp(a)=4, supp(b)=4, supp(ab)=3
    assert got[("a", "b")] == (3, 0.75, round(3 * 5 / 16, 6))
    assert got[("b", "a")] == (3, 0.75, round(3 * 5 / 16, 6))


def test_confidence_gate_is_exact(spark):
    # supp(ab)=1, supp(a)=2: confidence exactly 1/2 passes at 1/2
    # (1*2 >= 1*2) and fails at 501/1000
    rows = [(1, "a"), (1, "b"), (2, "a")]
    keep = _rules(association_rules(_df(spark, rows), 1, 10, 1, 2))
    assert ("a", "b") in keep
    drop = _rules(association_rules(_df(spark, rows), 1, 10, 501, 1000))
    assert ("a", "b") not in drop
    assert ("b", "a") in drop  # confidence 1.0


def test_all_eight_splits_from_triple(spark):
    rows = [(b, i) for b in (1, 2) for i in ("a", "b", "c")]
    got = _rules(association_rules(_df(spark, rows), 1, 1, 1, 100))
    ants = set(got)
    assert {
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
        ("b", "c"), ("c", "b"),
        ("a", "b,c"), ("b", "a,c"), ("c", "a,b"),
        ("a,b", "c"), ("a,c", "b"), ("b,c", "a"),
    } <= ants
    assert got[("a,b", "c")] == (2, 1.0, 1.0)


def test_brute_force_parity(spark):
    rng = random.Random(23)
    rows = [
        (b, f"i{rng.randrange(7)}")
        for b in range(50)
        for _ in range(rng.randrange(1, 6))
    ]
    got = _rules(association_rules(_df(spark, rows), 1, 10, 1, 4))
    want = _brute(rows, 1, 10, 1, 4)
    assert got == want


def test_validation():
    with pytest.raises(ValueError):
        association_rules(None, 1, 10, 0, 5)
    with pytest.raises(ValueError):
        association_rules(None, 0, 10, 1, 5)
