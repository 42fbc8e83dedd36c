"""bgp_match: SPARQL-style conjunctive pattern matching over triples.

Pinned against a hand-computed toy graph plus a brute-force pure-Python
matcher on a seeded random graph (the same two-face discipline as the rest
of the suite: the Spark plan must equal an independent evaluation of the
same semantics).
"""

import random

import pytest

from node_feedparser_spark.operators.bgp import bgp_match

TOY = [
    # (subj, pred, obj)
    ("a1", "knows", "a2"),
    ("a1", "knows", "a3"),
    ("a2", "knows", "a3"),
    ("a2", "works_at", "c1"),
    ("a3", "works_at", "c1"),
    ("a3", "works_at", "c2"),
    ("c1", "in", "r1"),
    ("c2", "in", "r2"),
    ("a4", "likes", "a4"),
    ("a1", "likes", "a2"),
]


def _tri(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _python_match(rows, patterns):
    """Brute-force reference: enumerate all assignments pattern-by-pattern."""
    bindings = [dict()]
    for p in patterns:
        nxt = []
        for env in bindings:
            for s, pr, o in rows:
                trial = dict(env)
                ok = True
                for term, val in zip(p, (s, pr, o)):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in trial and trial[v] != val:
                            ok = False
                            break
                        trial[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(trial)
        bindings = nxt
    vars_ = sorted({t[1:] for p in patterns for t in p if t.startswith("?")})
    return {tuple(env[v] for v in vars_) for env in bindings}


def _spark_match(spark, rows, patterns):
    df = bgp_match(_tri(spark, rows), patterns)
    return set(map(tuple, df.collect())), df.columns


def test_two_hop_with_constant(spark):
    got, cols = _spark_match(
        spark, TOY, [("?p", "works_at", "?c"), ("?c", "in", "r1")]
    )
    assert cols == ["c", "p"]
    assert got == {("c1", "a2"), ("c1", "a3")}


def test_three_pattern_chain(spark):
    pats = [("?x", "knows", "?y"), ("?y", "works_at", "?c"), ("?c", "in", "?r")]
    got, cols = _spark_match(spark, TOY, pats)
    assert cols == ["c", "r", "x", "y"]
    assert got == _python_match(TOY, pats)


def test_repeated_var_within_pattern(spark):
    got, cols = _spark_match(spark, TOY, [("?x", "likes", "?x")])
    assert cols == ["x"]
    assert got == {("a4",)}


def test_distinct_semantics(spark):
    # duplicate triples collapse: bindings are a set
    got, _ = _spark_match(spark, TOY + TOY, [("?p", "works_at", "?c")])
    assert got == _python_match(TOY, [("?p", "works_at", "?c")])


def test_disconnected_cross_join(spark):
    pats = [("?x", "in", "r1"), ("?y", "in", "r2")]
    got, _ = _spark_match(spark, TOY, pats)
    assert got == {("c1", "c2")}


def test_ground_pattern_rejected(spark):
    with pytest.raises(ValueError, match="ground"):
        bgp_match(_tri(spark, TOY), [("a1", "knows", "a2")])
    with pytest.raises(ValueError, match="empty"):
        bgp_match(_tri(spark, TOY), [])


def test_random_graph_parity(spark):
    rng = random.Random(7)
    nodes = [f"e{i}" for i in range(12)]
    preds = ["p", "q", "r"]
    rows = sorted(
        {
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(80)
        }
    )
    pattern_sets = [
        [("?a", "p", "?b"), ("?b", "q", "?c")],
        [("?a", "p", "?b"), ("?b", "p", "?a")],
        [("?a", "q", "?b"), ("?a", "r", "?c"), ("?c", "p", "?d")],
        [("?a", "p", "e1")],
    ]
    for pats in pattern_sets:
        got, _ = _spark_match(spark, rows, pats)
        assert got == _python_match(rows, pats), pats


def test_selectivity_order_is_constant_first(spark):
    # the most-constant pattern must seed the join order: with a constant
    # pattern present, the plan's first scan filter includes that constant.
    df = bgp_match(
        _tri(spark, TOY), [("?p", "works_at", "?c"), ("?c", "in", "r1")]
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # both pattern scans exist; the constant 'r1' appears as a literal filter
    assert "r1" in plan
