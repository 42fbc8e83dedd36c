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


def _python_match_full(rows, patterns, not_exists=None, optional=None):
    """Brute-force reference including FILTER NOT EXISTS + OPTIONAL."""

    def _matches(p, env):
        out = []
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
                out.append(trial)
        return out

    bindings = [dict()]
    for p in patterns:
        bindings = [t for env in bindings for t in _matches(p, env)]
    for p in not_exists or []:
        bindings = [env for env in bindings if not _matches(p, env)]
    all_vars = {t[1:] for p in patterns for t in p if t.startswith("?")}
    for p in optional or []:
        new_vars = {t[1:] for t in p if t.startswith("?")} - all_vars
        nxt = []
        for env in bindings:
            ms = _matches(p, env)
            if ms:
                nxt.extend(ms)
            else:
                nxt.append({**env, **{v: None for v in new_vars}})
        bindings = nxt
        all_vars |= new_vars
    vars_ = sorted(all_vars)
    return {tuple(env[v] for v in vars_) for env in bindings}


def test_not_exists_filters_bindings(spark):
    # workers who know nobody: only a3 (a1/a2 know; a3 works at c1 AND c2)
    pats = [("?p", "works_at", "?c")]
    ne = [("?p", "knows", "?z")]
    df = bgp_match(_tri(spark, TOY), pats, not_exists=ne)
    got = set(map(tuple, df.collect()))
    assert got == _python_match_full(TOY, pats, not_exists=ne) == {
        ("c1", "a3"), ("c2", "a3")}


def test_optional_extends_with_nulls(spark):
    # every company, optionally its region: c2's region exists, and a
    # company with no 'in' triple would surface NULL
    rows = TOY + [("a2", "works_at", "c3")]  # c3 has no region
    pats = [("?p", "works_at", "?c")]
    opt = [("?c", "in", "?r")]
    df = bgp_match(_tri(spark, rows), pats, optional=opt)
    assert df.columns == ["c", "p", "r"]
    got = set(map(tuple, df.collect()))
    assert got == _python_match_full(rows, pats, optional=opt)
    assert ("c3", "a2", None) in got


def test_optional_multiplies_per_match(spark):
    # SPARQL per-solution semantics: an OPTIONAL with two matches yields
    # two bindings, not one
    pats = [("?c", "in", "r1")]
    opt = [("?p", "works_at", "?c")]
    df = bgp_match(_tri(spark, TOY), pats, optional=opt)
    got = set(map(tuple, df.collect()))
    assert got == {("c1", "a2"), ("c1", "a3")}


def test_not_exists_then_optional_order(spark):
    # NOT EXISTS runs BEFORE OPTIONAL: the optional clause cannot resurrect
    # a filtered binding, and the filter never sees optional vars
    pats = [("?p", "works_at", "?c")]
    ne = [("?p", "knows", "?z")]
    opt = [("?c", "in", "?r")]
    df = bgp_match(_tri(spark, TOY), pats, not_exists=ne, optional=opt)
    got = set(map(tuple, df.collect()))
    assert got == _python_match_full(TOY, pats, not_exists=ne, optional=opt)
    assert got == {("c1", "a3", "r1"), ("c2", "a3", "r2")}


def test_unshared_clause_rejected(spark):
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(_tri(spark, TOY), [("?p", "works_at", "?c")],
                  not_exists=[("?x", "in", "?y")])
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(_tri(spark, TOY), [("?p", "works_at", "?c")],
                  optional=[("?x", "in", "?y")])
    with pytest.raises(ValueError, match="ground"):
        bgp_match(_tri(spark, TOY), [("?p", "works_at", "?c")],
                  not_exists=[("c1", "in", "r1")])


def test_random_graph_parity_full(spark):
    rng = random.Random(11)
    nodes = [f"e{i}" for i in range(12)]
    preds = ["p", "q", "r"]
    rows = sorted(
        {
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(80)
        }
    )
    cases = [
        ([("?a", "p", "?b")], [("?b", "q", "?c")], None),
        ([("?a", "p", "?b")], None, [("?b", "q", "?c")]),
        ([("?a", "p", "?b"), ("?b", "q", "?c")],
         [("?c", "r", "?d")], [("?a", "r", "?e")]),
        ([("?a", "q", "?b")], [("?a", "p", "?b")], [("?b", "r", "?z")]),
    ]
    for pats, ne, opt in cases:
        df = bgp_match(_tri(spark, rows), pats, not_exists=ne, optional=opt)
        got = set(map(tuple, df.collect()))
        want = _python_match_full(rows, pats, not_exists=ne, optional=opt)
        assert got == want, (pats, ne, opt)


def test_selectivity_order_is_constant_first(spark):
    # the most-constant pattern must seed the join order: with a constant
    # pattern present, the plan's first scan filter includes that constant.
    df = bgp_match(
        _tri(spark, TOY), [("?p", "works_at", "?c"), ("?c", "in", "r1")]
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # both pattern scans exist; the constant 'r1' appears as a literal filter
    assert "r1" in plan
