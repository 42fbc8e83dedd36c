"""Property-path evaluation (operators/paths.py): brute-force pure-Python
parity on a seeded random graph, hand-computed cases for every construct,
AST validation, and the Catalyst branch-pruning plan assertion."""

import random

import pytest

from node_feedparser_spark.operators.paths import eval_path

from pyspark.sql import functions as F


# ---------------------------------------------------------------- spec ---
def spec_eval(triples: list[tuple[str, str, str]], expr) -> set[tuple[str, str]]:
    """Independent pure-Python evaluator over (subj, pred, obj) tuples."""
    op = expr[0]
    if op == "pred":
        return {(s, o) for s, p, o in triples if p == expr[1]}
    if op == "inv":
        return {(d, s) for s, d in spec_eval(triples, expr[1])}
    if op == "seq":
        acc = spec_eval(triples, expr[1])
        for sub in expr[2:]:
            nxt = spec_eval(triples, sub)
            acc = {(a, d) for a, b in acc for c, d in nxt if b == c}
        return acc
    if op == "alt":
        out: set = set()
        for sub in expr[1:]:
            out |= spec_eval(triples, sub)
        return out
    if op == "upto":
        step = spec_eval(triples, expr[1])
        acc, cur = set(step), set(step)
        for _ in range(expr[2] - 1):
            cur = {(a, d) for a, b in cur for c, d in step if b == c}
            acc |= cur
        return acc
    if op in ("plus", "star"):
        step = spec_eval(triples, expr[1])
        acc = set(step)
        while True:
            new = {(a, d) for a, b in acc for c, d in step if b == c} - acc
            if not new:
                break
            acc |= new
        if op == "star":
            terms = {s for s, _, _ in triples} | {o for _, _, o in triples}
            acc |= {(t, t) for t in terms}
        return acc
    raise AssertionError(expr)


def run(spark, triples, expr):
    df = spark.createDataFrame(triples, ["subj", "pred", "obj"])
    rows = eval_path(df, expr).collect()
    got = [(r["src"], r["dst"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate endpoint pairs emitted"
    return set(got)


HAND = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("c", "knows", "d"),
    ("a", "likes", "c"),
    ("b", "likes", "d"),
    ("a", "knows", "b"),  # duplicate triple: set semantics must absorb it
]


def test_pred_leaf_dedupes(spark):
    assert run(spark, HAND, ("pred", "knows")) == {
        ("a", "b"), ("b", "c"), ("c", "d")}


def test_inv(spark):
    assert run(spark, HAND, ("inv", ("pred", "likes"))) == {
        ("c", "a"), ("d", "b")}


def test_seq(spark):
    # knows/knows: two-hop pairs
    assert run(spark, HAND, ("seq", ("pred", "knows"), ("pred", "knows"))) == {
        ("a", "c"), ("b", "d")}
    # knows/likes
    assert run(spark, HAND, ("seq", ("pred", "knows"), ("pred", "likes"))) == {
        ("a", "d")}


def test_alt(spark):
    assert run(spark, HAND, ("alt", ("pred", "knows"), ("pred", "likes"))) == {
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")}


def test_upto(spark):
    # knows{1,3} = 1-, 2- and 3-hop knows pairs
    assert run(spark, HAND, ("upto", ("pred", "knows"), 3)) == {
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d"), ("a", "d")}
    # k=1 degenerates to the leaf
    assert run(spark, HAND, ("upto", ("pred", "knows"), 1)) == run(
        spark, HAND, ("pred", "knows"))


def test_nested(spark):
    # ^(knows/likes) == ^likes/^knows
    lhs = run(spark, HAND, ("inv", ("seq", ("pred", "knows"), ("pred", "likes"))))
    rhs = run(spark, HAND, ("seq", ("inv", ("pred", "likes")),
                            ("inv", ("pred", "knows"))))
    assert lhs == rhs == {("d", "a")}


def test_plus_transitive_closure(spark):
    # knows+ over the a->b->c->d chain: all forward pairs
    assert run(spark, HAND, ("plus", ("pred", "knows"))) == {
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("a", "c"), ("b", "d"), ("a", "d")}


def test_plus_on_cycle_terminates(spark):
    cyc = [("x", "p", "y"), ("y", "p", "z"), ("z", "p", "x")]
    got = run(spark, cyc, ("plus", ("pred", "p")))
    assert got == spec_eval(cyc, ("plus", ("pred", "p")))
    assert ("x", "x") in got  # cycles close onto themselves


def test_star_adds_zero_length_for_every_term(spark):
    got = run(spark, HAND, ("star", ("pred", "likes")))
    # every term of the GRAPH gets (t, t) — even terms the step never
    # touches (d appears only via knows)
    for t in ("a", "b", "c", "d"):
        assert (t, t) in got
    assert got == spec_eval(HAND, ("star", ("pred", "likes")))


def test_plus_max_iters_guard(spark):
    chain = [(f"v{i}", "p", f"v{i+1}") for i in range(6)]
    df = spark.createDataFrame(chain, ["subj", "pred", "obj"])
    with pytest.raises(RuntimeError, match="did not converge"):
        eval_path(df, ("plus", ("pred", "p")), max_iters=2)
    # and a sufficient bound succeeds with the full closure
    assert run(spark, chain, ("plus", ("pred", "p"))) == spec_eval(
        chain, ("plus", ("pred", "p")))


def test_plus_empty_step(spark):
    assert run(spark, HAND, ("plus", ("pred", "nosuch"))) == set()


RANDOM_EXPRS = [
    ("seq", ("pred", "p0"), ("pred", "p1")),
    ("alt", ("pred", "p0"), ("inv", ("pred", "p2"))),
    ("seq", ("alt", ("pred", "p0"), ("pred", "p1")), ("inv", ("pred", "p2"))),
    ("upto", ("pred", "p0"), 3),
    ("upto", ("alt", ("pred", "p0"), ("pred", "p1")), 2),
    ("seq", ("upto", ("pred", "p0"), 2), ("pred", "p2"),
     ("inv", ("pred", "p1"))),
    ("plus", ("pred", "p0")),
    ("plus", ("alt", ("pred", "p0"), ("inv", ("pred", "p1")))),
    ("seq", ("plus", ("pred", "p0")), ("pred", "p1")),
]


@pytest.mark.parametrize("expr", RANDOM_EXPRS)
def test_random_graph_parity(spark, expr):
    rng = random.Random(1234)
    nodes = [f"v{i}" for i in range(30)]
    triples = sorted(
        {
            (rng.choice(nodes), f"p{rng.randrange(3)}", rng.choice(nodes))
            for _ in range(260)
        }
    )
    assert run(spark, triples, expr) == spec_eval(triples, expr)


@pytest.mark.parametrize(
    "bad",
    [
        (),
        ("nope", "x"),
        ("pred",),
        ("pred", ""),
        ("pred", "a", "b"),
        ("inv", ("pred", "a"), ("pred", "b")),
        ("seq", ("pred", "a")),
        ("alt", ("pred", "a")),
        ("upto", ("pred", "a"), 0),
        ("upto", ("pred", "a"), "2"),
        ("seq", ("pred", "a"), ("bogus",)),
        ("plus",),
        ("plus", ("pred", "a"), ("pred", "b")),
        ("star", ("pred", "")),
    ],
)
def test_malformed_ast_rejected(spark, bad):
    df = spark.createDataFrame(HAND, ["subj", "pred", "obj"])
    with pytest.raises(ValueError):
        eval_path(df, bad)


def test_union_branch_pruning(spark):
    """A ('pred', p) leaf over a union-of-literal-pred projections must be
    constant-folded so non-matching branches vanish from the optimized
    plan — the property that makes leaves read only their own predicate's
    rows at 100 TB."""
    a = spark.createDataFrame([("x", "y")], ["s", "o"]).select(
        F.col("s").alias("subj"), F.lit("keep").alias("pred"),
        F.col("o").alias("obj"))
    b = spark.createDataFrame([("u", "v")], ["s", "o"]).select(
        F.col("s").alias("subj"), F.lit("drop").alias("pred"),
        F.col("o").alias("obj"))
    tri = a.unionByName(b)
    out = eval_path(tri, ("pred", "keep"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan, plan
    assert [(r["src"], r["dst"]) for r in out.collect()] == [("x", "y")]


def test_no_python_nodes(spark):
    df = spark.createDataFrame(HAND, ["subj", "pred", "obj"])
    expr = ("seq", ("upto", ("alt", ("pred", "knows"), ("pred", "likes")), 2),
            ("inv", ("pred", "knows")))
    plan = eval_path(df, expr)._jdf.queryExecution().optimizedPlan().toString()
    assert "Python" not in plan and "mapInPandas" not in plan


def test_associativity_smoke(spark):
    """seq is n-ary left-fold: ((a/b)/c) == (a/(b/c)) on endpoint sets."""
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(20)]
    triples = sorted(
        {
            (rng.choice(nodes), f"p{rng.randrange(3)}", rng.choice(nodes))
            for _ in range(150)
        }
    )
    flat = run(spark, triples,
               ("seq", ("pred", "p0"), ("pred", "p1"), ("pred", "p2")))
    nested = run(spark, triples,
                 ("seq", ("pred", "p0"),
                  ("seq", ("pred", "p1"), ("pred", "p2"))))
    assert flat == nested == spec_eval(
        triples, ("seq", ("pred", "p0"), ("pred", "p1"), ("pred", "p2")))
