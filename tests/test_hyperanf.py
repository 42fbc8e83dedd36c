"""hyperanf: max-merge of HLL registers is EXACTLY the sketch of the
union, so the neighborhood-function estimate at radius t must equal
hll_distinct over the explicitly enumerated ball membership — zero
approximation slack.  Plus directionality and radius monotonicity."""

from pyspark.sql import functions as F

from node_feedparser_spark.operators.graph_algo import hyperanf
from node_feedparser_spark.operators.sketch import hll_distinct


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_id string, dst_id string")


def _balls(pairs, rounds):
    """Exact BFS balls along OUT edges, per node per radius."""
    adj = {}
    nodes = set()
    for s, d in pairs:
        nodes.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
    out = {}
    ball = {v: {v} for v in nodes}
    for t in range(1, rounds + 1):
        ball = {
            v: ball[v] | set().union(*(ball[u] for u in adj.get(v, ())), set())
            for v in nodes
        }
        for v in nodes:
            out[(v, t)] = set(ball[v])
    return out


def test_matches_hll_of_explicit_ball(spark):
    # directed path + branch: a->b->c, a->d, c->e
    pairs = [("a", "b"), ("b", "c"), ("a", "d"), ("c", "e")]
    got = {
        (r["node"], r["radius"]): (
            r["n_registers"], r["n_zero_buckets"], r["hll_estimate"]
        )
        for r in hyperanf(_edges(spark, pairs), rounds=3, p=7).collect()
    }
    balls = _balls(pairs, 3)
    members = [
        (f"{v}#{t}", m) for (v, t), s in balls.items() for m in s
    ]
    mdf = spark.createDataFrame(members, "grp string, member string")
    want_rows = hll_distinct(mdf, ["grp"], "member", p=7).collect()
    want = {}
    for r in want_rows:
        v, t = r["grp"].rsplit("#", 1)
        want[(v, int(t))] = (
            r["n_registers"], r["n_zero_buckets"], r["hll_estimate"]
        )
    assert got == want


def test_direction_and_monotonicity(spark):
    pairs = [("a", "b"), ("b", "c")]
    rows = hyperanf(_edges(spark, pairs), rounds=2, p=7).collect()
    est = {(r["node"], r["radius"]): r["hll_estimate"] for r in rows}
    regs = {(r["node"], r["radius"]): r["n_registers"] for r in rows}
    # c has no out-edges: its ball is always {c}
    assert regs[("c", 1)] == 1 and regs[("c", 2)] == 1
    # a reaches b at t=1 and c at t=2: register counts grow (no collision
    # at 3 nodes / 128 buckets is overwhelmingly likely; pin it exactly)
    assert regs[("a", 1)] == 2 and regs[("a", 2)] == 3
    # estimates are monotone in radius for every node
    for v in ("a", "b", "c"):
        assert est[(v, 2)] >= est[(v, 1)]


def test_parallel_edges_and_self_loops_are_noops(spark):
    base = [("a", "b"), ("b", "c")]
    noisy = base + [("a", "b"), ("a", "a"), ("b", "c")]
    clean = hyperanf(_edges(spark, base), rounds=2, p=7).collect()
    dirty = hyperanf(_edges(spark, noisy), rounds=2, p=7).collect()
    assert sorted(map(tuple, clean), key=str) == sorted(
        map(tuple, dirty), key=str
    )
