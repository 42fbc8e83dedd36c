"""HITS, modularity, power-law MLE, G2 collocations (operators/graph_algo.py)."""

import math

import pytest

from node_feedparser_spark.operators.graph_algo import (
    g2_edges,
    hits,
    modularity,
    powerlaw_alpha,
)


def test_hits_hand_computed_bipartite(spark):
    # 1->10, 2->10, 2->11, 3->11; two integer-exact iterations, L1 norm:
    # h2 = (3, 6, 3, 0, 0) and a2 = (0, 0, 0, 9, 9)
    e = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 11), (3, 11)], "src long, dst long"
    )
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e).collect()}
    assert got == {
        1: (0.25, 0.0),
        2: (0.5, 0.0),
        3: (0.25, 0.0),
        10: (0.0, 0.5),
        11: (0.0, 0.5),
    }


def test_hits_parallel_edges_and_cycles(spark):
    # duplicate edges collapse; a 2-cycle gives symmetric scores
    e = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e).collect()}
    assert got[1] == (0.5, 0.5) and got[2] == (0.5, 0.5)


def test_modularity_two_triangles_bridge(spark):
    # textbook: two triangles joined by one edge, partitioned naturally:
    # Q = 2 * (3/7 - (7/14)^2) = 5/14
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    assign = spark.createDataFrame(
        [(n, "A") for n in (1, 2, 3)] + [(n, "B") for n in (4, 5, 6)],
        "node long, community string",
    )
    rows = {r["community"]: r for r in modularity(e, assign).collect()}
    for c in ("A", "B"):
        assert rows[c]["n_in"] == 3 and rows[c]["d_tot"] == 7
        assert rows[c]["q_c"] == pytest.approx(3 / 7 - 0.25, abs=1e-6)
    assert sum(r["q_c"] for r in rows.values()) == pytest.approx(5 / 14, abs=1e-5)


def test_modularity_unassigned_node_is_own_community(spark):
    e = spark.createDataFrame([(1, 2), (2, 7)], "src long, dst long")
    assign = spark.createDataFrame(
        [(1, "A"), (2, "A")], "node long, community string"
    )
    rows = {r["community"]: r for r in modularity(e, assign).collect()}
    assert rows["7"]["n_in"] == 0 and rows["7"]["d_tot"] == 1
    assert rows["A"]["n_in"] == 1 and rows["A"]["d_tot"] == 3


def test_powerlaw_alpha_matches_formula(spark):
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "src long, dst long"
    )
    r = powerlaw_alpha(e, dmin=2).collect()[0]
    s = 1 * math.log(3 / 1.5) + 2 * math.log(2 / 1.5)
    assert r["n_tail"] == 3 and r["dmin"] == 2
    assert r["alpha"] == pytest.approx(1 + 3 / s, abs=1e-6)


def test_g2_matches_contingency_formula_and_min_count(spark):
    rows = [("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y"),
            ("b3", "x"), ("b4", "y"), ("b5", "x"), ("b5", "z")]
    df = spark.createDataFrame(rows, "basket_id string, item_id string")
    out = {(r["item_a"], r["item_b"]): r for r in g2_edges(df).collect()}
    assert set(out) == {("x", "y")}  # (x,z) has n_ab=1 < min_count
    # N=5, n_x=4, n_y=3, k11=2, k12=2, k21=1, k22=0
    want = 2 * (
        2 * math.log(2 * 5 / (4 * 3))
        + 2 * math.log(2 * 5 / (4 * 2))
        + 1 * math.log(1 * 5 / (1 * 3))
    )
    assert out[("x", "y")]["n_ab"] == 2
    assert out[("x", "y")]["g2"] == pytest.approx(want, abs=1e-6)


def test_g2_mega_basket_cap(spark):
    rows = [("big", f"i{k}") for k in range(5)] + [
        ("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y")]
    df = spark.createDataFrame(rows, "basket_id string, item_id string")
    out = g2_edges(df, max_basket=4).collect()
    assert {(r["item_a"], r["item_b"]) for r in out} == {("x", "y")}
