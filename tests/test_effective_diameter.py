"""effective_diameter: the global N(t)-threshold statistic read off the
same HyperANF sketches harmonic_centrality consumes — checked by hand
recomputation from hyperanf's own output (the fixed-point sum contract),
plus shape cases a graph analyst can verify mentally (clique -> 1,
long path -> truncation horizon)."""

import math

from pyspark.sql import functions as F

from node_feedparser_spark.operators.graph_algo import (
    effective_diameter,
    hyperanf,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_id string, dst_id string")


def _und(pairs):
    return pairs + [(b, a) for a, b in pairs]


def test_matches_hand_recomputation_from_hyperanf(spark):
    # branchy directed graph; rounds=3 exercises the generic loop
    pairs = [("a", "b"), ("b", "c"), ("a", "d"), ("c", "e"), ("e", "a")]
    rounds, p = 3, 7
    anf = hyperanf(_edges(spark, pairs), rounds=rounds, p=p).toPandas()
    m = float(1 << p)
    b0_fp = int(round(round(m * math.log(m / (m - 1.0)), 4) * 10000))
    n_nodes = (anf["radius"] == 1).sum()
    nf_fp = {0: int(n_nodes) * b0_fp}
    for t in range(1, rounds + 1):
        ests = anf.loc[anf["radius"] == t, "hll_estimate"]
        nf_fp[t] = int(sum(int(round(e * 10000)) for e in ests))
    want_eff = min(t for t in nf_fp if nf_fp[t] * 10 >= 9 * nf_fp[rounds])

    got = effective_diameter(
        _edges(spark, pairs), rounds=rounds, p=p
    ).toPandas()
    assert len(got) == rounds + 1
    assert set(got["radius"]) == set(range(rounds + 1))
    for _, row in got.iterrows():
        t = int(row["radius"])
        assert row["nf"] == nf_fp[t] / 10000.0
        assert row["frac_of_max"] == round(nf_fp[t] / nf_fp[rounds], 6)
        assert int(row["effective_diameter"]) == want_eff


def test_clique_effective_diameter_is_one(spark):
    # K5 undirected: every radius-1 ball is already the whole graph, so
    # N(1) == N(2) and the 0.9 threshold is met at t = 1
    nodes = ["a", "b", "c", "d", "e"]
    pairs = [(x, y) for x in nodes for y in nodes if x < y]
    got = effective_diameter(_edges(spark, _und(pairs)), rounds=2).toPandas()
    assert set(got["effective_diameter"]) == {1}
    fr = dict(zip(got["radius"], got["frac_of_max"]))
    assert fr[1] == 1.0 and fr[2] == 1.0 and fr[0] < 0.9


def test_long_path_hits_truncation_horizon(spark):
    # undirected 12-node path truncated at rounds=2: balls keep growing
    # well past the horizon, so the threshold is only met at t = rounds
    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)]
    got = effective_diameter(_edges(spark, _und(pairs)), rounds=2).toPandas()
    assert set(got["effective_diameter"]) == {2}
    fr = dict(zip(got["radius"], got["frac_of_max"]))
    assert fr[0] < fr[1] < fr[2] == 1.0


def test_threshold_is_exact_integer_arithmetic(spark):
    # threshold 1/1 demands nf_fp == max exactly: on the clique that is
    # t=1 (identical registers), on the path only t=rounds
    clique_nodes = ["a", "b", "c"]
    cp = [(x, y) for x in clique_nodes for y in clique_nodes if x < y]
    got = effective_diameter(
        _edges(spark, _und(cp)), rounds=2, threshold_num=1, threshold_den=1
    ).toPandas()
    assert set(got["effective_diameter"]) == {1}
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    got2 = effective_diameter(
        _edges(spark, _und(path)), rounds=2, threshold_num=1, threshold_den=1
    ).toPandas()
    assert set(got2["effective_diameter"]) == {2}
