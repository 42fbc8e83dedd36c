"""clustering_coeff / assortativity / reciprocity (operators/graph_algo.py)."""

import pytest

from node_feedparser_spark.operators.graph_algo import (
    assortativity,
    clustering_coeff,
    reciprocity,
)


def test_clustering_coeff_triangle_with_tail(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src_id long, dst_id long"
    )
    got = {r["node"]: (r["deg"], r["triangles"], r["coeff"])
           for r in clustering_coeff(e).collect()}
    assert got == {
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (3, 1, pytest.approx(1 / 3, abs=1e-6)),
        4: (1, 0, 0.0),
    }


def test_assortativity_star_is_minus_one(spark):
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src_id long, dst_id long"
    )
    r = assortativity(e).collect()[0]
    assert r["assortativity"] == -1.0 and r["n_edges"] == 3


def test_assortativity_path_hand_computed(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src_id long, dst_id long"
    )
    assert assortativity(e).collect()[0]["assortativity"] == -0.5


def test_assortativity_regular_graph_is_null(spark):
    # zero degree variance: 0/0, surfaced as NULL rather than a fake 0
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src_id long, dst_id long"
    )
    assert assortativity(e).collect()[0]["assortativity"] is None


def test_reciprocity_counts_mutual_pairs(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (4, 4), (1, 2)], "src_id long, dst_id long"
    )
    r = reciprocity(e).collect()[0]
    assert (r["n_edges"], r["n_mutual"]) == (3, 2)
    assert r["reciprocity"] == pytest.approx(2 / 3, abs=1e-6)
