"""Bipartite-graph motif analytics.

KG edge tables are frequently bipartite in practice (supplier<->part,
user<->item, entity<->document): the triangle/clustering family returns
zero on them by construction, because bipartite graphs have no odd
cycles.  The smallest non-trivial bipartite motif is the BUTTERFLY — the
2x2 biclique / 4-cycle — and butterfly counts are the bipartite
analogue of triangle counts (Wang-Fu-Cheng VLDB'14; Sanei-Mehri et al.
KDD'18): the building block of bipartite clustering coefficients,
community density, and spam/collusion detection (two accounts touching
the same two items, at scale, is the collusion signature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def butterfly_counts(
    edges: DataFrame,
    left_col: str = "left",
    right_col: str = "right",
) -> DataFrame:
    """Per-left-vertex butterfly counts over the bipartite edge list.

    For every pair of left vertices (u, v) sharing ``w`` right
    neighbors, each choice of two shared neighbors forms one butterfly:
    ``C(w, 2)`` butterflies on the pair, credited to BOTH endpoints.
    Returns (node, butterflies) for left vertices on at least one
    butterfly — pure integer arithmetic, bit-identical oracle.

    Plan: edges dedupe (one corpus shuffle), wedge generation by
    self-join on the right vertex (u1 < u2), one map-side-combinable
    count per left pair, then C(w,2) projected row-locally and one
    final per-node sum.  Wedge volume is sum_r C(deg(r), 2) — the known
    quadratic hub cost every butterfly counter pays; a celebrity right
    vertex should be diagnosed with `skew_profile` and capped upstream,
    exactly like the simhash hot-block guard.  The wedge join shuffles
    on the right-vertex key only; pair counting shuffles wedges once
    more — both bounded by wedge volume, never |L|^2.
    """
    e = (
        edges.select(
            F.col(left_col).cast("long").alias("u"),
            F.col(right_col).cast("long").alias("r"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    pairs = (
        e.alias("a")
        .join(e.alias("b"), "r")
        .filter(F.col("a.u") < F.col("b.u"))
        .groupBy(F.col("a.u").alias("u1"), F.col("b.u").alias("u2"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("w") >= 2)
        .withColumn(
            "bf", F.expr("w * (w - 1) DIV 2").cast("long")
        )
    )
    return (
        pairs.select(F.col("u1").alias("node"), "bf")
        .unionByName(pairs.select(F.col("u2").alias("node"), "bf"))
        .groupBy("node")
        .agg(F.sum("bf").cast("long").alias("butterflies"))
    )
