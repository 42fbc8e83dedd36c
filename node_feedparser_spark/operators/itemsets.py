"""Frequent-itemset mining (market-basket analysis) — the A-priori /
SON family (Agrawal & Srikant, VLDB'94; the classic MapReduce adaptation
is Savasere-Omiecinski-Navathe partitioning): which item combinations
co-occur in at least a given FRACTION of baskets.  On the KG this is
co-mention pattern mining over conversations; on orders it is the
literal market basket.

Reference analog: the reference accumulates per-item category sets and
dedupes them (`lib/feedparser.js` category accumulate, SURVEY A5) — this
is the corpus-level generalization: from "what labels does THIS item
carry" to "which label combinations recur across the corpus".

Scale design (the A-priori argument, stated for 100 TB):

- Support is RELATIVE (``num/den`` of the basket count) and compared in
  exact integer arithmetic (``s * den >= num * n``) — no float
  threshold, no ceil ambiguity, and the same mining travels across
  corpus sizes.
- The monotonicity prune is structural: only items surviving the
  1-itemset pass enter the pair self-join, and only pairs whose THREE
  sub-pairs are all frequent enter the triple count.  Frequent sets at
  any meaningful support are tiny relative to the corpus, so they
  broadcast — the corpus-sized basket table shuffles once (the initial
  distinct) and never again; every prune is a broadcast semi-join.
- The within-basket self-join is bounded by (pruned) basket size, not
  corpus size — the known quadratic/cubic local cost every A-priori
  implementation accepts; a pathological mega-basket should be capped
  upstream (the skew_profile operator is the diagnosis tool).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_itemsets(
    baskets: DataFrame,
    support_num: int = 1,
    support_den: int = 100,
    max_size: int = 3,
    basket_col: str = "basket",
    item_col: str = "item",
) -> DataFrame:
    """Frequent 1-, 2- and (optionally) 3-itemsets at relative support
    ``support_num/support_den`` of the distinct-basket count.

    Returns (k, i1, i2, i3, support): itemset size, the items in
    ascending lexicographic order (unused slots NULL), and the number of
    baskets containing the whole set.  Duplicate (basket, item) rows
    collapse first — support counts baskets, not occurrences.
    """
    if support_num < 1 or support_den < 1:
        raise ValueError("support_num and support_den must be >= 1")
    if max_size not in (1, 2, 3):
        raise ValueError("max_size must be 1, 2, or 3")
    b = baskets.select(
        F.col(basket_col).alias("b"),
        F.col(item_col).cast("string").alias("i"),
    ).distinct()
    n = b.agg(F.countDistinct("b").alias("n"))
    is_freq = F.col("support") * support_den >= support_num * F.col("n")

    f1 = (
        b.groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .join(F.broadcast(n))
        .filter(is_freq)
        .select("i", "support")
    )
    out = f1.select(
        F.lit(1).cast("long").alias("k"),
        F.col("i").alias("i1"),
        F.lit(None).cast("string").alias("i2"),
        F.lit(None).cast("string").alias("i3"),
        "support",
    )
    if max_size == 1:
        return out

    # A-priori prune: only frequent items enter the pair join
    b1 = b.join(F.broadcast(f1.select("i")), "i", "semi").localCheckpoint()
    f2 = (
        b1.alias("x")
        .join(b1.alias("y"), "b")
        .filter(F.col("x.i") < F.col("y.i"))
        .groupBy(
            F.col("x.i").alias("i1"), F.col("y.i").alias("i2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .join(F.broadcast(n))
        .filter(is_freq)
        .select("i1", "i2", "support")
    )
    out = out.unionByName(
        f2.select(
            F.lit(2).cast("long").alias("k"),
            "i1",
            "i2",
            F.lit(None).cast("string").alias("i3"),
            "support",
        )
    )
    if max_size == 2:
        return out

    # candidate triples: all three sub-pairs must be frequent (classic
    # candidate-generation prune), checked by broadcast semi-joins
    # BEFORE the count shuffle
    p = f2.select("i1", "i2").localCheckpoint()
    f3 = (
        b1.alias("x")
        .join(b1.alias("y"), "b")
        .filter(F.col("x.i") < F.col("y.i"))
        .join(b1.alias("z"), "b")
        .filter(F.col("y.i") < F.col("z.i"))
        .select(
            "b",
            F.col("x.i").alias("i1"),
            F.col("y.i").alias("i2"),
            F.col("z.i").alias("i3"),
        )
        .join(F.broadcast(p), ["i1", "i2"], "semi")
        .join(
            F.broadcast(p.select(F.col("i1"), F.col("i2").alias("i3"))),
            ["i1", "i3"],
            "semi",
        )
        .join(
            F.broadcast(
                p.select(F.col("i1").alias("i2"), F.col("i2").alias("i3"))
            ),
            ["i2", "i3"],
            "semi",
        )
        .groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .join(F.broadcast(n))
        .filter(is_freq)
        .select("i1", "i2", "i3", "support")
    )
    return out.unionByName(
        f3.select(
            F.lit(3).cast("long").alias("k"), "i1", "i2", "i3", "support"
        )
    )
