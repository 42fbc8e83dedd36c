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
    b, n = _normalize_baskets(baskets, basket_col, item_col)
    return _mine(b, n, support_num, support_den, max_size)


def _normalize_baskets(baskets, basket_col, item_col):
    """Distinct (basket, item) pairs + the 1-row basket count.  ``b`` is
    lazily localCheckpoint-ed: it has three consumers downstream (the
    count, the 1-itemset agg, the frequent-item semi-join) and must not
    re-shuffle the corpus for each."""
    b = (
        baskets.select(
            F.col(basket_col).alias("b"),
            F.col(item_col).cast("string").alias("i"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    return b, b.agg(F.countDistinct("b").alias("n"))


def _mine(b, n, support_num, support_den, max_size):
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


def association_rules(
    baskets: DataFrame,
    support_num: int = 1,
    support_den: int = 100,
    conf_num: int = 1,
    conf_den: int = 20,
    basket_col: str = "basket",
    item_col: str = "item",
) -> DataFrame:
    """Association rules X -> Y from the frequent 2- and 3-itemsets at
    relative support ``support_num/support_den`` and confidence at least
    ``conf_num/conf_den`` (Agrawal-Srikant's second stage):

        confidence = supp(X u Y) / supp(X)
        lift       = confidence / (supp(Y) / n)
                   = supp(X u Y) * n / (supp(X) * supp(Y))

    The confidence gate is an exact integer comparison
    (``supp(XY) * conf_den >= conf_num * supp(X)``), and confidence and
    lift are 6-dp fixed-point computed ENTIRELY in integer arithmetic —
    ``(2*num*10^6 + den) DIV (2*den) / 10^6`` is HALF_UP rounding with
    no float in the loop, so the SQL oracle is bit-identical even when a
    ratio lands exactly on a rounding boundary (F.round on DOUBLE and
    DuckDB's ROUND disagree there: BigDecimal-of-shortest-repr vs
    multiply-and-rint).  Antecedent and consequent are comma-joined
    ascending item lists.

    Scale shape: everything downstream of the mining operates on
    FREQUENT-SET-sized tables (tiny at any meaningful support), so the
    rule derivation is a handful of small joins — the corpus itself is
    touched only by `frequent_itemsets`' single shuffle.

    Returns (antecedent, consequent, support, confidence, lift): the
    2-itemset rules (a->b, b->a) and all six 3-itemset rules
    (singleton->pair and pair->singleton splits).
    """
    if conf_num < 1 or conf_den < 1:
        raise ValueError("conf_num and conf_den must be >= 1")
    if support_num < 1 or support_den < 1:
        raise ValueError("support_num and support_den must be >= 1")
    b, n = _normalize_baskets(baskets, basket_col, item_col)
    fi = _mine(b, n, support_num, support_den, 3).localCheckpoint()
    f1 = fi.filter(F.col("k") == 1).select(
        F.col("i1").alias("i"), F.col("support").alias("s")
    )
    f2 = fi.filter(F.col("k") == 2).select("i1", "i2", "support")
    f3 = fi.filter(F.col("k") == 3).select("i1", "i2", "i3", "support")

    # f3 components are ascending (i1<i2<i3), so any sub-pair is
    # already in sorted order — keys and display strings coincide
    def _pk(a: str, c: str):
        return F.concat_ws(",", a, c)

    def _lk(df, col, out):
        return df.join(
            F.broadcast(
                f1.select(F.col("i").alias(col), F.col("s").alias(out))
            ),
            col,
        )

    # 2-itemset rules: a -> b and b -> a
    r2 = f2.select(
        F.col("i1").alias("ante_i"), F.col("i2").alias("cons_i"), "support"
    ).unionByName(
        f2.select(
            F.col("i2").alias("ante_i"), F.col("i1").alias("cons_i"), "support"
        )
    )
    r2 = _lk(_lk(r2, "ante_i", "sx"), "cons_i", "sy").select(
        F.col("ante_i").alias("antecedent"),
        F.col("cons_i").alias("consequent"),
        "support", "sx", "sy",
    )

    f2s = f2.select(_pk("i1", "i2").alias("pk"), F.col("support").alias("sp"))
    # singleton -> pair: ante in {i1,i2,i3}, cons = the other two
    r31 = None
    for a, c1, c2 in (("i1", "i2", "i3"), ("i2", "i1", "i3"), ("i3", "i1", "i2")):
        part_df = f3.select(
            F.col(a).alias("ante_i"), _pk(c1, c2).alias("cons"), "support"
        )
        r31 = part_df if r31 is None else r31.unionByName(part_df)
    r31 = (
        _lk(r31, "ante_i", "sx")
        .join(
            F.broadcast(
                f2s.select(F.col("pk").alias("cons"), F.col("sp").alias("sy"))
            ),
            "cons",
        )
        .select(
            F.col("ante_i").alias("antecedent"),
            F.col("cons").alias("consequent"),
            "support", "sx", "sy",
        )
    )
    # pair -> singleton
    r32 = None
    for a1, a2, c in (("i1", "i2", "i3"), ("i1", "i3", "i2"), ("i2", "i3", "i1")):
        part_df = f3.select(
            _pk(a1, a2).alias("ante"), F.col(c).alias("cons_i"), "support"
        )
        r32 = part_df if r32 is None else r32.unionByName(part_df)
    r32 = (
        r32.join(
            F.broadcast(
                f2s.select(F.col("pk").alias("ante"), F.col("sp").alias("sx"))
            ),
            "ante",
        )
        .join(
            F.broadcast(f1.select(F.col("i").alias("cons_i"), F.col("s").alias("sy"))),
            "cons_i",
        )
        .select(
            F.col("ante").alias("antecedent"),
            F.col("cons_i").alias("consequent"),
            "support", "sx", "sy",
        )
    )

    rules = r2.unionByName(r31).unionByName(r32)
    return (
        rules.join(F.broadcast(n))
        .filter(F.col("support") * conf_den >= conf_num * F.col("sx"))
        .select(
            "antecedent",
            "consequent",
            F.col("support").cast("long").alias("support"),
            (
                F.expr(
                    "(2 * support * 1000000 + sx) DIV (2 * sx)"
                ).cast("long")
                / F.lit(1000000.0)
            ).alias("confidence"),
            (
                F.expr(
                    "(2 * support * n * 1000000 + sx * sy) "
                    "DIV (2 * sx * sy)"
                ).cast("long")
                / F.lit(1000000.0)
            ).alias("lift"),
        )
    )
