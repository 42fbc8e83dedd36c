"""Clustering-quality evaluation for entity resolution: B-cubed precision /
recall / F1, pairwise precision / recall / F1, and the Adjusted Rand Index,
computed exactly from one contingency table.

This closes the ER evaluation loop next to `profile.blocking_quality`
(which scores the CANDIDATE GENERATOR): after canonicalization assigns
cluster ids, this scores the CLUSTERING itself against a gold labeling —
the standard triple of metrics from the entity-resolution literature
(Bagga & Baldwin's B-cubed; pairwise linkage metrics; Hubert & Arabie's
ARI).

Definitions over items with predicted cluster p and true cluster t, with
n_pt = |items in (p, t)|, n_p = |cluster p|, n_t = |class t|, N = total:

- B-cubed precision = (1/N) * sum_items |p ∩ t| / |p|
                    = (1/N) * sum_pt n_pt^2 / n_p          (and recall
                      symmetrically over n_t) — per-ITEM averaging, so a
                      megacluster error costs proportionally to its size.
- pairwise: TP = sum_pt C(n_pt,2), predicted pairs = sum_p C(n_p,2),
  true pairs = sum_t C(n_t,2).
- ARI = (Σ C(n_pt,2) − ΣC(n_p,2)·ΣC(n_t,2)/C(N,2))
        / (½(ΣC(n_p,2)+ΣC(n_t,2)) − ΣC(n_p,2)·ΣC(n_t,2)/C(N,2)).

Scale design: everything reduces over the contingency table — ONE
groupBy(pred, true) count over the labeled items (map-side combinable),
then two cluster-sized aggregations and a single-row combine.  No windows,
no Python, no pair materialization: the pairwise metrics come from the
closed-form C(n,2) sums, never from joining items against items.  All
counts are exact integers; the final ratios are one IEEE division each,
rounded to 6 dp — bit-equal in any engine (the blocking_quality
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    return (F.col(col) * (F.col(col) - 1) / 2).cast("double")


def cluster_quality(
    labeled: DataFrame,
    pred_col: str = "pred_cluster",
    true_col: str = "true_cluster",
) -> DataFrame:
    """labeled(item-grain rows with pred_col, true_col; NULL labels are
    rejected by contract — filter upstream) -> one row:
    (n_items, n_pred_clusters, n_true_clusters, b3_precision, b3_recall,
    b3_f1, pair_precision, pair_recall, pair_f1, ari), all metrics rounded
    to 6 dp.  Singleton-only degenerate inputs give ARI 0.0 by the
    0/0 -> 0 convention (both numerator and denominator vanish)."""
    pt = labeled.select(
        F.col(pred_col).alias("p"), F.col(true_col).alias("t")
    ).groupBy("p", "t").agg(F.count(F.lit(1)).alias("n_pt"))

    # contingency-level sums (one row)
    cont = pt.agg(
        F.sum("n_pt").cast("long").alias("n"),
        F.sum(F.col("n_pt") * F.col("n_pt")).cast("double").alias("sq_pt"),
        F.sum(_c2("n_pt")).alias("tp_pairs"),
    )
    # per-predicted-cluster and per-true-class sums
    byp = pt.groupBy("p").agg(F.sum("n_pt").alias("n_p"))
    byt = pt.groupBy("t").agg(F.sum("n_pt").alias("n_t"))
    pstats = byp.agg(
        F.count(F.lit(1)).cast("long").alias("n_pred_clusters"),
        F.sum(_c2("n_p")).alias("pred_pairs"),
    )
    tstats = byt.agg(
        F.count(F.lit(1)).cast("long").alias("n_true_clusters"),
        F.sum(_c2("n_t")).alias("true_pairs"),
    )
    # B-cubed needs sum over (p,t) of n_pt^2 / n_p (resp. n_t): join the
    # cell table back to the cluster-size tables — both cluster-count-sized
    # the two B-cubed sums are the ONLY order-sensitive double additions
    # here (pair counts are integer-valued doubles, exact under any order)
    # — round them at 6 dp like every other cross-engine aggregate in this
    # repo, so partial-agg ordering can never flip the compared output
    b3 = (
        pt.join(byp, "p")
        .join(byt, "t")
        .agg(
            F.round(
                F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_p")), 6
            ).alias("b3p_sum"),
            F.round(
                F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_t")), 6
            ).alias("b3r_sum"),
        )
    )

    row = cont.crossJoin(pstats).crossJoin(tstats).crossJoin(b3)
    n2 = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    expected = F.col("pred_pairs") * F.col("true_pairs") / n2
    ari_num = F.col("tp_pairs") - expected
    ari_den = (F.col("pred_pairs") + F.col("true_pairs")) / 2 - expected
    b3p = F.col("b3p_sum") / F.col("n")
    b3r = F.col("b3r_sum") / F.col("n")
    pp = F.when(
        F.col("pred_pairs") > 0, F.col("tp_pairs") / F.col("pred_pairs")
    ).otherwise(F.lit(0.0))
    pr = F.when(
        F.col("true_pairs") > 0, F.col("tp_pairs") / F.col("true_pairs")
    ).otherwise(F.lit(0.0))

    def _f1(a, b):
        return F.when(a + b > 0, 2 * a * b / (a + b)).otherwise(F.lit(0.0))

    return row.select(
        F.col("n").alias("n_items"),
        "n_pred_clusters",
        "n_true_clusters",
        F.round(b3p, 6).alias("b3_precision"),
        F.round(b3r, 6).alias("b3_recall"),
        F.round(_f1(b3p, b3r), 6).alias("b3_f1"),
        F.round(pp, 6).alias("pair_precision"),
        F.round(pr, 6).alias("pair_recall"),
        F.round(_f1(pp, pr), 6).alias("pair_f1"),
        F.round(
            F.when(ari_den != 0, ari_num / ari_den).otherwise(F.lit(0.0)), 6
        ).alias("ari"),
    )


def cohen_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cohen's kappa — chance-corrected inter-annotator agreement (Cohen
    1960), per group: the labeled-training-data quality stat this module
    was missing next to cluster_quality (scores a clustering against
    gold) and blocking_quality (scores candidate generation) — kappa
    scores TWO LABELERS against each other, the gate before either label
    set is trusted as gold at all.

    With confusion counts n_ab over the joint label domain, row/column
    marginals r_c = sum_b n_cb and c_c = sum_a n_ac:

        po    = sum_c n_cc / n          (observed agreement)
        pe    = sum_c r_c * c_c / n^2   (chance agreement)
        kappa = (po - pe) / (1 - pe)
              = (n * sum_c n_cc - sum_c r_c c_c) / (n^2 - sum_c r_c c_c)

    — ONE exact integer numerator over one exact integer denominator,
    emitted as the repo's 6-dp integer fixed point, HALF-UP AWAY FROM
    ZERO on both signs: sign(num) * (2*|num|*10^6 + den) DIV (2*den) /
    10^6 — the abs keeps both operands positive, where Spark's DIV
    (truncating) and DuckDB's // (flooring) agree, so negative kappa
    (systematic disagreement) rounds identically too (pinned by test)
    and the SQL oracle is bit-identical.  A degenerate group where pe = 1 (both annotators
    constant and equal) has kappa undefined: emitted as NULL.

    NULL labels are their own category via a coalesce sentinel (an
    annotator abstaining IS a disagreement signal).

    Plan: one groupBy(group, a, b) count is the only corpus shuffle;
    diagonal sums and both marginals are re-aggregations of that
    confusion table (tiny: one row per observed label pair), joined on
    the label within each group.

    Returns (group_cols..., n, po, pe, kappa).
    """
    g = list(group_cols or [])
    a = F.coalesce(F.col(a_col).cast("string"), F.lit("\x00null"))
    b = F.coalesce(F.col(b_col).cast("string"), F.lit("\x00null"))
    conf = df.groupBy(
        *g, a.alias("__a"), b.alias("__b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    if g:
        gb = lambda d: d.groupBy(*g)  # noqa: E731
        join_keys = g
    else:
        conf = conf.withColumn("__one", F.lit(1))
        gb = lambda d: d.groupBy("__one")  # noqa: E731
        join_keys = ["__one"]
    totals = gb(conf).agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("c"))
              .otherwise(F.lit(0))).cast("long").alias("diag"),
    )
    rows = (
        conf.groupBy(*join_keys, F.col("__a").alias("lbl"))
        .agg(F.sum("c").cast("long").alias("r"))
    )
    cols = (
        conf.groupBy(*join_keys, F.col("__b").alias("lbl"))
        .agg(F.sum("c").cast("long").alias("cc"))
    )
    chance = (
        rows.join(cols, [*join_keys, "lbl"])
        .groupBy(*join_keys)
        .agg(F.sum(F.col("r") * F.col("cc")).cast("long").alias("rc"))
    )
    out = totals.join(chance, join_keys).select(
        *g,
        "n",
        F.expr("(2 * diag * 1000000 + n) DIV (2 * n)").cast("long")
        .alias("po6"),
        F.expr("(2 * rc * 1000000 + n * n) DIV (2 * n * n)").cast("long")
        .alias("pe6"),
        F.when(
            F.expr("n * n - rc") != 0,
            F.expr(
                "sign(n * diag - rc) * "
                "((2 * abs(n * diag - rc) * 1000000 + (n * n - rc))"
                " DIV (2 * (n * n - rc)))"
            ).cast("long"),
        ).alias("k6"),
    )
    return out.select(
        *g,
        "n",
        (F.col("po6") / F.lit(1000000.0)).alias("po"),
        (F.col("pe6") / F.lit(1000000.0)).alias("pe"),
        (F.col("k6") / F.lit(1000000.0)).alias("kappa"),
    )
