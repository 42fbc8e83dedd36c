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
