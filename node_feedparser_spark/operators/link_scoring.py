"""Entity-link score calibration — the north rule's "entity-link scoring"
stage as a standalone operator over the KG edge shape.

Raw edge weights (sum of per-mention extraction scores, see
plans/pipeline.py edges) are not comparable across predicates: a weight of
3.0 may be the strongest "mentions" link in the graph and a middling
"invokes" one.  `calibrate_link_scores` rescales each weight to a [0, 1]
confidence within its predicate via min-max calibration.

Scale shape (the reason this is NOT a window): per-predicate extrema are
ONE map-side-combinable aggregation over a handful of groups (#predicates
is a vocabulary, not data-sized), broadcast back onto the edge set.  A
`Window.partitionBy(pred)` would shuffle the whole edge corpus into
#predicate tasks — a guaranteed mega-partition straggler at 10^12 turns.
The plan is pinned window-free and broadcast-joined by
tests/test_link_scoring.py.

Reference analog: feedparser normalizes per-format fields into one
comparable item schema (/root/reference/lib/feedparser.js:743-1030); this
normalizes per-predicate weights into one comparable confidence scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calibrate_link_scores(edges: DataFrame, round_dp: int = 6) -> DataFrame:
    """(src_id, pred, dst_id, weight) -> + confidence in [0, 1].

    confidence = (weight - min_pred) / (max_pred - min_pred), per predicate;
    a degenerate predicate (all weights equal) calibrates to 1.0 — a link
    that ties for strongest-of-its-kind is fully confident, and the
    alternative (0/0) is meaningless.  Deterministic: pure IEEE double
    arithmetic on exact aggregates, no sampling, no hash family.
    """
    stats = edges.groupBy(F.col("pred").alias("_pred")).agg(
        F.min("weight").alias("_wmin"), F.max("weight").alias("_wmax")
    )
    conf = F.when(F.col("_wmax") == F.col("_wmin"), F.lit(1.0)).otherwise(
        (F.col("weight") - F.col("_wmin"))
        / (F.col("_wmax") - F.col("_wmin"))
    )
    return (
        # null-safe equality: groupBy keeps a NULL-pred group, and a plain
        # equi-join (NULL != NULL) would silently DROP those edges instead
        # of calibrating them — the operator is row-preserving by contract
        edges.join(
            F.broadcast(stats),
            F.col("pred").eqNullSafe(F.col("_pred")),
        )
        .select(
            "src_id",
            "pred",
            "dst_id",
            "weight",
            F.round(conf, round_dp).alias("confidence"),
        )
    )


def roc_auc(
    scored: DataFrame, score: str = "score", label: str = "label"
) -> DataFrame:
    """ROC-AUC of a score column against a binary label, as ONE row
    (auc, n_pos, n_neg) — the threshold-free quality number for the
    entity-link scores calibrate_link_scores emits (ranking_eval in
    graph_algo.py covers the per-query MRR/Hits@k view; AUC is the
    global pairwise view: P(score_pos > score_neg) + P(=)/2, i.e. the
    normalized Mann-Whitney U statistic with average-rank tie handling).

    Plan shape for scale: NO global sort over rows.  The scores are first
    collapsed to a distinct-score histogram (one map-side-combinable agg:
    n_pos/n_neg per distinct score), and the single-partition window runs
    over THAT — bounded by score cardinality, not corpus size, the same
    small-table discipline as hist_quantiles.  U is then
    sum_s pos(s) * (neg_below(s) + neg_same(s)/2), all integer-and-half
    arithmetic until one final division — bit-reproducible against the
    DuckDB oracle.
    """
    hist = scored.groupBy(F.col(score).alias("_s")).agg(
        F.sum(F.col(label).cast("long")).alias("pos"),
        F.sum(F.lit(1) - F.col(label).cast("long")).alias("neg"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    u = hist.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below"),
    )
    return u.agg(
        F.round(
            F.sum(F.col("pos") * (F.col("neg_below") + F.col("neg") / 2.0))
            / (F.sum("pos") * F.sum("neg")),
            6,
        ).alias("auc"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
    )
