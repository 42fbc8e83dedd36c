"""Streaming face of the PSI drift monitor (operators/curation.psi_drift).

Continuous distribution-drift monitoring: the batch profile supplies the
REFERENCE (decile edges + Laplace-floored bin probabilities — small
literals, effectively a broadcast dim of ~10 numbers), and the stream is
reduced per event-time tumbling window to one PSI row.

The streaming constraint that shapes the plan: append-mode allows ONE
aggregation, so the per-bin count -> per-window total two-level shape of
the batch operator is flattened into a single windowed agg of n_bins
conditional sums (bin membership is a projection before the agg, evaluated
once per row).  With the watermark, each window emits exactly once and its
state is dropped — bounded state regardless of stream length.

Same arithmetic as the batch operator: +0.5 Laplace floor on the current
side, natural-log terms, 6 dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_psi(
    events: DataFrame,
    edges: list[float],
    ref_p: list[float],
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """One PSI row per event-time window vs a static reference profile.

    ``edges``: the n_bins-1 reference bin edges; ``ref_p``: the n_bins
    reference probabilities (already Laplace-floored, all > 0).  Returns
    (window_start, window_end, n, psi).
    """
    n_bins = len(ref_p)
    if len(edges) != n_bins - 1:
        raise ValueError("need len(edges) == len(ref_p) - 1")
    if any(p <= 0 for p in ref_p):
        raise ValueError("ref_p must be strictly positive (Laplace-floor it)")
    v = F.col(value_col).cast("double")
    b = F.lit(0)
    for e in edges:
        b = b + F.when(v > F.lit(float(e)), 1).otherwise(0)
    binned = events.withWatermark(ts_col, watermark).select(
        F.col(ts_col), b.alias("_bin")
    )
    agg = binned.groupBy(
        F.window(ts_col, window_duration).alias("win")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.when(F.col("_bin") == i, 1).otherwise(0)).alias(
                f"_n{i}"
            )
            for i in range(n_bins)
        ],
    )
    denom = F.col("n") + 0.5 * n_bins
    psi = F.lit(0.0)
    for i, r in enumerate(ref_p):
        p = (F.col(f"_n{i}") + 0.5) / denom
        psi = psi + (p - F.lit(float(r))) * F.log(p / F.lit(float(r)))
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        F.col("n").cast("long").alias("n"),
        F.round(psi, 6).alias("psi"),
    )
