"""Bucketed interval (range-containment) join.

`point.ts BETWEEN interval.start AND interval.end` is the join Spark's
optimizer handles worst: with no equality key it falls back to
BroadcastNestedLoopJoin (a cartesian scan of every point against every
interval — the 100 TB killer the asof operator in operators/asof.py
already dodges for the "most recent event" case).  This operator handles
the general containment case with the standard bucketing trick:

1. pick a bucket width ``w`` (seconds); every interval EXPLODES to the
   buckets it overlaps (intervals/``w`` rows each — bounded when interval
   lengths are bounded, the practical case: sessions, slots, windows);
2. every point maps to exactly ONE bucket;
3. equi-join on the bucket key (a real shuffle key — partitioned,
   AQE-skew-splittable), then re-verify the exact range predicate.

The equi-join produces each (point, interval) candidate at most once —
a point has one bucket and an interval appears once per bucket — so no
dedup pass is needed; the verify filter alone restores exact semantics.
The DuckDB oracle runs the NAIVE range join (its optimizer builds an IEJoin
— an independently-implemented range algorithm), so a pass pins the
bucketed plan against genuinely different execution.

Reference analog: the reference's scoped base-URI context (xml:base spans
of the document stream, /root/reference/lib/feedparser.js:230-247) is an
interval-containment lookup over document positions — same shape, time
axis instead of byte axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _us(col):
    return F.unix_micros(F.col(col).cast("timestamp"))


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    bucket_seconds: int = 3600,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Equi-join-shaped containment join: every (point, interval) pair with
    start <= ts <= end (inclusive both ends).  Returns points columns +
    intervals columns (caller projects).  Column sets must be disjoint
    apart from the timestamp columns named here.
    """
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    w = int(bucket_seconds) * 1_000_000
    p = points.withColumn(
        "_ij_bucket", F.floor(_us(point_ts) / w).cast("long")
    )
    iv = intervals.withColumn(
        "_ij_bucket",
        F.explode(
            F.sequence(
                F.floor(_us(start_col) / w).cast("long"),
                F.floor(_us(end_col) / w).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "_ij_bucket").where(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_ij_bucket")


def interval_join_naive(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """The θ-join definition (BroadcastNestedLoop on Spark) — tests only."""
    return points.join(
        intervals,
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col)),
    )


def comention_edges(
    points: DataFrame,
    key: str = "key",
    item: str = "item",
    ts: str = "ts",
    id_col: str = "id",
    window_seconds: int = 3600,
    min_count: int = 1,
) -> DataFrame:
    """Windowed co-mention edge builder — the point-to-point BAND
    self-join, fourth member of the time-join family here (asof.py =
    point-to-latest, interval_join = point-in-interval, timeline.py
    temporal_conflicts = interval-overlap): count unordered item pairs
    observed within ±window_seconds under the same key ("entities
    mentioned within an hour of each other in one conversation"), the
    proximity-weighted alternative to pmi_edges' whole-basket pairing.

    Plan (never a nested-loop range join): right side keyed at its
    window-width time bucket, left side exploded to {b-1, b, b+1}, one
    equi-join on (key, bucket) — a candidate pair meets EXACTLY once
    because the right row's bucket is fixed — then the exact |dt| <= w
    re-verify.  Each unordered POINT pair is claimed once by the strict
    (ts, id) lexicographic order (id breaks equal-timestamp ties, so
    duplicate-timestamp streams stay exact), then oriented by item name.
    Skew: a mega-key contributes pairs, not a mega-partition — the join
    key is (key, bucket), the same discipline as temporal_conflicts.
    """
    w_us = int(window_seconds) * 1_000_000
    p = points.select(
        F.col(key).alias("k"),
        F.col(item).alias("it"),
        _us(ts).alias("t"),
        F.col(id_col).alias("id"),
    ).withColumn("bkt", (F.col("t") / F.lit(w_us)).cast("long"))
    left = p.select(
        "k",
        F.col("it").alias("it_l"),
        F.col("t").alias("t_l"),
        F.col("id").alias("id_l"),
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ).alias("bkt"),
    )
    right = p.select(
        "k",
        F.col("it").alias("it_r"),
        F.col("t").alias("t_r"),
        F.col("id").alias("id_r"),
        "bkt",
    )
    pairs = (
        left.join(right, ["k", "bkt"])
        .filter(
            (
                (F.col("t_l") < F.col("t_r"))
                | ((F.col("t_l") == F.col("t_r")) & (F.col("id_l") < F.col("id_r")))
            )
            & (F.col("t_r") - F.col("t_l") <= w_us)
            & (F.col("it_l") != F.col("it_r"))
        )
        .select(
            F.least("it_l", "it_r").alias("item_a"),
            F.greatest("it_l", "it_r").alias("item_b"),
        )
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
        .filter(F.col("n_co") >= min_count)
    )
