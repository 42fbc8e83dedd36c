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
