"""As-of join — "most recent right-side row at or before each left row".

Spark has no ASOF JOIN operator (DuckDB, Pandas and kdb do); the naive
range-join formulation (``l.ts >= r.ts`` + keep max) explodes to
O(|L| x |R|) per key before pruning.  The scalable DataFrame formulation
is a MERGE of both streams and one forward-fill window:

  1. tag right rows 0 and left rows 1, union them on the join key + time;
  2. one window per key ordered by (time, tag, tiebreaks) carries the most
     recent right-side payload forward (``last(..., ignorenulls=True)``);
     right sorts BEFORE left at equal timestamps, so "at or before" is
     inclusive;
  3. keep the left rows; optionally null out matches older than
     ``tolerance_seconds``.

Cost: one shuffle of |L| + |R| rows on the key and a linear window pass —
the plan a stream-stream temporal join compiles to, and the shape that
survives 100 TB (no pair explosion, no driver state).  Key skew is the
window's partition skew; for mega-keys, range-bucket the time axis exactly
as operators/sessionize.py does (carry each bucket's last right-row into
the next bucket's seed).

Reference analog: feedparser's retro-resolution joins each item to the
most recently *discovered* feed URL context (lib/feedparser.js:358-360) —
a per-document as-of against parse order; here the time axis is real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from node_feedparser_spark.operators.sessionize import epoch_seconds


def _ts_type(df: DataFrame, col: str) -> str:
    """The time axis adopts the LEFT side's native timestamp flavor
    (timestamp vs timestamp_ntz): Spark 4 ANSI mode makes the flavors
    non-interchangeable in casts/unix_micros, and preserving the input
    flavor keeps the output schema identical to the source table."""
    t = dict(df.dtypes)[col]
    return t if t.startswith("timestamp") else "timestamp"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row, enriched with `right_cols` from
    the most recent `right` row of the same `on` key with
    ``right_ts <= left_ts`` (NULLs when none).  Adds ``asof_ts`` (the
    matched right timestamp).

    `tiebreak`: column present on `right` that breaks equal-`right_ts`
    ties deterministically (keep the max).  Required if right timestamps
    can repeat within a key — without it the carried row is
    plan-dependent.
    """
    tt = _ts_type(left, left_ts)
    payload = F.struct(
        F.col(right_ts).cast(tt).alias("_ats"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).cast(tt).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    l = left.select(
        "*",
        F.col(left_ts).cast(tt).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    # right (_side 0) sorts before left (_side 1) at equal time: "at or
    # before" is inclusive.  last(ignorenulls) + max-struct ordering on
    # (_ats, _tb) makes the carried row the latest right row, max-tiebreak
    # at equal right_ts (struct max orders field-by-field).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.max(F.col("_p")).over(w) if tiebreak else F.last(
        F.col("_p"), ignorenulls=True
    ).over(w)

    out = (
        merged.withColumn("_carried", carried)
        .filter(F.col("_side") == 1)
        .drop("_t", "_side", "_p")
    )
    match_ts = F.col("_carried._ats")
    if tolerance_seconds is not None:
        ok = (
            epoch_seconds(F.col(left_ts)) - epoch_seconds(match_ts)
            <= tolerance_seconds
        )
        keep = F.when(ok, F.col("_carried"))
    else:
        keep = F.col("_carried")
    cols = [F.col(c) for c in left.columns]
    cols.append(keep["_ats"].alias("asof_ts"))
    for c in right_cols:
        cols.append(keep[c].alias(c))
    return out.select(*cols)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    bucket_width_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Mega-key scale path for :func:`asof_join` — identical output
    (pinned by test), but the forward-fill window runs per ``(key,
    time-bucket)`` so no task ever sorts a whole mega-key.

    Two-level plan, the operators/sessionize.py shape:

    1. per ``(key, bucket)``: local union-tag window (bounded rows), plus
       the bucket's best right-side payload into a BOUNDARY table — one
       row per non-empty (key, bucket), orders of magnitude smaller than
       the data;
    2. a cumulative max over the boundary table (window over buckets of
       one key — tiny partitions) yields each bucket's SEED: the best
       right row of all earlier buckets.  ``greatest(local, seed)`` is
       then exact because the payload struct orders by (ts, tiebreak).

    Requires `tiebreak` (struct-max ordering is the merge operator here,
    so ties must be deterministic).
    """
    if tiebreak is None:
        raise ValueError("asof_join_bucketed requires a tiebreak column")
    tt = _ts_type(left, left_ts)
    payload = F.struct(
        F.col(right_ts).cast(tt).alias("_ats"),
        F.col(tiebreak).alias("_tb"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).cast(tt).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    l = left.select(
        "*",
        F.col(left_ts).cast(tt).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    merged = l.unionByName(r, allowMissingColumns=True).withColumn(
        "_bucket",
        F.floor(epoch_seconds(F.col("_t")) / bucket_width_seconds).cast("long"),
    )

    # level 1: bounded local forward-fill within (key, bucket)
    wloc = (
        Window.partitionBy(on, "_bucket")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = merged.withColumn("_local", F.max(F.col("_p")).over(wloc))

    # level 2: per-(key, bucket) boundary rows over BOTH sides (left-only
    # buckets still need a seed), best right payload per bucket, then the
    # strictly-preceding cumulative max = the seed carried into the bucket
    bounds = merged.groupBy(on, "_bucket").agg(F.max("_p").alias("_best"))
    wb = Window.partitionBy(on).orderBy(F.col("_bucket").asc())
    seeds = bounds.select(
        on,
        "_bucket",
        F.max("_best")
        .over(wb.rowsBetween(Window.unboundedPreceding, -1))
        .alias("_seed"),
    )

    out = (
        local.join(seeds, [on, "_bucket"])
        .withColumn("_carried", F.greatest(F.col("_local"), F.col("_seed")))
        .filter(F.col("_side") == 1)
    )
    match_ts = F.col("_carried._ats")
    if tolerance_seconds is not None:
        ok = (
            epoch_seconds(F.col(left_ts)) - epoch_seconds(match_ts)
            <= tolerance_seconds
        )
        keep = F.when(ok, F.col("_carried"))
    else:
        keep = F.col("_carried")
    cols = [F.col(c) for c in left.columns]
    cols.append(keep["_ats"].alias("asof_ts"))
    for c in right_cols:
        cols.append(keep[c].alias(c))
    return out.select(*cols)


def linear_attribution(
    events: DataFrame,
    window_hours: int = 24,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Linear multi-touch attribution — the many-touch complement to the
    last-touch as-of join above: every touch event within the lookback
    window before a conversion receives an EQUAL share of the conversion
    value (credit = value / n_touches), the standard linear model a
    marketing/behavior pipeline runs next to last-touch to bound how much
    the attribution choice moves revenue.

    Plan: one user-keyed equi-join (touches x conversions co-partitioned
    on the user — never a cartesian; mega-user skew is the documented
    salting case) + range filter, one per-conversion count window bounded
    by touches-per-window.  Returns (conversion_id, touch_id, n_touches,
    credit) with credit rounded to 6 dp; conversions with zero in-window
    touches emit nothing (their value is unattributable, same as the
    reference's null-propagating precedence chains).
    """
    if window_hours < 1:
        raise ValueError("window_hours must be >= 1")
    win_us = int(window_hours) * 3600 * 1_000_000
    conv = events.where(F.col("event_type") == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conversion_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_cts"),
        F.col(value_col).cast("double").alias("_val"),
    )
    touch = events.where(F.col("event_type") == touch_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("touch_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_tts"),
    )
    j = conv.join(touch, "_u").where(
        (F.col("_tts") <= F.col("_cts"))
        & (F.col("_tts") > F.col("_cts") - win_us)
    )
    w = Window.partitionBy("conversion_id")
    return (
        j.withColumn("n_touches", F.count(F.lit(1)).over(w).cast("long"))
        .select(
            "conversion_id",
            "touch_id",
            "n_touches",
            F.round(F.col("_val") / F.col("n_touches"), 6).alias("credit"),
        )
    )
