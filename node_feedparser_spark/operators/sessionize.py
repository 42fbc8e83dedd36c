"""Gap-based sessionization — conversation/activity segmentation.

Splits each user's (or conversation's) event stream into sessions wherever
the gap between consecutive events exceeds ``gap``.  This is the
transcript-domain segmentation primitive: the reference emits items in
document order within one feed (/root/reference/lib/feedparser.js:366) and
scopes context to the enclosing element (xml:base stack,
lib/feedparser.js:275-302); sessionization is the same scoping discipline
applied to a time axis — turns belong to the innermost enclosing activity
burst.

Two plans, identical results (pinned by test):

- ``sessionize_naive``: one window over ``partitionBy(key).orderBy(ts,
  tiebreak)`` — the textbook lag/cumsum plan.  Correct, but the window
  sorts EVERY event of a key inside one task: a mega-user stalls the stage
  (the same skew the north rule calls out for mega-threads).

- ``sessionize``: time-bucketed two-level plan.  Events are windowed over
  ``(key, bucket)`` where ``bucket = floor(epoch(ts) / bucket_width)`` —
  contiguous time ranges, so each task holds at most one bucket-width of
  one key (the range-salting of operators/conv_apply.py, valid here
  because time is dense within a burst).  Local session indices are then
  stitched across buckets with a second window over the per-(key, bucket)
  BOUNDARY table (one row per non-empty bucket — orders of magnitude
  smaller than the events): bucket k's first session continues bucket
  k-1's last session iff the boundary gap is within ``gap``; a cumulative
  offset re-bases local indices to global ones.  Every stage is a bounded
  window or a map-side-combinable agg; nothing ever holds a whole
  mega-user.

``bucket_width`` is the skew knob: pick it so max events per (key, bucket)
fits one task comfortably (it must be >= gap, or an intra-session pause
could span a whole empty bucket and still stitch — the stitch compares
against the previous NON-EMPTY bucket, so correctness holds for any
width >= gap; boundedness is the only tuning concern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(col: Column) -> Column:
    """Epoch seconds as double from a timestamp of either flavor.

    Spark 4 ANSI mode forbids TIMESTAMP_NTZ -> DOUBLE casts and
    unix_micros(TIMESTAMP_NTZ); casting through TIMESTAMP first is legal
    for both flavors (NTZ is interpreted in the session time zone — UTC
    throughout this repo — so the mapping is deterministic and monotone,
    which is all gap/bucket arithmetic needs)."""
    return F.unix_micros(col.cast("timestamp")) / F.lit(1_000_000.0)


def _session_agg(df: DataFrame, key: str, ts: str, value: str | None):
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    ]
    if value is not None:
        aggs.append(F.round(F.sum(value), 4).alias("total_value"))
    return df.groupBy(key, "session_id").agg(*aggs)


def sessionize_naive(
    events: DataFrame,
    gap_seconds: int,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str | None = "value",
) -> DataFrame:
    """Single-window sessionization: lag + cumulative sum of gap-starts.
    One row per session: (key, session_id, n_events, session_start,
    session_end[, total_value]).  session_id is a 0-based per-key index in
    time order."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    prev = F.lag(F.col(ts)).over(w)
    new_sess = (
        prev.isNull()
        | (epoch_seconds(F.col(ts)) - epoch_seconds(prev) > gap_seconds)
    ).cast("long")
    with_sid = events.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return _session_agg(with_sid, key, ts, value)


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    bucket_width_seconds: int = 86_400,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str | None = "value",
) -> DataFrame:
    """Bucketed sessionization — same output as :func:`sessionize_naive`,
    but no task ever windows more than one ``bucket_width`` of one key."""
    if bucket_width_seconds < gap_seconds:
        raise ValueError(
            "bucket_width_seconds must be >= gap_seconds: a session pause "
            "longer than a bucket would otherwise be unobservable at a "
            "boundary"
        )
    epoch = epoch_seconds(F.col(ts))
    ev = events.withColumn(
        "_bucket", F.floor(epoch / bucket_width_seconds).cast("long")
    )

    # --- level 1: local sessions within (key, bucket) — bounded window
    wloc = Window.partitionBy(key, "_bucket").orderBy(
        F.col(ts).asc(), F.col(tiebreak).asc()
    )
    prev = F.lag(epoch).over(wloc)
    starts = (prev.isNull() | (epoch - prev > gap_seconds)).cast("long")
    local = ev.withColumn(
        "_local_sid",
        F.sum(starts).over(
            wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )

    # --- level 2: per-(key, bucket) boundary table (tiny vs the events):
    # first/last event time and local session count
    bounds = local.groupBy(key, "_bucket").agg(
        F.min(epoch).alias("_first_ts"),
        F.max(epoch).alias("_last_ts"),
        (F.max("_local_sid") + 1).alias("_n_local"),
    )
    wb = Window.partitionBy(key).orderBy(F.col("_bucket").asc())
    # continuation: this bucket's first event is within `gap` of the
    # previous NON-EMPTY bucket's last event (lag over the boundary table
    # skips empty buckets by construction)
    cont = (
        F.col("_first_ts") - F.lag(F.col("_last_ts")).over(wb) <= gap_seconds
    ).cast("long")
    offsets = bounds.withColumn("_cont", F.coalesce(cont, F.lit(0))).select(
        key,
        "_bucket",
        # global base of this bucket's local sid 0:
        #   sum of previous buckets' session counts minus every
        #   continuation up to and including this bucket
        (
            F.coalesce(
                F.sum("_n_local").over(
                    wb.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            - F.sum("_cont").over(
                wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("_base"),
    )

    with_sid = (
        local.join(offsets, [key, "_bucket"])
        .withColumn("session_id", F.col("_base") + F.col("_local_sid"))
        .drop("_bucket", "_local_sid", "_base")
    )
    return _session_agg(with_sid, key, ts, value)


# ---------------------------------------------------------------------------
# Ordered-sequence analytics over the same event stream: funnels + cohorts
# ---------------------------------------------------------------------------


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    max_gap_hours: int = 24,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered first-occurrence funnel: for each user, step i
    completes at the earliest event of type steps[i] that falls strictly
    after the user's step i-1 completion and within ``max_gap_hours`` of
    it.  Returns one row per step: (step_idx, step, n_users,
    conversion_rate) with the rate relative to step 1.

    Plan shape: the per-step frontier is one groupBy(user).min(ts) over
    events filtered to that step's type — the type filter pushes to the
    scan, and every frontier is |users|-sized, so steps 2.. are
    BROADCAST-joined against the (type-pruned) event stream: the big table
    shuffles zero times and is scanned once per step with column/predicate
    pushdown.  A window-based single-pass variant exists (sessionize's
    bucketed windows) but pays a full (user, ts) sort of ALL events;
    per-step broadcast frontiers beat it whenever |users| << |events|,
    which is the 100 TB regime.  The final 3-row summary is a trivial agg.
    """
    if len(steps) < 2:
        raise ValueError("need at least 2 funnel steps")
    gap = F.expr(f"INTERVAL {int(max_gap_hours)} HOURS")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("t"))
    )
    counts = [frontier.count()]
    for step in steps[1:]:
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ts2")
        )
        frontier = (
            nxt.join(F.broadcast(frontier), "u")
            .filter(
                (F.col("ts2") > F.col("t")) & (F.col("ts2") <= F.col("t") + gap)
            )
            .groupBy("u")
            .agg(F.min("ts2").alias("t"))
        )
        counts.append(frontier.count())
    spark = events.sparkSession
    base = max(counts[0], 1)
    rows = [(i + 1, s, counts[i]) for i, s in enumerate(steps)]
    # the per-step counts are len(steps) driver-side scalars (bounded by
    # the funnel definition, not the data); the rate division/rounding
    # happens engine-side so rounding semantics match the oracle's
    return spark.createDataFrame(
        rows, "step_idx INT, step STRING, n_users BIGINT"
    ).withColumn(
        "conversion_rate",
        F.round(F.col("n_users") / F.lit(float(base)), 6),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the Monday-truncated
    week of their FIRST event; retention at offset k = fraction of the
    cohort active (any event) during cohort week + k.

    Returns (cohort_week: date, week_offset, n_active, retention) for every
    (cohort, offset) with activity.  Two aggregations (per-user first event;
    per-(user, week) distinct activity) plus a broadcast of the tiny
    cohort-size table — both shuffles key on user_id, so with the input
    bucketed by user (the conv_id discipline of the KG pipeline applied to
    users) they collapse into map-side work.  Week arithmetic stays on
    date_trunc'd values, so the day-difference is an exact multiple of 7 in
    both engines.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    firsts = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(F.min(wk).alias("cohort_ts"))
    )
    activity = events.select(
        F.col(user_col).alias("u"), wk.alias("w")
    ).distinct()
    sizes = firsts.groupBy("cohort_ts").agg(
        F.countDistinct("u").alias("cohort_size")
    )
    joined = activity.join(firsts, "u").select(
        "u",
        "cohort_ts",
        (F.datediff(F.col("w"), F.col("cohort_ts")) / 7)
        .cast("long")
        .alias("week_offset"),
    )
    return (
        joined.groupBy("cohort_ts", "week_offset")
        .agg(F.countDistinct("u").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_ts")
        .select(
            F.to_date("cohort_ts").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )
