"""Entity timelines — SCD2 valid-interval materialization.

A temporal KG doesn't just store the *current* object of ``(entity,
attribute)``; it stores every historical value with its validity interval
(slowly-changing-dimension type 2).  Given an event stream ``(key, value,
ts)``, collapse consecutive runs of the same value into intervals::

    (key, value, valid_from, valid_to, n_events, interval_id)

``valid_to`` is the start of the NEXT interval (NULL for the current one),
so intervals tile the key's timeline with no gaps — the standard as-of
lookup shape (``valid_from <= t < valid_to``, see operators/asof.py).

Reference analog: feedparser keeps only the latest value per field but
versioned feeds re-emit items with changed values over fetches; the
retro-resolution window (lib/feedparser.js:358-360) is the same
"context changes at discrete points in time" discipline.

Two plans, identical output (pinned by test), mirroring
operators/sessionize.py:

- ``scd2_timeline_naive``: one window per key — lag(value) change flags +
  cumulative sum.  A mega-entity (10^8 events for one key) sorts inside a
  single task.
- ``scd2_timeline``: time-bucketed two-level plan.  Change flags are local
  to ``(key, bucket)``; a per-(key, bucket) boundary table (one row per
  non-empty bucket) carries each bucket's LAST value forward so the next
  bucket's first row knows whether it continues the run, and a cumulative
  offset re-bases local interval indices to global ones.  No task ever
  holds more than one bucket of one key.

The interval table itself is change-sized (one row per value change), so
the final ``lead(valid_from)`` window over intervals is output-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from node_feedparser_spark.operators.sessionize import epoch_seconds


def _interval_agg(df: DataFrame, key: str, value: str, ts: str) -> DataFrame:
    """(key, interval_id) groups -> one SCD2 row; valid_to via lead over
    the change-sized interval table."""
    iv = df.groupBy(key, "interval_id").agg(
        F.first(value).alias(value),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w = Window.partitionBy(key).orderBy(F.col("interval_id").asc())
    return iv.select(
        key,
        "interval_id",
        value,
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        "n_events",
    )


def scd2_timeline_naive(
    events: DataFrame,
    key: str = "user_id",
    value: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Single-window SCD2: lag(value) change flags + cumulative sum.
    interval_id is a 0-based per-key index in time order."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    prev = F.lag(F.col(value)).over(w)
    # row_number guard: lag()=NULL can't distinguish "first row" from
    # "previous value was NULL", and a NULL first value must still open
    # interval 0
    change = (
        (F.row_number().over(w) == 1) | ~F.col(value).eqNullSafe(prev)
    ).cast("long")
    with_iid = events.withColumn(
        "interval_id",
        F.sum(change).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return _interval_agg(with_iid, key, value, ts)


def scd2_timeline(
    events: DataFrame,
    bucket_width_seconds: int = 86_400,
    key: str = "user_id",
    value: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Bucketed SCD2 — same output as :func:`scd2_timeline_naive`, but no
    task ever windows more than one ``bucket_width`` of one key.

    Unlike sessionize there is no minimum bucket width: run continuation
    across a boundary depends only on the previous non-empty bucket's last
    VALUE, which the boundary table carries exactly.
    """
    epoch = epoch_seconds(F.col(ts))
    ev = events.withColumn(
        "_bucket", F.floor(epoch / bucket_width_seconds).cast("long")
    )

    # --- level 1: local change flags within (key, bucket)
    wloc = Window.partitionBy(key, "_bucket").orderBy(
        F.col(ts).asc(), F.col(tiebreak).asc()
    )
    prev = F.lag(F.col(value)).over(wloc)
    change = (
        (F.row_number().over(wloc) == 1) | ~F.col(value).eqNullSafe(prev)
    ).cast("long")
    local = ev.withColumn(
        "_local_iid",
        F.sum(change).over(
            wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )

    # --- level 2: boundary table — first/last value per (key, bucket)
    # (last value by max (ts, tiebreak); max_by keeps it one agg pass)
    order_key = F.struct(F.col(ts), F.col(tiebreak))
    bounds = local.groupBy(key, "_bucket").agg(
        F.min_by(F.col(value), order_key).alias("_first_val"),
        F.max_by(F.col(value), order_key).alias("_last_val"),
        (F.max("_local_iid") + 1).alias("_n_local"),
    )
    wb = Window.partitionBy(key).orderBy(F.col("_bucket").asc())
    cont = (
        F.col("_first_val").eqNullSafe(F.lag(F.col("_last_val")).over(wb))
    ).cast("long")
    # the key's FIRST bucket never continues anything (eqNullSafe against
    # the lag would spuriously match a NULL first value) — detect it by
    # lagged bucket id, which is never NULL for later buckets
    offsets = bounds.withColumn(
        "_cont",
        F.when(F.lag(F.col("_bucket")).over(wb).isNull(), F.lit(0)).otherwise(
            cont
        ),
    ).select(
        key,
        "_bucket",
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

    with_iid = (
        local.join(offsets, [key, "_bucket"])
        .withColumn("interval_id", F.col("_base") + F.col("_local_iid"))
        .drop("_bucket", "_local_iid", "_base")
    )
    return _interval_agg(with_iid, key, value, ts)


def temporal_conflicts(
    events: DataFrame,
    key: str = "user_id",
    value: str = "event_type",
    ts: str = "ts",
    source: str = "source",
    tiebreak: str = "event_id",
    bucket_width_seconds: int = 86_400,
) -> DataFrame:
    """Temporal functional-property conflict detection — the DETECT-side
    complement of the fusion stage's conflict RESOLUTION (truth_fusion
    resolves disagreeing snapshot claims by source trust; this finds
    where two provenance streams assert DIFFERENT values of a functional
    property for the same entity over OVERLAPPING validity windows, the
    temporal-KG consistency check).

    Assertion model: within each (key, source) stream ordered by
    (ts, tiebreak), an event asserts ``value`` from its own timestamp
    until the stream's next event; a stream's final assertion closes at
    the KEY's last observed event across all sources (the SCD2
    current-row convention — "valid until end of observed data", which
    keeps every interval finite and bucketable).  Overlap is STRICT
    (a.from < b.to AND b.from < a.to): a zero-length final assertion and
    an instantaneous handoff at a shared boundary are not simultaneous.

    Plan (the interval_join discipline, overlap flavor): build intervals
    with one lead() window per (key, source) plus one whole-partition
    max() per key; explode each interval to the time buckets it covers;
    equi-join the two sides on (key, bucket) — a real, AQE-skew-
    splittable shuffle key, never a nested-loop range join; re-verify the
    exact overlap + value-differs predicate; DISTINCT the (id_a, id_b)
    pairs (an overlapping pair can share several buckets).  Per-entity
    assertion cardinality bounds the per-bucket quadratic term; a
    mega-entity concentrates in single (key, bucket) cells that AQE skew
    splitting subdivides.  The DuckDB oracle runs the naive range
    self-join (its IEJoin), pinning the bucketed plan against genuinely
    different execution.
    """
    if bucket_width_seconds < 1:
        raise ValueError("bucket_width_seconds must be >= 1")
    w_src = Window.partitionBy(key, source).orderBy(
        F.col("_vf").asc(), F.col(tiebreak).asc()
    )
    w_key = Window.partitionBy(key)
    iv = events.select(key, source, tiebreak, value, F.col(ts).alias("_vf"))
    iv = iv.withColumn(
        "_vt",
        F.coalesce(F.lead("_vf").over(w_src), F.max("_vf").over(w_key)),
    )
    wus = int(bucket_width_seconds) * 1_000_000
    # parquet timestamps are TIMESTAMP_NTZ; unix_micros wants TIMESTAMP
    us_f = F.unix_micros(F.col("_vf").cast("timestamp"))
    us_t = F.unix_micros(F.col("_vt").cast("timestamp"))
    iv = iv.withColumn(
        "_tc_bucket",
        F.explode(
            F.sequence(
                F.floor(us_f / wus).cast("long"),
                F.floor(us_t / wus).cast("long"),
            )
        ),
    )
    a = iv.select(
        F.col(key).alias("_k"),
        F.col("_tc_bucket"),
        F.col(source).alias("source_a"),
        F.col(tiebreak).alias("id_a"),
        F.col(value).alias("value_a"),
        F.col("_vf").alias("_vf_a"),
        F.col("_vt").alias("_vt_a"),
    )
    b = iv.select(
        F.col(key).alias("_k"),
        F.col("_tc_bucket"),
        F.col(source).alias("source_b"),
        F.col(tiebreak).alias("id_b"),
        F.col(value).alias("value_b"),
        F.col("_vf").alias("_vf_b"),
        F.col("_vt").alias("_vt_b"),
    )
    return (
        a.join(b, ["_k", "_tc_bucket"])
        .where(
            (F.col("source_a") < F.col("source_b"))
            & (F.col("_vf_a") < F.col("_vt_b"))
            & (F.col("_vf_b") < F.col("_vt_a"))
            & (F.col("value_a") != F.col("value_b"))
        )
        .select(
            F.col("_k").alias(key),
            "source_a",
            "source_b",
            "id_a",
            "id_b",
            "value_a",
            "value_b",
            F.greatest("_vf_a", "_vf_b").alias("overlap_from"),
            F.least("_vt_a", "_vt_b").alias("overlap_to"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Allen interval algebra
# ---------------------------------------------------------------------------

ALLEN_RELATIONS = (
    "equals", "before", "after", "meets", "met_by", "starts", "started_by",
    "finishes", "finished_by", "during", "contains", "overlaps",
    "overlapped_by",
)


def allen_relations(
    intervals: DataFrame,
    key: str = "key",
    id_col: str = "iid",
    start: str = "s",
    end: str = "e",
) -> DataFrame:
    """Classify every ordered interval pair within a key group into one of
    Allen's 13 interval relations ("Maintaining Knowledge about Temporal
    Intervals", Allen, CACM 1983 — the standard temporal-KG reasoning
    vocabulary; a fact pair's relation decides whether SCD2 facts conflict,
    chain, or refine each other — see temporal_conflicts above, which is
    the special case "interior overlap + differing value").

    Input: one row per PROPER interval (start < end, numeric or epoch
    encoding), with a per-key unique id.  Output: (key, a, b, rel) for
    every pair a < b by id; ``rel`` is the relation of A relative to B.
    The 13 cases are mutually exclusive and exhaustive for proper
    intervals, so the final branch is written as an explicit predicate
    (no ``otherwise``) — an impossible pair would surface as NULL rather
    than silently misclassify.

    Scale: one equi-join on the group key, quadratic only within a group
    — the transcript/orders shape has bounded group sizes; for mega-keys,
    pre-bucket by coarse time exactly as interval_join_bucketed does and
    classify only same/adjacent buckets (pairs further apart are 'before'/
    'after' by construction).
    """
    a = intervals.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("a"),
        F.col(start).alias("s1"),
        F.col(end).alias("e1"),
    )
    b = intervals.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("b"),
        F.col(start).alias("s2"),
        F.col(end).alias("e2"),
    )
    s1, e1, s2, e2 = (F.col(c) for c in ("s1", "e1", "s2", "e2"))
    rel = (
        F.when((s1 == s2) & (e1 == e2), "equals")
        .when(e1 < s2, "before")
        .when(s1 > e2, "after")
        .when(e1 == s2, "meets")
        .when(s1 == e2, "met_by")
        .when((s1 == s2) & (e1 < e2), "starts")
        .when((s1 == s2) & (e1 > e2), "started_by")
        .when((e1 == e2) & (s1 > s2), "finishes")
        .when((e1 == e2) & (s1 < s2), "finished_by")
        .when((s1 > s2) & (e1 < e2), "during")
        .when((s1 < s2) & (e1 > e2), "contains")
        .when((s1 < s2) & (e1 < e2), "overlaps")
        .when((s1 > s2) & (e1 > e2), "overlapped_by")
    )
    return (
        a.join(b, "_k")
        .filter(F.col("a") < F.col("b"))
        .select(F.col("_k").alias(key), "a", "b", rel.alias("rel"))
    )


def interval_coverage_naive(
    df: DataFrame,
    key: str = "key",
    start: str = "s_us",
    end: str = "e_us",
) -> DataFrame:
    """Reference plan for `interval_coverage`: classic gaps-and-islands
    with ONE window per key — correct, but a mega-key sorts inside a
    single task (the scd2_timeline_naive caveat verbatim).  Kept as the
    equality oracle for the bucketed plan; intervals are half-open
    ``[s, e)`` LONG microseconds, rows with ``e <= s`` drop.

    Returns (key, n_intervals, n_islands, covered_us).
    """
    iv = df.select(
        F.col(key).alias("k"),
        F.col(start).cast("long").alias("s"),
        F.col(end).cast("long").alias("e"),
    ).filter(F.col("e") > F.col("s"))
    w = Window.partitionBy("k").orderBy("s", "e")
    run_max = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "ni",
        F.when(
            run_max.isNull() | (F.col("s") > run_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "iid", F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    islands = flagged.groupBy("k", "iid").agg(
        F.min("s").alias("ms"),
        F.max("e").alias("me"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return islands.groupBy(F.col("k").alias(key)).agg(
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("me") - F.col("ms")).cast("long").alias("covered_us"),
    )


def interval_coverage(
    df: DataFrame,
    key: str = "key",
    start: str = "s_us",
    end: str = "e_us",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Per-key union coverage of half-open ``[s, e)`` intervals: how much
    of the timeline each key actually covers after overlaps merge — the
    effective-uptime / SLA / speaker-airtime statistic, and the interval
    companion of `sessionize` (points with a gap rule) and
    `allen_relations` (pairwise interval classification).

    Returns (key, n_intervals, n_islands, covered_us): raw interval
    count, merged-run count (touching intervals merge: gap 0 is no gap),
    and the exact union length in LONG microseconds — pure integer
    arithmetic, bit-identical oracle.

    Scale plan (no per-key window over the whole key — the
    sessionize/scd2 mega-key discipline, by a different route):
    coverage MEASURE is additive over any partition of the time axis, so
    intervals are first CLIPPED to ``bucket_us`` buckets (one row per
    touched bucket via a sequence explode), islands merge LOCALLY inside
    each (key, bucket) window — bounded task, whatever the key's total
    span — and per-key sums re-assemble the answer.  The island COUNT is
    not additive: a run crossing a bucket boundary appears once on each
    side, so junctions (coverage touching the boundary from BOTH sides —
    detected from each bucket's min-start / max-end against the bucket
    edges, empty buckets cannot intervene because a spanning interval
    leaves a clipped piece in every bucket it crosses) are counted with
    one self-join on (key, bucket+1) and subtracted.  An interval
    spanning B buckets explodes into B rows — bounded by span /
    bucket_us; pick the bucket so typical intervals touch O(1) buckets.

    Matches `interval_coverage_naive` exactly (pinned by test).
    """
    if bucket_us < 1:
        raise ValueError("bucket_us must be >= 1")
    iv = df.select(
        F.col(key).alias("k"),
        F.col(start).cast("long").alias("s"),
        F.col(end).cast("long").alias("e"),
    ).filter(F.col("e") > F.col("s"))
    n_raw = iv.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals")
    )
    b = F.lit(bucket_us)
    pieces = iv.select(
        "k",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / b).cast("long"),
                F.floor((F.col("e") - 1) / b).cast("long"),
            )
        ).alias("bkt"),
        "s",
        "e",
    ).select(
        "k",
        "bkt",
        F.greatest(F.col("s"), F.col("bkt") * b).alias("ps"),
        F.least(F.col("e"), (F.col("bkt") + 1) * b).alias("pe"),
    )
    w = Window.partitionBy("k", "bkt").orderBy("ps", "pe")
    run_max = F.max("pe").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pieces.withColumn(
        "ni",
        F.when(
            run_max.isNull() | (F.col("ps") > run_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "iid", F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    islands = flagged.groupBy("k", "bkt", "iid").agg(
        F.min("ps").alias("ms"), F.max("pe").alias("me")
    )
    per_bucket = islands.groupBy("k", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("n_isl"),
        F.sum(F.col("me") - F.col("ms")).cast("long").alias("cov"),
        F.max(
            (F.col("me") == (F.col("bkt") + 1) * b).cast("int")
        ).alias("touch_r"),
        F.max(
            (F.col("ms") == F.col("bkt") * b).cast("int")
        ).alias("touch_l"),
    ).localCheckpoint(eager=False)
    junctions = (
        per_bucket.filter(F.col("touch_r") == 1)
        .select("k", (F.col("bkt") + 1).alias("bkt"))
        .join(
            per_bucket.filter(F.col("touch_l") == 1).select("k", "bkt"),
            ["k", "bkt"],
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_junc"))
    )
    agg = per_bucket.groupBy("k").agg(
        F.sum("n_isl").cast("long").alias("isl_raw"),
        F.sum("cov").cast("long").alias("covered_us"),
    )
    return (
        agg.join(junctions, "k", "left")
        .join(n_raw, "k")
        .select(
            F.col("k").alias(key),
            "n_intervals",
            (F.col("isl_raw") - F.coalesce("n_junc", F.lit(0)))
            .cast("long")
            .alias("n_islands"),
            "covered_us",
        )
    )
