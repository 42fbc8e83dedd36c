"""Watermarked stream-stream interval join — the one Structured-Streaming
join shape the repo's streaming surface did not yet exercise (stream-static
broadcasts live in stream_extract; session windows in sessionize_stream;
stateful accumulators in stateful.py/burst_stream.py).

Semantics: an impression matches every click on the same key that lands in
``[impression.ts, impression.ts + max_delay_seconds]`` — the streaming twin
of the batch click_attribution / interval_join pair.  Both sides carry
watermarks, and the time-bound condition is what lets the engine EVICT
join state: an impression's state can be dropped once the click watermark
passes its upper bound (Spark derives this from the inequality — without
the bound, stream-stream inner join state grows forever and the query is
rejected for update/append semantics at scale).

Scale notes: state is partitioned by the join key across the state store;
the watermark delay is the late-data SLA — clicks later than the watermark
are dropped by the engine (not by our code), which tests pin by draining a
too-late click through a checkpoint and asserting it never joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "ad_id",
    max_delay_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """(key, imp_id, imp_ts, click_id, click_ts, delay_s) for every click
    within max_delay_seconds at-or-after its impression, same key.

    Columns expected: impressions(key, imp_id, ts), clicks(key, click_id,
    ts).  Inner join; each side watermarked so the engine bounds state.
    """
    i = (
        impressions.select(
            F.col(key).alias("k"),
            F.col("imp_id"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", watermark)
    )
    c = (
        clicks.select(
            F.col(key).alias("k"),
            F.col("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    ia, ca = i.alias("i"), c.alias("c")
    # the time bound must live IN the join condition (not a post-filter)
    # so the engine can derive state-eviction thresholds from it
    cond = (
        (F.col("i.k") == F.col("c.k"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (
            F.col("click_ts")
            <= F.col("imp_ts") + F.expr(f"INTERVAL {int(max_delay_seconds)} SECOND")
        )
    )
    return ia.join(ca, cond, "inner").select(
        F.col("i.k").alias(key),
        "imp_id",
        "imp_ts",
        "click_id",
        "click_ts",
        (
            (F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("imp_ts")))
            / F.lit(1_000_000)
        ).cast("long").alias("delay_s"),
    )
