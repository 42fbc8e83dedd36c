"""Streaming face of gap-based sessionization (operators/sessionize.py).

Uses Spark's native ``session_window`` — the engine's own merging-window
state machine — rather than re-implementing session assembly in a custom
stateful operator: each event opens a [ts, ts+gap) window, overlapping
windows merge, and the state store holds one in-flight window per (key,
open session).  With a watermark, closed sessions are finalized and their
state evicted; this is exactly the "scoped context on a time axis"
discipline of the batch operator, lifted to unbounded input.

Boundary semantics (pinned by test): Spark's session window is INCLUSIVE
at its end — an event arriving exactly ``gap_seconds`` after the previous
one extends the session — which matches the batch operator's ``diff <=
gap`` rule (its DuckDB oracle runs ``diff > gap`` as the split test)
row-for-row, exact boundary included.

Output-mode contract:
- continuous deployments: ``append`` + watermark — a session row is
  emitted exactly once, when the watermark proves it can no longer extend,
  and its state is dropped (bounded state);
- finite drains / tests: ``complete`` — every session so far is emitted
  each trigger (state is the full session set; fine for a drain, wrong for
  an always-on stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int,
    watermark: str = "1 hour",
    key: str = "user_id",
    ts: str = "ts",
    value: str | None = "value",
) -> DataFrame:
    """Streaming session aggregation: one row per (key, session).

    Output columns match the batch operator's aggregate face —
    (key, n_events, session_start, session_end[, total_value]) — with
    window_end (last event + gap, the engine's session bound) kept as
    well.  No ordinal session_id: a stream cannot number an unbounded
    past; order by session_start instead.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    ]
    if value is not None:
        aggs.append(F.round(F.sum(value), 4).alias("total_value"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(
            key,
            F.session_window(F.col(ts), f"{gap_seconds} seconds").alias("_w"),
        )
        .agg(*aggs)
        .select(
            key,
            *(
                ["n_events", "session_start", "session_end"]
                + (["total_value"] if value is not None else [])
            ),
            F.col("_w.end").alias("window_end"),
        )
    )
