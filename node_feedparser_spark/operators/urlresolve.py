"""Scoped-context retro-resolution — the W2/W3 operators with real URL
semantics, not just the window shape.

The reference discovers a feed's base URL possibly LATE (an xml:base or
the feed link arriving after items already emitted) and then re-resolves
already-emitted relative URLs against it (reresolve,
/root/reference/lib/utils.js:160-210, driven from lib/feedparser.js:358-360
and pinned by test/xmlbase.js:47-68,143-168).  The transcript analog: a
conversation establishes its base URL at SOME turn (the first absolute URL
anyone mentions), and relative URL mentions in ALL turns — including turns
BEFORE the base was established — resolve against that conversation-scoped
context.

Spark plan (context-first two-pass, SURVEY.md W3):
  pass 1: derive the per-conversation context — filter to absolute URLs
          (JVM rlike screen, no UDF), min_by over the turn order -> one
          (conv_id, base_url) row per conversation.  Partial-aggregatable,
          one narrow shuffle on conv_id.
  pass 2: join the context back (plain shuffle join on conv_id — both
          sides hash-partition on the same key; the aggregated dim is one
          row per conversation so AQE may broadcast it) and rewrite every
          relative URL with the Arrow-batched resolve UDF.

At 10^12 turns both passes are linear, shuffle only (conv_id, base_url)
pairs + the turn rows once, and have no skew amplification: the window in
pass 1 is an aggregation (min_by), not a row_number over mega-threads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import ABSOLUTE_URL_RLIKE, resolve_udf


def derive_conv_base(
    turns: DataFrame,
    url_col: str = "url",
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """First absolute URL per conversation in turn order ->
    (conv_col, base_url).  'First' is deterministic: min_by over the
    composite order tuple."""
    order = F.struct(*[F.col(c) for c in order_cols])
    return (
        turns.filter(F.col(url_col).rlike(ABSOLUTE_URL_RLIKE))
        .groupBy(conv_col)
        .agg(F.min_by(F.col(url_col), order).alias("base_url"))
    )


def retro_resolve_urls(
    turns: DataFrame,
    url_col: str = "url",
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    out_col: str = "resolved_url",
) -> DataFrame:
    """Two-pass retro-resolution: every turn's URL — EARLIER turns included
    — resolves against the conversation's first absolute URL.  Rows in
    conversations with no absolute URL pass through unchanged (resolve's
    null-base pass-through, the reference's never-throw discipline)."""
    base = derive_conv_base(turns, url_col, conv_col, order_cols)
    return (
        turns.join(base, conv_col, "left")
        .withColumn(out_col, resolve_udf(F.col("base_url"), F.col(url_col)))
    )
