"""Salted per-conversation apply — explicit mega-thread skew handling.

The north rule requires conversations to be "salted and range-partitioned on
conv_id with explicit skew handling for mega-threads".  Hash-spreading
already protects the stateless stages (extraction never groups,
tests/test_skew.py), but any genuinely PER-CONVERSATION computation
(applyInPandas over conv_id) would hand one task a whole mega-thread.  This
module provides the salted version:

  1. conversation sizes come from one cheap count agg;
  2. conversations over `mega_threshold` turns get a salt column
     `floor(turn_idx / chunk_rows)` — contiguous turn RANGES, so a chunk
     function that needs local order still sees ordered, gap-free slices;
  3. `applyInPandas` groups on (conv_id, salt) — the mega thread becomes
     many bounded tasks;
  4. an associative `merge` reduces chunk partials per conversation
     (a plain groupBy, map-side combinable).

The (chunk_fn, merge agg) contract is the classic partial/final aggregation
split — the same shape Catalyst uses for its own aggregates, lifted to
user-defined per-conversation logic.

Reference analog: the reference caps pathological node size with a 16 MB
token buffer (/root/reference/lib/feedparser.js:82-90) rather than letting
one element consume the process; chunking a mega-thread is the distributed
version of that bound.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MEGA_THRESHOLD = 10_000
DEFAULT_CHUNK_ROWS = 2_000


def salted(
    transcripts: DataFrame,
    mega_threshold: int = DEFAULT_MEGA_THRESHOLD,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    mode: str = "range",
) -> DataFrame:
    """Add a `salt` column: 0 for normal conversations, chunk index for
    mega conversations.  One count agg + a broadcast join of the (tiny)
    mega list.

    mode="range": salt = floor(order_col / chunk_rows) — contiguous,
    gap-free ordered slices, for chunk functions that need local order.
    ONLY valid when order_col is a dense per-group index (turn_idx is).
    With a globally-assigned id, range-width buckets degenerate to one
    chunk per row (each group's ids are spread across the whole id space),
    and per-group Python dispatch overhead explodes.

    mode="hash": salt = pmod(hash(order_col), ceil(n / chunk_rows)) —
    bounds EXPECTED chunk size at chunk_rows for any order-col density;
    chunks are unordered samples, so only valid for order-independent
    chunk functions (anything with an associative merge).
    """
    if mode not in ("range", "hash"):
        raise ValueError(f"salted: unknown mode {mode!r}")
    sizes = transcripts.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    mega = sizes.filter(F.col("_n") > mega_threshold).select(
        group_col,
        F.ceil(F.col("_n") / chunk_rows).cast("int").alias("_n_chunks"),
    )
    flagged = transcripts.join(F.broadcast(mega), group_col, "left")
    if mode == "range":
        chunk_idx = F.floor(F.col(order_col) / chunk_rows).cast("int")
    else:
        chunk_idx = F.pmod(F.hash(F.col(order_col)), F.col("_n_chunks")).cast("int")
    salt = F.when(F.col("_n_chunks").isNotNull(), chunk_idx).otherwise(F.lit(0))
    return flagged.withColumn("salt", salt).drop("_n_chunks")


def conversation_stats(
    transcripts: DataFrame,
    mega_threshold: int = DEFAULT_MEGA_THRESHOLD,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    tool_col: str = "tool",
    salt_mode: str = "hash",
) -> DataFrame:
    """Per-conversation stats via salted applyInPandas + associative merge.

    Output: (conv_id, n_turns, n_chars, n_tool_turns, max_turn_idx).
    Semantically identical to a direct groupBy(conv_id) — the point is the
    EXECUTION shape: no task ever holds more than ~chunk_rows turns of a
    mega thread, and the merge is a map-side-combinable groupBy.

    Defaults to salt_mode="hash" because the chunk function is
    order-independent and the merge associative — hash salting bounds
    chunk size for ANY order-col density (a global event id as much as a
    dense turn_idx).  Pass salt_mode="range" only for chunk functions
    that need ordered, gap-free slices, and only with a dense per-group
    order col.
    """
    chunk_schema = (
        f"{group_col} string, n_turns long, n_chars long, "
        "n_tool_turns long, max_turn_idx int"
    )

    def chunk_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_turns": [len(pdf)],
                "n_chars": [int(pdf[text_col].str.len().fillna(0).sum())],
                "n_tool_turns": [int(pdf[tool_col].notna().sum())],
                "max_turn_idx": [int(pdf[order_col].max())],
            }
        )

    # Explicit repartition on the grouping keys: AQE coalesces shuffle
    # partitions by BYTES, but this stage's cost is per-group Python
    # dispatch — a few MB of salted groups coalesced into 3 partitions
    # serializes thousands of applyInPandas calls onto 3 cores.  A
    # user-specified repartition is exempt from AQE coalescing and
    # already satisfies the applyInPandas clustered distribution, so no
    # second shuffle is added.
    n_parts = int(
        transcripts.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    chunked = (
        salted(
            transcripts, mega_threshold, chunk_rows, group_col, order_col,
            mode=salt_mode,
        )
        .repartition(n_parts, group_col, "salt")
        .groupBy(group_col, "salt")
        .applyInPandas(chunk_stats, chunk_schema)
    )
    return chunked.groupBy(group_col).agg(
        F.sum("n_turns").alias("n_turns"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_tool_turns").alias("n_tool_turns"),
        F.max("max_turn_idx").alias("max_turn_idx"),
    )
