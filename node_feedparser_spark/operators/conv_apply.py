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
) -> DataFrame:
    """Add a `salt` column: 0 for normal conversations, turn-range chunk
    index for mega conversations.  One count agg + a broadcast join of the
    (tiny) mega list."""
    sizes = transcripts.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    mega = sizes.filter(F.col("_n") > mega_threshold).select(group_col)
    flagged = transcripts.join(
        F.broadcast(mega.withColumn("_is_mega", F.lit(True))), group_col, "left"
    )
    salt = F.when(
        F.col("_is_mega").isNotNull(),
        F.floor(F.col(order_col) / chunk_rows).cast("int"),
    ).otherwise(F.lit(0))
    return flagged.withColumn("salt", salt).drop("_is_mega")


def conversation_stats(
    transcripts: DataFrame,
    mega_threshold: int = DEFAULT_MEGA_THRESHOLD,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation stats via salted applyInPandas + associative merge.

    Output: (conv_id, n_turns, n_chars, n_tool_turns, max_turn_idx).
    Semantically identical to a direct groupBy(conv_id) — the point is the
    EXECUTION shape: no task ever holds more than chunk_rows turns of a
    mega thread, and the merge is a map-side-combinable groupBy.
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

    chunked = (
        salted(transcripts, mega_threshold, chunk_rows, group_col, order_col)
        .groupBy(group_col, "salt")
        .applyInPandas(chunk_stats, chunk_schema)
    )
    return chunked.groupBy(group_col).agg(
        F.sum("n_turns").alias("n_turns"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_tool_turns").alias("n_tool_turns"),
        F.max("max_turn_idx").alias("max_turn_idx"),
    )
