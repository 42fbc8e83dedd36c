"""SFT training-pair extraction — transcripts into (prompt, response) rows.

The last mile of a conversation-corpus pipeline: after dedupe, curation and
profiling, assistant turns become supervised fine-tuning examples whose
prompt is the rendered trailing context window.  The reference's analog is
its item assembly — each emitted item carries the meta context it appeared
under (lib/feedparser.js:503-535 joins item fields with the surrounding
channel state); here each response carries its surrounding conversation
prefix.

``sft_pairs``:
- context = the previous ``context_turns`` turns in (turn_idx) order,
  rendered ``role: text`` and joined with ``sep`` (NULL text renders with
  an empty body, ``role: `` — a tool turn with no transcript body still
  marks its position, like the reference's empty-element placeholders);
- one output row per assistant turn with at least ``min_response_chars``
  of text and at least one context turn (a conversation-opening assistant
  turn has nothing to condition on — dropped, matching standard SFT data
  prep);
- output: (conv_id, turn_idx, prompt, response, n_context_turns).

Scale shape: ONE shuffle on conv_id; the context window is a bounded
rows-frame (``ROWS BETWEEN context_turns PRECEDING AND 1 PRECEDING``) so
each row's prompt is at most ``context_turns`` turn-lengths — the
duplication factor is declared and constant, never conversation-length
(contrast a cumulative unbounded-preceding frame, which would square
mega-threads).  Everything is JVM string/window work — no Python.

Portability: collect_list over an ordered rows-frame preserves frame
order in Spark; the DuckDB oracle's windowed string_agg aggregates in the
same ORDER BY — both pinned by the dedicated tests' explicit expected
strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sft_pairs(
    transcripts: DataFrame,
    context_turns: int = 4,
    min_response_chars: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Extract (prompt, response) SFT rows from the north-rule transcript
    shape — one row per assistant turn with a non-trivial response and a
    non-empty rendered context of the previous ``context_turns`` turns."""
    if context_turns < 1:
        raise ValueError(f"context_turns must be >= 1, got {context_turns}")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    line = F.concat_ws(": ", F.col("role"), F.coalesce(F.col("text"), F.lit("")))
    ctx = F.collect_list(line).over(w)
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("text").alias("response"),
            ctx.alias("_ctx"),
        )
        .filter(F.col("role") == "assistant")
        .filter(
            F.length(F.coalesce(F.col("response"), F.lit("")))
            >= int(min_response_chars)
        )
        .filter(F.size("_ctx") >= 1)
        .select(
            "conv_id",
            "turn_idx",
            F.concat_ws(sep, F.col("_ctx")).alias("prompt"),
            "response",
            F.size("_ctx").cast("long").alias("n_context_turns"),
        )
    )
