"""Custom stateful streaming operator — running per-conversation state via
applyInPandasWithState.

The reference enriches its one `meta` object incrementally as the stream
progresses and fires events when enough is known
(/root/reference/lib/feedparser.js:351-357, 367-376; SURVEY.md §2.8 'meta
event enrichable until end').  The streaming analog: a per-conversation
accumulator that survives micro-batches in the state store and emits an
updated conversation summary whenever new turns arrive.

Scale notes: state is one small row per live conversation, partitioned by
conv_id across the cluster's state store; a GroupStateTimeout would expire
idle conversations in a continuous deployment (the availableNow batch-drain
used in tests never idles, so the timeout path stays NoTimeout here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_tool_turns", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_tool_turns", LongType()),
        StructField("max_turn_idx", IntegerType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_conv(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_turns, n_tool, max_idx = state.get
    else:
        n_turns, n_tool, max_idx = 0, 0, -1
    last_ts = None
    for pdf in pdfs:
        n_turns += len(pdf)
        n_tool += int(pdf["tool"].notna().sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
            ts_max = pdf["ts"].max()
            if pd.notna(ts_max):
                last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n_turns, n_tool, max_idx))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_tool_turns": [n_tool],
            "max_turn_idx": [max_idx],
            "last_ts": [last_ts],
        }
    )


def conv_state_stream(transcripts: DataFrame) -> DataFrame:
    """Streaming per-conversation running summary (update mode): each
    micro-batch that touches a conversation emits its refreshed totals,
    carried across batches by the state store."""
    return transcripts.groupBy("conv_id").applyInPandasWithState(
        _update_conv,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
