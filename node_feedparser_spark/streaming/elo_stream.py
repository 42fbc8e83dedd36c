"""Streaming face of sequential Elo rating (operators/preference.elo_fold).

Continuous preference-signal aggregation: comparisons arrive as a stream
(pool, seq, winner, loser) and each pool's rating table lives in the state
store, updated by the SAME ``elo_fold`` the batch operator runs — parity
between the faces is structural, not re-implemented.  This is the
order-dependent twin of the bradley_terry MM aggregate: Elo is an online
algorithm by construction (each result moves two ratings immediately), so
a streaming state-store operator is its native shape, and the batch
``elo_ratings`` is the replay.

State per pool: parallel arrays (players, ratings, games, wins) plus
``last_seq`` — comparisons at or below last_seq are skipped inside the
fold, so a replayed micro-batch after checkpoint recovery cannot
double-apply a result (the same idempotence discipline as
stream_extract's first-wins dedupe).  Within a micro-batch rows are
folded in (seq, winner, loser) order; across micro-batches ordering
holds for in-seq-order sources, the same caveat burst_stream documents
for its in-order parity.

Scale notes: state is one bounded row per pool (players are a dimension
by contract); each micro-batch hands the pandas function only that
pool's new rows, so the fold is O(new comparisons).  Output mode is
update: after every micro-batch each touched pool emits its full current
rating table (pools are small; downstream sinks upsert by (pool,
player)).

Pinned by tests/test_elo_stream.py: drain parity with the batch
operator, state carry + no-double-apply across two checkpointed
availableNow drains, and hand-computed fold cases.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from node_feedparser_spark.operators.preference import (
    ELO_BASE,
    ELO_K,
    ELO_SCALE,
    elo_fold,
)

STATE_SCHEMA = StructType(
    [
        StructField("players", ArrayType(StringType())),
        StructField("ratings", ArrayType(DoubleType())),
        StructField("games", ArrayType(LongType())),
        StructField("wins", ArrayType(LongType())),
        StructField("last_seq", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("pool", StringType()),
        StructField("player", StringType()),
        StructField("rating", DoubleType()),
        StructField("n_games", LongType()),
        StructField("wins", LongType()),
    ]
)


def _make_update(k: float, scale: float, base: float):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (pool,) = key
        if state.exists:
            players, ratings, games, wins, last_seq = state.get
            st = {
                "ratings": dict(zip(players, ratings)),
                "games": dict(zip(players, games)),
                "wins": dict(zip(players, wins)),
                "last_seq": int(last_seq),
            }
        else:
            st = {"ratings": {}, "games": {}, "wins": {}, "last_seq": -1}
        rows: list[tuple[int, str, str]] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            rows.extend(
                zip(
                    pdf["seq"].astype("int64"),
                    pdf["winner"].astype(str),
                    pdf["loser"].astype(str),
                )
            )
        if not rows:
            yield pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA])
            return
        st = elo_fold(rows, k=k, scale=scale, base=base, state=st)
        players = sorted(st["ratings"])
        state.update(
            (
                players,
                [st["ratings"][p] for p in players],
                [st["games"][p] for p in players],
                [st["wins"][p] for p in players],
                st["last_seq"],
            )
        )
        yield pd.DataFrame(
            {
                "pool": [pool] * len(players),
                "player": players,
                "rating": [st["ratings"][p] for p in players],
                "n_games": [st["games"][p] for p in players],
                "wins": [st["wins"][p] for p in players],
            }
        )

    return _update


def stream_elo(
    comparisons: DataFrame,
    pool: str = "pool",
    k: float = ELO_K,
    scale: float = ELO_SCALE,
    base: float = ELO_BASE,
) -> DataFrame:
    """Streaming per-pool Elo rating tables — after each micro-batch every
    touched pool emits its full current (player, rating, n_games, wins)
    snapshot, byte-identical to the batch ``elo_ratings`` replay of the
    same in-order comparison sequence."""
    return comparisons.groupBy(F.col(pool).alias("pool")).applyInPandasWithState(
        _make_update(k, scale, base),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
