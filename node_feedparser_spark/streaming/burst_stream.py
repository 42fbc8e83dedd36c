"""Streaming face of the rate-burst detector (operators/profile.burst_detect).

Continuous anomaly screening over an event stream: per event-type state in
the state store carries (a) the currently-open time bucket's partial count
and (b) the trailing deque of the last ``trail`` CLOSED bucket counts.  A
bucket closes when a later bucket for the same key is first seen — the
in-operator analog of a watermark: events later than one whole bucket are
dropped (counted in ``n_late`` nowhere; the batch operator has no late
data, so parity holds on in-order streams).  When a bucket closes with a
full trailing window behind it, the SAME flag rule as the batch operator
runs — ROUND_HALF_UP(cnt - mean - z*std, 6) > 0, sample (n-1) std from
integer sum/sum-of-squares — and a flagged row is emitted.

Scale notes: state is one small row per event type (two bounded arrays),
partitioned across the state store; each micro-batch reduces to per-key
bucket counts inside the pandas function before any state math, so state
updates are O(buckets touched), not O(events).  Output mode is update
(append would hold rows until watermark expiry; flags should fire as soon
as their bucket closes).

The semantics match burst_detect on in-order data and are pinned by
tests/test_burst_stream.py: single-drain parity with the batch operator
(the still-open final bucket excluded) and state carry across two
checkpointed drains.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

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

STATE_SCHEMA = StructType(
    [
        StructField("open_bkt", LongType()),
        StructField("open_cnt", LongType()),
        StructField("trail_bkts", ArrayType(LongType())),
        StructField("trail_cnts", ArrayType(LongType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket_start_s", LongType()),
        StructField("cnt", LongType()),
        StructField("trail_mean", DoubleType()),
        StructField("trail_std", DoubleType()),
    ]
)


def _r6(x: float) -> float:
    # Spark's ROUND is HALF_UP; Python's round is banker's — mirror Spark
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _make_update(bucket_seconds: int, trail: int, z: float):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            open_bkt, open_cnt, tb, tc = state.get
            tb, tc = list(tb), list(tc)
        else:
            open_bkt, open_cnt, tb, tc = -1, 0, [], []
        counts: dict[int, int] = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            # normalize to ns first (Arrow may hand us datetime64[us]),
            # then bucket; parquet timestamps are NTZ/UTC throughout
            bk = (
                pdf["ts"].astype("datetime64[ns]").astype("int64")
                // 1_000_000_000
                // bucket_seconds
            ).value_counts()
            for b, c in bk.items():
                counts[int(b)] = counts.get(int(b), 0) + int(c)
        if not counts:
            yield pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA])
            return
        if open_bkt >= 0:
            counts[open_bkt] = counts.get(open_bkt, 0) + open_cnt
        last_closed = tb[-1] if tb else -1
        max_bkt = max(counts)
        out = []
        for b in sorted(counts):
            if b <= last_closed:
                continue  # late beyond the open bucket: dropped
            if b < max_bkt:  # closes now
                cnt = counts[b]
                if len(tc) == trail:
                    s1 = sum(tc)
                    s2 = sum(c * c for c in tc)
                    mean = s1 / trail
                    var = (s2 - s1 * s1 / trail) / (trail - 1)
                    std = max(var, 0.0) ** 0.5
                    if _r6(cnt - mean - z * std) > 0:
                        out.append(
                            (etype, b * bucket_seconds, cnt, _r6(mean), _r6(std))
                        )
                tb.append(b)
                tc.append(cnt)
                tb, tc = tb[-trail:], tc[-trail:]
            else:
                open_bkt, open_cnt = b, counts[b]
        state.update((open_bkt, open_cnt, tb, tc))
        yield pd.DataFrame(
            out, columns=[f.name for f in OUTPUT_SCHEMA]
        )

    return _update


def stream_bursts(
    events: DataFrame,
    group: str = "event_type",
    bucket_seconds: int = 21_600,
    trail: int = 8,
    z: float = 2.0,
) -> DataFrame:
    """Streaming burst flags, one row per (type, closed bucket) that beats
    the trailing baseline — same rule and output shape as burst_detect."""
    return events.groupBy(F.col(group)).applyInPandasWithState(
        _make_update(bucket_seconds, trail, z),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
