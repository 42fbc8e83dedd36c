"""Storage-layout optimization — Z-order (Morton) clustering keys.

The lakehouse file-clustering primitive behind Iceberg's sort-order /
Delta's ``OPTIMIZE ZORDER BY``: interleaving the bits of several columns'
normalized values produces a single sort key whose total order preserves
MULTI-dimensional locality, so files written in z-key ranges give
min/max-stat file skipping on EVERY participating column, not just the
leading one of a lexicographic sort.  At 100 TB this is the difference
between a two-column predicate pruning ~sqrt of the files and pruning
almost all of them.

Pipeline fit: compact_kg rewrites partitions; writing the rewrite sorted by
``zorder_key(subj_id, pred_hash)`` is the natural follow-on (the compaction
job stays unchanged — the key is just a sort column).

Everything is integer/bit arithmetic from min-max-normalized doubles (the
quantize_embeddings discipline), unrolled per bit, so the plan is pure
whole-stage-codegen projection and the DuckDB oracle replays it
bit-for-bit.  The only non-projection work is one tiny global min/max agg
broadcast back — at scale these bounds come from table stats for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: Column, hi: Column, levels: int) -> Column:
    """Min-max map to an integer grid cell in [0, levels-1]; degenerate
    (hi == lo) columns collapse to cell 0."""
    cell = F.floor(
        (col.cast("double") - lo) / (hi - lo) * levels
    )
    return (
        F.when(hi > lo, F.least(cell, F.lit(levels - 1)))
        .otherwise(F.lit(0))
        .cast("long")
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Add a Morton z-key column interleaving ``bits`` bits per column.

    Column j's bit i lands at z-bit ``i * len(cols) + j`` (bit 0 = least
    significant), the standard interleave; total key width is
    ``bits * len(cols)`` bits (capped at 60 so the key stays a clean
    BIGINT in every engine).  Bounds are one global min/max agg,
    broadcast back — a pure projection afterwards.
    """
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns")
    if bits * len(cols) > 60:
        raise ValueError("bits * n_cols must be <= 60")
    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            )
        ]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    n = len(cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cell = _normalize(
            F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), 1 << bits
        )
        for i in range(bits):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1).cast("long"))
            z = z + bit * F.lit(1 << (i * n + j)).cast("long")
    return with_bounds.withColumn(out_col, z).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )


def zorder_key_sql(
    cols: list[str], bits: int = 8, bounds_cte: str = "bounds"
) -> str:
    """DuckDB expression replaying zorder_key bit-for-bit; expects a CTE
    exposing _lo_<col> / _hi_<col> (cross-joined) exactly like the Spark
    plan's broadcast bounds."""
    n = len(cols)
    levels = 1 << bits
    terms = []
    for j, c in enumerate(cols):
        cell = (
            f"(CASE WHEN _hi_{c} > _lo_{c} THEN LEAST(CAST(FLOOR("
            f"(CAST({c} AS DOUBLE) - _lo_{c}) / (_hi_{c} - _lo_{c})"
            f" * {levels}) AS BIGINT), {levels - 1}) ELSE 0 END)"
        )
        for i in range(bits):
            terms.append(
                f"((({cell} >> {i}) & 1) * {1 << (i * n + j)})"
            )
    return " + ".join(terms)


def zorder_locality_stats(
    zdf: DataFrame,
    cols: list[str],
    n_files: int = 64,
    bits: int = 8,
    z_col: str = "zkey",
) -> DataFrame:
    """Per-simulated-file min/max ranges of each participating column when
    rows are packed into ``n_files`` equal z-key ranges — the file-skipping
    evidence: tight per-file column ranges mean a point/range predicate on
    ANY column prunes most files.  Returns one row per non-empty file:
    (file_id, n_rows, <col>_min, <col>_max ...).
    """
    span = 1 << (bits * len(cols))
    width = max(span // n_files, 1)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        zdf.select(
            (F.col(z_col) / width).cast("long").alias("file_id"), *cols
        )
        .groupBy("file_id")
        .agg(*aggs)
    )
