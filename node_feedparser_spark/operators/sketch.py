"""Cardinality sketches — HyperLogLog distinct counting on DataFrames.

At 10^12 rows, ``COUNT(DISTINCT x)`` per group is a full shuffle of every
distinct value; the HLL sketch gets within a few percent with ONE
map-side-combinable aggregation whose state is ``m = 2^p`` small integers
per group.  Spark ships `approx_count_distinct` (a HLL++ built-in), but
its register layout is opaque to other engines; this operator builds the
registers from the repo's portable 60-bit hash (functions/hashing.py) so
the DuckDB oracle can replay them BIT-FOR-BIT — the same
engine-portability discipline as minhash/simhash.

Flajolet et al. 2007 estimator, 60-bit hash split as::

    bucket = h mod m                (low p bits)
    w      = h >> p                 (remaining 60-p bits)
    rho    = (60-p) - bitlen(w) + 1 (leading-zero rank; w=0 -> 60-p+1)

register[bucket] = max(rho); raw estimate alpha_m * m^2 / sum(2^-reg)
(empty buckets contribute 2^0 = 1); linear-counting correction
``m * ln(m / zeros)`` when the raw estimate <= 2.5m and zeros > 0.  No
64-bit large-range correction is needed at a 60-bit hash.

The register table is MERGEABLE (elementwise max) — sketches computed per
partition / per day union into totals without touching raw data, which is
the property that makes the sketch worth having at warehouse scale.

Plan: one groupBy(group, bucket) max (map-side combinable — the only pass
over the data), one groupBy(group) fold of <= m rows per group.  bitlen
via length(bin(w)) keeps everything integer-exact (no double holds a
60-bit int); the dyadic 2^-rho sums are rounded at 9 dp before the final
division so engine summation order cannot leak into the 4 dp estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from node_feedparser_spark.functions.hashing import portable_hash60

#: total hash bits produced by portable_hash60
_HASH_BITS = 60


def _alpha(m: int) -> float:
    # the standard bias-correction constant; the m >= 128 closed form
    # (p >= 7 enforced below)
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """(group..., bucket, register) — the mergeable sketch state."""
    if not 7 <= p <= 16:
        raise ValueError("p must be in [7, 16] (m = 2^p registers)")
    m = 1 << p
    h = portable_hash60(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(_HASH_BITS - p + 1)).otherwise(
        F.lit(_HASH_BITS - p + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(m)).alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL distinct-count estimate.

    Returns (group..., n_registers, n_zero_buckets, hll_estimate) with the
    estimate rounded to 4 dp.  Relative error is ~1.04/sqrt(m) (~6.5% at
    p=8; raise p for tighter bounds — state grows linearly).
    """
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union several sketches' register tables into one (elementwise max) —
    e.g. per-day sketches folding into a running total."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate_from_registers(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Finish a (possibly merged) register table into estimates — identical
    arithmetic to hll_distinct's tail."""
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.round(F.sum(F.pow(F.lit(2.0), -F.col("register"))), 9).alias("_s"),
    )
    zeros = F.lit(m) - F.col("n_registers")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_registers",
        zeros.cast("long").alias("n_zero_buckets"),
        F.round(est, 4).alias("hll_estimate"),
    )
