"""Bloom-filter semi-join pruning — broadcast runtime filters on DataFrames.

The classic 100 TB join-reduction move: when a selective predicate lives on
the SMALL side of a join (dimension), build a Bloom filter of the surviving
keys and apply it to the FACT side *before* the shuffle — rows that cannot
match never enter the exchange.  Spark's own optimizer does this
automatically behind ``spark.sql.optimizer.runtime.bloomFilter.enabled``
(AQE runtime filters); this operator is the explicit, engine-portable twin:
the bit array is built from the repo's portable 60-bit hash so the DuckDB
oracle reconstructs it BIT-FOR-BIT, and the filter state is first-class
(inspectable, mergeable by OR, persistable next to the data like an Iceberg
partition-level bloom).

Layout: ``m`` bits packed 32 per BIGINT word (32, not 64 — DuckDB raises on
``1 << 63``, and the sign bit buys nothing), k seeded hash functions
(portable_hash60 seeded 100+i).  The build side aggregates positions with
ONE map-side-combinable ``bit_or`` into at most m/32 sparse words, collected
into a single-row ``map<word_idx, word>`` — a few KB for m = 2^16..2^20 —
which broadcasts to the probe side as a pure projection: NO shuffle, no
join, of the fact table.  False-positive rate ~ (1 - e^(-k n / m))^k; size
m >= 1.44 k n for the k chosen.

Membership is one-sided, like every sketch here: a true key always passes
(all k bits were set by the build), a miss proves non-membership — so the
prune is LOSSLESS for join semantics, and the exact join afterwards only
sees the (small) false-positive surplus.

Reference analog: the reference prunes per-item work by cheap screens before
expensive parsing (mayHaveEmbeddedHtml gate, /root/reference/lib/utils.js:342-355)
— same shape: a cheap over-approximate test that never drops a real match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from node_feedparser_spark.functions.hashing import portable_hash60


def _bit(pos_mod: Column) -> Column:
    # 2^(pos % 32) as a long — F.shiftleft only takes a literal shift
    # amount, and 2^31 is exact in a double, so pow is the portable spell
    return F.pow(F.lit(2.0), pos_mod).cast("long")

#: bits packed per BIGINT word (see module docstring for why not 64)
WORD_BITS = 32
#: seed base for the k hash families
SEED_BASE = 100


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(portable_hash60(key, seed=SEED_BASE + i), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Single-row (bloom: map<long, long>, n_keys: long) filter state.

    One explode of k positions per build row, one map-side-combinable
    bit_or per word, one tiny collect-to-map agg.  Merge two filters of
    identical (m_bits, k) by unioning their word tables and re-OR-ing.
    """
    if m_bits % WORD_BITS != 0 or m_bits < 1024:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}, >= 1024")
    if not 1 <= k <= 8:
        raise ValueError("k must be in [1, 8]")
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 5).alias("word_idx"),
            _bit(F.pmod(F.col("pos"), F.lit(WORD_BITS))).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    n = df.select(F.countDistinct(F.col(key_col)).alias("n_keys"))
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word_idx", "word")))
        ).alias("bloom")
    ).crossJoin(n)


def bloom_probe(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Rows of ``probe`` whose key passes the filter (all k bits set).

    The single-row filter broadcasts; the membership test is a pure
    projection over the probe — the fact table never shuffles.  Missing
    words mean all-zero bits (the build never touched them).
    """
    key = F.col(key_col).cast("string")
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word = F.element_at(F.col("bloom"), F.shiftright(p, 5))
        bit = _bit(F.pmod(p, F.lit(WORD_BITS)))
        cond = cond & word.isNotNull() & (word.bitwiseAND(bit) != 0)
    return (
        probe.crossJoin(F.broadcast(bloom.select("bloom")))
        .filter(cond)
        .drop("bloom")
    )


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Bloom-pruned distinct fact keys, flagged against exact membership.

    Returns (fact_key, is_true_member): every true member passes (the
    one-sided guarantee); rows with is_true_member = false are the
    filter's false positives — the residue the exact join still removes.
    Exposed as a DataFrame so tests and the oracle can see the FP surplus
    instead of trusting the formula.
    """
    filt = bloom_build(dim, dim_key, m_bits, k)
    passed = bloom_probe(
        fact.select(F.col(fact_key)).distinct(), fact_key, filt, m_bits, k
    )
    dim_keys = dim.select(
        F.col(dim_key).alias(fact_key)
    ).distinct()
    return passed.join(
        F.broadcast(dim_keys.withColumn("_m", F.lit(True))), fact_key, "left"
    ).select(
        fact_key,
        F.coalesce(F.col("_m"), F.lit(False)).alias("is_true_member"),
    )
