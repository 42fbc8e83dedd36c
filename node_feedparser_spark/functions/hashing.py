"""Portable 60-bit hashing + shingling — the JVM-side hash substrate for
dedupe / fingerprinting / MinHash.

Why md5 and not xxhash64: every hash computed here must be *reproducible by
the DuckDB oracle* (the driver's correctness harness runs our Spark queries
against DuckDB SQL on the same parquet).  Spark's `xxhash64` has no DuckDB
equivalent; `md5` is bit-identical in both engines, and
`conv(substr(md5(x),1,15),16,10)` == DuckDB `CAST('0x'||substr(md5(x),1,15)
AS BIGINT)` gives a uniform 60-bit integer.  At true 100 TB scale one would
swap `portable_hash60` for `F.xxhash64` (one line, same plan shape) — md5 is
~3× more cpu but still JVM-side, vectorized, and never the bottleneck next
to the shuffle it feeds.

Reference analog: the reference keys its dedupe-merges on plain string keys
(`(url, type)` enclosure identity, /root/reference/lib/feedparser.js:1007-1011);
at 10^12 rows string keys become 60-bit ints for shuffle compactness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: always fits a signed int64, so Spark `conv(...,16,10)
# .cast(long)` and DuckDB `CAST('0x...' AS BIGINT)` agree with no overflow.
HASH_HEX_CHARS = 15


def portable_hash60(col: Column | str, seed: int | None = None) -> Column:
    """60-bit integer hash of a string column, reproducible in DuckDB as
    CAST('0x' || substr(md5(<expr>), 1, 15) AS BIGINT).  `seed` prefixes the
    input so independent hash families (MinHash permutations) stay portable.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}\x1f"), c)
    return F.conv(F.substring(F.md5(c), 1, HASH_HEX_CHARS), 16, 10).cast("long")


def portable_hash60_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-side twin of portable_hash60 (used to build oracle SQL)."""
    if seed is not None:
        expr = f"concat('{seed}' || chr(31), {expr})"
    return f"CAST(('0x' || substr(md5({expr}), 1, {HASH_HEX_CHARS})) AS BIGINT)"


def token_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct token k-gram shingles of a whitespace-tokenized text column.

    Documents shorter than k tokens contribute a single whole-text shingle,
    so every non-null document has >= 1 shingle (Jaccard never sees an empty
    set).  Pure JVM (split / sequence / transform / array_distinct): no
    Python in the hot path, whole-stage-codegen friendly.

    DuckDB twin: token_shingles_sql below (lists are 1-indexed there too via
    element_at here, so the two agree token for token).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    # greatest-guard: docs shorter than k tokens make size-(k-1) negative;
    # the CASE below short-circuits them today, but the slice expressions
    # must stay safe if this gram construction is ever reused bare (the
    # same guard curation._grams uses)
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    # Build grams by zipping k aligned slices (each of exactly n elements)
    # instead of transform+element_at: element_at(toks, i) re-evaluates the
    # split for EVERY access (~k * n_tokens splits per row — measured ~20x
    # the whole operator's cost at bench scale); slices evaluate it k times.
    grams = F.slice(toks, 1, n)
    for j in range(1, k):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, n), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.array_distinct(F.when(F.size(toks) >= k, grams).otherwise(F.array(c)))


def token_shingles_sql(expr: str, k: int = 3) -> str:
    """DuckDB SQL producing exactly token_shingles(expr, k)."""
    toks = f"string_split({expr}, ' ')"
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(k))
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(range(1, len({toks}) - {k - 1} + 1), i -> {parts}) "
        f"ELSE [{expr}] END)"
    )
