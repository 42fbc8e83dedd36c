"""Entity canonicalization — surface forms -> canonical entity IDs.

The distributed version of reference_extract.canonicalize_entities, the
analog of the reference collapsing many namespace URIs onto one canonical
prefix (lib/constants.js:7-38, lib/utils.js:137-150) — except the dictionary
is partly *built by the job*:

  1. normalize surface -> blocking key (vectorized pandas UDF; NFKC casefold
     must match the spec exactly, so it shares the same Python function),
  2. static alias dictionary via **broadcast hash join** (tiny dim table —
     SURVEY.md J1; Catalyst broadcasts it, no shuffle),
  3. fuzzy candidate pairs via **MinHash-LSH banding**, DataFrame-native:
     explode 3-gram shingles -> 64 seeded xxhash64 min-aggregations ->
     band hashes -> self-join on (band_idx, band_hash).  O(n) shuffle,
     never O(n^2): pairwise work happens only inside LSH buckets,
  4. exact Jaccard verification of candidates (vectorized UDF) at
     FUZZY_JACCARD — LSH may over-generate (false positives at low s are
     filtered here) but under-generates with probability < 1e-5 at s>=0.55
     with 32 bands x 2 rows,
  5. connected components over (exact-key ∪ fuzzy) edges assigns
     entity_id = min(sha1-hash of member keys) — see components.py.

Pseudo-entities ('conv:…', 'tool:…') merge by exact key ONLY (step 3 skips
them): fuzzy-merging conversation IDs would collapse distinct conversations.

Scale notes: distinct surface forms ≪ total mentions (counts aggregate
first); every join key is a 64-bit hash or short string; the only wide
shuffle is the shingle explode, bounded by Σ|key| per partition.  AQE handles
residual skew (hot shingles like ' th').
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..constants import ALIAS_TABLE
from ..functions.normalize import normalize_entity_key
from ..reference_extract import FUZZY_JACCARD
from .components import connected_components

N_MINHASH = 64
N_BANDS = 32  # rows per band = N_MINHASH // N_BANDS = 2


@pandas_udf(T.StringType())
def norm_key_udf(surfaces: pd.Series) -> pd.Series:
    """The only Python exchange in canonicalization: NFKC casefold has no
    JVM-side equivalent expression.  Everything downstream is JVM columns."""
    return surfaces.map(normalize_entity_key)


def entity_hash_col(key) -> "F.Column":
    """JVM twin of functions.normalize.entity_hash: first 8 bytes of
    sha1(key) as big-endian signed int64.  shiftleft/bitwiseOR reassemble
    the two 32-bit halves with two's-complement wrap (bitwise ops don't
    ANSI-overflow); parity with the oracle is pinned by tests."""
    c = F.col(key) if isinstance(key, str) else key
    d = F.sha1(c)
    hi = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def char_shingles_col(key, k: int = 3) -> "F.Column":
    """JVM twin of functions.normalize.char_shingles: distinct character
    k-grams of the space-padded key (whole padded string when shorter than
    k)."""
    c = F.col(key) if isinstance(key, str) else key
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    n = F.length(padded)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)), lambda i: padded.substr(i, F.lit(k))
    )
    return F.array_distinct(
        F.when(n <= k, F.array(padded)).otherwise(grams)
    )


def jaccard_col(a, b, k: int = 3) -> "F.Column":
    """JVM twin of functions.normalize.jaccard over char shingle sets."""
    sa, sb = char_shingles_col(a, k), char_shingles_col(b, k)
    inter = F.size(F.array_intersect(sa, sb))
    return inter / (F.size(sa) + F.size(sb) - inter)


def alias_dim(spark: SparkSession) -> DataFrame:
    """The static alias dictionary as a broadcastable dimension table."""
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(ALIAS_TABLE.items())],
        schema="alias_key string, canonical_key string",
    )


def surface_keys(spark: SparkSession, surfaces: DataFrame) -> DataFrame:
    """surfaces(surface, n_mentions) -> (surface, key, n_mentions, is_pseudo).

    Normalization UDF + broadcast alias join (J1).  A key that normalizes to
    empty falls back to the raw surface (never lose data)."""
    keyed = surfaces.withColumn("raw_key", norm_key_udf("surface"))
    keyed = keyed.withColumn(
        "raw_key",
        F.when(F.col("raw_key") == "", F.col("surface")).otherwise(F.col("raw_key")),
    )
    dim = F.broadcast(alias_dim(spark))
    return (
        keyed.join(dim, keyed.raw_key == dim.alias_key, "left")
        .select(
            "surface",
            F.coalesce("canonical_key", "raw_key").alias("key"),
            "n_mentions",
            (
                F.col("surface").startswith("conv:")
                | F.col("surface").startswith("tool:")
            ).alias("is_pseudo"),
        )
    )


def lsh_candidate_pairs(keys: DataFrame) -> DataFrame:
    """keys(key) [distinct, non-pseudo] -> candidate pairs (key_a, key_b).

    MinHash: minhash_i(key) = min over shingles s of xxhash64(i, s).
    Banding: band_j = xxhash64(j, h_{2j}, h_{2j+1}); keys sharing any band
    bucket become a candidate pair.  Bucket join uses a conditional self-join
    on (band_idx, band_hash) with key_a < key_b to halve the pair space.
    """
    exploded = keys.select("key", F.explode(char_shingles_col("key")).alias("shingle"))
    minhashes = exploded.groupBy("key").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(N_MINHASH)
        ]
    )
    r = N_MINHASH // N_BANDS
    bands = minhashes.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.xxhash64(
                            F.lit(j), *[F.col(f"h{j * r + k}") for k in range(r)]
                        ).alias("band_hash"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("key", "band.band_idx", "band.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .distinct()
    )


def canonicalize(spark: SparkSession, surfaces: DataFrame):
    """surfaces(surface, n_mentions) -> (mapping, vertices).

    mapping:  (surface, entity_id)
    vertices: (entity_id, canonical_name, aliases, n_mentions) — canonical
              name = most-mentioned surface, ties lexicographic
              (matches the pure-Python spec).

    Execution split: pseudo-entities ('conv:', 'tool:') merge by EXACT key
    only, so they take a fast path — one groupBy(key), entity_id =
    hash(key), no LSH / CC / label joins.  At corpus scale pseudo surfaces
    outnumber mention surfaces ~1000:1 (one per conversation), so this
    removes almost all data from the expensive path without changing one
    label.  The single subtlety: a pseudo surface whose key COLLIDES with a
    mention key could be pulled into a fuzzy-merged component, so colliding
    keys are routed to the full path (the overlap is computed exactly and
    is ~always empty).
    """
    keyed = surface_keys(spark, surfaces)  # surface, key, n_mentions, is_pseudo
    keyed.cache()

    mention_keyed = keyed.filter(~F.col("is_pseudo"))
    pseudo_keyed = keyed.filter(F.col("is_pseudo"))
    overlap = (
        pseudo_keyed.select("key")
        .distinct()
        .join(mention_keyed.select("key").distinct(), "key")
    )
    full_keyed = mention_keyed.unionByName(
        pseudo_keyed.join(F.broadcast(overlap), "key")
    )
    fast_keyed = pseudo_keyed.join(F.broadcast(overlap), "key", "left_anti")

    fast_mapping = fast_keyed.select(
        "surface", entity_hash_col("key").alias("entity_id")
    )
    # canonical_name via one ordered-struct min: (-n_mentions asc, surface
    # asc) == (count desc, name asc) — no window, map-side combinable
    fast_vertices = (
        fast_keyed.groupBy("key")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_mentions")).alias("neg"),
                    F.col("surface").alias("s"),
                )
            ).alias("best"),
            F.sort_array(F.collect_set("surface")).alias("aliases"),
            F.sum("n_mentions").alias("n_mentions"),
        )
        .select(
            entity_hash_col("key").alias("entity_id"),
            F.col("best.s").alias("canonical_name"),
            "aliases",
            "n_mentions",
        )
    )

    full_mapping, full_vertices = _canonicalize_full(full_keyed)
    mapping = full_mapping.unionByName(fast_mapping)
    vertices = full_vertices.unionByName(fast_vertices)
    return mapping, vertices


def _canonicalize_full(keyed: DataFrame):
    """The LSH + connected-components path (mention surfaces + colliding
    pseudo keys): see module docstring steps 3-5."""
    distinct_keys = keyed.select("key", "is_pseudo").distinct()
    node_ids = distinct_keys.withColumn("node_id", entity_hash_col("key")).cache()

    fuzzy_keys = node_ids.filter(~F.col("is_pseudo")).select("key")
    pairs = lsh_candidate_pairs(fuzzy_keys)
    verified = pairs.filter(jaccard_col("key_a", "key_b") >= F.lit(FUZZY_JACCARD))

    ids = node_ids.select("key", "node_id")
    edge_ids = (
        verified.join(ids.withColumnRenamed("key", "key_a"), "key_a")
        .withColumnRenamed("node_id", "src")
        .join(
            ids.withColumnRenamed("key", "key_b").withColumnRenamed(
                "node_id", "dst"
            ),
            "key_b",
        )
        .select("src", "dst")
    )

    labels = connected_components(edge_ids)  # (node_id, component)

    key_component = (
        node_ids.join(labels, node_ids.node_id == labels.node, "left")
        .select(
            "key",
            F.coalesce("component", "node_id").alias("entity_id"),
        )
    )

    mapped = keyed.join(key_component, "key").select(
        "surface", "key", "entity_id", "n_mentions"
    )
    mapping = mapped.select("surface", "entity_id")

    # canonical_name = most-mentioned surface, ties lexicographic asc —
    # exactly the spec's (count desc, name asc); row_number over a window
    # (deterministic, unlike max_by with composite string tiebreaks).
    from pyspark.sql import Window

    w = Window.partitionBy("entity_id").orderBy(
        F.col("n_mentions").desc(), F.col("surface").asc()
    )
    best = (
        mapped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("entity_id", F.col("surface").alias("canonical_name"))
    )
    vertices = (
        mapped.groupBy("entity_id")
        .agg(
            F.sort_array(F.collect_set("surface")).alias("aliases"),
            F.sum("n_mentions").alias("n_mentions"),
        )
        .join(best, "entity_id")
        .select("entity_id", "canonical_name", "aliases", "n_mentions")
    )
    return mapping, vertices
