"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship KG pipeline over sf0.001 (documents mapped into the
                 transcripts shape + the deterministic fixture corpus).
queries()      — named operators from SURVEY.md §2 over the driver testdata.
oracle_sql()   — DuckDB-equivalent SQL for each query (same column names,
                 same rounding) for the sf0.01 correctness harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# entry: flagship — transcripts -> triples -> canonical entity IDs
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Run the KG extraction+canonicalization over sf0.001.

    documents.parquet is mapped into the transcripts shape
    (conv_id, turn_idx, role, text, tool, ts) — the north-rule input —
    and pushed through dedupe -> mapInPandas extraction -> broadcast-alias +
    LSH + connected-components canonicalization.  Returns the triples
    DataFrame (conv_id, turn_idx, subj, pred, obj, score, subj_id, obj_id).
    """
    from node_feedparser_spark.operators.canonicalize import canonicalize
    from node_feedparser_spark.operators.extract import (
        ERROR_PRED,
        dedupe_first_wins,
        extract_triples,
    )

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    transcripts = docs.select(
        F.concat(F.lit("doc-"), (F.col("doc_id") % 50).cast("string")).alias("conv_id"),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        # capitalize a few tokens so the entity grammar has mentions to find
        F.initcap(F.substring("text", 1, 80)).alias("text"),
        F.when(F.col("doc_id") % 7 == 0, F.col("source")).alias("tool"),
        F.to_timestamp(F.lit("2025-01-06 09:00:00")).alias("ts"),
    )
    turns = dedupe_first_wins(transcripts)
    triples = extract_triples(turns).filter(F.col("pred") != ERROR_PRED)
    surfaces = (
        triples.select(F.explode(F.array("subj", "obj")).alias("surface"))
        .groupBy("surface")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )
    mapping, _ = canonicalize(spark, surfaces)
    m_subj = mapping.withColumnRenamed("surface", "subj").withColumnRenamed(
        "entity_id", "subj_id"
    )
    m_obj = mapping.withColumnRenamed("surface", "obj").withColumnRenamed(
        "entity_id", "obj_id"
    )
    return triples.join(m_subj, "subj").join(m_obj, "obj").select(
        "conv_id", "turn_idx", "subj", "pred", "obj", "score", "subj_id", "obj_id"
    )


# ---------------------------------------------------------------------------
# queries — one per SURVEY.md §2 operator, over the TPC-H-ish testdata
# ---------------------------------------------------------------------------


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 parent-child collect as hash agg: TPC-H-Q1-style pricing summary."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_case_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 root-type dispatch: CASE chain classifying events."""
    ev = _t(spark, sf_dir, "events")
    classified = ev.withColumn(
        "event_class",
        F.when(F.col("event_type") == "error", "failure")
        .when(F.col("event_type").isin("signup", "purchase"), "conversion")
        .otherwise("engagement"),
    )
    return classified.groupBy("event_class").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 namespace canonicalization as broadcast-hash join: customer ->
    nation -> region, counts per region (tiny dims broadcast, no shuffle of
    the fact side beyond the final agg)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


def q_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 first-wins semantics: first event_type per user in (ts, event_id)
    order — the 'first guid wins' window."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("event_type").alias("first_event_type"))
    )


def q_precedence_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4 precedence-coalesce chains: first non-null of a priority list
    (the single most common operator in the reference, SURVEY.md A4)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.coalesce(
            F.when(F.col("p_size") > 40, F.col("p_brand")),
            F.when(F.col("p_retailprice") > 1500, F.lit("PREMIUM")),
            F.col("p_type"),
        ).alias("resolved_label"),
    )


def q_distinct_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3/J2 dedupe-by-key keep-first: one event per (user_id, event_type),
    first by (ts, event_id) — the enclosure dedupe-merge shape."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


def q_category_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 category accumulate + dedupe: split p_type on spaces (the
    dc:subject space-split rule), explode, order-insensitive distinct."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select("p_brand", F.explode(F.split("p_type", " ")).alias("type_word"))
        .distinct()
    )


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 XML-decl parse analog: regex extraction of a typed field from a
    serialized props string."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int").alias("prop_k"),
    )


def q_window_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 document-order emission: stable (partition, order) window with
    rank; first 3 events per user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", F.col("rn").cast("long").alias("rn"))
    )


def q_late_meta_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/J3 late-arriving meta joined onto items: per-order aggregate
    (computed over the whole group, position-independent) attached to each
    line."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    order_meta = li.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "order_revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        orders.join(order_meta, orders.o_orderkey == order_meta.l_orderkey)
        .select("o_orderkey", "o_orderstatus", "order_revenue", "n_lines")
    )


def q_exact_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedupe via content hash (training-data pipeline op): md5 of
    text, keep lowest doc_id per hash group, report group sizes."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_hash", F.md5("text"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token count + char stats per document (JVM-side only,
    no UDF: split/length/size)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators (dedupe / similarity / text / multimodal)
# ---------------------------------------------------------------------------


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup join: token-3-gram Jaccard >= 0.8 via MinHash-LSH banding +
    exact verification (operators/dedupe.py). Result equals brute force."""
    from node_feedparser_spark.operators.dedupe import lsh_near_dup_pairs

    return lsh_near_dup_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint per document (operators/dedupe.py)."""
    from node_feedparser_spark.operators.dedupe import simhash

    return simhash(_t(spark, sf_dir, "documents"))


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs within hamming distance 3 of SimHash, via exact pigeonhole
    block-join (no cross product)."""
    from node_feedparser_spark.operators.dedupe import simhash_near_dup_pairs

    pairs = simhash_near_dup_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)
    return pairs.select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id<10 — broadcast
    query matrix, one numpy matmul per Arrow batch, tiny top-k shuffle."""
    from node_feedparser_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    tk = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return tk.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank")
    )


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-5 over the int8-QUANTIZED corpus (per-dim min-max scalar
    quantization, dequantized in-row for scoring; queries stay float) —
    the memory-bound ANN plan for a corpus that only fits quantized.  The
    oracle replays the identical quantize/dequantize arithmetic
    relationally (exact aggregates, one IEEE division, half-up rounding
    of non-negative values — bit-equal across engines)."""
    from node_feedparser_spark.operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    tk = quantized_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return tk.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank")
    )


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with ADC lookup tables (late round 3,
    operators/similarity.py pq_topk — Jégou et al. TPAMI 2011): 16
    subspaces x 256-code codebooks (the standard FAISS 8-bit PQ16 shape)
    over the scalar-quantized corpus, so a vector is 16 codes (16 B)
    instead of 256 B float32 — the representation a 100 TB embedding
    corpus needs to fit cluster memory — and a query scores candidates
    with m_sub integer table lookups, never a d-dim op.  Every distance
    is an exact int64 sum of squared integer differences (no float
    summation), codebooks seed from the quantized subvectors of the 256
    smallest vec_ids and take TWO Lloyd rounds with pure-integer means
    ((2*sum+n)//(2*n)), encode tie-breaks argmin-first == smallest code:
    the DuckDB oracle replays seed, both Lloyd rounds, re-encode, ADC
    tables, and the (adist asc, vec_id asc) top-5 bit-identically.
    Measured recall@5 vs exact cosine at sf0.01: 0.70 (was 0.25 with the
    round-3 toy 16x8 parameters; floor pinned by tests/test_pq.py)."""
    from node_feedparser_spark.operators.similarity import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_codes=256, m_sub=16,
        train_iters=2,
    )


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (late round 3, operators/similarity.py ivfpq_topk — the
    FAISS IVF16,PQ16 shape, the production 100 TB layout): an integer-L2
    coarse quantizer (16 cells, seeded from the smallest vec_ids + one
    pure-integer Lloyd round) prunes each query to its 8 nearest cells,
    and candidates in probed cells are scored with pq_topk's integer ADC
    tables (256 codes x 16 subspaces, two Lloyd rounds) — per query
    ~n_probe/n_cells of the corpus is touched and each candidate costs 16
    table lookups.  Measured recall@5 vs exact cosine at sf0.01: 0.675.  Zero float arithmetic: the DuckDB
    oracle replays coarse seed/Lloyd/assign/probe, PQ seed/Lloyd/encode,
    and the (adist asc, vec_id asc) top-5 bit-identically."""
    from node_feedparser_spark.operators.similarity import ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_cells=16,
        n_probe=8,
        n_codes=256,
        m_sub=16,
        train_iters=2,
    )


def q_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ (late round 3, operators/similarity.py
    ivfpq_residual_topk — exact FAISS IndexIVFPQ semantics): PQ encodes
    x − centroid(cell(x)) so the 16-byte codes (256 codes x 16 subspaces,
    two Lloyd rounds) only span the tight within-cell residual
    distribution, and each query builds one integer ADC table PER PROBED
    CELL (8 of 16) from its residual against that centroid.  Measured
    recall@5 vs exact cosine at sf0.01: 0.65 (was 0.325 with the round-3
    toy parameters; floor pinned by tests/test_pq.py).
    All arithmetic is int64 (negative residual sums take the
    sign-symmetric half-away-from-zero mean, since Python // floors but
    DuckDB // truncates); the DuckDB oracle replays coarse
    seed/Lloyd/assign/probe, residual seeding, residual Lloyd, re-encode,
    per-cell ADC, and the (adist asc, vec_id asc) top-5 bit-identically."""
    from node_feedparser_spark.operators.similarity import ivfpq_residual_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_residual_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_cells=16,
        n_probe=8,
        n_codes=256,
        m_sub=16,
        train_iters=2,
    )


def q_ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF-PQ index probe (late round 3, operators/ann_index.py):
    the corpus is PQ-encoded once into cell-PARTITIONED parquet (8 B of
    codes per vector + a JSON codebook sidecar) and the query probes scan
    only their n_probe cell directories — `cell IN (...)` lands in the
    scan's PartitionFilters (plan-pinned) and scoring is pure-JVM integer
    table lookups, no Python at probe time.  The index is a layout
    change, not a semantics change: results are bit-identical to the
    in-memory ivfpq_topk lane, so this query's ORACLE IS ivfpq_topk's
    oracle, shared verbatim."""
    import hashlib
    import tempfile

    from node_feedparser_spark.operators.ann_index import (
        build_ann_index,
        probe_ann_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # stable digest (not salted str hash) so reruns overwrite one dir
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ann_index_{digest}")
    build_ann_index(emb, path, n_cells=16, n_codes=256, m_sub=16)
    return probe_ann_index(
        spark, path, emb.filter(F.col("vec_id") < 8), k=5, n_probe=8
    )


def q_ann_lane_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN lane scoreboard (late round 3): recall@5 + MRR of every
    PQ-family lane (global-codebook PQ, IVF-PQ, residual IVF-PQ, int8
    scalar quantization) against the exact float cosine top-5 on the
    shared vec_id<8 query set — the honest in-plan quality ledger that
    makes "approximate" a measured number per lane, not a vibe
    (extends ann_recall_eval's IVF-only eval).  MRR is float-summation
    free: per (lane, query) ROUND(1e6/minrank) as BIGINT, exact integer
    sum, one final division rounded to 4 dp.  The oracle composes each
    lane's own verified oracle SQL verbatim (rrf_fusion discipline), so
    the scoreboard can never drift from the lanes it scores."""
    from node_feedparser_spark.operators.similarity import (
        cosine_topk,
        ivfpq_residual_topk,
        ivfpq_topk,
        pq_topk,
        quantized_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q8 = emb.filter(F.col("vec_id") < 8)
    truth = cosine_topk(emb, q8, k=5).select("query_id", "vec_id")
    lanes = [
        ("ivfpq", ivfpq_topk(emb, q8, k=5)),
        ("ivfpq_residual", ivfpq_residual_topk(emb, q8, k=5)),
        ("pq", pq_topk(emb, q8, k=5)),
        ("quantized", quantized_topk(emb, q8, k=5)),
    ]
    union = None
    for name, df in lanes:
        part = df.select(
            F.lit(name).alias("lane"),
            "query_id",
            "vec_id",
            F.col("rank").cast("long").alias("rank"),
        )
        union = part if union is None else union.union(part)
    hits = union.join(truth, ["query_id", "vec_id"])
    base = union.select("lane").distinct()
    rec = hits.groupBy("lane").agg(F.count(F.lit(1)).alias("n_hits"))
    ms = (
        hits.groupBy("lane", "query_id")
        .agg(F.min("rank").alias("minr"))
        .select(
            "lane",
            F.round(F.lit(1000000.0) / F.col("minr"))
            .cast("long")
            .alias("rr"),
        )
        .groupBy("lane")
        .agg(F.sum("rr").alias("s"))
    )
    return (
        base.join(rec, "lane", "left")
        .join(ms, "lane", "left")
        .select(
            "lane",
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(40.0),
                4,
            ).alias("recall_at_5"),
            F.round(
                F.coalesce(F.col("s"), F.lit(0)).cast("double")
                / F.lit(8000000.0),
                4,
            ).alias("mrr"),
        )
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= 0.4, size-dispatched (r3)
    — exact broadcast matmul below the 50k cutoff (this oracle's regime),
    the driver-collect-free blocked IVF plan above it, so the named query
    is scale-safe by construction (plan pinned by tests/test_similarity_auto)."""
    from node_feedparser_spark.operators.similarity import (
        cosine_threshold_pairs_auto,
    )

    return cosine_threshold_pairs_auto(_t(spark, sf_dir, "embeddings"), threshold=0.4)


def q_embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked (IVF multi-probe) embedding near-dup pairs: cell-partitioned
    block matmuls, no driver collect of the corpus — the 100 TB path whose
    brute-force twin is embedding_near_dup (recall pinned by test)."""
    from node_feedparser_spark.operators.similarity import (
        cosine_threshold_pairs_blocked,
    )

    return cosine_threshold_pairs_blocked(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, n_cells=16, n_probe=4
    )


def q_semantic_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: IVF-cluster the embedding space
    (argmax-cosine against the deterministic first-16 centroids), connect
    within-cluster pairs with cosine >= 0.4, transitively close, keep the
    min-id representative per group.  No driver collect, per-cell block
    matmuls only; the DuckDB oracle replays the same assignment + a
    recursive-CTE closure independently."""
    from node_feedparser_spark.operators.similarity import semantic_dedupe

    return semantic_dedupe(_t(spark, sf_dir, "embeddings"), threshold=0.4)


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the exact and IVF top-5 lists (c=60):
    heterogeneous retrieval strategies combined without comparable scores.
    Output-sized all the way — union of two top-k lists, one sum agg, one
    bounded window.  The oracle fuses the two existing oracle queries."""
    from node_feedparser_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        rrf_fuse,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # the fused inputs ARE the two named queries verbatim (including their
    # different query sets: exact vec_id<10, IVF vec_id<8), so the oracle
    # composes their oracle SQL unchanged — queries 8-9 fuse from the
    # exact list alone, a legitimate RRF case (a strategy missing a query)
    exact = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    ivf = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, n_cells=16, n_probe=4
    )
    return rrf_fuse([exact, ivf], k=5)


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-probe ANN: deterministic centroids (vec_id<16), probe 4 of
    16 cells, top-5 — the scale path whose plan partitions by cell."""
    from node_feedparser_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    tk = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, n_cells=16, n_probe=4
    )
    return tk.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank")
    )


def q_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with deterministic k-means-refined centroids (2 unrolled
    Lloyd iterations from the first-16 seed; per-dimension means rounded
    to 4dp so Spark and the unrolled-SQL oracle compute identical
    centroids).  Same probe/top-k machinery as ivf_ann_topk."""
    from node_feedparser_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, n_cells=16, n_iters=2)
    tk = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, n_cells=16, n_probe=5,
        centroids=cents,
    )
    return tk.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank")
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-dictionary language ID: broadcast dim join + argmax."""
    from node_feedparser_spark.operators.text_analysis import language_id

    return language_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "pred_lang", F.col("n_hits").cast("long").alias("n_hits")
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features + composite score, single projection."""
    from node_feedparser_spark.operators.text_analysis import quality_features

    qf = quality_features(_t(spark, sf_dir, "documents"))
    return qf.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len", "punct_ratio", "stopword_ratio", "upper_ratio",
        "quality_score",
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    from node_feedparser_spark.operators.text_analysis import token_counts

    tc = token_counts(_t(spark, sf_dir, "documents"))
    return tc.select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint: min + bottom-4 of token-5-gram hashes."""
    from node_feedparser_spark.operators.text_analysis import fingerprints

    fp = fingerprints(_t(spark, sf_dir, "documents"), k=5, n_keep=4)
    return fp.select(
        "doc_id",
        "fingerprint",
        F.array_join(F.col("bottom_k").cast("array<string>"), ",").alias("bottom_k"),
    )


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata: binary payload length, content key, modality
    dispatch (operators/multimodal.py — the oracle-checkable face)."""
    from node_feedparser_spark.operators.multimodal import attach_payload, media_meta

    mm = media_meta(attach_payload(_t(spark, sf_dir, "documents")))
    return mm.select(
        "doc_id", "media_type",
        F.col("byte_len").cast("long").alias("byte_len"),
        "content_md5", "modality",
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over the (stubbed, deterministic) decode stage:
    mapInPandas decode -> JVM sequence+explode every 8th frame."""
    from node_feedparser_spark.operators.multimodal import (
        attach_payload,
        decode_media,
        frame_sample,
    )

    decoded = decode_media(attach_payload(_t(spark, sf_dir, "documents")))
    fs = frame_sample(decoded, every_n=8)
    return fs.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
    )


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode stage output (round 3): real PNG/GIF/JPEG bytes decode to
    true dimensions; the synthetic corpus is text bytes, so every row takes
    the deterministic md5 fake lane — which the DuckDB oracle reproduces
    byte-for-byte (width = 16 + 4*digest[0], height = 16 + 4*digest[1],
    n_frames = 1 + digest[2] % 64)."""
    from node_feedparser_spark.operators.multimodal import (
        attach_payload,
        decode_media,
    )

    decoded = decode_media(attach_payload(_t(spark, sf_dir, "documents")))
    return decoded.select(
        "doc_id",
        "media_type",
        F.col("byte_len").cast("long").alias("byte_len"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        "decoder",
    )


def q_payload_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-enclosure analog: dedupe binary payloads on (content key,
    media type), keep-first (J2)."""
    from node_feedparser_spark.operators.multimodal import (
        attach_payload,
        exact_payload_dedupe,
    )

    return exact_payload_dedupe(attach_payload(_t(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Training-corpus curation operators (operators/curation.py)
# ---------------------------------------------------------------------------


def q_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS: LSH pair graph transitively closed via connected
    components; every doc labeled (group = min id, keeper = first-wins)."""
    from node_feedparser_spark.operators.dedupe import near_dup_groups

    return near_dup_groups(_t(spark, sf_dir, "documents"))


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring spans: maximal token ranges covered by
    5-grams occurring in >= 2 distinct documents — the text an exact
    cross-document dedup pass would cut (the planted near-duplicate docs
    produce spans up to ~90 tokens).  Gram dim joins on 8-byte hashes (NOT
    assumed broadcastable); interval merge is an in-row fold."""
    from node_feedparser_spark.operators.dedupe import duplicate_spans

    return duplicate_spans(_t(spark, sf_dir, "documents"), k=5, min_docs=2)


def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition signals: distinct-token fraction,
    modal-token fraction, duplicate-3-gram fraction.  Array-local fractions
    shuffle nothing; the modal count is two map-side-combined aggs."""
    from node_feedparser_spark.operators.curation import repetition_metrics

    return repetition_metrics(_t(spark, sf_dir, "documents"))


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language token-budget sampling under a bucketed
    (skew-proof) cumulative sum — hash-priority prefix per language."""
    from node_feedparser_spark.operators.curation import token_budget_sample

    return token_budget_sample(_t(spark, sf_dir, "documents"), budget=5000)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: emails/phones (deterministically injected so the patterns
    fire) -> typed placeholders + removal counts; pure codegen projection."""
    from node_feedparser_spark.operators.curation import pii_scrub

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail.example.com"),
                ),
            ).otherwise(""),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" call +1-555-0100-1234")).otherwise(
                ""
            ),
        ).alias("text"),
    )
    return pii_scrub(aug)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any token
    3-gram with the eval subset (doc_id % 97 == 0 — planted IN the corpus,
    the classic contamination case); broadcast eval grams, no corpus
    shuffle."""
    from node_feedparser_spark.operators.curation import decontaminate

    docs = _t(spark, sf_dir, "documents")
    return decontaminate(docs, docs.filter(F.col("doc_id") % 97 == 0))


def q_decontaminate_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-suite contamination matrix: two planted eval suites (doc_id%97
    and doc_id%89 — overlapping at %8633, so some docs hit BOTH) against
    the corpus; one corpus explode regardless of suite count, broadcast
    (set, gram) dim, hit-pairs-only output."""
    from node_feedparser_spark.operators.curation import decontaminate_multi

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.lit("suiteA").alias("eval_set"), "text"
    ).union(
        docs.filter(F.col("doc_id") % 89 == 0).select(
            F.lit("suiteB").alias("eval_set"), "text"
        )
    )
    return decontaminate_multi(docs, ev)


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.3) per-source training-mixture weights
    from per-source token totals."""
    from node_feedparser_spark.operators.curation import mixture_weights

    return mixture_weights(_t(spark, sf_dir, "documents"))


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified 80/10/10 train/val/test split:
    hash-ranked prefix cut at exact floor(cum_weight * n) boundaries per
    stratum (bucketed two-level rank — no single-task language windows)."""
    from node_feedparser_spark.operators.curation import stratified_split

    return stratified_split(_t(spark, sf_dir, "documents"))


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (tf * ln(N/df), ties by token asc):
    two map-side-combinable aggs + a vocabulary join + a per-doc-bounded
    window — no corpus-sized window partitions."""
    from node_feedparser_spark.operators.text_analysis import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=3)


def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-frequency line removal: per-source header lines
    and a shared subscribe footer (planted deterministically — the classic
    nav-bar/banner case) each hit >= 5 distinct docs and are scrubbed from
    every document; the doc's own body line and the per-doc unique footer
    survive.  The frequent-line dim is counted on 8-byte hashes and
    BROADCAST; the corpus pays exactly one shuffle (per-doc reassembly)."""
    from node_feedparser_spark.operators.curation import boilerplate_scrub

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("=== "), F.col("source"), F.lit(" newsletter ===")),
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit("subscribe at example.com/news")
            ).otherwise(
                F.concat(F.lit("footer "), F.col("doc_id").cast("string"))
            ),
        ).alias("text"),
    )
    return boilerplate_scrub(aug, min_docs=5)


# ---------------------------------------------------------------------------
# Remaining SURVEY.md §2 operator shapes over the TPC-H-ish tables
# ---------------------------------------------------------------------------


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 meta/item child skip as anti-join: customers with no FINISHED
    orders.  (Every customer in the driver testdata has at least one order,
    so the round-1 'no orders at all' predicate was vacuously empty — this
    one returns 71 rows at sf0.01 / 511 at sf0.1.)"""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_link_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 full link `rel` dispatch + exploded-link reassembly (ref
    lib/feedparser.js:891-940): events become link elements (rel derived
    from event_type), items get ~3 links each so every branch is live —
    last-canonical origlink, last-alternate link with first-self fallback,
    last-replies comments, document-order (url,type)-deduped enclosures.
    One hash agg, no windows — see operators/links.py."""
    from node_feedparser_spark.operators.links import reassemble_links

    ev = _t(spark, sf_dir, "events")
    et = F.col("event_type")
    links = ev.select(
        (F.col("user_id") * 20 + F.col("event_id") % 20).alias("item_id"),
        F.col("ts"),
        F.col("event_id").alias("link_id"),
        F.when(et == "click", "alternate")
        .when(et == "view", "self")
        .when(et == "signup", "canonical")
        .when(et == "error", "replies")
        .otherwise("enclosure")
        .alias("rel"),
        F.when(
            et == "purchase",
            F.concat(
                F.lit("https://cdn.example.com/f"),
                (F.col("event_id") % 7).cast("string"),
                F.lit(".mp3"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://example.com/"),
                et,
                F.lit("/"),
                F.col("event_id").cast("string"),
            )
        )
        .alias("href"),
        F.when(
            et == "purchase",
            F.when(F.col("event_id") % 2 == 0, "audio/mpeg").otherwise("video/mp4"),
        ).alias("type"),
    )
    return reassemble_links(links)


def q_meta_cloud(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 meta side — feed-level link dispatch + PubSubHubbub hub /
    rssCloud `<cloud>` merge (ref lib/feedparser.js:498,550-552,584-586,
    621-626; the intertwingly.atom fixture's `<link rel="hub">`): events
    become feed-level elements (error rows are `<cloud>` elements with
    rssCloud attributes — domain present on only every third so both
    guard arms are live; purchase rows are hub links, click/view are
    alternate/self, signup is an inert rel-less link), feeds get ~3
    elements each.  First-alternate link, last-self xmlurl, first-hub
    cloud blocked by a cloud element's href/domain, element replaces —
    one hash agg, no windows; see operators/links.reassemble_meta_links."""
    from node_feedparser_spark.operators.links import reassemble_meta_links

    ev = _t(spark, sf_dir, "events")
    et = F.col("event_type")
    eid = F.col("event_id")
    els = ev.select(
        (F.col("user_id") * 20 + eid % 20).alias("meta_id"),
        eid.alias("ord"),
        F.when(et == "error", "cloud").otherwise("link").alias("kind"),
        F.when(et == "click", "alternate")
        .when(et == "view", "self")
        .when(et == "purchase", "hub")
        .alias("rel"),
        F.when(
            et != "error",
            F.concat(
                F.lit("https://example.com/"), et, F.lit("/"), eid.cast("string")
            ),
        ).alias("href"),
        F.when(
            (et == "error") & (eid % 3 == 0),
            F.concat(F.lit("rpc"), (eid % 7).cast("string"), F.lit(".example.com")),
        ).alias("domain"),
        F.when(et == "error", (F.lit(80) + eid % 2).cast("string")).alias("port"),
        F.when(et == "error", F.lit("/rpc")).alias("path"),
        F.when(et == "error", F.lit("cloud.notify")).alias("register_procedure"),
        F.when(
            et == "error",
            F.when(eid % 2 == 0, "xml-rpc").otherwise("http-post"),
        ).alias("protocol"),
    )
    return reassemble_meta_links(els, order_cols=("ord",))


def q_author_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 author address parse, full addressparser long tail (reference
    lib/feedparser.js:606-619): 6-way shape dispatch per customer — plain
    'Name <addr>', quoted '"Name, c" <addr>' (comma inside quotes
    survives), 'addr (Comment)', bare address, name-only, and a
    multi-address list (first-wins) — through the shared regex contract in
    functions/authors.py, plus the name||address||raw display preference."""
    from node_feedparser_spark.functions.authors import author_fields_cols

    cust = _t(spark, sf_dir, "customer")
    addr = F.concat(F.lit("user"), F.col("c_custkey"), F.lit("@example.com"))
    k = F.col("c_custkey") % 6
    raw = (
        F.when(k == 0, F.concat(F.col("c_name"), F.lit(" <"), addr, F.lit(">")))
        .when(
            k == 1,
            F.concat(
                F.lit('"'), F.col("c_name"), F.lit(', c'), F.col("c_custkey"),
                F.lit('" <'), addr, F.lit(">"),
            ),
        )
        .when(k == 2, F.concat(addr, F.lit(" ("), F.col("c_name"), F.lit(")")))
        .when(k == 3, addr)
        .when(k == 4, F.col("c_name"))
        .otherwise(F.concat(addr, F.lit(", second"), addr))
    )
    name, address, author = author_fields_cols(raw)
    return cust.select(
        "c_custkey",
        raw.alias("raw_author"),
        name.alias("author_name"),
        address.alias("author_address"),
        author.alias("author"),
    )


def q_precedence_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/F11 tolerant multi-format date parse: serialize o_orderdate into
    one of SEVEN formats — three plain-date styles, RFC-822 with a numeric
    timezone token, ISO-8601 with offset, and (round 4, the `new Date()`
    long tail, lib/feedparser.js:523,884) RFC-822 with a TWO-DIGIT year
    plus a NAMED zone, and a bare named-zone variant — and recover all of
    them with one try_to_timestamp coalesce chain.  The named-zone and
    two-digit-year handling replicates the ECMA-262 Date.parse rules the
    reference relies on: only the spec's fixed-offset zone names
    (GMT/UT/UTC/EST/EDT/CST/CDT/MST/MDT/PST/PDT) are recognized, each as
    a constant offset, and a 2-digit year yy maps to 19yy when yy >= 50
    else 20yy.  Both are applied as deterministic textual normalization
    BEFORE the format parse — exactly what a tolerant parser does with
    redundant/legacy tokens.  Offset-carrying formats are normalized to
    UTC wall time (session-tz independent via to_utc_timestamp)."""
    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 7
    date_str = (
        F.when(k == 0, F.date_format("o_orderdate", "yyyy/MM/dd"))
        .when(k == 1, F.date_format("o_orderdate", "MM-dd-yyyy"))
        .when(k == 2, F.date_format("o_orderdate", "dd.MM.yyyy"))
        .when(
            k == 3,
            F.concat(
                F.date_format("o_orderdate", "EEE, dd MMM yyyy"),
                F.lit(" 15:04:05 +0530"),
            ),
        )
        .when(
            k == 4,
            F.concat(
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                F.lit("T08:30:00-04:00"),
            ),
        )
        .when(
            k == 5,
            F.concat(
                F.date_format("o_orderdate", "EEE, dd MMM yy"),
                F.lit(" 15:04:05 PST"),
            ),
        )
        .otherwise(
            F.concat(
                F.date_format("o_orderdate", "dd MMM yyyy"),
                F.lit(" 16:45:00 EST"),
            )
        )
    )
    tz = spark.conf.get("spark.sql.session.timeZone")
    # Spark >= 3 refuses day-of-week fields in PARSE patterns (weekday is
    # non-determinant), so the RFC-822 branches strip the 'Tue, ' prefix
    # first — exactly what a tolerant parser does with redundant tokens.
    no_dow = F.regexp_replace(date_str, r"^[A-Za-z]{3}, ", "")
    # ECMA-262 fixed-offset zone names -> numeric offsets (the ONLY named
    # zones JS Date.parse recognizes; anything else is NaN there too)
    named = no_dow
    for zone, off in _JS_DATE_ZONES:
        named = F.regexp_replace(named, f" {zone}$", f" {off}")
    # JS 2-digit-year rule: yy >= 50 -> 19yy, else 20yy (applied between
    # month name and time-of-day so 4-digit years cannot match)
    named = F.regexp_replace(
        named, r"^(\d{1,2} [A-Za-z]{3} )([5-9][0-9])( )", r"$119$2$3"
    )
    named = F.regexp_replace(
        named, r"^(\d{1,2} [A-Za-z]{3} )([0-4][0-9])( )", r"$120$2$3"
    )
    parsed = F.coalesce(
        F.try_to_timestamp(date_str, F.lit("yyyy/MM/dd")),
        F.try_to_timestamp(date_str, F.lit("MM-dd-yyyy")),
        F.try_to_timestamp(date_str, F.lit("dd.MM.yyyy")),
        F.to_utc_timestamp(
            F.try_to_timestamp(named, F.lit("dd MMM yyyy HH:mm:ss Z")), tz
        ),
        F.to_utc_timestamp(
            F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")), tz
        ),
    )
    return orders.select(
        "o_orderkey", date_str.alias("date_str"), parsed.alias("pubdate")
    )


# ECMA-262 Date.parse legacy zone names and their fixed offsets — the
# complete list the spec (and therefore the reference's new Date()) accepts
_JS_DATE_ZONES = [
    ("GMT", "+0000"), ("UTC", "+0000"), ("UT", "+0000"),
    ("EST", "-0500"), ("EDT", "-0400"), ("CST", "-0600"), ("CDT", "-0500"),
    ("MST", "-0700"), ("MDT", "-0600"), ("PST", "-0800"), ("PDT", "-0700"),
]


def q_scalar_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14/F15/F16 scalar chains: generator assembly (concat_ws), guid
    synthesis, guid->link inference (rlike '^https?:'), and the
    isPermaLink rule — permalink = guid unless an isPermaLink attribute
    contains 'false' case-insensitively; a MISSING attribute defaults to
    permalink (reference lib/feedparser.js:941-954)."""
    part = _t(spark, sf_dir, "part")
    guid = F.when(
        F.col("p_partkey") % 5 == 0,
        F.concat(F.lit("https://parts.example/"), F.col("p_partkey")),
    ).otherwise(F.concat(F.lit("urn:part:"), F.col("p_partkey")))
    is_permalink_attr = (
        F.when(F.col("p_partkey") % 3 == 0, F.lit("false"))
        .when(F.col("p_partkey") % 3 == 1, F.lit("True"))
        .otherwise(F.lit(None).cast("string"))
    )
    not_denied = ~F.coalesce(
        F.lower(is_permalink_attr).contains("false"), F.lit(False)
    )
    return part.select(
        "p_partkey",
        F.concat_ws(
            " ",
            F.col("p_brand"),
            F.concat(F.lit("v"), F.col("p_size")),
            F.concat(F.lit("("), F.col("p_type"), F.lit(")")),
        ).alias("generator"),
        guid.alias("guid"),
        F.when(guid.rlike("^https?:"), guid).alias("link"),
        is_permalink_attr.alias("ispermalink_attr"),
        F.when(not_denied, guid).alias("permalink"),
    )


def q_explode_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/D1 category accumulate: split two sources, flatten, uniq, stable
    sort — emitted as a joined string for engine-portable comparison."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.concat(F.split("p_name", " "), F.split("p_type", " "))
                )
            ),
            ",",
        ).alias("categories"),
    )


def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 scoped context as window state: carry the last purchase value
    forward per user (last ignorenulls over unbounded-preceding frame)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 4).alias(
            "last_purchase_value"
        ),
    )


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: (user, day) pairs with a click but no purchase that day
    (EXCEPT).  Day granularity because every user in the driver testdata
    eventually triggers every event type, making the round-1 user-level
    EXCEPT vacuously empty; this returns 1010 rows at sf0.01."""
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    return clicks.exceptAll(buys)


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: customer account balance by (region, nation)
    with ROLLUP subtotals (broadcast dims, partial aggs)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
    )


def q_ntriples_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Triples serialization (late round 3, operators/export.py
    to_ntriples): every document row as a spec-escaped
    `<urn:kg:e:ID> <urn:kg:p:text> "..." .` line — the KG's
    standard-format exit door (RDF 1.1 N-Triples), with the literal
    ECHAR escapes and IRI percent-encoding done by one chain of JVM
    literal replaces (no regex, no Python).  The DuckDB oracle applies
    the identical REPLACE chain byte-for-byte."""
    from node_feedparser_spark.operators.export import to_ntriples

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("subj"),
        F.lit("text").alias("pred"),
        F.col("text").alias("obj"),
    )
    return to_ntriples(docs)


def q_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per source (late round 3,
    operators/cluster_eval.py cohen_kappa): chance-corrected agreement
    between two deterministic 'annotators' of the documents table (lang
    vs lang-with-every-7th-doc-relabeled) — the labeled-data quality
    gate before either label set is trusted as gold; completes the
    evaluation family next to cluster_quality (clustering vs gold) and
    blocking_quality (candidate generation).  Exact integer
    numerator/denominator, sign/abs 6-dp fixed point — bit-identical
    oracle."""
    from node_feedparser_spark.operators.cluster_eval import cohen_kappa

    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.col("lang").alias("ann_a"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("zz"))
        .otherwise(F.col("lang"))
        .alias("ann_b"),
    )
    return cohen_kappa(docs, "ann_a", "ann_b", ["source"])


def q_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (late round 3): per-type event counts
    and distinct users over 30-minute windows sliding every 10 — the
    overlapping-window surface (F.window with a slide) that tumbling
    bucket queries (burst_detect, drift) don't exercise; each event
    lands in exactly window/slide = 3 windows, which the DuckDB oracle
    reproduces by exploding the three epoch-aligned starts in exact
    microsecond arithmetic (Spark aligns window starts to multiples of
    the slide from the epoch)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.window(F.col("ts").cast("timestamp"), "30 minutes", "10 minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("win_start"),
            "n",
            "n_users",
        )
    )


def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quartiles (late round 3, operators/profile.py
    exact_percentiles): p25/p50/p75 of lineitem quantity per
    (returnflag, linestatus) by pure integer position selection
    (ceil(q*n), type-1/lower quantile, NO interpolation) over a
    distinct-value histogram — the sketch-free exact twin of
    hist_quantiles for bounded value domains; the cumulative window runs
    over the ~50 distinct quantities per key, never the row count."""
    from node_feedparser_spark.operators.profile import exact_percentiles

    li = _t(spark, sf_dir, "lineitem")
    return exact_percentiles(
        li, ["l_returnflag", "l_linestatus"], "l_quantity"
    )


def q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (late round 3): per-user event counts pivoted into one
    column per event type — the long-to-wide reshape surface
    (`groupBy().pivot()`), with the value list passed EXPLICITLY so
    Spark skips the extra collect-distinct pass (the scale-safe form:
    an implicit pivot scans the corpus twice and caps at
    spark.sql.pivotMaxValues).  Missing combinations coalesce to 0.
    The DuckDB oracle is the equivalent conditional aggregation."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in types
        ],
    )


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (late round 3): the wide-to-long inverse of
    q_pivot_counts — lineitem's four measure columns become
    (orderkey, linenumber, measure, value) rows via the native
    `DataFrame.unpivot` (SQL UNPIVOT / stack surface; one projection +
    generator, no shuffle at all).  Values are carried verbatim (no
    arithmetic), so double equality is bit-exact."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    ).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").cast("long").alias("linenumber"),
        "measure",
        F.col("value").cast("double").alias("value"),
    )


def q_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-function family (late round 3): rank / dense_rank over a
    tied band ordering plus ntile(4) and row_number over the fully
    tie-broken ordering, per nation — the analytic-function surface
    beyond q_window_order's bare row_number.  rank/dense_rank are
    evaluated over the BAND-ONLY ordering (ties collapse identically in
    both engines regardless of intra-tie row order), ntile/row_number
    over (band desc, custkey) — a total order, so every output is a
    deterministic integer; top 7 per nation."""
    cust = _t(spark, sf_dir, "customer")
    banded = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_custkey").alias("custkey"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    w_band = Window.partitionBy("nation").orderBy(F.col("band").desc())
    w_full = Window.partitionBy("nation").orderBy(
        F.col("band").desc(), F.col("custkey")
    )
    return (
        banded.select(
            "nation",
            "custkey",
            "band",
            F.rank().over(w_band).cast("long").alias("rnk"),
            F.dense_rank().over(w_band).cast("long").alias("drnk"),
            F.ntile(4).over(w_full).cast("long").alias("quartile"),
            F.row_number().over(w_full).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 7)
    )


def q_cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping ids (late round 3): the full 2^2 subtotal
    lattice over (returnflag, linestatus) — the OLAP companion of
    q_rollup_revenue's hierarchy-only subtotals; grouping_id()
    disambiguates a NULL group key from a subtotal row (both engines use
    the same first-arg-most-significant bitmask).  Quantity is
    integer-valued so its double sum is order-independent and exact; one
    expand + partial/final agg, no joins."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
    )


def q_whitespace_hoist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 whitespace-only drop + hoist: trim, then NULL out empty strings
    (the reference deletes all-whitespace text nodes)."""
    docs = _t(spark, sf_dir, "documents")
    padded = F.when(F.col("doc_id") % 7 == 0, F.lit("   ")).otherwise(
        F.concat(F.lit("  "), F.col("lang"), F.lit(" "))
    )
    return docs.select(
        "doc_id",
        F.nullif(F.trim(padded), F.lit("")).alias("hoisted_lang"),
    )


def q_ordered_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 parent-child collect, order-sensitive: per user, the first 5
    event types in (ts, event_id) order as one array.  collect_list is
    order-nondeterministic under parallelism, so the struct-sort_array
    idiom pins document order (SURVEY.md A1 'always carry turn_idx')."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    5,
                ),
                ",",
            ).alias("first_events")
        )
    )


def q_url_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F5/F6 URL resolution: never-throw resolve(base, url) over
    synthesized (base, url) pairs covering ../ ./ bare /abs absolute urn:
    and empty shapes plus null bases (reference lib/utils.js:62-70;
    test/utils.js:75-138).  The Spark side runs the real resolver UDF; the
    oracle reconstructs each controlled shape with string ops."""
    from node_feedparser_spark.functions.urls import resolve_udf

    ev = _t(spark, sf_dir, "events")
    base = F.when(
        F.col("event_id") % 13 != 0,
        F.concat(F.lit("https://u"), F.col("user_id"), F.lit(".example/a/b/")),
    )
    m = F.col("event_id") % 7
    url = (
        F.when(m == 0, F.concat(F.lit("../c"), F.col("event_id")))
        .when(m == 1, F.concat(F.lit("./d"), F.col("event_id")))
        .when(m == 2, F.concat(F.lit("e"), F.col("event_id")))
        .when(m == 3, F.concat(F.lit("/f"), F.col("event_id")))
        .when(m == 4, F.concat(F.lit("https://cdn.example/g"), F.col("event_id")))
        .when(m == 5, F.concat(F.lit("urn:item:"), F.col("event_id")))
        .otherwise(F.lit(""))
    )
    return ev.select(
        "event_id",
        base.alias("base_url"),
        url.alias("url"),
        resolve_udf(base, url).alias("resolved"),
    )


def q_retro_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/W3 scoped-context retro-resolution: each user's first absolute
    URL (signup events carry one) becomes the conversation base; relative
    URLs in ALL events — including ones BEFORE the base event — resolve
    against it (reference reresolve, lib/utils.js:160-210; late xml:base,
    test/xmlbase.js:47-68)."""
    from node_feedparser_spark.operators.urlresolve import retro_resolve_urls

    ev = _t(spark, sf_dir, "events")
    url = F.when(
        F.col("event_type") == "signup",
        F.concat(
            F.lit("https://u"), F.col("user_id"), F.lit(".example/s"),
            F.col("event_id"), F.lit("/"),
        ),
    ).otherwise(
        F.when(F.col("event_id") % 3 == 0, F.concat(F.lit("../r"), F.col("event_id")))
        .when(F.col("event_id") % 3 == 1, F.concat(F.lit("p"), F.col("event_id")))
        .otherwise(F.concat(F.lit("/q"), F.col("event_id")))
    )
    turns = ev.select("event_id", "user_id", "ts", url.alias("url"))
    out = retro_resolve_urls(
        turns, url_col="url", conv_col="user_id", order_cols=("ts", "event_id")
    )
    return out.select("event_id", "user_id", "url", "base_url", "resolved_url")


def q_html_uri_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 resolveHtmlUris: rewrite URI attributes inside known HTML open
    tags embedded in text — quoted, unquoted, and srcset attributes resolve;
    unknown tags survive byte-identically (reference lib/utils.js:276-340)."""
    from node_feedparser_spark.functions.urls import resolve_html_uris_udf

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<a href="/doc'), F.col("doc_id"), F.lit('">'), F.col("lang"),
        F.lit("</a> <img src=img"), F.col("doc_id"),
        F.lit('.png srcset="a'), F.col("doc_id"),
        F.lit('.png 1x, /b'), F.col("doc_id"),
        F.lit('.png 2x"> <foo href="/skip">'),
    )
    base = F.concat(
        F.lit("https://h"), F.col("doc_id") % 10, F.lit(".example/dir/")
    )
    return docs.select(
        "doc_id",
        base.alias("base_url"),
        resolve_html_uris_udf(html, base).alias("resolved_html"),
    )


def q_salted_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule mega-thread skew handling, oracle-checkable (r3): salted
    applyInPandas per-group stats (operators/conv_apply.py) — hot groups
    split into bounded hash-salt chunks (event_id is a GLOBAL id, so
    range-salting would degenerate to one chunk per row), then an
    associative merge — over the events table keyed by user; semantically
    a plain GROUP BY, which is exactly what the DuckDB oracle runs."""
    from node_feedparser_spark.operators.conv_apply import conversation_stats

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_id").cast("int").alias("event_id"),
        "event_type",
        "props",
    )
    stats = conversation_stats(
        ev,
        mega_threshold=50,
        chunk_rows=20,
        group_col="user_id",
        order_col="event_id",
        text_col="event_type",
        tool_col="props",
    )
    return stats.select(
        "user_id",
        F.col("n_turns").alias("n_events"),
        F.col("n_chars"),
        F.col("n_tool_turns").alias("n_with_props"),
        F.col("max_turn_idx").alias("max_event_id"),
    )


def q_embedded_html_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 mayHaveEmbeddedHtml — exact field/type-attr dispatch (reference
    lib/utils.js:342-355) gating the F9 HTML-URI rewrite (lib/feedparser.js:
    294-298): synthesize a field name (8-way by event_id) and a type attr
    (4-way by user_id) per event, emit the codegen dispatch boolean and the
    gated rewrite — routed fields get their embedded href resolved against
    the base, unrouted fields pass through byte-identically."""
    from node_feedparser_spark.functions.urls import (
        may_have_embedded_html_col,
        resolve_field_html_uris_col,
    )

    ev = _t(spark, sf_dir, "events")
    fields = [
        "content:encoded", "description", "summary", "tagline",
        "content", "title", "subtitle", "link",
    ]
    name = F.element_at(
        F.array(*[F.lit(f) for f in fields]), (F.col("event_id") % 8 + 1).cast("int")
    )
    k = F.col("user_id") % 4
    type_attr = (
        F.when(k == 0, "html").when(k == 1, "xhtml").when(k == 2, "text")
    )  # k == 3 -> NULL (absent type attr)
    text = F.concat(
        F.lit('say <a href="/e'), F.col("event_id"), F.lit('">go</a>')
    )
    base = F.concat(F.lit("http://b"), F.col("user_id") % 5, F.lit(".example/d/"))
    return ev.select(
        "event_id",
        name.alias("field_name"),
        type_attr.alias("type_attr"),
        may_have_embedded_html_col(name, type_attr, text).alias("routed"),
        resolve_field_html_uris_col(name, type_attr, text, base).alias("out_text"),
    )


def q_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 attribute simplification on a MapType column: build an attr map,
    lowercase the keys, drop the 'version' key (reference excludes the
    version attr from meta '@', lib/feedparser.js:209-215), emit sorted
    k=v pairs for engine-portable comparison."""
    part = _t(spark, sf_dir, "part")
    attrs = F.create_map(
        F.lit("Brand"), F.col("p_brand"),
        F.lit("TYPE"), F.col("p_type"),
        F.lit("version"), F.col("p_size").cast("string"),
    )
    lowered = F.transform_keys(attrs, lambda k, _: F.lower(k))
    cleaned = F.map_filter(lowered, lambda k, _: k != "version")
    # F13 analog: re-serialize the normalized attribute map back into one
    # canonical self-closed element string (the reference re-serializes
    # parsed xhtml content back to markup, lib/feedparser.js:304-320;
    # canonical = lowercase names, sorted, double-quoted).
    serialized = F.concat(
        F.lit("<item "),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(cleaned),
                    lambda e: F.concat(
                        e["key"], F.lit('="'), e["value"], F.lit('"')
                    ),
                )
            ),
            " ",
        ),
        F.lit("/>"),
    )
    return part.select(
        "p_partkey",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(cleaned),
                    lambda e: F.concat_ws("=", e["key"], e["value"]),
                )
            ),
            ";",
        ).alias("attrs"),
        serialized.alias("serialized"),
    )


def q_xhtml_reserialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 true XHTML subtree re-serialization (reference
    lib/feedparser.js:198-204,308,318,401-402): derive a deterministic
    variable-depth node tree per document (depth 1-3 below the container by
    doc_id%3, text and element siblings interleaved, whitespace padding at
    both ends), fold it bottom-up with the general
    ``serialize_subtrees`` operator, and emit the container's trimmed
    inner markup — open tags with insertion-ordered raw attrs, verbatim
    text, close tags, exactly the reference's sax-walk output."""
    from node_feedparser_spark.operators.reserialize import (
        container_inner,
        serialize_subtrees,
    )

    docs = _t(spark, sf_dir, "documents")
    attrs_t = "array<struct<k:string,v:string>>"

    def node(nid, pid, pos, depth, kind, name, attrs, text, keep):
        return F.struct(
            F.lit(nid).alias("node_id"),
            (F.lit(pid) if pid is None else F.lit(pid)).cast("int").alias("parent_id"),
            F.lit(pos).alias("pos"),
            F.lit(depth).alias("depth"),
            F.lit(kind).alias("kind"),
            (F.lit(name) if isinstance(name, str) or name is None else name)
            .cast("string")
            .alias("name"),
            (F.lit(None) if attrs is None else attrs).cast(attrs_t).alias("attrs"),
            (F.lit(None) if text is None else text).cast("string").alias("text"),
            keep.alias("keep"),
        )

    def a(k, v):
        return F.struct(F.lit(k).alias("k"), v.cast("string").alias("v"))

    m = F.col("doc_id") % 3
    yes = F.lit(True)
    arr = F.array(
        node(0, None, 0, 0, "text", None, None, F.lit("  "), yes),
        node(
            1, None, 1, 0, "elem", "div",
            F.array(
                a("id", F.concat(F.lit("d"), F.col("doc_id").cast("string"))),
                a("class", F.concat(F.lit("c"), (F.col("doc_id") % 5).cast("string"))),
            ),
            None, yes,
        ),
        node(2, 1, 0, 1, "text", None, None, F.substring("text", 1, 24), yes),
        node(3, 1, 1, 1, "elem", "span", F.array(a("lang", F.col("lang"))), None, m >= 1),
        node(4, 3, 0, 2, "text", None, None, F.substring("text", 25, 12), m >= 1),
        node(5, 3, 1, 2, "elem", "em", F.array().cast(attrs_t), None, m == 2),
        node(6, 5, 0, 3, "text", None, None, F.substring("text", 37, 6), m == 2),
        node(7, None, 2, 0, "text", None, None, F.concat(F.lit(" "), F.col("source")), yes),
        node(8, None, 3, 0, "text", None, None, F.lit("\n"), yes),
    )
    nodes = (
        docs.select("doc_id", F.explode(F.filter(arr, lambda s: s["keep"])).alias("n"))
        .select("doc_id", "n.*")
        .drop("keep")
    )
    return container_inner(serialize_subtrees(nodes)).select("doc_id", "serialized")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (round 3): segment each user's event
    stream into activity sessions at 30-minute silence gaps, via the
    BUCKETED two-level plan (operators/sessionize.py) — per-(user, day)
    local windows stitched through a tiny boundary table, so no task ever
    windows a whole mega-user.  Semantically the textbook lag/cumsum
    sessionization, which is exactly what the DuckDB oracle runs."""
    from node_feedparser_spark.operators.sessionize import sessionize

    ev = _t(spark, sf_dir, "events")
    out = sessionize(ev, gap_seconds=1800, bucket_width_seconds=86_400)
    return out.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        F.col("n_events").cast("long").alias("n_events"),
        "session_start",
        "session_end",
        "total_value",
    )


def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (round 3): each purchase enriched with the user's most
    recent click at or before it (classic attribution).  Spark has no ASOF
    JOIN; operators/asof.py compiles it to a union-tag + one forward-fill
    window — |L|+|R| rows, one shuffle, no range-join pair explosion.  The
    DuckDB oracle runs its NATIVE ASOF JOIN, an independently-implemented
    operator, on the same input."""
    from node_feedparser_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        right_cols=("click_event_id",),
        tiebreak="click_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_ts").alias("click_ts"),
        "click_event_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_ts").cast("timestamp"))
        ).alias("micros_since_click"),
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph algorithm (round 3): 2-iteration weighted PageRank
    (operators/graph_algo.py) over the supplier->part shipment graph
    projected from lineitem.  Each iteration is one join of the static
    normalized edge list with the rank vector + one groupBy sum; dangling
    mass (every part node — the graph is bipartite) is one scalar
    aggregate per round.  The DuckDB oracle unrolls the same two
    iterations as plain SQL, so every semantic choice (uniform teleport,
    uniform dangling redistribution, weight-proportional split) is
    independently pinned."""
    from node_feedparser_spark.operators.graph_algo import pagerank

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
        F.col("l_quantity").cast("double").alias("weight"),
    )
    out = pagerank(edges, n_iter=2, damping=0.85)
    return out.select("node", F.round("rank", 6).alias("rank"))


def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-overlap link prediction (KG completion) over the
    supplier-part shipment graph: for non-adjacent node pairs sharing a
    neighbor, common-neighbor count + Adamic-Adar + Jaccard.  max_degree=40
    caps wedge pivots (the d^2 celebrity blow-up — suppliers ship hundreds
    of parts and are excluded as pivots; parts have bounded supplier fan-in
    and drive the wedges), so the output is supplier-pair affinity via
    shared parts.  The oracle replays the same cap."""
    from node_feedparser_spark.operators.graph_algo import link_predict

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    return link_predict(edges, max_degree=40)


def q_link_pred_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG-completion ranking evaluation (MRR / Hits@k / mean rank): score
    supplier-supplier affinity with Adamic-Adar over shared parts
    (q_link_predict's scorer, same max_degree=40 pivot cap), then rank
    each supplier's candidates and evaluate against HELD-OUT truth that
    the scorer never sees — supplier pairs that co-occur in the same
    order.  The graph is bipartite (supplier-part), so no truth pair is
    train-adjacent and the protocol needs no filtering step.  Candidates
    are symmetrized (each scored pair ranks in both endpoints' lists);
    ranking is (rounded score DESC, item ASC) so the rank — and therefore
    every metric — is deterministic and engine-portable.  Positives the
    scorer never surfaced count as misses (RR 0, hits 0), mean_rank
    averages found ranks only.  One summary row.

    Honesty note: TPC-H assigns parts to suppliers uniformly at random,
    so shared-part affinity carries ~zero signal for co-order truth and
    the measured metrics sit near the uniform baseline (sf0.1: mean_rank
    499.4 vs 499.5 random) — the deliverable here is the evaluation
    operator and its engine-portable determinism, pinned non-trivially by
    tests/test_ranking_eval.py on a hand-computed graph."""
    from node_feedparser_spark.operators.graph_algo import (
        link_predict,
        ranking_eval,
    )

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    sp = link_predict(edges, max_degree=40).filter(
        F.col("node_a").startswith("s")
    )
    cand = sp.select(
        F.col("node_a").alias("g"),
        F.col("node_b").alias("it"),
        F.col("aa_score").alias("sc"),
    ).union(
        sp.select(
            F.col("node_b").alias("g"),
            F.col("node_a").alias("it"),
            F.col("aa_score").alias("sc"),
        )
    )
    osup = li.select(
        "l_orderkey", F.concat(F.lit("s"), F.col("l_suppkey")).alias("s")
    ).distinct()
    a, b = osup.alias("a"), osup.alias("b")
    truth = a.join(b, "l_orderkey").filter(F.col("a.s") != F.col("b.s")).select(
        F.col("a.s").alias("g"), F.col("b.s").alias("it")
    )
    return ranking_eval(cand, truth, group="g", item="it", score="sc")


# round 4: q_hyperanf_reach and q_harmonic_centrality consume the SAME
# hyperanf register chain over the SAME %4 shipment graph; within one
# driver session the |E| x 2^p join fan is paid once via this memoized,
# lazily-checkpointed frame.  Keyed by (application, sf_dir, lineitem
# file mtime+size) so a fresh session OR regenerated data at the same
# path never reuses stale sketches; a driver session visits 1-2 sf_dirs,
# so the unbounded dict and the pinned checkpoint blocks stay two
# entries deep in practice.  Results are identical either way — the
# cache is a cost change, not a semantics change (pinned by
# tests/test_hyperanf.py's shared-frame tests).
_ANF_SHARED: dict = {}


def _shared_hyperanf(spark: SparkSession, sf_dir: str):
    from node_feedparser_spark.operators.graph_algo import hyperanf

    li_path = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(li_path)
        stamp = (int(st.st_mtime), st.st_size)
    except OSError:
        stamp = None
    key = (spark.sparkContext.applicationId, sf_dir, stamp)
    if key not in _ANF_SHARED:
        li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 4 == 0)
        e = li.select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
        )
        edges = e.union(e.select(F.col("dst_id"), F.col("src_id")))
        _ANF_SHARED[key] = hyperanf(edges, rounds=2, p=7).localCheckpoint(
            eager=False
        )
    return _ANF_SHARED[key]



def q_hyperanf_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF approximate neighborhood function (round 3,
    operators/graph_algo.py hyperanf): per-node HLL estimates of
    |ball(v, t)| for t = 1, 2 over the undirected supplier<->part
    shipment graph — the Boldi-Vigna reachability/effective-diameter
    sketch whose exact counterpart (materializing every BFS ball) is
    |V|^2 on small-diameter graphs.  Max-merge of HLL registers is
    EXACTLY the sketch of the union, so the DuckDB oracle rebuilds the
    identical registers bit-for-bit, unrolls the same two merge rounds,
    and applies the same estimator — zero approximation slack between
    engines.

    The named query runs on the orderkey%4==0 projection (the declared
    deterministic bound rule_mining also uses, replayed by the oracle):
    round 2's join intermediate is |E| x up-to-2^p registers — the
    algorithm's intrinsic cost — and the projection roughly halves the
    sf0.1 bench wall (21.6 s full graph -> 11.8 s; supplier balls still
    saturate toward 2^p registers, so the fan shrinks sublinearly in
    |E|) without changing what the operator does.  Round 4: the frame is
    the memoized _shared_hyperanf chain also consumed by
    q_harmonic_centrality, so one driver session pays the register join
    fan once across the two queries."""
    return _shared_hyperanf(spark, sf_dir)


def q_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global effective diameter from HyperANF (late round 3,
    operators/graph_algo.py effective_diameter): smallest t with
    N(t) >= 0.9 * N(rounds) over the undirected supplier<->part shipment
    graph — the per-GRAPH statistic ANF was built for (Boldi-Vigna "Four
    Degrees of Separation"), alongside harmonic_centrality's per-node
    effective radius from the same sketches.  Deterministic bound: the
    l_orderkey%8==0 projection (half hyperanf_reach's %4 edge fan — the
    register-join intermediate is the algorithm's intrinsic cost and this
    query adds only a 3-row radius sum on top, so it doesn't pay the full
    fan twice in the bench).  The DuckDB oracle rebuilds the identical
    registers, unrolls the same two merge rounds, scales each 4-dp
    estimate to an exact integer before the global sum, and applies the
    same exact-integer threshold test — bit-identical on both engines."""
    from node_feedparser_spark.operators.graph_algo import (
        effective_diameter,
    )

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 8 == 0)
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    edges = e.union(e.select(F.col("dst_id"), F.col("src_id")))
    return effective_diameter(edges, rounds=2, p=7)


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic node2vec/DeepWalk sampling over the undirected
    supplier<->part graph: 2 walks of length 3 from every node, each step
    a hash-indexed neighbor choice (seed 11) — the graph-embedding
    training-corpus generator, reproducible enough that the DuckDB oracle
    unrolls the identical walks in SQL."""
    from node_feedparser_spark.operators.graph_algo import random_walks

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    edges = e.union(e.select(F.col("dst_id"), F.col("src_id")))
    return random_walks(edges, walk_len=3, walks_per_node=2, seed=11)


def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context, n_pairs) training pairs (window 2) from
    the deterministic walk corpus of q_random_walks — the full
    graph-embedding data pipeline (walks -> pairs) as one declarative plan.
    Pair generation is array-local over assembled walks; the oracle
    self-joins the same unrolled-SQL walks on |step diff| <= 2."""
    from node_feedparser_spark.operators.graph_algo import (
        random_walks,
        skipgram_pairs,
    )

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    edges = e.union(e.select(F.col("dst_id"), F.col("src_id")))
    walks = random_walks(edges, walk_len=3, walks_per_node=2, seed=11)
    return skipgram_pairs(walks, window=2)


def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths (3-round Bellman-Ford) from suppliers
    s1-s3 over the undirected supplier<->part shipment graph, edge weight
    = min l_quantity per pair: one dist-join-min relaxation per round
    with a changed-rows frontier; the oracle unrolls the same three
    full-table relaxations (frontier vs full-table are semantically
    identical — the frontier is only a work saver)."""
    from node_feedparser_spark.operators.graph_algo import shortest_paths

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
        F.col("l_quantity").cast("double").alias("weight"),
    )
    edges = e.union(e.select(F.col("dst_id"), F.col("src_id"), F.col("weight")))
    seeds = _t(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") <= 3
    ).select(F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"))
    return shortest_paths(edges, seeds, max_hops=3)


def q_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order (node2vec) biased walks over the triangle-rich part
    co-purchase graph (parts sharing an order are linked): step 1 uniform,
    step 2 weighted 1/2/1 by the candidate's relation to the previous node
    (return / closes-a-triangle / outward) — integer weights, hash-indexed
    pick, so the DuckDB oracle unrolls the identical walks including both
    window cumulative-weight ranges."""
    from node_feedparser_spark.operators.graph_algo import biased_walks

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.concat(F.lit("p"), F.col("a.l_partkey")).alias("src_id"),
            F.concat(F.lit("p"), F.col("b.l_partkey")).alias("dst_id"),
        )
    )
    return biased_walks(edges, walk_len=2, walks_per_node=1, seed=13)


def q_kg_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a KG-shaped edge list
    (operators/components.py — the north rule's 'iterative
    large-star/small-star on DataFrames', here exposed as its own named
    query instead of only inside canonicalize/near-dup).  The graph is
    sparse and deterministic: customers with ADJACENT custkeys in the same
    nation are linked, giving many chain components of varying length —
    exactly the shape whose diameter makes naive label propagation slow
    and star-contraction logarithmic.  component = min custkey of the
    chain; isolated customers are their own component.  The DuckDB oracle
    is an independent recursive-CTE reachability closure."""
    from node_feedparser_spark.operators.components import (
        connected_components,
    )

    cust = _t(spark, sf_dir, "customer")
    c1 = cust.select(
        F.col("c_custkey").cast("long").alias("src"), "c_nationkey"
    )
    c2 = cust.select(
        F.col("c_custkey").cast("long").alias("dst"),
        F.col("c_nationkey").alias("nk2"),
    )
    edges = (
        c1.withColumn("jk", F.col("src") + 1)
        .join(c2, F.col("jk") == F.col("dst"))  # equi-join, never a BNLJ
        .filter(F.col("c_nationkey") == F.col("nk2"))
        .select("src", "dst")
    )
    comp = connected_components(edges)
    nodes = cust.select(F.col("c_custkey").cast("long").alias("node"))
    return nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components over a DIRECTED graph (round 3,
    operators/scc.py — Orzan-coloring peel loop; kg_components is the
    undirected twin).  Deterministic directed shape: customers in each
    nation are ringed in consecutive blocks of 6 (by custkey rank) — one
    SCC per block — and each block's minimum points DOWN to the previous
    block's minimum, so the condensation is a per-nation chain whose edges
    run high→low: the age-correlated-id KG shape on which the first
    forward coloring already separates every SCC (generality under
    adversarial ids is pinned by tests/test_scc.py's multi-round peel).
    The DuckDB oracle is an independent recursive-CTE mutual-reachability
    closure — the O(n·reach) object the distributed operator exists to
    avoid."""
    from node_feedparser_spark.operators.scc import (
        strongly_connected_components,
    )

    edges, nodes = _scc_ring_graph(spark, sf_dir)
    return strongly_connected_components(edges, nodes)


def _scc_ring_graph(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The deterministic directed graph q_scc and q_scc_condensation
    share: per-nation custkey-rank rings of 6 (one SCC each) plus one
    high->low edge between consecutive block minima (the condensation
    chain).  Returns (edges(src, dst), nodes(node))."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    b = (
        cust.select(
            F.col("c_custkey").cast("long").alias("ck"),
            F.col("c_nationkey").alias("nk"),
            (F.row_number().over(w) - 1).alias("rn"),
        )
        .withColumn("blk", (F.col("rn") / 6).cast("long"))
        .withColumn("pos", F.col("rn") % 6)
    )
    bs = b.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("nk", "blk"))
    )
    ring = (
        bs.alias("a")
        .join(
            bs.alias("c"),
            (F.col("a.nk") == F.col("c.nk"))
            & (F.col("a.blk") == F.col("c.blk"))
            & (F.col("c.pos") == (F.col("a.pos") + 1) % F.col("a.bsz")),
        )
        .select(F.col("a.ck").alias("src"), F.col("c.ck").alias("dst"))
    )
    mins = b.groupBy("nk", "blk").agg(F.min("ck").alias("mck"))
    cross = (
        mins.alias("hi")
        .join(
            mins.alias("lo"),
            (F.col("hi.nk") == F.col("lo.nk"))
            & (F.col("hi.blk") == F.col("lo.blk") + 1),
        )
        .select(F.col("hi.mck").alias("src"), F.col("lo.mck").alias("dst"))
    )
    nodes = cust.select(F.col("c_custkey").cast("long").alias("node"))
    return ring.union(cross), nodes


def q_scc_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation DAG over q_scc's graph (late round 3,
    operators/scc.py condensation): every ring SCC contracted to its MIN
    member, leaving exactly the per-nation high->low chain between block
    minima — one row per consecutive block pair, n_edges = 1.  The
    acyclic component-level graph cycle analysis and topological
    scheduling consume after SCC detection; two label equi-joins + one
    count agg on top of the SCC peel.  The DuckDB oracle composes the
    same recursive-CTE mutual-reachability labels with the same
    join-filter-count."""
    from node_feedparser_spark.operators.scc import condensation

    edges, nodes = _scc_ring_graph(spark, sf_dir)
    return condensation(edges, nodes)


def q_freq_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori frequent itemsets (late round 3, operators/itemsets.py
    frequent_itemsets): which part-brand combinations co-occur in at
    least 0.15% of order baskets — the market-basket/co-mention pattern
    family (Agrawal-Srikant VLDB'94), the corpus-level generalization of
    the reference's per-item category accumulate (SURVEY A5).  Baskets =
    order -> distinct brands via a broadcast part-dim join; support is
    RELATIVE and compared in exact integer arithmetic (s*den >= num*n),
    so the same mining travels across corpus sizes; monotonicity prunes
    are broadcast semi-joins — the corpus shuffles once.  The DuckDB
    oracle mirrors all three levels with the same integer threshold."""
    from node_feedparser_spark.operators.itemsets import frequent_itemsets

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    baskets = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
    ).select(
        F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item")
    )
    return frequent_itemsets(baskets, support_num=15, support_den=10000)


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union coverage (late round 3, operators/timeline.py
    interval_coverage): events become half-open activity intervals
    [ts, ts + value seconds) in exact long microseconds and overlaps
    merge — effective uptime / speaker airtime, the interval companion
    of sessionize (gap rule on points) and allen_relations (pairwise
    classification).  Runs the BUCKETED plan (coverage is additive over
    a time partition: clip to 1-hour buckets, merge islands locally,
    subtract boundary junctions) so no task ever windows a whole
    mega-key; the DuckDB oracle is the independent single-window
    gaps-and-islands plan.  FLOOR before the double->long cast on both
    engines (Spark casts truncate, DuckDB casts round — the Benford
    lesson)."""
    from node_feedparser_spark.operators.timeline import interval_coverage

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("user_id").alias("key"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.floor(F.col("value") * 1000000).cast("long")
        ).alias("e_us"),
    )
    return interval_coverage(iv, bucket_us=3_600_000_000)


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier butterfly counts (late round 3,
    operators/bipartite.py butterfly_counts): 2x2 bicliques over the
    bipartite supplier<->part shipment graph (orderkey % 6 == 1) — the
    bipartite analogue of triangle counting (triangle_count returns 0 on
    bipartite graphs: no odd cycles), the collusion/density signature.
    Wedge self-join on the part key, pair count, C(w,2) row-local, one
    per-node sum — pure integer arithmetic, bit-identical oracle."""
    from node_feedparser_spark.operators.bipartite import butterfly_counts

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 6 == 1)
    edges = li.select(
        F.col("l_suppkey").alias("left"), F.col("l_partkey").alias("right")
    )
    return butterfly_counts(edges)


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules (late round 3, operators/itemsets.py
    association_rules): X -> Y with confidence and lift over the same
    order -> part-brand baskets as q_freq_itemsets (support 0.15%,
    confidence >= 5%) — Agrawal-Srikant's second stage.  The confidence
    gate is an exact integer comparison BEFORE the two 6-dp-rounded
    divisions, and everything after the mining runs on
    frequent-set-sized tables, so the corpus shuffles exactly once."""
    from node_feedparser_spark.operators.itemsets import association_rules

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    baskets = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
    ).select(
        F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item")
    )
    return association_rules(
        baskets, support_num=15, support_den=10000, conf_num=1, conf_den=20
    )


def q_topo_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological longest-path layers (late round 3, operators/scc.py
    topological_layers): the PERT/critical-path level assignment over a
    deterministic divisor DAG on part keys (k -> 2k and k -> 3k while
    within range) — layer(k) = a+b for k = m*2^a*3^b reachable in range,
    i.e. the schedule wave in which k's "task" can run.  Depth is
    log2(max key), so rounds stay bounded at ANY scale factor; pure
    integer arithmetic, sum-stationary convergence, and the DuckDB
    recursive-CTE longest-path oracle is bit-identical.  The condensation
    composition (cycle-contract, then layer) is pinned in
    tests/test_topo_layers.py."""
    from node_feedparser_spark.operators.scc import topological_layers

    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("k")
    )
    mx = part.agg(F.max("k").alias("mx"))
    keyed = part.join(F.broadcast(mx))
    edges = (
        keyed.filter(F.col("k") * 2 <= F.col("mx"))
        .select(F.col("k").alias("src"), (F.col("k") * 2).alias("dst"))
        .unionByName(
            keyed.filter(F.col("k") * 3 <= F.col("mx")).select(
                F.col("k").alias("src"), (F.col("k") * 3).alias("dst")
            )
        )
    )
    return topological_layers(edges, nodes=part.select(F.col("k").alias("node")))


def q_link_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-link score calibration (round 3,
    operators/link_scoring.py): the north rule's 'entity-link scoring'
    stage as a standalone operator — per-predicate min-max confidence over
    the KG edge shape.  The per-predicate extrema are ONE tiny
    map-side-combinable agg broadcast back onto the edges; a
    Window.partitionBy(pred) would funnel the whole edge corpus into
    #predicate tasks (plan pinned window-free + broadcast-joined in
    tests/test_link_scoring.py)."""
    from node_feedparser_spark.operators.link_scoring import (
        calibrate_link_scores,
    )

    li = _t(spark, sf_dir, "lineitem")
    edges = li.groupBy(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.col("l_returnflag").alias("pred"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    ).agg(
        F.round(F.sum(F.col("l_quantity").cast("double")), 6).alias("weight")
    )
    return calibrate_link_scores(edges)


def q_type_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded label spreading (round 3, operators/graph_algo.py
    type_spread): clamped Zhu-Ghahramani majority-vote typing, two rounds
    over the full custkey chain with every 29th customer seeded
    'n'||nationkey — nodes farther than 2 hops stay honestly NULL; ties
    break to the lexicographically smallest type so the oracle's two
    unrolled rounds replay exactly."""
    from node_feedparser_spark.operators.graph_algo import type_spread

    cust = _t(spark, sf_dir, "customer")
    c1 = cust.select(F.col("c_custkey").cast("long").alias("src"))
    c2 = cust.select(F.col("c_custkey").cast("long").alias("dst"))
    edges = (
        c1.withColumn("jk", F.col("src") + 1)
        .join(c2, F.col("jk") == F.col("dst"))
        .select("src", "dst")
    )
    seeds = cust.filter(F.col("c_custkey") % 29 == 0).select(
        F.col("c_custkey").cast("long").alias("node"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("type"),
    )
    return type_spread(edges, seeds, n_rounds=2)


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (round 3, operators/graph_algo.py
    personalized_pagerank): topic-sensitive relevance from the supplier
    seeds suppkey <= 10 over the weighted supplier→part graph — teleport
    AND dangling mass restart at the seed vector (Haveliwala / Jeh-Widom),
    two iterations like the global pagerank query; the oracle unrolls
    both with the same seed vector."""
    from node_feedparser_spark.operators.graph_algo import (
        personalized_pagerank,
    )

    li = _t(spark, sf_dir, "lineitem")
    edges = li.groupBy(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    ).agg(F.sum(F.col("l_quantity").cast("double")).alias("weight"))
    seeds = (
        li.filter(F.col("l_suppkey") <= 10)
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("node"))
        .distinct()
    )
    return personalized_pagerank(edges, seeds, n_iter=2)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard similarity join (round 3,
    operators/dedupe.py jaccard_prefix_pairs): AllPairs prefix filtering —
    shingles globally ordered rarest-first, candidates only from prefix
    collisions, exact verify.  Deterministic (no hash family, no miss
    probability), and skew-resistant because stop-word grams are last in
    every doc's order and so almost never in a prefix.  The DuckDB oracle
    is the brute-force O(n^2) join at the same threshold — prefix filtering
    is provably lossless, and this pins it."""
    from node_feedparser_spark.operators.dedupe import jaccard_prefix_pairs

    return jaccard_prefix_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.7, k=3
    )


def q_term_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document term salience (round 3, operators/text_analysis.py
    term_salience): frequency × first-position heuristic (Dunietz-Gillick
    entity-salience features), top-3 terms per document with deterministic
    (salience DESC, token ASC) tie-breaks — the budget-k entity-node
    prioritizer for KG construction; per-document windows only."""
    from node_feedparser_spark.operators.text_analysis import term_salience

    return term_salience(_t(spark, sf_dir, "documents"), top_k=3)


def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shingle-containment join (round 3, operators/dedupe.py
    containment_pairs): ordered pairs with |S(src) ∩ S(dst)| / |S(src)|
    >= 0.8 — the asymmetric quote/subset relation Jaccard can't see,
    found via one-sided rarest-first prefix filtering (src prefixes vs
    the full dst posting list) and verified exactly in the JVM.  The
    DuckDB oracle is the brute-force O(n²) ordered join, pinning the
    prefix filter's losslessness."""
    from node_feedparser_spark.operators.dedupe import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, k=3
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered triangle counting (round 3, operators/graph_algo.py)
    over the co-supply graph: suppliers are adjacent when they both ship
    the same part in a large lot (l_quantity > 47).  The Spark side orients
    each edge low-degree -> high-degree so wedge generation is O(m^(3/2))
    even under celebrity-node skew; the DuckDB oracle counts the same
    triangles by a completely different algorithm (a < b < c three-way
    join), so the orientation machinery is independently pinned."""
    from node_feedparser_spark.operators.graph_algo import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.filter(F.col("l_quantity") > 47)
        .select(
            F.col("l_partkey").alias("p"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    pairs = (
        ps.withColumnRenamed("s", "s1")
        .join(ps.withColumnRenamed("s", "s2"), "p")
        .filter(F.col("s1") < F.col("s2"))
        .select(F.col("s1").alias("src_id"), F.col("s2").alias("dst_id"))
        .distinct()
    )
    out = triangle_count(pairs)
    return out.select("node", F.col("triangles").cast("long").alias("triangles"))


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-truss peel (round 3, operators/graph_algo.py
    ktruss): 2 rounds of drop-edges-with-support<2 (k=4) over the same
    co-supply graph as triangle_count — the EDGE-level density filter
    beside kcore's node-level peel, with the declared bounded-round
    truncation the oracle replays round for round."""
    from node_feedparser_spark.operators.graph_algo import ktruss

    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.filter(F.col("l_quantity") > 47)
        .select(
            F.col("l_partkey").alias("p"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    pairs = (
        ps.withColumnRenamed("s", "s1")
        .join(ps.withColumnRenamed("s", "s2"), "p")
        .filter(F.col("s1") < F.col("s2"))
        .select(F.col("s1").alias("src_id"), F.col("s2").alias("dst_id"))
        .distinct()
    )
    return ktruss(pairs, k=4, n_rounds=2)


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (round 3,
    operators/graph_algo.py clustering_coeff) over the same co-supply
    graph as triangle_count — the Watts-Strogatz per-node refinement;
    the ratio 2*tri/(deg*(deg-1)) is row-local integer arithmetic the
    oracle repeats on its independently-counted a<b<c triangles."""
    from node_feedparser_spark.operators.graph_algo import clustering_coeff

    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.filter(F.col("l_quantity") > 47)
        .select(
            F.col("l_partkey").alias("p"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    pairs = (
        ps.withColumnRenamed("s", "s1")
        .join(ps.withColumnRenamed("s", "s2"), "p")
        .filter(F.col("s1") < F.col("s2"))
        .select(F.col("s1").alias("src_id"), F.col("s2").alias("dst_id"))
        .distinct()
    )
    out = clustering_coeff(pairs)
    return out.select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        F.col("triangles").cast("long").alias("triangles"),
        "coeff",
    )


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (round 3, operators/graph_algo.py
    assortativity) of the supplier–part graph: four integer sums over
    the symmetrized stub list, one final float division — the
    disassortativity probe (bipartite hub-leaf KGs run strongly
    negative) beside powerlaw_alpha's tail fit."""
    from node_feedparser_spark.operators.graph_algo import assortativity

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    return assortativity(edges)


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-edge reciprocity (round 3, operators/graph_algo.py
    reciprocity) of the mixed N/R supplier↔part edge set — the
    "is this predicate family symmetric in practice" one-row probe;
    in-plan HALF_UP rounding, no driver-side arithmetic."""
    from node_feedparser_spark.operators.graph_algo import reciprocity

    li = _t(spark, sf_dir, "lineitem")
    fwd = li.filter(F.col("l_returnflag") == "N").select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    back = li.filter(F.col("l_returnflag") == "R").select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src_id"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst_id"),
    )
    return reciprocity(fwd.union(back))


def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS reachability (round 3, operators/graph_algo.py) over the
    typed KG projected from TPC-H's key chain: customer -[placed]-> order
    -[contains]-> part -[supplied_by]-> supplier.  Seeds are a hashed
    customer sample; dist is the MINIMUM forward hop count (<= 3).  Each
    hop joins only the delta frontier against the static edge list; the
    DuckDB oracle unrolls the same three hops and takes MIN over levels."""
    from node_feedparser_spark.operators.graph_algo import khop

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cu = _t(spark, sf_dir, "customer")
    edges = (
        od.select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src_id"),
            F.concat(F.lit("o"), F.col("o_orderkey")).alias("dst_id"),
        )
        .unionByName(
            li.select(
                F.concat(F.lit("o"), F.col("l_orderkey")).alias("src_id"),
                F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
            ).distinct()
        )
        .unionByName(
            li.select(
                F.concat(F.lit("p"), F.col("l_partkey")).alias("src_id"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst_id"),
            ).distinct()
        )
    )
    seeds = cu.filter(F.col("c_custkey") % 89 == 0).select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("node")
    )
    # checkpoint=True: without per-hop lineage truncation each hop's
    # isEmpty + the final action re-derive the whole frontier chain —
    # measured 18.4 s -> 6.1 s at sf0.1 local[32]
    out = khop(edges, seeds, max_hops=3, checkpoint=True)
    return out.select("node", F.col("dist").cast("long").alias("dist"))


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection (round 3, operators/graph_algo.py
    label_propagation): 2 synchronous iterations of most-frequent-neighbor-
    label relabeling (ties -> smallest label) over the sparse co-supply
    graph (suppliers sharing a part in a near-full lot, l_quantity > 49).
    Deterministic by construction, so the DuckDB oracle unrolls the same
    two iterations with ROW_NUMBER over (count DESC, label ASC)."""
    from node_feedparser_spark.operators.graph_algo import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.filter(F.col("l_quantity") > 49)
        .select(
            F.col("l_partkey").alias("p"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    pairs = (
        ps.withColumnRenamed("s", "s1")
        .join(ps.withColumnRenamed("s", "s2"), "p")
        .filter(F.col("s1") < F.col("s2"))
        .select(F.col("s1").alias("src_id"), F.col("s2").alias("dst_id"))
        .distinct()
    )
    return label_propagation(pairs, n_iter=2)


def q_kg_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (round 3, operators/graph_algo.py): the
    customer -[ordered]-> part edge aggregate at two OVERLAPPING snapshot
    windows (orders before 1999-01-01 vs orders from 1996-01-01 on), so all
    three interesting statuses occur: removed (old window only), added
    (new window only), changed (both, different weight); unchanged rows are
    filtered out.  This is the consumer query over the KG
    pipeline's snap-partitioned outputs — one co-partitioned full-outer
    join, classification as a pure projection.  Weights are
    round(sum(l_quantity), 2) built identically on BOTH sides before the
    diff, so classification never compares unrounded doubles."""
    from node_feedparser_spark.operators.graph_algo import snapshot_diff

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def _edges(orders_df: DataFrame) -> DataFrame:
        return (
            orders_df.select("o_orderkey", "o_custkey")
            .join(li.select("l_orderkey", "l_partkey", "l_quantity"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy(
                F.concat(F.lit("c"), F.col("o_custkey")).alias("src_id"),
                F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
            )
            .agg(F.round(F.sum("l_quantity"), 2).alias("weight"))
        )

    old = _edges(od.filter(F.col("o_orderdate") < "1999-01-01"))
    new = _edges(od.filter(F.col("o_orderdate") >= "1996-01-01"))
    out = snapshot_diff(old, new, keys=["src_id", "dst_id"], value="weight")
    return out.filter(F.col("status") != "unchanged").select(
        "src_id", "dst_id", "old_weight", "new_weight", "status"
    )


def q_truth_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knowledge fusion (round 3): conflicting (subj, pred) -> obj claims
    resolved by 2-iteration source-trust voting (operators/fusion.py).
    Claims: each supplier asserts a part's returnflag and linestatus —
    many sources, genuine conflicts.  The oracle unrolls the identical
    trust/confidence fixed-point in SQL, so every semantic choice
    (per-claim denominators, avg-trust update, argmax tie-break on obj)
    is independently pinned."""
    from node_feedparser_spark.operators.fusion import truth_fusion

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("subj"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("source"),
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
    )
    claims = base.select(
        "subj", F.lit("returnflag").alias("pred"), F.col("rf").alias("obj"), "source"
    ).unionAll(
        base.select(
            "subj", F.lit("linestatus").alias("pred"), F.col("ls").alias("obj"), "source"
        )
    )
    return truth_fusion(claims, n_iter=2)


def q_entity_timelines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 valid-interval materialization (round 3): collapse each
    user's event stream into (value, valid_from, valid_to) intervals at
    event_type change points, via the BUCKETED two-level plan
    (operators/timeline.py — local change flags per (user, day), boundary
    table carries each bucket's last value across the seam).  The oracle
    is the textbook single-window lag/cumsum/lead SQL."""
    from node_feedparser_spark.operators.timeline import scd2_timeline

    ev = _t(spark, sf_dir, "events")
    out = scd2_timeline(ev, bucket_width_seconds=86_400)
    return out.select(
        "user_id",
        F.col("interval_id").cast("long").alias("interval_id"),
        "event_type",
        "valid_from",
        "valid_to",
        "n_events",
    )


def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of entity-link scores (round 3, operators/link_scoring.py
    roc_auc): does the summed 'N'-flag edge weight of a (supplier, part)
    pair predict whether the pair also carries an 'R'-flag edge?  The
    normalized Mann-Whitney U with average-rank ties, computed over a
    distinct-score histogram (never a global row sort); all arithmetic is
    integer-and-half until the single final division, so the DuckDB twin
    matches bit-for-bit.  Complements ranking_eval's per-query MRR view."""
    from node_feedparser_spark.operators.link_scoring import roc_auc

    li = _t(spark, sf_dir, "lineitem")
    scored = (
        li.filter(F.col("l_returnflag") == "N")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.round(F.sum(F.col("l_quantity").cast("double")), 6).alias("score"))
    )
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .withColumn("one", F.lit(1))
    )
    labeled = scored.join(r, ["l_suppkey", "l_partkey"], "left").select(
        "score", F.coalesce("one", F.lit(0)).alias("label")
    )
    return roc_auc(labeled)


def q_rule_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn-rule application (round 3, operators/rules.py rule_apply):
    materialize placed(c,o) ∧ contains(o,p) → bought(c,p) over the mixed
    KG and keep only the heads NOT already asserted — the `bought`
    predicate is deliberately partial (even custkeys), so the inferred
    delta is exactly the odd-custkey completion a curator would review;
    the application half of rule_mining's AMIE loop."""
    from node_feedparser_spark.operators.rules import rule_apply

    return rule_apply(
        _kg_triples(spark, sf_dir), "placed", "contains", "bought"
    )


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration (round 3, operators/profile.py
    gini_concentration) of supplier→part edge weights — the inequality
    probe beside powerlaw_alpha and assortativity; exact grouped
    computation over a distinct-value histogram, never a per-row sort."""
    from node_feedparser_spark.operators.profile import gini_concentration

    li = _t(spark, sf_dir, "lineitem")
    w = li.groupBy("l_suppkey", "l_partkey").agg(
        F.round(F.sum(F.col("l_quantity").cast("double")), 6).alias("v")
    )
    return gini_concentration(w)


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile (round 3, operators/profile.py
    benford_digits) of order totals: per-digit chi-square contributions
    against log10(1+1/d) — the fraud/synthetic-feed screen; every number
    row-local from integer counts and shared module literals, leading
    digit via HALF_UP cents (a raw double→int cast truncates in Spark
    ANSI but rounds in DuckDB — sidestepped)."""
    from node_feedparser_spark.operators.profile import benford_digits

    return benford_digits(_t(spark, sf_dir, "orders"), "o_totalprice")


def q_fk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity profile (round 3, operators/profile.py
    fk_orphans): orphan rates for three FK relations — two healthy TPC-H
    keys (zero orphans is the honest answer) and one deliberately stale
    dimension (suppliers with suppkey % 7 == 0 dropped) so the non-zero
    path is exercised; the generic-table face of validate_kg's
    refs-resolve checks."""
    from node_feedparser_spark.operators.profile import fk_orphans

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 7 != 0)
    a = fk_orphans(li, orders, "l_orderkey", "o_orderkey", "lineitem->orders")
    b = fk_orphans(orders, cust, "o_custkey", "c_custkey", "orders->customer")
    c = fk_orphans(
        li, supp, "l_suppkey", "s_suppkey", "lineitem->supplier_stale"
    )
    return a.union(b).union(c)


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column string-domain profile (round 3, operators/profile.py
    column_profile) of orders — null counts, distinct cardinality,
    lexicographic min/max by contract (floats out of scope for oracle
    portability); the ingest-time schema sanity check."""
    from node_feedparser_spark.operators.profile import column_profile

    return column_profile(
        _t(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_orderpriority", "o_custkey"],
    )


def q_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst detection (round 3, operators/profile.py burst_detect):
    per-event-type 6-hour bucket counts flagged when they exceed the
    trailing-8-bucket mean by 2 trailing sample standard deviations — the
    streaming-corpus anomaly screen (error storms, scraper loops) as a
    batch operator.  The stream collapses to a bounded (type, bucket)
    count table BEFORE any window runs; the flag test rounds the margin
    to 6 dp so the DuckDB twin never straddles a ULP."""
    from node_feedparser_spark.operators.profile import burst_detect

    return burst_detect(_t(spark, sf_dir, "events"))


def q_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed evidence weights (round 3,
    operators/fusion.py time_decay_weights): per-(user, event_type)
    recency-weighted mass with a 7-day half-life against a FIXED
    deterministic now (2024-02-01 UTC — no wall-clock reads); per-row
    decay rounded at 9 dp before the sum per the fusion module's
    cross-engine discipline."""
    from node_feedparser_spark.operators.fusion import time_decay_weights

    ev = _t(spark, sf_dir, "events")
    return time_decay_weights(
        ev,
        key_cols=("user_id", "event_type"),
        ts="ts",
        now_s=1_706_745_600,
        half_life_seconds=604_800,
    )


def q_comention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-mention edges (round 3, operators/interval_join.py
    comention_edges): event types co-observed within ±1h for one user,
    built as the bucketed point-to-point BAND self-join (explode the left
    side to 3 window buckets, equi-join on (key, bucket), exact |dt|
    re-verify) — never a nested-loop range join; each unordered point
    pair claimed once via strict (ts, event_id) order.  The proximity
    alternative to pmi_pairs' whole-basket pairing."""
    from node_feedparser_spark.operators.interval_join import comention_edges

    ev = _t(spark, sf_dir, "events")
    return comention_edges(
        ev,
        key="user_id",
        item="event_type",
        ts="ts",
        id_col="event_id",
        window_seconds=3600,
    )


def q_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen interval-algebra classification (round 3,
    operators/timeline.py allen_relations): every pair of a customer's
    order validity intervals (start = o_orderdate in epoch-micros, length
    = (o_orderkey % 29 + 1) days) labeled with its Allen relation — the
    temporal-KG reasoning vocabulary of which temporal_conflicts' interior
    overlap is one case.  One equi-join on the bounded group key; the 13
    CASE branches are mutually exclusive and exhaustive for proper
    intervals (pinned branch-by-branch in tests/test_allen.py)."""
    from node_feedparser_spark.operators.timeline import allen_relations

    orders = _t(spark, sf_dir, "orders")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    iv = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("iid"),
        us.alias("s"),
        (
            us
            + ((F.col("o_orderkey") % 29) + 1) * F.lit(86_400_000_000).cast("long")
        ).alias("e"),
    )
    return allen_relations(iv, key="ck", id_col="iid", start="s", end="e")


def q_temporal_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal functional-conflict detection (round 3,
    operators/timeline.py temporal_conflicts): split the event stream
    into two provenance sources by even/odd event_id (the declared
    deterministic-split discipline of _kg_triples' partial predicates),
    treat each event as an assertion of the user's functional state
    valid until the same source's next event, and emit every pair of
    cross-source assertions whose validity windows overlap while
    claiming DIFFERENT states — the temporal-KG consistency check that
    detects what truth_fusion later resolves.  Day-bucketed overlap
    equi-join (never a nested-loop range join); the oracle replays the
    naive range self-join via DuckDB's IEJoin."""
    from node_feedparser_spark.operators.timeline import temporal_conflicts

    ev = _t(spark, sf_dir, "events").withColumn(
        "src", (F.col("event_id") % 2).cast("long")
    )
    return temporal_conflicts(ev, source="src")


def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered negative sampling for KG-embedding training (round 3):
    k=2 deterministic hash-corrupted tails per positive supplier->part
    edge, anti-joined against the true edges
    (operators/graph_algo.negative_samples).  The oracle replays the same
    portable 60-bit hash and NOT EXISTS filter."""
    from node_feedparser_spark.operators.graph_algo import negative_samples

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 25)
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src_id"),
        F.col("l_partkey").cast("long").alias("dst_id"),
    )
    n_ent = (
        _t(spark, sf_dir, "part").agg(F.max("p_partkey")).collect()[0][0] + 1
    )
    out = negative_samples(edges, n_entities=int(n_ent), k=2, seed=17)
    return out.select(
        "src_id",
        "dst_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        "neg_dst",
    )


def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM quality score (round 3): the CCNet/Gopher
    perplexity-gate shape with the LM trained by the corpus itself —
    add-one-smoothed mean token log-probability per document
    (operators/text_analysis.unigram_lm_score)."""
    from node_feedparser_spark.operators.text_analysis import unigram_lm_score

    return unigram_lm_score(_t(spark, sf_dir, "documents"))


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (round 3): hashed-bigram log-likelihood
    ratio of the English subset vs the whole corpus, ranked for selection
    (operators/curation.dsir_weights)."""
    from node_feedparser_spark.operators.curation import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en", n_buckets=1024, k=2)


def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI co-occurrence edges (round 3): parts co-purchased within an
    order, weighted by ln(n_ab * N / (n_a * n_b)) over distinct baskets,
    with the d^2 mega-basket guard (max_basket=10) applied BEFORE pairing
    (operators/graph_algo.pmi_edges)."""
    from node_feedparser_spark.operators.graph_algo import pmi_edges

    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket_id"),
        F.col("l_partkey").alias("item_id"),
    )
    return pmi_edges(baskets, min_count=2, max_basket=10)


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (round 3, operators/graph_algo.py hits):
    two integer-exact iterations over a genuinely cyclic mixed edge set
    (supplier→part for 'N' rows, part→supplier for 'R' rows), L1
    normalize-at-end so every accumulation the oracle replays is a whole
    number — the scale-free direction is identical to the textbook
    per-round-normalized loop."""
    from node_feedparser_spark.operators.graph_algo import hits

    li = _t(spark, sf_dir, "lineitem")
    fwd = (
        li.filter(F.col("l_returnflag") == "N")
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
    )
    back = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    return hits(fwd.union(back), iters=2)


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community Newman modularity (round 3, operators/graph_algo.py
    modularity) of the nation partition over the full custkey chain
    (c → c+1 for every customer, so chain links crossing a nation
    boundary are inter-community edges): q_c = e_c/m − (d_c/2m)² per
    community from pure integer counts — the quality score for
    label_propagation / kg_components output, with no cross-community
    float sum anywhere."""
    from node_feedparser_spark.operators.graph_algo import modularity

    cust = _t(spark, sf_dir, "customer")
    c1 = cust.select(F.col("c_custkey").cast("long").alias("src"))
    c2 = cust.select(F.col("c_custkey").cast("long").alias("dst"))
    edges = c1.withColumn("jk", F.col("src") + 1).join(
        c2, F.col("jk") == F.col("dst")
    ).select("src", "dst")
    assign = cust.select(
        F.col("c_custkey").cast("long").alias("node"),
        F.col("c_nationkey").alias("community"),
    )
    return modularity(edges, assign)


def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree power-law exponent MLE (round 3, operators/graph_algo.py
    powerlaw_alpha, Clauset-Shalizi-Newman): the one-row hub-tail
    heaviness profile of the supplier–part graph that decides whether
    skew salting / pivot caps are load-bearing at the next scale-up;
    the only float sum runs over the distinct-degree histogram."""
    from node_feedparser_spark.operators.graph_algo import powerlaw_alpha

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    return powerlaw_alpha(edges, dmin=3)


def q_g2_colloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning G² log-likelihood collocations (round 3,
    operators/graph_algo.py g2_edges): the small-count-honest companion
    to pmi_pairs over the same order×part baskets with the same declared
    mega-basket cap; every G² derives row-locally from integer counts by
    one expression the oracle repeats verbatim."""
    from node_feedparser_spark.operators.graph_algo import g2_edges

    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket_id"),
        F.col("l_partkey").alias("item_id"),
    )
    return g2_edges(baskets, min_count=2, max_basket=10)


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (round 3): 3 rounds of drop-degree<30 over
    the symmetrized supplier<->part graph
    (operators/graph_algo.kcore) — the density filter run before
    embedding/community stages.  The oracle unrolls the same three
    peeling rounds."""
    from node_feedparser_spark.operators.graph_algo import kcore

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    # checkpoint=True: each peeling round references the prior round's
    # edge set three times (direct + twice via keep); without lineage
    # truncation the recompute fans out ~3^rounds — measured 12.3 s ->
    # 5.2 s at sf0.1 local[32]
    return kcore(edges, k=30, n_rounds=3, checkpoint=True)


def _kg_triples(spark: SparkSession, sf_dir: str, mod: int | None = None) -> DataFrame:
    """Deterministic mixed-predicate KG projected from the testdata
    relations — the triple shape the pipeline materializes, with enough
    predicate diversity (7 preds, typed 1-char entity prefixes) that rule
    mining and predicate profiling have real structure to find.  The
    derived `bought` / customer-`in_region` predicates are intentionally
    PARTIAL (even / odd custkeys only) so PCA confidence measurably
    diverges from standard confidence.  ``mod`` keeps only orders /
    lineitems with orderkey % mod == 0 — a declared deterministic
    projection (replayed by the oracle) that bounds the per-part pivot
    degrees rule mining squares over."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    ords = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    if mod is not None:
        ords = ords.filter(F.col("o_orderkey") % mod == 0)
        li = li.filter(F.col("l_orderkey") % mod == 0)

    def _tri(df, s, p, o):
        return df.select(s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"))

    c = F.concat(F.lit("c"), F.col("c_custkey"))
    return (
        _tri(cust, c, "in_nation", F.concat(F.lit("n"), F.col("c_nationkey")))
        .unionAll(
            _tri(
                supp,
                F.concat(F.lit("s"), F.col("s_suppkey")),
                "in_nation",
                F.concat(F.lit("n"), F.col("s_nationkey")),
            )
        )
        .unionAll(
            _tri(
                nat,
                F.concat(F.lit("n"), F.col("n_nationkey")),
                "in_region",
                F.concat(F.lit("r"), F.col("n_regionkey")),
            )
        )
        .unionAll(
            _tri(
                cust.join(nat, cust.c_nationkey == nat.n_nationkey).filter(
                    F.col("c_custkey") % 2 == 1
                ),
                c,
                "in_region",
                F.concat(F.lit("r"), F.col("n_regionkey")),
            )
        )
        .unionAll(
            _tri(
                ords,
                F.concat(F.lit("c"), F.col("o_custkey")),
                "placed",
                F.concat(F.lit("o"), F.col("o_orderkey")),
            )
        )
        .unionAll(
            _tri(
                li,
                F.concat(F.lit("o"), F.col("l_orderkey")),
                "contains",
                F.concat(F.lit("p"), F.col("l_partkey")),
            )
        )
        .unionAll(
            _tri(
                li,
                F.concat(F.lit("p"), F.col("l_partkey")),
                "supplied_by",
                F.concat(F.lit("s"), F.col("l_suppkey")),
            )
        )
        .unionAll(
            _tri(
                ords.join(li, ords.o_orderkey == li.l_orderkey).filter(
                    F.col("o_custkey") % 2 == 0
                ),
                F.concat(F.lit("c"), F.col("o_custkey")),
                "bought",
                F.concat(F.lit("p"), F.col("l_partkey")),
            )
        )
    )


def q_rule_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMIE-style 2-hop horn-rule mining (round 3, operators/rules.py):
    p1(x,z) AND p2(z,y) => p3(x,y) with support / standard confidence /
    PCA confidence / head coverage over the mixed-predicate KG projection
    (_kg_triples).  The deliberately partial `bought` and customer
    `in_region` heads make conf_pca > conf_std, pinning the open-world
    PCA denominator against the oracle's replay.  Per-(z,p1,p2)
    in*out-degree cap (max_pairs) is the declared celebrity guard —
    replayed verbatim in the oracle.  mod=8 bounds the part-pivot degrees
    the body join squares over (declared, replayed)."""
    from node_feedparser_spark.operators.rules import mine_path_rules

    return mine_path_rules(_kg_triples(spark, sf_dir, mod=8), min_support=500)


def q_pred_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate functionality / domain-range profiling (round 3,
    operators/rules.py): per predicate, triple + distinct subj/obj
    counts, functionality and inverse functionality, and the dominant
    1-char entity-namespace prefix of each side with its share — the
    schema-induction statistics that gate truth_fusion (functional preds
    only) and AMIE pruning."""
    from node_feedparser_spark.operators.rules import predicate_stats

    return predicate_stats(_kg_triples(spark, sf_dir))


def q_schema_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VoID/ABSTAT-style schema graph (late round 3,
    operators/rules.py schema_summary): the full (subj_type, pred,
    obj_type) pattern profile over the distinct KG projection — triple /
    distinct-entity counts and each pattern's share of its predicate.
    predicate_stats keeps only the dominant prefix per side; this is the
    complete typed-pattern table a SHACL author or ontology-drift monitor
    reads.  One groupBy over the triples; the share window touches only
    the dozens-row summary."""
    from node_feedparser_spark.operators.rules import schema_summary

    return schema_summary(_kg_triples(spark, sf_dir))


def q_bgp_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-style basic-graph-pattern match (round 3, operators/bgp.py):
    conjunctive triple-pattern query over the KG projection — bindings of
    (?c in_nation ?n)(?n in_region r1)(?c placed ?o), i.e. every order
    placed by a customer whose nation is in region r1.  Constants compile
    to pushed scan filters, the greedy static-selectivity order keeps the
    most-constant pattern first, joins are plain variable equi-joins, and
    the result is SELECT DISTINCT over the bindings — scans + joins +
    distinct only, zero Python nodes."""
    from node_feedparser_spark.operators.bgp import bgp_match

    return bgp_match(
        _kg_triples(spark, sf_dir),
        [
            ("?c", "in_nation", "?n"),
            ("?n", "in_region", "r1"),
            ("?c", "placed", "?o"),
        ],
    )


def q_shacl_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite shape validation (round 3, operators/shacl.py): declared
    per-namespace cardinality / range / object-pattern constraints checked
    in bulk over the (distinct) KG projection, aggregated to violation
    counts per (target_prefix, pred, code).  The constraint set is chosen
    so every code fires: even-custkey customers miss in_region
    (min_count), customers without orders miss placed (min_count) while
    heavy ones exceed max_count 15, supplied_by deliberately declares
    range 'n' against the actual 's' namespace (range), and in_nation
    objects must match the single-digit pattern n[0-9] (pattern)."""
    from node_feedparser_spark.operators.shacl import shacl_validate

    # deliberately NOT cached: measured at sf0.1, re-deriving the pruned
    # columnar union per branch beats a 1.6M-row memory-store round trip
    # (5.6 s vs 7.7 s best-of-3) — the classic don't-cache-cheap-scans rule
    tri = _kg_triples(spark, sf_dir).distinct()
    constraints = [
        {"target_prefix": "c", "pred": "in_region", "min_count": 1},
        {"target_prefix": "c", "pred": "placed", "min_count": 1, "max_count": 15},
        {"target_prefix": "o", "pred": "contains", "min_count": 1},
        {"target_prefix": "p", "pred": "supplied_by", "range_prefix": "n"},
        {"target_prefix": "c", "pred": "in_nation", "obj_pattern": "n[0-9]"},
        {"target_prefix": "n", "pred": "in_region", "range_prefix": "r"},
    ]
    v = shacl_validate(tri, constraints, distinct_input=True)
    return v.groupBy(
        F.substring("focus", 1, 1).alias("target_prefix"), "pred", "code"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_violations"))


def q_rdfs_inferred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS entailment materialization (round 3, operators/rdfs.py): the
    ontology schema (sub-property chains bought/placed ⊑ interacted_with,
    in_nation/in_region ⊑ located_in ⊑ related_to; domains/ranges with
    Customer ⊑ Agent, Nation/Region ⊑ Place) is saturated ON THE DRIVER
    (it is dimension-sized) and instance inference is four broadcast
    joins + union + subtract — one pass over the corpus, no iteration,
    identical plan at any scale.  Returns only the NEW entailments."""
    from node_feedparser_spark.operators.rdfs import rdfs_inferred

    schema = [
        ("bought", "subprop_of", "interacted_with"),
        ("placed", "subprop_of", "interacted_with"),
        ("in_nation", "subprop_of", "located_in"),
        ("in_region", "subprop_of", "located_in"),
        ("located_in", "subprop_of", "related_to"),
        ("placed", "domain", "Customer"),
        ("supplied_by", "domain", "Part"),
        ("in_nation", "range", "Nation"),
        ("in_region", "range", "Region"),
        ("Nation", "subclass_of", "Place"),
        ("Region", "subclass_of", "Place"),
        ("Customer", "subclass_of", "Agent"),
    ]
    # not cached: like q_shacl_validate, re-scanning the pruned union per
    # rule branch measures faster than a memory-store round trip
    return rdfs_inferred(_kg_triples(spark, sf_dir), schema)


def q_bgp_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL OPTIONAL + FILTER NOT EXISTS (round 3, operators/bgp.py):
    every in_nation subject (customers AND suppliers) WITHOUT a direct
    in_region triple (even-custkey customers by construction, plus all
    suppliers), optionally extended with its placed orders — suppliers and
    orderless customers surface with a NULL ord.  NOT EXISTS compiles to
    one anti join over the distinct shared-variable projection, OPTIONAL
    to one left join, both after the required conjunction (documented
    order: filter shrinks before optional widens)."""
    from node_feedparser_spark.operators.bgp import bgp_match

    return bgp_match(
        _kg_triples(spark, sf_dir),
        [("?c", "in_nation", "?n")],
        not_exists=[("?c", "in_region", "?x")],
        optional=[("?c", "placed", "?ord")],
    )


def q_path_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 property-path query (round 3, operators/paths.py):
    ``(in_nation|in_region){1,2}/^in_region`` over the KG projection —
    for every located entity (customer, supplier or nation), the nations
    sharing its region.  Exercises every path construct in one expression:
    alternation, bounded repetition (unrolled to delta joins — the
    SQL-replayable cousin of khop's fixpoint), sequence composition and
    inverse.  All scans + equi-joins + distinct, zero Python nodes; the
    pred leaves constant-fold against the union's literal pred columns so
    each leaf reads only its own predicate's branches (pinned by
    tests/test_paths.py::test_union_branch_pruning).

    The dst-type filter is load-bearing at scale, not cosmetic: regions
    are 5-key hubs and ``^in_region`` fans each region out to every
    located-in-region entity (nations AND odd customers), so the unfiltered
    endpoint product is quadratic through the hubs (~25 M pairs at sf0.1 —
    measured 30 s; filtered, the inverted relation prunes to the 25 nation
    rows and the same query runs in ~2 s).  Catalyst pushes the
    deterministic ``dst LIKE 'n%'`` through the trailing distinct into the
    final join's build side — the SPARQL FILTER-next-to-path idiom doing
    the same job as a typed edge partition at 100 TB."""
    from node_feedparser_spark.operators.paths import eval_path

    expr = (
        "seq",
        ("upto", ("alt", ("pred", "in_nation"), ("pred", "in_region")), 2),
        ("inv", ("pred", "in_region")),
    )
    return eval_path(_kg_triples(spark, sf_dir), expr).filter(
        F.col("dst").startswith("n")
    )


def q_path_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ``(in_nation|in_region)+`` — unbounded transitive closure
    (round 3, operators/paths.py): the located-in reachability relation,
    evaluated as a semi-naive datalog fixpoint (delta-compose + anti join
    per round, lazily checkpointed lineage — per-round cost proportional
    to NEW pairs only).  Converges in 2 rounds on this graph (entity →
    nation → region); the DuckDB oracle is a genuine RECURSIVE CTE, so the
    fixpoint semantics are pinned independently of the round count."""
    from node_feedparser_spark.operators.paths import eval_path

    return eval_path(
        _kg_triples(spark, sf_dir),
        ("plus", ("alt", ("pred", "in_nation"), ("pred", "in_region"))),
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (round 3): per-returnflag
    distinct-part estimates from portable 60-bit-hash registers
    (operators/sketch.py) — one map-side-combinable max agg instead of a
    full COUNT(DISTINCT) shuffle; the DuckDB oracle rebuilds the exact
    same registers bit-for-bit and applies the same estimator."""
    from node_feedparser_spark.operators.sketch import hll_distinct

    li = _t(spark, sf_dir, "lineitem")
    return hll_distinct(li, ["l_returnflag"], "l_partkey", p=8)


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-sketch set-overlap estimation (late round 3,
    operators/sketch.py kmv_set_overlap — Beyer et al. SIGMOD 2007):
    3-gram shingle-vocabulary overlap between the two doc_id-parity
    halves of the documents table.  Each side's sketch is its k=256
    smallest distinct portable-60-bit hash values; distinct / union /
    intersection / Jaccard estimates come from the combined sketch below
    theta = min of the two k-th values.  Two corpus slices compare
    vocabularies by shipping k integers each — the sketch-join shape at
    100 TB, mergeable like the HLL registers.  Deterministic md5 hashing
    means the DuckDB oracle rebuilds the identical sketches; estimator
    divisions are exact-integer-to-double with one rounding each, so the
    4-dp estimates are bit-identical."""
    from node_feedparser_spark.functions.hashing import token_shingles
    from node_feedparser_spark.operators.sketch import kmv_set_overlap

    docs = _t(spark, sf_dir, "documents")
    elems = docs.select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(token_shingles("text", 3)).alias("elem"),
    )
    return kmv_set_overlap(elems, k=256)


def q_kmv_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs KMV overlap matrix (late round 3, operators/sketch.py
    kmv_pairwise_overlap): theta-sketch intersection / union / Jaccard
    estimates between every pair of the documents table's 20 sources
    (190 pairs) from one k=128 sketch per source — the "which corpus
    slices share content" lineage matrix that exact distinct-joins make
    quadratic; after the single sketch pass everything is sketch-sized.
    Deterministic md5 sketches; the DuckDB oracle replays sketches,
    per-pair thresholds, and the three estimators bit-for-bit."""
    from node_feedparser_spark.functions.hashing import token_shingles
    from node_feedparser_spark.operators.sketch import kmv_pairwise_overlap

    docs = _t(spark, sf_dir, "documents")
    elems = docs.select(
        F.col("source").alias("side"),
        F.explode(token_shingles("text", 3)).alias("elem"),
    )
    return kmv_pairwise_overlap(elems, k=128)


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (round 3): document tokens whose
    CMS-estimated frequency reaches 0.5% of total token mass, from a d=4 ×
    w=1024 portable-hash counter table (operators/sketch.py) — sublinear
    mergeable state instead of an exact full-domain token count; the
    DuckDB oracle rebuilds every counter bit-for-bit."""
    from node_feedparser_spark.operators.sketch import cms_heavy_hitters

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    return cms_heavy_hitters(toks, "token", threshold=0.005, d=4, w=1024)


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-quantile sketch (round 3): per-returnflag p25/p50/p95 of
    l_extendedprice from a mergeable 64-bucket fixed-width histogram
    (operators/sketch.py) — two map-side-combinable aggs replace the full
    sort; the oracle replays bucket assignment, cumulative ranks, and the
    in-bucket linear interpolation exactly."""
    from node_feedparser_spark.operators.sketch import histogram_quantiles

    li = _t(spark, sf_dir, "lineitem")
    return histogram_quantiles(
        li, ["l_returnflag"], "l_extendedprice", qs=(0.25, 0.5, 0.95)
    )


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prune (round 3): distinct lineitem partkeys
    passing a 4096-bit / k=3 portable-hash Bloom filter built from parts
    with p_size > 45, flagged against exact membership so the false-
    positive surplus is visible data (operators/bloom.py) — the explicit
    twin of Spark's AQE runtime bloom filter; the oracle rebuilds the
    same packed words and probes them bitwise."""
    from node_feedparser_spark.operators.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    return bloom_semi_join(
        li, "l_partkey", part, "p_partkey", m_bits=4096, k=3
    )


def q_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (round 3): documents
    blocked on (lang, source), three-field agreement vector (length
    tolerance, 16-char prefix, shingle-Jaccard >= 0.5), log-likelihood-
    ratio score with m/u folded to Python-literal weights so neither
    engine evaluates ln() (operators/linkage.py); decisions at +/-2.0."""
    from node_feedparser_spark.operators.linkage import fs_link_documents

    return fs_link_documents(_t(spark, sf_dir, "documents"))


def q_snm_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood near-dup blocking (round 3): two
    CONTENT-derived sort-key families (text prefix; zero-padded length +
    reversed prefix), window-4 neighbor pairing inside prefix-bounded
    blocks, exact shingle-Jaccard verify at 0.5 (operators/dedupe.py
    snm_near_dup_pairs).  Recovers all 25 brute-force >= 0.5 pairs at
    sf0.01 (pinned by test); the oracle replays both passes' LEAD windows
    and the verify."""
    from node_feedparser_spark.operators.dedupe import snm_near_dup_pairs

    return snm_near_dup_pairs(_t(spark, sf_dir, "documents"))


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit (round 3, operators/profile.py
    blocking_quality): reduction ratio / pairs completeness / pair
    quality of the multi-pass SNM candidate generator against the EXACT
    Jaccard >= 0.7 truth set (jaccard_prefix_pairs — provably lossless,
    pinned by ngram_jaccard's brute-force oracle).  The ER-evaluation
    triple every blocking knob (window, passes, band count) trades
    against; the oracle replays both SNM LEAD passes AND the brute-force
    truth join, then the same count arithmetic."""
    from node_feedparser_spark.operators.dedupe import (
        jaccard_prefix_pairs,
        snm_all_candidates,
    )
    from node_feedparser_spark.operators.profile import blocking_quality

    docs = _t(spark, sf_dir, "documents")
    cands = snm_all_candidates(docs)
    truth = jaccard_prefix_pairs(docs, threshold=0.7).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return blocking_quality(cands, truth, docs)


def q_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution clustering quality (round 3,
    operators/cluster_eval.py): B-cubed P/R/F1, pairwise P/R/F1 and ARI of
    the CHEAP fingerprint clustering (group by the 12-char text prefix —
    SNM pass-1's sort key used as an equality blocker) against the exact
    Jaccard >= 0.7 truth clustering.  Deliberately non-trivial in one
    direction: shared openings over-merge unrelated docs (measured B-cubed
    precision ~0.3 at sf0.01) while every planted near-dup pair shares its
    prefix (recall 1.0) — the quantified version of why SNM verifies.
    Everything reduces over the (pred, true) contingency table; pairwise
    counts are closed-form C(n,2) sums, never materialized pairs."""
    from node_feedparser_spark.operators.cluster_eval import cluster_quality
    from node_feedparser_spark.operators.components import connected_components
    from node_feedparser_spark.operators.dedupe import jaccard_prefix_pairs

    docs = _t(spark, sf_dir, "documents")
    true_lab = connected_components(
        jaccard_prefix_pairs(docs, threshold=0.7).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
    ).withColumnRenamed("node", "doc_id")
    labeled = (
        docs.select("doc_id", F.substring("text", 1, 12).alias("pred_cluster"))
        .join(true_lab.withColumnRenamed("component", "tc"), "doc_id", "left")
        .select(
            "pred_cluster",
            F.coalesce("tc", F.col("doc_id")).alias("true_cluster"),
        )
    )
    return cluster_quality(labeled)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sampling without replacement
    (round 3, Efraimidis-Spirakis A-ES): per-language top-5 documents by
    key u^(1/n_chars) with u from the portable hash — the weighted
    companion to token_budget_sample's uniform priority
    (operators/curation.py weighted_sample).  The oracle replays the
    ln(u)/w ordering from identical double inputs."""
    from node_feedparser_spark.operators.curation import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"),
        k=5,
        weight_col="n_chars",
        group_cols=["lang"],
        seed=11,
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered first-occurrence funnel (round 3): view -> click ->
    purchase within 24 h per hop (operators/sessionize.funnel_conversion).
    Per-step frontiers are |users|-sized broadcast joins against the
    type-pruned event scan — the big table never shuffles."""
    from node_feedparser_spark.operators.sessionize import funnel_conversion

    return funnel_conversion(
        _t(spark, sf_dir, "events"),
        steps=["view", "click", "purchase"],
        max_gap_hours=24,
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (round 3): users cohorted by Monday-
    truncated first-event week; retention(k) = fraction active in cohort
    week + k (operators/sessionize.cohort_retention).  Week arithmetic
    stays on date_trunc'd values so day diffs are exact multiples of 7 in
    both engines."""
    from node_feedparser_spark.operators.sessionize import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


def q_incremental_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components (round 3): fold a delta batch of
    edges into an existing assignment via the quotient-graph rewrite
    (operators/components.incremental_components) — CC runs only over
    |delta| component-space edges, never the accumulated graph.  Batches
    split the kg_components edge set 2:1 by hash; the oracle is the full
    recursive-CTE closure over ALL edges, so the query passes only if
    incremental == full recompute."""
    from node_feedparser_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"), F.col("c_nationkey")
    )
    a, b = c.alias("a"), c.alias("b")
    e0 = a.join(
        b,
        (F.col("b.k") == F.col("a.k") + 1)
        & (F.col("a.c_nationkey") == F.col("b.c_nationkey")),
    ).select(F.col("a.k").alias("src"), F.col("b.k").alias("dst"))
    batch1 = e0.filter(F.pmod(F.col("src"), F.lit(3)) != 0)
    batch2 = e0.filter(F.pmod(F.col("src"), F.lit(3)) == 0)
    assign = connected_components(batch1)
    updated = incremental_components(assign, batch2)
    return c.select(F.col("k").alias("node")).join(
        updated, "node", "left"
    ).select(
        "node", F.coalesce("component", "node").alias("component")
    )


BM25_QUERIES = [
    ("q1", "hash join query"),
    ("q2", "customer order table"),
    ("q3", "vector stream merge"),
]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (round 3): top-5 documents per literal
    query, k1=1.2 b=0.75 (operators/text_analysis.bm25_topk) — the lexical
    counterpart to embedding_topk and an rrf_fusion input; rank orders by
    the ROUNDED score so float summation order can never flip a rank."""
    from node_feedparser_spark.operators.text_analysis import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), BM25_QUERIES, k=5)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key + locality evidence (round 3): Morton-
    interleave 8 bits each of (p_size, p_retailprice), pack rows into 64
    simulated z-range files, report per-file min/max of BOTH columns
    (operators/layout.py) — the Iceberg/Delta OPTIMIZE ZORDER primitive;
    tight per-file ranges on every column = multi-column file skipping.
    The oracle replays the bit interleave exactly."""
    from node_feedparser_spark.operators.layout import (
        zorder_key,
        zorder_locality_stats,
    )

    part = _t(spark, sf_dir, "part")
    z = zorder_key(part, ["p_size", "p_retailprice"], bits=8)
    return zorder_locality_stats(
        z, ["p_size", "p_retailprice"], n_files=64, bits=8
    )


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (round 3): every click in the 24 h
    before a purchase gets an equal share of its value
    (operators/asof.linear_attribution) — the many-touch complement to
    the last-touch `click_attribution` as-of join; one user-co-partitioned
    equi-join + range filter + per-conversion count window."""
    from node_feedparser_spark.operators.asof import linear_attribution

    return linear_attribution(_t(spark, sf_dir, "events"), window_hours=24)


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval-containment join (round 3): purchases matched to
    12 deterministic promo windows carved from the event time range
    (integer-micros arithmetic) via operators/interval_join.py — the
    equi-join-shaped range join (interval explodes to overlapped buckets,
    point keys to one bucket, exact predicate re-verified) that avoids
    Spark's BroadcastNestedLoop fallback.  The DuckDB oracle runs the
    NAIVE range join on its native IEJoin — an independently-implemented
    range algorithm."""
    from node_feedparser_spark.operators.interval_join import (
        interval_join_bucketed,
    )

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = F.broadcast(ev.agg(F.min(us).alias("_lo"), F.max(us).alias("_hi")))
    span12 = F.expr("(_hi - _lo) div 12")
    span24 = F.expr("(_hi - _lo) div 24")
    iv = (
        spark.range(12)
        .withColumnRenamed("id", "iv_id")
        .crossJoin(b)
        .select(
            "iv_id",
            F.timestamp_micros(F.col("_lo") + F.col("iv_id") * span12).alias(
                "start_ts"
            ),
            F.timestamp_micros(
                F.col("_lo") + F.col("iv_id") * span12 + span24
            ).alias("end_ts"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = interval_join_bucketed(purchases, iv, bucket_seconds=3600)
    return out.select("event_id", "iv_id")


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation as a first-class query (round 3):
    recall@5 and reciprocal rank of the IVF cell-probe ANN lane
    (`ivf_ann_topk`'s exact parameters) against the brute-force cosine
    ground truth, per query — the measure-don't-guess harness run in-plan:
    two topk lanes, one join, two tiny aggs.  The oracle composes the two
    existing retrieval oracles (the rrf_fusion discipline: parameters must
    mirror the named queries EXACTLY; ground truth re-filtered to the ANN
    lane's vec_id<8 query set)."""
    from node_feedparser_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    gt = cosine_topk(emb, queries_df, k=5).select(
        "query_id", "vec_id", F.col("rank").cast("long").alias("rank")
    )
    ann = ivf_topk(emb, queries_df, k=5, n_cells=16, n_probe=4).select(
        "query_id", "vec_id", F.col("rank").cast("long").alias("rank")
    )
    hits = (
        gt.join(ann.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    base = gt.select("query_id").distinct()
    n_hit = base.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("_h", F.lit(0)).cast("long").alias("n_hit")
    )
    top1 = gt.where(F.col("rank") == 1).select("query_id", "vec_id")
    rr = (
        top1.join(
            ann.withColumnRenamed("rank", "_arank"),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.coalesce(F.max(1.0 / F.col("_arank")), F.lit(0.0)).alias("_rr")
        )
    )
    return (
        n_hit.join(rr, "query_id")
        .select(
            "query_id",
            "n_hit",
            F.round(F.col("n_hit") / 5.0, 6).alias("recall_at_5"),
            F.round("_rr", 6).alias("reciprocal_rank"),
        )
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (round 3): (lang, source) quasi-identifier
    combinations occurring fewer than 12 times (operators/profile.py) —
    the post-pii_scrub re-identification surface; one map-side-combinable
    count agg returning only the violating groups."""
    from node_feedparser_spark.operators.profile import (
        k_anonymity_violations,
    )

    return k_anonymity_violations(
        _t(spark, sf_dir, "documents"), ["lang", "source"], k=12
    )


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (late round 3, operators/profile.py
    l_diversity_violations): (lang, source) quasi-identifier groups whose
    SENSITIVE attribute — the 200-char length band standing in for the
    sensitive column of a real corpus — takes fewer than 3 distinct
    values, i.e. the homogeneity-attack surface k-anonymity misses
    (Machanavajjhala et al., ICDE'06).  Complements q_k_anonymity on the
    same qid tuple: that bounds group size, this bounds the entropy
    floor.  One groupBy with a two-phase partial-distinct agg; the
    shuffle carries one row per observed (qid, band) pair."""
    from node_feedparser_spark.operators.profile import (
        l_diversity_violations,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "band", F.floor(F.col("n_chars") / F.lit(200.0)).cast("long")
    )
    return l_diversity_violations(docs, ["lang", "source"], "band", l=3)


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (late round 3, operators/profile.py
    t_closeness_violations): (lang, source) quasi-identifier groups whose
    sensitive-attribute distribution (the 200-char length band) sits more
    than t=0.15 total-variation distance from the global distribution —
    the skewness-attack surface l-diversity misses (Li, Li &
    Venkatasubramanian, ICDE'07).  Completes the privacy trio on the same
    qid tuple: q_k_anonymity bounds group size, q_l_diversity the
    distinct floor, this the distributional gap.  Absent-domain mass
    folded in algebraically (no class x domain cross product); exact
    integer numerators, one 6-dp-rounded division — the DuckDB oracle is
    bit-identical."""
    from node_feedparser_spark.operators.profile import (
        t_closeness_violations,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "band", F.floor(F.col("n_chars") / F.lit(200.0)).cast("long")
    )
    return t_closeness_violations(docs, ["lang", "source"], "band", t=0.15)


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-source bounded Brandes betweenness (late round 3,
    operators/graph_algo.py betweenness): which entities BROKER
    shortest-path traffic over the undirected supplier<->part shipment
    graph (orderkey % 4 == 0), sources = suppliers 1..4, paths truncated
    at 3 hops — the sampled k-betweenness estimator, the one centrality
    the ball-size family (hyperanf / harmonic) cannot see because it
    scores interior position, not reach.  Exact long sigma path counts;
    6-dp level-wise dependency rounding (the ALS float-sum discipline);
    the DuckDB oracle unrolls both the 3-level multi-source BFS and the
    backward accumulation with identical arithmetic."""
    from node_feedparser_spark.operators.graph_algo import betweenness

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 4 == 0)
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    edges = e.unionByName(
        e.select(
            F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
        )
    )
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 4)
        .select(F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"))
    )
    return betweenness(edges, seeds, max_depth=3)


def q_wl_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weisfeiler-Lehman structural fingerprints (late round 3,
    operators/graph_algo.py wl_fingerprints): 2 rounds of 1-WL color
    refinement over the undirected supplier<->part shipment graph
    (orderkey % 8 == 1 — disjoint from the hyperanf family's
    projections), md5-of-sorted-multiset relabeling from an out-degree
    seed.  The final label partitions the graph into structural-
    equivalence classes (role discovery: two nodes share a label iff
    their 2-hop neighborhood trees agree) — returned per node with the
    class size.  Pure string/hash arithmetic, so the DuckDB oracle
    (same degree seed, same list_sort + md5 chain) is bit-identical."""
    from node_feedparser_spark.operators.graph_algo import wl_fingerprints

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 8 == 1)
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    edges = e.unionByName(
        e.select(
            F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
        )
    )
    return wl_fingerprints(edges, rounds=2)


def q_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting reachability (late round 3,
    operators/graph_algo.py temporal_reachability): earliest-arrival
    relaxation over the TEMPORAL supplier<->part contact graph — each
    lineitem (orderkey % 12 == 3) is two directed temporal edges at
    l_shipdate; suppliers 1..3 are seeded at 1990-01-01; three
    synchronous rounds answer "which entities could this information
    have reached, and when, respecting time order" — the provenance /
    contagion question static khop_reach cannot ask (a topological path
    running backward in time transmits nothing).  Exact timestamp
    arithmetic only; the DuckDB oracle unrolls the same three
    full-outer min-merges bit-identically."""
    from node_feedparser_spark.operators.graph_algo import (
        temporal_reachability,
    )

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 12 == 3)
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
        F.col("l_shipdate").alias("ts"),
    )
    edges = fwd.unionByName(
        li.select(
            F.concat(F.lit("p"), F.col("l_partkey")).alias("src_id"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst_id"),
            F.col("l_shipdate").alias("ts"),
        )
    )
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 3)
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"),
            F.lit("1990-01-01").cast("timestamp").alias("arrival"),
        )
    )
    return temporal_reachability(edges, seeds, rounds=3)


def q_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boruvka minimum spanning forest (late round 3,
    operators/graph_algo.py boruvka_mst): backbone extraction over the
    weighted supplier<->part graph (orderkey % 10 == 7; weight = summed
    quantity as exact long) — every component picks its cheapest
    outgoing edge simultaneously, components at least halve per round,
    contraction via the existing connected_components hybrid.  Priority
    selection inside a fixpoint is not SQL-expressible, so this entry
    takes the driver's rows-only check; correctness is pinned by
    tests/test_mst.py's exact Kruskal-parity under the same (w, a, b)
    total order."""
    from node_feedparser_spark.operators.graph_algo import boruvka_mst

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 7)
    edges = li.groupBy(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey").cast("long") + 1000000).alias("dst"),
    ).agg(F.sum("l_quantity").cast("long").alias("w"))
    return boruvka_mst(edges)


def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby maximal independent set (late round 3,
    operators/graph_algo.py luby_mis): deterministic symmetry breaking
    over the per-nation customer rings + condensation chain
    (_scc_ring_graph, undirected) — conflict-free scheduling / anchor
    selection over a KG; md5 round priorities make the output a
    reproducible function of the graph.  Iterative symmetry breaking is
    not SQL-expressible, so this entry takes the driver's rows-only
    check; tests/test_mis.py pins bit-exact parity with a pure-Python
    replica plus the independence and maximality invariants."""
    from node_feedparser_spark.operators.graph_algo import luby_mis

    edges, nodes = _scc_ring_graph(spark, sf_dir)
    return luby_mis(edges, nodes=nodes)


def q_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated-MIS graph coloring (late round 3,
    operators/graph_algo.py greedy_coloring): conflict-serialization
    schedule over the customer ring graph — nodes of one color share no
    edge, the color count is the schedule length; rings of 6 are
    2-colorable plus the chain's occasional third color.  Deterministic
    through the md5 priority chain; rows-only driver check (iterated
    symmetry breaking), pinned bit-exact against the pure-Python
    replica in tests/test_coloring.py."""
    from node_feedparser_spark.operators.graph_algo import greedy_coloring

    edges, nodes = _scc_ring_graph(spark, sf_dir)
    return greedy_coloring(edges, nodes=nodes, max_colors=8)


def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality (late round 3, operators/graph_algo.py
    katz_centrality): walk-count centrality with beta = 1/4 over three
    rounds on the symmetrized supplier<->part contact graph (orderkey %
    8 == 5; both directions, so longer walks exist) — no per-node
    normalization (vs pagerank), repeated walks all count (vs hyperanf
    ball sizes).  Walk counts are exact longs,
    attenuation is accumulated integer-scaled by 4^rounds, and the one
    final division is dyadic (power of two) hence FLOAT-EXACT — the
    unrolled DuckDB oracle is bit-identical with no rounding clause."""
    from node_feedparser_spark.operators.graph_algo import katz_centrality

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 8 == 5)
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    edges = fwd.unionByName(
        li.select(
            F.concat(F.lit("p"), F.col("l_partkey")).alias("src_id"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst_id"),
        )
    ).distinct()
    return katz_centrality(edges, rounds=3, beta_den=4)


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic centrality from HyperANF ball deltas (late
    round 3, operators/graph_algo.py harmonic_centrality_anf — Boldi &
    Vigna's own flagship ANF application): H(v) = Σ_t (B_t − B_{t−1})/t
    over the same undirected supplier<->part shipment graph and the same
    orderkey%4==0 deterministic bound as q_hyperanf_reach, plus the
    per-node effective radius (smallest t with B_t ≥ 0.9·B_rounds).
    Exact harmonic centrality is all-pairs BFS (|V|² ball rows); this is
    one conditional-max pivot over the |V|·2^p sketch table.  The DuckDB
    oracle rebuilds the registers bit-for-bit, unrolls both merge
    rounds, and replays the same exact fixed-point delta weighting
    (integers x 10^4, one final constant division), so the harmonics
    are bit-identical doubles."""
    from node_feedparser_spark.operators.graph_algo import (
        harmonic_centrality_anf,
    )

    return harmonic_centrality_anf(
        rounds=2, p=7, anf=_shared_hyperanf(spark, sf_dir)
    )


def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed uncertainty quantification (round 3): Poisson(1)
    bootstrap standard error of the per-event_type mean value — the
    resampling scheme that distributes (per-row per-replicate multiplicity
    instead of materialized resamples), with DETERMINISTIC hash-CDF draws
    so both engines resample bit-identically (operators/sketch.py).
    Oracle replays hash -> u -> Poisson weight -> weighted means -> SE."""
    from node_feedparser_spark.operators.sketch import poisson_bootstrap

    return poisson_bootstrap(
        _t(spark, sf_dir, "events"), n_replicates=50
    )


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profiler (round 3): per-key share, partition-width
    occupancy at 32 reducers, and the salt factor that bounds the key back
    to one partition's width (operators/profile.py) — the diagnosis step
    behind the salted applyInPandas / hot-block guards this repo already
    ships.  One count agg + windows over the top-k slice only."""
    from node_feedparser_spark.operators.profile import skew_profile

    return skew_profile(
        _t(spark, sf_dir, "events"), "event_type", n_partitions=32, top_k=5
    )


def q_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell typo join (round 3): corpus-vocabulary pairs at edit
    distance 1 via the COMPLETE deletion-neighborhood blocking (every
    distance-1 pair shares a 1-deletion key — no recall loss), verified
    with one levenshtein on candidates only (operators/fuzzy.py) — the
    character-level fuzzy matcher the shingle-based near-dup family cannot
    provide.  Both engines run the same levenshtein built-in."""
    from node_feedparser_spark.operators.fuzzy import edit_distance_join

    return edit_distance_join(_t(spark, sf_dir, "documents"))


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (round 3): Population Stability Index of
    the event value distribution between the first and second half of the
    time range (midpoint in integer epoch-micros, so the split is exact in
    both engines) — reference-decile bins, +0.5 Laplace floor, per-bin PSI
    terms (operators/curation.psi_drift).  Oracle replays edges, binning,
    floors and terms."""
    from node_feedparser_spark.operators.curation import psi_drift

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = F.broadcast(
        ev.agg(F.min(us).alias("_lo"), F.max(us).alias("_hi"))
    )
    j = ev.crossJoin(b)
    ref = j.where(us * 2 <= F.col("_lo") + F.col("_hi"))
    cur = j.where(us * 2 > F.col("_lo") + F.col("_hi"))
    return psi_drift(ref, cur, value_col="value", n_bins=10)


_PSI_WINDOW_EDGES = [2.0, 5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0, 400.0]


def q_psi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed PSI drift — the STREAMING face's exact code path
    (streaming/drift_stream.stream_psi: single windowed agg of
    conditional bin sums, +0.5 Laplace floor, natural-log terms) run on
    batch input, where `withWatermark` is a no-op and `F.window` is the
    same tumbling-window expression the micro-batch engine executes.
    This gives the stream semantics a DuckDB oracle attestation the
    streaming tests can't provide (VERDICT r4 item 7): 6-hour
    epoch-aligned windows of event values vs a fixed uniform reference
    over log-spread edges.  One shuffle (the windowed agg)."""
    from node_feedparser_spark.streaming.drift_stream import stream_psi

    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    return stream_psi(
        ev,
        edges=_PSI_WINDOW_EDGES,
        ref_p=[0.1] * 10,
        window_duration="6 hours",
        watermark="12 hours",
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen (round 3): Iglewicz-Hodges modified z-score
    per event_type — exact median + MAD (50%-breakdown, masking-proof)
    with the tiny per-group stats broadcast back
    (operators/curation.mad_outliers); flag decided on the 4 dp-rounded
    score.  Oracle: DuckDB quantile_cont replays Spark's exact percentile
    interpolation."""
    from node_feedparser_spark.operators.curation import mad_outliers

    return mad_outliers(_t(spark, sf_dir, "events"), k=3.5)


def q_markov_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over per-user event streams (round 3):
    ML transition matrix from one lead() window + one catalog²-sized count
    agg, plus the 2-step power-iteration distribution from uniform computed
    on that tiny matrix (operators/markov.py).  6 dp re-rounding every step
    (the ALS/kmeans discipline); oracle emitted from the same code."""
    from node_feedparser_spark.operators.markov import markov_chain

    return markov_chain(_t(spark, sf_dir, "events"), n_steps=2)


def q_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained multinomial Naive Bayes classifier (round 3): add-1-smoothed
    per-class token log-likelihoods learned from the corpus itself, every
    document scored and argmax-labeled, entirely in built-in functions
    (operators/classify.py) — the learned complement to the `language_id`
    stopword heuristic.  Scores round to 6 dp before the argmax so libm log
    ulp differences cannot flip ranks; ties break by class name.  Oracle
    emitted from the same code (naive_bayes_sql)."""
    from node_feedparser_spark.operators.classify import naive_bayes_score

    return naive_bayes_score(_t(spark, sf_dir, "documents"))


def q_als_factorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-2 ALS matrix factorization (round 3): user embeddings of the
    user x event_type interaction-count matrix via alternating CLOSED-FORM
    2x2 ridge solves — each half-step is one join + one 5-sum agg + a
    projection, pure DataFrame algebra, no MLlib/Python
    (operators/factorize.py).  Deterministic hash init, 6 dp rounding at
    every aggregate so summation order never leaks.  The DuckDB oracle is
    emitted from the SAME code (als_sql) unrolling the identical
    alternations."""
    from node_feedparser_spark.operators.factorize import als_factorize

    users, _items = als_factorize(_t(spark, sf_dir, "events"), n_alt=2)
    return users


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE kernel (round 3): first-iteration adjacent-symbol
    pair statistics (chars + '</w>', per-occurrence multiplicity, weighted
    by word frequency) over the corpus word-count table
    (operators/bpe.py).  This is the aggregation every Sennrich merge
    iteration re-runs on the evolving (vocabulary-sized) word table; the
    oracle replays char-split + zip + weighted count."""
    from node_feedparser_spark.operators.bpe import (
        bpe_pair_counts,
        word_counts,
    )

    return bpe_pair_counts(word_counts(_t(spark, sf_dir, "documents")))


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (round 3): 48 Sennrich merges learned from
    the corpus (operators/bpe.bpe_train) — distributed word count, capped
    deterministic vocab, sequential merge loop over the vocabulary-sized
    table only.  The merge loop is iterative-rewrite (not SQL-expressible)
    so this entry ships rows-only; semantics are pinned by
    tests/test_bpe.py against an independent pure-Python Sennrich
    implementation, on hand corpora and a real corpus slice."""
    from node_feedparser_spark.operators.bpe import bpe_train, merges_df

    merges = bpe_train(
        _t(spark, sf_dir, "documents"), n_merges=48, top_words=50_000
    )
    return merges_df(spark, merges)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE corpus encoding (round 3): apply the learned merges with an
    Arrow-batched mapInPandas whose Python unit of work is the unique word
    (memoized across batches), not the row (operators/bpe.bpe_encode).
    Rows-only for the same reason as bpe_merges; lossless-roundtrip and
    reference-equality are pytest-pinned."""
    from node_feedparser_spark.operators.bpe import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=48, top_words=50_000)
    return bpe_encode(docs, merges).select(
        "doc_id", "n_words", "n_bpe_tokens"
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/embedding chunking (round 3): 64-token sliding windows with
    8-token overlap per document (operators/packing.chunk_documents) —
    pure-projection explode (no shuffle), short final chunk, portable
    chunk hash for downstream chunk-level dedupe/caching.  Oracle replays
    the window arithmetic with list_slice."""
    from node_feedparser_spark.operators.packing import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=8
    )


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (round 3): per-window leftmost-min of the
    positional token-5-gram hash stream, window w=4
    (text_analysis.winnow_fingerprints) — MOSS's position-aware local
    fingerprint with the shared-run matching guarantee, complementing the
    positionless bottom-k sketch (`doc_fingerprint`).  Oracle replays the
    same gram/hash/window-min pipeline in SQL."""
    from node_feedparser_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=5, w=4
    )


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style training-sequence packing map (round 3): concat documents
    in doc_id order, chunk the token stream at 512-token boundaries; per doc
    report start sequence / offset / sequences spanned
    (operators/packing.py).  Spark runs the two-phase distributed prefix sum
    (range buckets -> tiny bucket-offset window -> per-bucket windows); the
    oracle is the sequential single-window definition — pass means the
    distributed scan equals the textbook semantics."""
    from node_feedparser_spark.operators.packing import sequence_pack

    return sequence_pack(
        _t(spark, sf_dir, "documents"), capacity=512, n_buckets=64
    )


def q_neighbor_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style sampled neighbor aggregation (round 3): 2 hops of
    hash-sampled (fanout 8) mean feature mixing over the symmetrized
    supplier<->part graph, supplier features = s_acctbal, part features =
    p_retailprice (operators/graph_algo.neighbor_agg).  The oracle
    replays the same hash-ranked sample and both unrolled hops."""
    from node_feedparser_spark.operators.graph_algo import neighbor_agg

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst_id"),
    )
    edges = e.union(e.select(F.col("dst_id"), F.col("src_id")))
    feats = (
        _t(spark, sf_dir, "supplier")
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"),
            F.col("s_acctbal").alias("feat"),
        )
        .union(
            _t(spark, sf_dir, "part").select(
                F.concat(F.lit("p"), F.col("p_partkey")).alias("node"),
                F.col("p_retailprice").alias("feat"),
            )
        )
    )
    return neighbor_agg(edges, feats, n_hops=2, fanout=8, seed=23)


def q_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-prompt chosen/rejected preference-pair mining (round 4,
    operators/preference.dpo_pairs) — the DPO training-pair construction
    step of an LLM data pipeline: orders are prompts, their line items are
    scored candidates (extended price in HALF_UP cents), chosen =
    best / rejected = worst with deterministic tie-breaks, margin >= $1
    screen, single-candidate prompts dropped.  One shuffle on the prompt
    key; both rankings and the count ride the same partitioning."""
    from node_feedparser_spark.operators.preference import dpo_pairs

    li = _t(spark, sf_dir, "lineitem")
    cands = li.select(
        F.col("l_orderkey").alias("prompt_id"),
        F.col("l_linenumber").alias("cand_id"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("score"),
    )
    return dpo_pairs(cands, min_margin=100)


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry ability estimation (round 4, operators/preference
    .bradley_terry): pairwise comparisons are consecutive line items in
    the same order — the pricier (HALF_UP cents) part's brand beats the
    other's, exact-tie and same-brand pairs dropped — aggregated to a
    25-player (p_brand) ability table via 2 unrolled MM rounds (Hunter
    2004) and one sum-1 normalization.  The reward-model vote-aggregation
    face: the corpus is touched once (pair counts); every MM round runs
    on the players^2-bounded pair table with the ability vector broadcast
    like truth_fusion's trust table."""
    from node_feedparser_spark.operators.preference import bradley_terry

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    l = li.join(part, F.col("p_partkey") == F.col("l_partkey")).select(
        "l_orderkey",
        "l_linenumber",
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    prv = l.select(
        "l_orderkey",
        (F.col("l_linenumber") + 1).alias("l_linenumber"),
        F.col("brand").alias("brand_prev"),
        F.col("cents").alias("cents_prev"),
    )
    comps = (
        l.join(prv, ["l_orderkey", "l_linenumber"])
        .filter(F.col("cents") != F.col("cents_prev"))
        .filter(F.col("brand") != F.col("brand_prev"))
        .select(
            F.when(
                F.col("cents") > F.col("cents_prev"), F.col("brand")
            ).otherwise(F.col("brand_prev")).alias("winner"),
            F.when(
                F.col("cents") > F.col("cents_prev"), F.col("brand_prev")
            ).otherwise(F.col("brand")).alias("loser"),
        )
    )
    return bradley_terry(comps, n_iter=2)


def q_conv_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation structural profile (round 4, operators/profile
    .conversation_profile) over the north-rule transcript shape:
    documents are mapped deterministically into (conv_id, turn_idx, role,
    text, tool, ts) — 50 conversations, roles cycling user/assistant/tool
    by doc_id mod 3, every 7th turn a tool call, one minute per turn —
    then profiled: role counts, tool-call density, text volume,
    role-alternation count, wall-clock span.  One shuffle on conv_id;
    all-integer outputs, no rounding discipline needed."""
    from node_feedparser_spark.operators.profile import conversation_profile

    docs = _t(spark, sf_dir, "documents")
    tr = docs.select(
        F.concat(F.lit("doc-"), (F.col("doc_id") % 50).cast("string")).alias(
            "conv_id"
        ),
        F.floor(F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "user")
        .when(F.col("doc_id") % 3 == 1, "assistant")
        .otherwise("tool")
        .alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.col("source")).alias("tool"),
        F.timestamp_seconds(
            F.lit(1736154000) + F.floor(F.col("doc_id") / 50) * 60
        ).alias("ts"),
    )
    return conversation_profile(tr)


def q_judge_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched LLM-judge scoring plumbing (round 4, operators/judge
    .judge_scores): documents scored on two criteria through the Arrow
    mapInPandas path with the deterministic offline fake (portable
    60-bit md5 -> [0,1) at 6 dp) — the model-based-filtering stage with
    the client stubbed, the multimodal-decode discipline; the oracle
    replays the hash arithmetic, pinning batching/schema/rounding
    end-to-end.  Embarrassingly parallel: zero shuffles."""
    from node_feedparser_spark.operators.judge import judge_scores

    return judge_scores(
        _t(spark, sf_dir, "documents"),
        criteria=("helpfulness", "factuality"),
    )


def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@2 per prompt (round 4, operators/preference
    .pass_at_k; Chen et al. 2021 eq. 1): orders are prompts, line items
    are sampled candidates, 'passing' = returnflag N — the coverage
    estimator every eval harness reports, as one map-side-combinable
    count agg plus a row-local exact-integer product (no binomials
    materialized, single-candidate prompts honestly NULL)."""
    from node_feedparser_spark.operators.preference import pass_at_k

    li = _t(spark, sf_dir, "lineitem")
    return pass_at_k(
        li.select(
            F.col("l_orderkey").alias("prompt_id"),
            (F.col("l_returnflag") == "N").alias("passed"),
        ),
        k=2,
    )


def q_conv_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-granularity near-dup detection (round 4): documents
    fold into 4-turn conversations (ordered concat by turn_idx), every
    10th conversation gets a deterministic mirrored twin (the
    cross-posted-thread shape), and the existing MinHash-LSH + exact
    verify join (operators/dedupe.lsh_near_dup_pairs) runs at CONV
    granularity — LLM pipelines dedupe whole threads, not just turns;
    the twins must surface at jaccard 1.0 plus whatever natural near-dup
    blocks align.  Scale shape: one groupBy fold, then the banded LSH
    join — candidate volume stays ~linear, nothing all-pairs."""
    from node_feedparser_spark.operators.dedupe import lsh_near_dup_pairs

    docs = _t(spark, sf_dir, "documents")
    ordered = (
        docs.select(
            F.floor(F.col("doc_id") / 4).alias("conv_key"),
            (F.col("doc_id") % 4).alias("turn_idx"),
            "text",
        )
        .groupBy("conv_key")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
    )
    convs = ordered.select(
        F.concat(F.lit("cv-"), F.col("conv_key").cast("string")).alias("conv"),
        "text",
    )
    twins = ordered.filter(F.col("conv_key") % 10 == 0).select(
        F.concat(F.lit("dup-"), F.col("conv_key").cast("string")).alias("conv"),
        "text",
    )
    pairs = lsh_near_dup_pairs(
        convs.unionByName(twins), id_col="conv", text_col="text", threshold=0.8
    )
    return pairs.select(
        F.col("doc_a").alias("conv_a"),
        F.col("doc_b").alias("conv_b"),
        "jaccard",
    )


def q_reward_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-prompt reward whitening (round 4, operators/preference
    .reward_whiten): the dpo_pairs candidate shape (orders as prompts,
    line items as candidates scored in HALF_UP cents) standardized to
    per-prompt z-scores via the exact-integer (n·x − s1)/sqrt(n·s2 − s1²)
    form — one sqrt and one division per row, everything else long
    arithmetic, zero-variance and singleton groups whiten to 0."""
    from node_feedparser_spark.operators.preference import reward_whiten

    li = _t(spark, sf_dir, "lineitem")
    cands = li.select(
        F.col("l_orderkey").alias("prompt_id"),
        F.col("l_linenumber").alias("cand_id"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("score"),
    )
    return reward_whiten(cands)


def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT training-pair extraction (round 4, operators/sft.sft_pairs):
    documents mapped into the north-rule transcript shape (the
    conv_profile projection), then every assistant turn becomes a
    (prompt, response) row whose prompt is the previous 3 turns rendered
    'role: text' — the conversation-corpus last mile.  One conv_id
    shuffle; the context frame is a bounded 3-row window, so prompt size
    is constant per row, never conversation-length."""
    from node_feedparser_spark.operators.sft import sft_pairs

    docs = _t(spark, sf_dir, "documents")
    tr = docs.select(
        F.concat(F.lit("doc-"), (F.col("doc_id") % 50).cast("string")).alias(
            "conv_id"
        ),
        F.floor(F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "user")
        .when(F.col("doc_id") % 3 == 1, "assistant")
        .otherwise("tool")
        .alias("role"),
        F.col("text"),
    )
    return sft_pairs(tr, context_turns=3)


def q_predicate_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extensional predicate alignment (round 4, operators/rules
    .predicate_align): the KG projection's in_nation / in_region /
    placed / supplied_by vocabulary scored against a deliberately
    different 'foreign' vocabulary — locatedIn (customers with
    custkey % 3 != 0, all suppliers), partOf (nations), soldBy (same
    pairs as supplied_by) — by Jaccard of distinct (subj, obj) pair
    sets.  soldBy must align 1.0 with supplied_by, locatedIn partially
    with in_nation, partOf partially with in_region (in_region also
    holds odd customers) — the namespace-table derivation face."""
    from node_feedparser_spark.operators.rules import predicate_align

    a = _kg_triples(spark, sf_dir).filter(
        F.col("pred").isin("in_nation", "in_region", "placed", "supplied_by")
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    b = (
        cust.filter(F.col("c_custkey") % 3 != 0)
        .select(
            F.concat(F.lit("c"), F.col("c_custkey")).alias("subj"),
            F.lit("locatedIn").alias("pred"),
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("obj"),
        )
        .unionAll(
            supp.select(
                F.concat(F.lit("s"), F.col("s_suppkey")).alias("subj"),
                F.lit("locatedIn").alias("pred"),
                F.concat(F.lit("n"), F.col("s_nationkey")).alias("obj"),
            )
        )
        .unionAll(
            nat.select(
                F.concat(F.lit("n"), F.col("n_nationkey")).alias("subj"),
                F.lit("partOf").alias("pred"),
                F.concat(F.lit("r"), F.col("n_regionkey")).alias("obj"),
            )
        )
        .unionAll(
            li.select(
                F.concat(F.lit("p"), F.col("l_partkey")).alias("subj"),
                F.lit("soldBy").alias("pred"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("obj"),
            )
        )
    )
    return predicate_align(a, b, min_overlap=1)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- driver CORRECTNESS window (first 50 entries, rotated per round) ---
        # The external driver oracle-checks exactly the first 50 dict entries.
        # Rounds 1-4 attested 112 distinct queries; round 5 rotates in 50
        # never-driver-checked entries: the full late-r4 preference/SFT/judge
        # tail (9) plus 41 late-r3 additions.  mst/mis/coloring have no SQL
        # oracle (iterative fixpoints) and get the driver's rows-only check.
        # Local replica (tests/test_queries_oracle.py) checks ALL entries.
        "dpo_pairs": q_dpo_pairs,
        "bradley_terry": q_bradley_terry,
        "conv_profile": q_conv_profile,
        "sft_pairs": q_sft_pairs,
        "predicate_align": q_predicate_align,
        "reward_whiten": q_reward_whiten,
        "conv_near_dup": q_conv_near_dup,
        "pass_at_k": q_pass_at_k,
        "judge_scores": q_judge_scores,
        "bm25_topk": q_bm25_topk,
        "dsir_weights": q_dsir_weights,
        "snm_near_dup": q_snm_near_dup,
        "mst": q_mst,
        "mis": q_mis,
        "coloring": q_coloring,
        "unigram_lm": q_unigram_lm,
        "winnow_fingerprint": q_winnow_fingerprint,
        "mad_outliers": q_mad_outliers,
        "psi_drift": q_psi_drift,
        "kcore": q_kcore,
        "rule_mining": q_rule_mining,
        "hits": q_hits,
        "modularity": q_modularity,
        "incremental_cc": q_incremental_cc,
        "topo_layers": q_topo_layers,
        "allen_relations": q_allen_relations,
        "burst_detect": q_burst_detect,
        "fk_profile": q_fk_profile,
        "column_profile": q_column_profile,
        "pmi_pairs": q_pmi_pairs,
        "fs_linkage": q_fs_linkage,
        "sequence_pack": q_sequence_pack,
        "chunk_documents": q_chunk_documents,
        "bpe_pair_counts": q_bpe_pair_counts,
        "als_factorize": q_als_factorize,
        "naive_bayes_lang": q_naive_bayes_lang,
        "markov_chain": q_markov_chain,
        "k_anonymity": q_k_anonymity,
        "freq_itemsets": q_freq_itemsets,
        "assoc_rules": q_assoc_rules,
        "interval_coverage": q_interval_coverage,
        "exact_percentiles": q_exact_percentiles,
        "sliding_counts": q_sliding_counts,
        "annotator_kappa": q_annotator_kappa,
        "rank_analytics": q_rank_analytics,
        "ntriples_export": q_ntriples_export,
        "ann_recall_eval": q_ann_recall_eval,
        "edit_distance_join": q_edit_distance_join,
        "psi_window": q_psi_window,  # new this round (streaming-face twin)
        "meta_cloud": q_meta_cloud,  # new this round (F17 meta side)
        # --- never driver-checked: remaining rotation candidates (31) ---
        "interval_join": q_interval_join,
        "linear_attribution": q_linear_attribution,
        "benford": q_benford,
        "time_decay": q_time_decay,
        "comention": q_comention,
        "rule_apply": q_rule_apply,
        "gini": q_gini,
        "roc_auc": q_roc_auc,
        "negative_sampling": q_negative_sampling,
        "pred_stats": q_pred_stats,
        "schema_graph": q_schema_graph,
        "g2_colloc": q_g2_colloc,
        "powerlaw_alpha": q_powerlaw_alpha,
        "neighbor_agg": q_neighbor_agg,
        "bloom_semi_join": q_bloom_semi_join,
        "blocking_quality": q_blocking_quality,
        "cluster_quality": q_cluster_quality,
        "weighted_sample": q_weighted_sample,
        "funnel": q_funnel,
        "cohort_retention": q_cohort_retention,
        "zorder_layout": q_zorder_layout,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "skew_profile": q_skew_profile,
        "poisson_bootstrap": q_poisson_bootstrap,
        "l_diversity": q_l_diversity,
        "t_closeness": q_t_closeness,
        "butterflies": q_butterflies,
        "cube_pricing": q_cube_pricing,
        "pivot_counts": q_pivot_counts,
        "unpivot_measures": q_unpivot_measures,
        # --- driver-attested rounds 1-4 (112 distinct, all green) ---
        "embedded_html_dispatch": q_embedded_html_dispatch,
        "xhtml_reserialize": q_xhtml_reserialize,
        "salted_group_stats": q_salted_group_stats,
        "kg_components": q_kg_components,
        "scc": q_scc,
        "scc_condensation": q_scc_condensation,
        "pagerank": q_pagerank,
        "ppr": q_ppr,
        "truth_fusion": q_truth_fusion,
        "bgp_match": q_bgp_match,
        "bgp_optional": q_bgp_optional,
        "path_query": q_path_query,
        "path_closure": q_path_closure,
        "shacl_validate": q_shacl_validate,
        "rdfs_inferred": q_rdfs_inferred,
        "hll_distinct": q_hll_distinct,
        "kmv_overlap": q_kmv_overlap,
        "kmv_pairwise": q_kmv_pairwise,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "hist_quantiles": q_hist_quantiles,
        "sessionize": q_sessionize,
        "click_attribution": q_click_attribution,
        "link_calibrate": q_link_calibrate,
        "link_predict": q_link_predict,
        "link_pred_eval": q_link_pred_eval,
        "harmonic_centrality": q_harmonic_centrality,
        "betweenness": q_betweenness,
        "wl_fingerprints": q_wl_fingerprints,
        "temporal_reach": q_temporal_reach,
        "katz": q_katz,
        "effective_diameter": q_effective_diameter,
        "hyperanf_reach": q_hyperanf_reach,
        "random_walks": q_random_walks,
        "skipgram_pairs": q_skipgram_pairs,
        "node2vec_walks": q_node2vec_walks,
        "shortest_paths": q_shortest_paths,
        "type_spread": q_type_spread,
        "ngram_jaccard": q_ngram_jaccard,
        "containment_join": q_containment_join,
        "term_salience": q_term_salience,
        "triangle_count": q_triangle_count,
        "clustering_coeff": q_clustering_coeff,
        "ktruss": q_ktruss,
        "assortativity": q_assortativity,
        "reciprocity": q_reciprocity,
        "khop_reach": q_khop_reach,
        "kg_snapshot_diff": q_kg_snapshot_diff,
        "label_propagation": q_label_propagation,
        "entity_timelines": q_entity_timelines,
        "temporal_conflicts": q_temporal_conflicts,
        "agg_pricing_summary": q_agg_pricing_summary,
        "case_dispatch": q_case_dispatch,
        "broadcast_dim_join": q_broadcast_dim_join,
        "first_wins": q_first_wins,
        "precedence_coalesce": q_precedence_coalesce,
        "distinct_by_key": q_distinct_by_key,
        "category_accumulate": q_category_accumulate,
        "regex_extract": q_regex_extract,
        "window_order": q_window_order,
        "late_meta_enrich": q_late_meta_enrich,
        "exact_dedupe": q_exact_dedupe,
        "token_stats": q_token_stats,
        "minhash_near_dup": q_minhash_near_dup,
        "simhash": q_simhash,
        "simhash_near_dup": q_simhash_near_dup,
        "embedding_topk": q_embedding_topk,
        "quantized_topk": q_quantized_topk,
        "pq_topk": q_pq_topk,
        "ivfpq_topk": q_ivfpq_topk,
        "ivfpq_residual_topk": q_ivfpq_residual_topk,
        "ann_lane_eval": q_ann_lane_eval,
        "ann_index_probe": q_ann_index_probe,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_blocked": q_embedding_near_dup_blocked,
        "semantic_dedupe": q_semantic_dedupe,
        "ivf_ann_topk": q_ivf_ann_topk,
        "rrf_fusion": q_rrf_fusion,
        "ivf_kmeans_topk": q_ivf_kmeans_topk,
        "language_id": q_language_id,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_doc_fingerprint,
        "media_meta": q_media_meta,
        "media_decode": q_media_decode,
        "frame_sample": q_frame_sample,
        "payload_dedupe": q_payload_dedupe,
        "near_dup_groups": q_near_dup_groups,
        "duplicate_spans": q_duplicate_spans,
        "repetition_metrics": q_repetition_metrics,
        "token_budget_sample": q_token_budget_sample,
        "pii_scrub": q_pii_scrub,
        "decontaminate": q_decontaminate,
        "decontaminate_multi": q_decontaminate_multi,
        "mixture_weights": q_mixture_weights,
        "stratified_split": q_stratified_split,
        "tfidf_topk": q_tfidf_topk,
        "boilerplate_scrub": q_boilerplate_scrub,
        "anti_join": q_anti_join,
        "link_reassembly": q_link_reassembly,
        "author_parse": q_author_parse,
        "precedence_dates": q_precedence_dates,
        "scalar_chains": q_scalar_chains,
        "explode_distinct": q_explode_distinct,
        "forward_fill": q_forward_fill,
        "set_except": q_set_except,
        "rollup_revenue": q_rollup_revenue,
        "whitespace_hoist": q_whitespace_hoist,
        "ordered_collect": q_ordered_collect,
        "map_normalize": q_map_normalize,
        "url_resolve": q_url_resolve,
        "retro_resolve": q_retro_resolve,
        "html_uri_resolve": q_html_uri_resolve,
    }


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB twins of the hash/shingle/simhash plans)
# ---------------------------------------------------------------------------


def _js_zone_replace_sql(inner: str) -> str:
    """Nested DuckDB regexp_replace chain swapping each ECMA-262 legacy
    zone name at end-of-string for its fixed offset — the same textual
    normalization the Spark query applies (_JS_DATE_ZONES)."""
    expr = inner
    for zone, off in _JS_DATE_ZONES:
        expr = f"regexp_replace({expr}, ' {zone}$', ' {off}')"
    return expr


def _oracle_builders():
    from node_feedparser_spark.functions.hashing import (
        portable_hash60_sql,
        token_shingles_sql,
    )
    from node_feedparser_spark.operators.dedupe import SIMHASH_BITS
    from node_feedparser_spark.operators.text_analysis import LANG_STOPWORDS

    return portable_hash60_sql, token_shingles_sql, SIMHASH_BITS, LANG_STOPWORDS


def _simhash_cte() -> str:
    """DuckDB CTE body computing (doc_id, simhash) exactly as
    operators/dedupe.py simhash does."""
    h_sql, _, bits, _ = _oracle_builders()
    sums = ", ".join(
        f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    assemble = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
        toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
        th AS (SELECT doc_id, {h_sql('token')} AS th FROM toks),
        votes AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
        sh AS (SELECT doc_id, CAST(({assemble}) AS BIGINT) AS simhash FROM votes)
    """


def _stopword_values() -> str:
    _, _, _, stopwords = _oracle_builders()
    rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in sorted(stopwords.items())
        for w in words
    )
    return f"(VALUES {rows}) sw(lang, word)"




# ---------------------------------------------------------------------------
# PQ-family oracle generators (round 4): the pq / ivfpq / ivfpq_residual
# oracles replay seed -> N integer-Lloyd rounds -> encode -> ADC entirely
# in DuckDB SQL.  Hand-maintaining one CTE pair per Lloyd round stopped
# scaling when the lanes moved from the round-3 toy parameters (16 codes x
# 8 subspaces, 1 round, recall@5 0.25-0.33) to the production FAISS-shaped
# ones (256 codes x 16 subspaces, 2 rounds, n_probe 8; recall@5 0.65-0.70
# measured at sf0.01), so the chains are emitted by these generators.
# The constants MUST mirror the named queries' explicit parameters.
# ---------------------------------------------------------------------------

_PQ_N_CODES = 256
_PQ_M_SUB = 16
_PQ_SUB = 64 // _PQ_M_SUB  # dims per subspace on the 64-d embeddings table
_PQ_ROUNDS = 2
_IVF_N_CELLS = 16
_IVF_N_PROBE = 8


def _pq_lloyd_chain_sql(
    n_codes: int, rounds: int, src: str, val: str, pre: str, signed: bool
) -> str:
    """CTE chain for PQ codebook training over a subvector table
    src(vec_id, m, d, {val}): seed ({pre}cent1 = the n_codes smallest
    vec_ids' subvectors), then `rounds` x [assign -> integer-mean refine,
    empty cells keep their centroid], then the final distance table
    {pre}cdf and code table {pre}ccodef.  signed=True uses the
    sign-symmetric half-away-from-zero mean (residuals can be negative;
    Python // floors while DuckDB // truncates)."""
    if signed:
        mean_sql = f"""CASE WHEN SUM(s.{val}) >= 0
                            THEN (2 * SUM(s.{val}) + COUNT(*))
                                 // (2 * COUNT(*))
                            ELSE -((-2 * SUM(s.{val}) + COUNT(*))
                                   // (2 * COUNT(*)))
                       END"""
    else:
        mean_sql = f"(2 * SUM(s.{val}) + COUNT(*)) // (2 * COUNT(*))"
    parts = [
        f"""{pre}cent1 AS (SELECT vec_id AS code, m, d, {val}
                 FROM {src} WHERE vec_id < {n_codes})"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""{pre}cd{r} AS (SELECT s.vec_id, s.m, c.code,
                     SUM((s.{val} - c.{val}) * (s.{val} - c.{val})) AS dist
                 FROM {src} s JOIN {pre}cent{r} c ON c.m = s.m AND c.d = s.d
                 GROUP BY s.vec_id, s.m, c.code)"""
        )
        parts.append(
            f"""{pre}ccode{r} AS (SELECT vec_id, m, code FROM (
                     SELECT vec_id, m, code,
                            ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                ORDER BY dist ASC, code ASC) AS rn
                     FROM {pre}cd{r}) WHERE rn = 1)"""
        )
        parts.append(
            f"""{pre}refm{r} AS (SELECT a.m, a.code, s.d, {mean_sql} AS {val}
                 FROM {pre}ccode{r} a
                 JOIN {src} s ON s.vec_id = a.vec_id AND s.m = a.m
                 GROUP BY a.m, a.code, s.d)"""
        )
        parts.append(
            f"""{pre}cent{r + 1} AS (SELECT c.code, c.m, c.d,
                        COALESCE(rf.{val}, c.{val}) AS {val}
                 FROM {pre}cent{r} c LEFT JOIN {pre}refm{r} rf
                   ON rf.m = c.m AND rf.code = c.code AND rf.d = c.d)"""
        )
    parts.append(
        f"""{pre}cdf AS (SELECT s.vec_id, s.m, c.code,
                 SUM((s.{val} - c.{val}) * (s.{val} - c.{val})) AS dist
             FROM {src} s JOIN {pre}cent{rounds + 1} c
               ON c.m = s.m AND c.d = s.d
             GROUP BY s.vec_id, s.m, c.code)"""
    )
    parts.append(
        f"""{pre}ccodef AS (SELECT vec_id, m, code FROM (
                 SELECT vec_id, m, code,
                        ROW_NUMBER() OVER (PARTITION BY vec_id, m
                            ORDER BY dist ASC, code ASC) AS rn
                 FROM {pre}cdf) WHERE rn = 1)"""
    )
    return ",\n            ".join(parts)


def _pq_quantize_cte(include_pos: bool) -> str:
    """Shared scalar-quantize + subvector-decompose CTEs: x (unnested
    dims), st (per-dim min/scale), q (vec_id[, pos], m, d, qx)."""
    pos_col = "x.vec_id, x.pos," if include_pos else "x.vec_id,"
    return f"""x AS (SELECT vec_id, unnest(v) AS x,
                         generate_subscripts(v, 1) AS pos
                  FROM e),
            st AS (SELECT pos, MIN(x) AS mn,
                          (MAX(x) - MIN(x)) / 255.0 AS sc
                   FROM x GROUP BY pos),
            q AS (SELECT {pos_col}
                         (x.pos - 1) // {_PQ_SUB} AS m,
                         (x.pos - 1) % {_PQ_SUB} AS d,
                         CASE WHEN st.sc > 0
                              THEN CAST(ROUND((x.x - st.mn) / st.sc) AS BIGINT)
                              ELSE 0 END AS qx
                  FROM x JOIN st USING (pos))"""


def _ivf_coarse_cte(q_cut: int) -> str:
    """Coarse inverted-file layer: n_cells full-vector centroids (seed =
    smallest vec_ids + ONE integer Lloyd round), final assignment
    gassign, and per-query probe sets gprobe (n_probe nearest refined
    cells, ties -> smallest cell)."""
    return f"""gcent AS (SELECT vec_id AS cell, pos, qx FROM q
                      WHERE vec_id < {_IVF_N_CELLS}),
            gd AS (SELECT qq.vec_id, c.cell,
                          SUM((qq.qx - c.qx) * (qq.qx - c.qx)) AS dist
                   FROM q qq JOIN gcent c ON c.pos = qq.pos
                   GROUP BY qq.vec_id, c.cell),
            ga1 AS (SELECT vec_id, cell FROM (
                        SELECT vec_id, cell,
                               ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist ASC, cell ASC) AS rn
                        FROM gd) WHERE rn = 1),
            gref AS (SELECT a.cell, qq.pos,
                            (2 * SUM(qq.qx) + COUNT(*)) // (2 * COUNT(*)) AS qx
                     FROM ga1 a JOIN q qq ON qq.vec_id = a.vec_id
                     GROUP BY a.cell, qq.pos),
            gcent2 AS (SELECT c.cell, c.pos, COALESCE(r.qx, c.qx) AS qx
                       FROM gcent c LEFT JOIN gref r
                         ON r.cell = c.cell AND r.pos = c.pos),
            gd2 AS (SELECT qq.vec_id, c.cell,
                           SUM((qq.qx - c.qx) * (qq.qx - c.qx)) AS dist
                    FROM q qq JOIN gcent2 c ON c.pos = qq.pos
                    GROUP BY qq.vec_id, c.cell),
            gassign AS (SELECT vec_id, cell FROM (
                            SELECT vec_id, cell,
                                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY dist ASC, cell ASC) AS rn
                            FROM gd2) WHERE rn = 1),
            gprobe AS (SELECT query_id, cell FROM (
                           SELECT vec_id AS query_id, cell,
                                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist ASC, cell ASC) AS pr
                           FROM gd2 WHERE vec_id < {q_cut})
                       WHERE pr <= {_IVF_N_PROBE})"""


def _pq_oracle_sql(cosine_cte: str) -> str:
    chain = _pq_lloyd_chain_sql(
        _PQ_N_CODES, _PQ_ROUNDS, src="q", val="qx", pre="", signed=False
    )
    return f"""
            WITH {cosine_cte},
            {_pq_quantize_cte(include_pos=False)},
            {chain},
            qtab AS (SELECT vec_id AS query_id, m, code, dist
                     FROM cdf WHERE vec_id < 10),
            ad AS (SELECT t.query_id, c.vec_id,
                          CAST(SUM(t.dist) AS BIGINT) AS adist
                   FROM ccodef c JOIN qtab t ON t.m = c.m AND t.code = c.code
                   WHERE c.vec_id <> t.query_id
                   GROUP BY t.query_id, c.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY adist ASC, vec_id ASC) AS rnk FROM ad)
            SELECT query_id, vec_id, adist, CAST(rnk AS BIGINT) AS rank
            FROM r WHERE rnk <= 5
        """


def _ivfpq_oracle_sql(cosine_cte: str) -> str:
    chain = _pq_lloyd_chain_sql(
        _PQ_N_CODES, _PQ_ROUNDS, src="q", val="qx", pre="", signed=False
    )
    return f"""
            WITH {cosine_cte},
            {_pq_quantize_cte(include_pos=True)},
            {_ivf_coarse_cte(q_cut=8)},
            {chain},
            qtab AS (SELECT vec_id AS query_id, m, code, dist
                     FROM cdf WHERE vec_id < 8),
            cand AS (SELECT p.query_id, a.vec_id
                     FROM gprobe p JOIN gassign a ON a.cell = p.cell
                     WHERE a.vec_id <> p.query_id),
            ad AS (SELECT cand.query_id, cand.vec_id,
                          CAST(SUM(t.dist) AS BIGINT) AS adist
                   FROM cand
                   JOIN ccodef c ON c.vec_id = cand.vec_id
                   JOIN qtab t ON t.query_id = cand.query_id
                              AND t.m = c.m AND t.code = c.code
                   GROUP BY cand.query_id, cand.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY adist ASC, vec_id ASC) AS rnk FROM ad)
            SELECT query_id, vec_id, adist, CAST(rnk AS BIGINT) AS rank
            FROM r WHERE rnk <= 5
        """


def _ivfpq_residual_oracle_sql(cosine_cte: str) -> str:
    chain = _pq_lloyd_chain_sql(
        _PQ_N_CODES, _PQ_ROUNDS, src="rq", val="rx", pre="r", signed=True
    )
    final_cent = f"rcent{_PQ_ROUNDS + 1}"
    return f"""
            WITH {cosine_cte},
            {_pq_quantize_cte(include_pos=True)},
            {_ivf_coarse_cte(q_cut=8)},
            rq AS (SELECT qq.vec_id, qq.m, qq.d, qq.qx - g.qx AS rx
                   FROM q qq
                   JOIN gassign a ON a.vec_id = qq.vec_id
                   JOIN gcent2 g ON g.cell = a.cell AND g.pos = qq.pos),
            {chain},
            qr AS (SELECT p.query_id, p.cell, qq.m, qq.d, qq.qx - g.qx AS rx
                   FROM gprobe p
                   JOIN q qq ON qq.vec_id = p.query_id
                   JOIN gcent2 g ON g.cell = p.cell AND g.pos = qq.pos),
            qtab AS (SELECT qr.query_id, qr.cell, qr.m, c.code,
                            SUM((qr.rx - c.rx) * (qr.rx - c.rx)) AS dist
                     FROM qr JOIN {final_cent} c
                       ON c.m = qr.m AND c.d = qr.d
                     GROUP BY qr.query_id, qr.cell, qr.m, c.code),
            cand AS (SELECT p.query_id, a.vec_id, a.cell
                     FROM gprobe p JOIN gassign a ON a.cell = p.cell
                     WHERE a.vec_id <> p.query_id),
            ad AS (SELECT cand.query_id, cand.vec_id,
                          CAST(SUM(t.dist) AS BIGINT) AS adist
                   FROM cand
                   JOIN rccodef c ON c.vec_id = cand.vec_id
                   JOIN qtab t ON t.query_id = cand.query_id
                              AND t.cell = cand.cell
                              AND t.m = c.m AND t.code = c.code
                   GROUP BY cand.query_id, cand.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY adist ASC, vec_id ASC) AS rnk FROM ad)
            SELECT query_id, vec_id, adist, CAST(rnk AS BIGINT) AS rank
            FROM r WHERE rnk <= 5
        """


def oracle_sql() -> dict[str, str]:
    return {
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "case_dispatch": """
            SELECT CASE WHEN event_type = 'error' THEN 'failure'
                        WHEN event_type IN ('signup', 'purchase') THEN 'conversion'
                        ELSE 'engagement' END AS event_class,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS total_value
            FROM events GROUP BY 1
        """,
        "broadcast_dim_join": """
            SELECT r_name, COUNT(*) AS n_customers,
                   ROUND(SUM(c_acctbal), 4) AS total_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "first_wins": """
            SELECT user_id, event_type AS first_event_type
            FROM (SELECT user_id, event_type,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts ASC, event_id ASC) AS rn
                  FROM events) WHERE rn = 1
        """,
        "precedence_coalesce": """
            SELECT p_partkey,
                   COALESCE(CASE WHEN p_size > 40 THEN p_brand END,
                            CASE WHEN p_retailprice > 1500 THEN 'PREMIUM' END,
                            p_type) AS resolved_label
            FROM part
        """,
        "distinct_by_key": """
            SELECT user_id, event_type, event_id AS first_event_id
            FROM (SELECT user_id, event_type, event_id,
                         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts ASC, event_id ASC) AS rn
                  FROM events) WHERE rn = 1
        """,
        "category_accumulate": """
            SELECT DISTINCT p_brand, UNNEST(string_split(p_type, ' ')) AS type_word
            FROM part
        """,
        "regex_extract": """
            SELECT event_id,
                   CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INTEGER) AS prop_k
            FROM events
        """,
        "window_order": """
            SELECT user_id, event_id, rn
            FROM (SELECT user_id, event_id,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts ASC, event_id ASC) AS rn
                  FROM events) WHERE rn <= 3
        """,
        "late_meta_enrich": """
            SELECT o_orderkey, o_orderstatus, order_revenue, n_lines
            FROM orders
            JOIN (SELECT l_orderkey,
                         ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS order_revenue,
                         COUNT(*) AS n_lines
                  FROM lineitem GROUP BY l_orderkey) meta
            ON o_orderkey = l_orderkey
        """,
        "exact_dedupe": """
            SELECT md5(text) AS text_hash,
                   MIN(doc_id) AS keeper_doc_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "token_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars_computed
            FROM documents
        """,
    } | _extra_oracles()


def _kmeans_ctes(n_cells: int = 16, n_iters: int = 2) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs over `e` (vec_id, v):
    c0 = first-N seed; a{i} = nearest-centroid assignment (rounded cosine,
    cell-asc ties); m{i} = per-dimension means rounded to 4dp; c{i} = new
    centroids, empty clusters keeping the previous centroid.  The final
    relation is c{n_iters}(cell, cv) — identical, by rounding, to
    operators/similarity.kmeans_centroids."""
    parts = [
        f"c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {n_cells})"
    ]
    prev = "c0"
    for it in range(1, n_iters + 1):
        parts.append(f"""a{it} AS (SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cell ASC) AS rn
            FROM e CROSS JOIN {prev} c) WHERE rn = 1)""")
        parts.append(f"""m{it} AS (SELECT cell, list(m ORDER BY pos) AS mv FROM (
            SELECT cell, pos, ROUND(AVG(x), 4) AS m FROM (
                SELECT a{it}.cell, unnest(e.v) AS x,
                       generate_subscripts(e.v, 1) AS pos
                FROM a{it} JOIN e USING (vec_id))
            GROUP BY cell, pos) GROUP BY cell)""")
        parts.append(
            f"c{it} AS (SELECT p.cell, COALESCE(m.mv, p.cv) AS cv "
            f"FROM {prev} p LEFT JOIN m{it} m ON p.cell = m.cell)"
        )
        prev = f"c{it}"
    return ",\n            ".join(parts)


def _author_parse_oracle() -> str:
    """DuckDB twin of q_author_parse: same 6-way shape synthesis, same
    regex contract (functions/authors.author_fields_sql)."""
    from node_feedparser_spark.functions.authors import (
        author_fields_sql,
        sql_trim,
    )

    parts = author_fields_sql("raw_author")
    name, address = parts["name"], parts["address"]
    return f"""
        WITH b0 AS (SELECT c_custkey, c_name,
                           'user' || c_custkey || '@example.com' AS addr
                    FROM customer),
        b1 AS (SELECT c_custkey,
                      CASE c_custkey % 6
                        WHEN 0 THEN c_name || ' <' || addr || '>'
                        WHEN 1 THEN '"' || c_name || ', c' || c_custkey
                                    || '" <' || addr || '>'
                        WHEN 2 THEN addr || ' (' || c_name || ')'
                        WHEN 3 THEN addr
                        WHEN 4 THEN c_name
                        ELSE addr || ', second' || addr END AS raw_author
               FROM b0),
        b AS (SELECT c_custkey, raw_author,
                     {sql_trim("coalesce(raw_author, '')")} AS s
              FROM b1)
        SELECT c_custkey, raw_author,
               ({name}) AS author_name,
               ({address}) AS author_address,
               CASE WHEN ({name}) <> '' THEN ({name})
                    WHEN ({address}) <> '' THEN ({address})
                    ELSE s END AS author
        FROM b
    """


def _random_walks_oracle(walk_len: int = 3, seed: int = 11) -> str:
    """DuckDB twin of q_random_walks: same bipartite graph, same ranked
    neighbor lists, same hash-indexed choice at every unrolled step."""
    h_sql, _, _, _ = _oracle_builders()
    steps, selects = [], [
        "SELECT start_node, walk_k, CAST(0 AS BIGINT) AS step, node FROM w0"
    ]
    for t in range(1, walk_len + 1):
        prev = f"w{t - 1}"
        hexpr = h_sql(
            f"concat_ws(chr(31), '{seed}', {prev}.start_node, "
            f"CAST({prev}.walk_k AS VARCHAR), '{t}', {prev}.node)"
        )
        steps.append(f"""w{t} AS (SELECT {prev}.start_node, {prev}.walk_k,
                       nbr.n AS node
                FROM {prev} JOIN degs ON {prev}.node = degs.u
                JOIN nbr ON {prev}.node = nbr.u
                 AND nbr.idx = ({hexpr}) % degs.deg)""")
        selects.append(
            f"SELECT start_node, walk_k, CAST({t} AS BIGINT) AS step, node "
            f"FROM w{t}"
        )
    step_ctes = ",\n        ".join(steps)
    unioned = " UNION ALL ".join(selects)
    return f"""
        WITH raw AS (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS u,
                                     'p' || CAST(l_partkey AS VARCHAR) AS n
                     FROM lineitem),
        dedges AS (SELECT u, n FROM raw UNION SELECT n, u FROM raw),
        nbr AS (SELECT u, n,
                       CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY n)
                            AS BIGINT) - 1 AS idx
                FROM dedges),
        degs AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
                 FROM dedges GROUP BY u),
        w0 AS (SELECT u AS start_node, CAST(k AS BIGINT) AS walk_k, u AS node
               FROM (SELECT DISTINCT u FROM dedges) nodes
               CROSS JOIN (VALUES (0), (1)) ks(k)),
        {step_ctes}
        {unioned}
    """


def _biased_walks_oracle(seed: int = 13) -> str:
    """DuckDB twin of q_node2vec_walks: same co-purchase graph, uniform
    step 1, and the step-2 cumulative-weight pick (1/2/1) unrolled."""
    h_sql, _, _, _ = _oracle_builders()
    h1 = h_sql(
        f"concat_ws(chr(31), '{seed}', w0.start_node, "
        "CAST(w0.walk_k AS VARCHAR), '1', w0.node)"
    )
    h2 = h_sql(
        f"concat_ws(chr(31), '{seed}', s2.start_node, "
        "CAST(s2.walk_k AS VARCHAR), '2', s2.prev, s2.node)"
    )
    return f"""
        WITH pp AS (SELECT DISTINCT
                        'p' || CAST(a.l_partkey AS VARCHAR) AS sa,
                        'p' || CAST(b.l_partkey AS VARCHAR) AS sb
                    FROM lineitem a JOIN lineitem b
                      ON a.l_orderkey = b.l_orderkey
                    WHERE a.l_partkey < b.l_partkey),
        und AS (SELECT DISTINCT LEAST(sa, sb) AS a, GREATEST(sa, sb) AS b
                FROM pp),
        dedges AS (SELECT a AS u, b AS n FROM und
                   UNION ALL SELECT b, a FROM und),
        nbr AS (SELECT u, n,
                       CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY n)
                            AS BIGINT) - 1 AS idx
                FROM dedges),
        degs AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
                 FROM dedges GROUP BY u),
        w0 AS (SELECT u AS start_node, CAST(0 AS BIGINT) AS walk_k, u AS node
               FROM (SELECT DISTINCT u FROM dedges) nodes),
        w1 AS (SELECT w0.start_node, w0.walk_k,
                      w0.node AS prev, nbr.n AS node
               FROM w0 JOIN degs ON w0.node = degs.u
               JOIN nbr ON w0.node = nbr.u
                AND nbr.idx = ({h1}) % degs.deg),
        c2 AS (SELECT w1.start_node, w1.walk_k, w1.prev, w1.node,
                      nbr.n, nbr.idx,
                      CAST(CASE WHEN nbr.n = w1.prev THEN 1
                                WHEN ex.a IS NOT NULL THEN 2
                                ELSE 1 END AS BIGINT) AS wt
               FROM w1 JOIN nbr ON w1.node = nbr.u
               LEFT JOIN und ex
                 ON ex.a = LEAST(w1.prev, nbr.n)
                AND ex.b = GREATEST(w1.prev, nbr.n)),
        s2 AS (SELECT *,
                      SUM(wt) OVER (PARTITION BY start_node, walk_k
                                    ORDER BY idx
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum,
                      SUM(wt) OVER (PARTITION BY start_node, walk_k) AS tot
               FROM c2),
        w2 AS (SELECT start_node, walk_k, node AS prev, n AS node
               FROM s2
               WHERE tot > 0
                 AND ({h2}) % tot >= cum - wt
                 AND ({h2}) % tot < cum)
        SELECT start_node, walk_k, CAST(0 AS BIGINT) AS step, node FROM w0
        UNION ALL
        SELECT start_node, walk_k, CAST(1 AS BIGINT) AS step, node FROM w1
        UNION ALL
        SELECT start_node, walk_k, CAST(2 AS BIGINT) AS step, node FROM w2
    """


def _extra_oracles() -> dict[str, str]:
    from node_feedparser_spark.operators.curation import (
        EMAIL_RE as EMAIL_RE_,
        PHONE_RE as PHONE_RE_,
    )

    h_sql, shingles_sql, _, stopwords = _oracle_builders()
    portable_hash60_sql_ = h_sql
    en_stop = ", ".join(f"'{w}'" for w in stopwords["en"])
    from node_feedparser_spark.operators.profile import BENFORD_P

    # repr round-trips doubles, so the oracle embeds the SAME constants
    benford_vals = ", ".join(f"({d}, {p!r})" for d, p in sorted(BENFORD_P.items()))
    cosine_cte = (
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
    )
    mtype_case = """CASE source WHEN 'src0' THEN 'image/png'
                        WHEN 'src1' THEN 'image/jpeg'
                        WHEN 'src2' THEN 'audio/wav'
                        WHEN 'src3' THEN 'video/mp4'
                        ELSE 'application/octet-stream' END"""
    d = {
        "minhash_near_dup": f"""
            WITH sh AS (SELECT doc_id, {shingles_sql('text', 3)} AS shingles
                        FROM documents),
            j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         ROUND(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                               / len(list_distinct(list_concat(a.shingles, b.shingles))),
                               6) AS jaccard
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
        """,
        "ngram_jaccard": f"""
            WITH sh AS (SELECT doc_id, {shingles_sql('text', 3)} AS shingles
                        FROM documents),
            j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         ROUND(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                               / len(list_distinct(list_concat(a.shingles, b.shingles))),
                               6) AS jaccard
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.7
        """,
        "benford": f"""
            WITH raw AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                                AS cents FROM orders),
            obs AS (SELECT CAST(SUBSTRING(CAST(cents AS VARCHAR), 1, 1)
                                AS INT) AS digit,
                           CAST(COUNT(*) AS BIGINT) AS n_obs
                    FROM raw GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
            dim AS (SELECT digit, CAST(exp_p AS DOUBLE) AS exp_p
                    FROM (VALUES {benford_vals}) v(digit, exp_p))
            SELECT CAST(dim.digit AS BIGINT) AS digit,
                   CAST(COALESCE(obs.n_obs, 0) AS BIGINT) AS n_obs,
                   ROUND(dim.exp_p, 6) AS exp_p,
                   ROUND((COALESCE(obs.n_obs, 0) - tot.n * dim.exp_p)
                         * (COALESCE(obs.n_obs, 0) - tot.n * dim.exp_p)
                         / (tot.n * dim.exp_p), 6) AS contrib
            FROM dim LEFT JOIN obs ON dim.digit = obs.digit CROSS JOIN tot
        """,
        "term_salience": f"""
            WITH toks AS (SELECT doc_id,
                                 unnest(string_split(text, ' ')) AS token,
                                 generate_subscripts(string_split(text, ' '),
                                                     1) AS pos
                          FROM documents),
            f AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt,
                         CAST(MIN(pos) - 1 AS BIGINT) AS first_idx
                  FROM toks
                  WHERE token <> '' AND token NOT IN ({en_stop})
                  GROUP BY 1, 2),
            s AS (SELECT *, ROUND(cnt * (1.0 + 1.0 / (1.0 + first_idx)),
                                  6) AS salience FROM f),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY salience DESC, token ASC) AS rnk FROM s)
            SELECT doc_id, token, cnt, first_idx, salience,
                   CAST(rnk AS BIGINT) AS rank
            FROM r WHERE rnk <= 3
        """,
        "containment_join": f"""
            WITH sh AS (SELECT doc_id, {shingles_sql('text', 3)} AS shingles
                        FROM documents),
            c AS (SELECT a.doc_id AS src, b.doc_id AS dst,
                         ROUND(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                               / len(a.shingles), 6) AS containment
                  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
            SELECT src, dst, containment FROM c WHERE containment >= 0.8
        """,
        "simhash": f"""
            WITH {_simhash_cte()}
            SELECT doc_id, simhash FROM sh
        """,
        "simhash_near_dup": f"""
            WITH {_simhash_cte()}
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "embedding_topk": f"""
            WITH {cosine_cte},
            s AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                         ROUND(list_cosine_similarity(q.v, c.v), 6) AS score
                  FROM e q JOIN e c ON c.vec_id <> q.vec_id
                  WHERE q.vec_id < 10),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) AS rnk FROM s)
            SELECT query_id, vec_id, score, rnk AS rank FROM r WHERE rnk <= 5
        """,
        # identical per-dim min-max quantize -> dequantize arithmetic,
        # replayed relationally; queries stay float (q.v)
        "quantized_topk": f"""
            WITH {cosine_cte},
            x AS (SELECT vec_id, unnest(v) AS x,
                         generate_subscripts(v, 1) AS pos
                  FROM e),
            st AS (SELECT pos, MIN(x) AS mn,
                          (MAX(x) - MIN(x)) / 255.0 AS sc
                   FROM x GROUP BY pos),
            dqv AS (SELECT x.vec_id,
                           list(CASE WHEN st.sc > 0
                                     THEN st.mn + ROUND((x.x - st.mn) / st.sc)
                                          * st.sc
                                     ELSE st.mn END ORDER BY x.pos) AS dv
                    FROM x JOIN st USING (pos) GROUP BY x.vec_id),
            s AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                         ROUND(list_cosine_similarity(q.v, c.dv), 6) AS score
                  FROM e q JOIN dqv c ON c.vec_id <> q.vec_id
                  WHERE q.vec_id < 10),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) AS rnk FROM s)
            SELECT query_id, vec_id, score, rnk AS rank FROM r WHERE rnk <= 5
        """,
        # product quantization / IVF-PQ / residual IVF-PQ: the full
        # seed -> 2x integer-Lloyd -> encode -> ADC chain replayed
        # relationally by the generators above (zero float summation, so
        # the top-k is bit-identical); constants mirror the named queries
        "pq_topk": _pq_oracle_sql(cosine_cte),
        "ivfpq_topk": _ivfpq_oracle_sql(cosine_cte),
        "ivfpq_residual_topk": _ivfpq_residual_oracle_sql(cosine_cte),
        "embedding_near_dup": f"""
            WITH {cosine_cte}
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) AS score
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4
        """,
        "embedding_near_dup_blocked": f"""
            WITH {cosine_cte},
            cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
            assign AS (SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                                  c.cell ASC) AS rn
                FROM e CROSS JOIN cents c) WHERE rn <= 4),
            pairs AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
                      FROM assign a JOIN assign b
                      ON a.cell = b.cell AND a.vec_id < b.vec_id)
            SELECT p.doc_a, p.doc_b,
                   ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS score
            FROM pairs p
            JOIN e ea ON ea.vec_id = p.doc_a
            JOIN e eb ON eb.vec_id = p.doc_b
            WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= 0.4
        """,
        # single-cell (n_probe=1) assignment + within-cell pairs + an
        # independent recursive-CTE transitive closure — the SemDeDup shape
        "semantic_dedupe": f"""
            WITH RECURSIVE {cosine_cte},
            cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
            assign AS (SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                                  c.cell ASC) AS rn
                FROM e CROSS JOIN cents c) t WHERE rn = 1),
            p AS (SELECT a.vec_id AS pa, b.vec_id AS pb
                  FROM assign a JOIN assign b
                    ON a.cell = b.cell AND a.vec_id < b.vec_id
                  JOIN e ea ON ea.vec_id = a.vec_id
                  JOIN e eb ON eb.vec_id = b.vec_id
                  WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= 0.4),
            edges AS (SELECT pa AS a, pb AS b FROM p
                      UNION SELECT pb, pa FROM p),
            reach(node, r) AS (
                SELECT a, b FROM edges
                UNION
                SELECT reach.node, edges.b
                FROM reach JOIN edges ON reach.r = edges.a),
            comp AS (SELECT node, LEAST(node, MIN(r)) AS group_id
                     FROM reach GROUP BY node)
            SELECT e.vec_id, assign.cell,
                   COALESCE(cm.group_id, e.vec_id) AS group_id,
                   COALESCE(cm.group_id, e.vec_id) = e.vec_id AS is_keeper
            FROM e JOIN assign USING (vec_id)
            LEFT JOIN comp cm ON e.vec_id = cm.node
        """,
        # independent wedge join over the same undirected simple graph,
        # replaying the max_degree=40 pivot cap
        "link_predict": """
            WITH raw AS (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS a,
                                'p' || CAST(l_partkey AS VARCHAR) AS b
                         FROM lineitem),
            und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
                    FROM raw WHERE a <> b),
            adj AS (SELECT u AS z, v AS n FROM und
                    UNION ALL SELECT v, u FROM und),
            deg AS (SELECT z AS node, COUNT(*) AS d FROM adj GROUP BY z),
            piv AS (SELECT adj.z, adj.n, deg.d
                    FROM adj JOIN deg ON adj.z = deg.node
                    WHERE deg.d <= 40),
            w AS (SELECT a.n AS na, b.n AS nb, a.d AS dz
                  FROM piv a JOIN piv b ON a.z = b.z AND a.n < b.n),
            s AS (SELECT na, nb, CAST(COUNT(*) AS BIGINT) AS n_common,
                         SUM(1.0 / ln(dz)) AS aa
                  FROM w GROUP BY na, nb),
            nonadj AS (SELECT s.* FROM s
                       LEFT JOIN und ON s.na = und.u AND s.nb = und.v
                       WHERE und.u IS NULL)
            SELECT na AS node_a, nb AS node_b, n_common,
                   ROUND(aa, 6) AS aa_score,
                   ROUND(CAST(n_common AS DOUBLE) / (da.d + db.d - n_common),
                         6) AS jaccard
            FROM nonadj JOIN deg da ON nonadj.na = da.node
                        JOIN deg db ON nonadj.nb = db.node
        """,
        "link_pred_eval": """
            WITH raw AS (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS a,
                                'p' || CAST(l_partkey AS VARCHAR) AS b
                         FROM lineitem),
            und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
                    FROM raw WHERE a <> b),
            adj AS (SELECT u AS z, v AS n FROM und
                    UNION ALL SELECT v, u FROM und),
            deg AS (SELECT z AS node, COUNT(*) AS d FROM adj GROUP BY z),
            piv AS (SELECT adj.z, adj.n, deg.d
                    FROM adj JOIN deg ON adj.z = deg.node
                    WHERE deg.d <= 40),
            w AS (SELECT a.n AS na, b.n AS nb, a.d AS dz
                  FROM piv a JOIN piv b ON a.z = b.z AND a.n < b.n),
            s AS (SELECT na, nb, SUM(1.0 / ln(dz)) AS aa
                  FROM w GROUP BY na, nb),
            sp AS (SELECT na, nb, ROUND(aa, 6) AS sc FROM s
                   WHERE na LIKE 's%'),
            cand AS (SELECT na AS g, nb AS it, sc FROM sp
                     UNION ALL SELECT nb, na, sc FROM sp),
            ranked AS (SELECT g, it,
                              ROW_NUMBER() OVER (PARTITION BY g
                                  ORDER BY sc DESC, it ASC) AS rnk
                       FROM cand),
            osup AS (SELECT DISTINCT l_orderkey,
                            's' || CAST(l_suppkey AS VARCHAR) AS s
                     FROM lineitem),
            tr AS (SELECT DISTINCT a.s AS g, b.s AS it
                   FROM osup a JOIN osup b ON a.l_orderkey = b.l_orderkey
                   WHERE a.s <> b.s),
            j AS (SELECT tr.g, tr.it, ranked.rnk
                  FROM tr LEFT JOIN ranked
                    ON tr.g = ranked.g AND tr.it = ranked.it)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
                   CAST(COUNT(rnk) AS BIGINT) AS n_scored,
                   ROUND(AVG(COALESCE(1.0 / rnk, 0)), 6) AS mrr,
                   ROUND(AVG(CASE WHEN rnk <= 1 THEN 1.0 ELSE 0.0 END),
                         6) AS hits_1,
                   ROUND(AVG(CASE WHEN rnk <= 3 THEN 1.0 ELSE 0.0 END),
                         6) AS hits_3,
                   ROUND(AVG(CASE WHEN rnk <= 10 THEN 1.0 ELSE 0.0 END),
                         6) AS hits_10,
                   ROUND(AVG(CAST(rnk AS DOUBLE)), 6) AS mean_rank
            FROM j
        """,
        # the identical hash-indexed walks unrolled as SQL (seed 11,
        # walks_per_node 2, walk_len 3)
        "random_walks": _random_walks_oracle(),
        "node2vec_walks": _biased_walks_oracle(),
        # three full-table relaxation rounds (the engine's changed-rows
        # frontier is a work saver with identical semantics)
        "shortest_paths": """
            WITH raw AS (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS u,
                                'p' || CAST(l_partkey AS VARCHAR) AS v,
                                CAST(l_quantity AS DOUBLE) AS w
                         FROM lineitem),
            eb AS (SELECT u, v, w FROM raw UNION ALL SELECT v, u, w FROM raw),
            e AS (SELECT u, v, MIN(w) AS w FROM eb GROUP BY u, v),
            d0 AS (SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node,
                          0.0 AS dist
                   FROM supplier WHERE s_suppkey <= 3),
            d1 AS (SELECT node, MIN(dist) AS dist FROM (
                     SELECT node, dist FROM d0
                     UNION ALL
                     SELECT e.v, d0.dist + e.w FROM d0 JOIN e ON d0.node = e.u
                   ) t GROUP BY node),
            d2 AS (SELECT node, MIN(dist) AS dist FROM (
                     SELECT node, dist FROM d1
                     UNION ALL
                     SELECT e.v, d1.dist + e.w FROM d1 JOIN e ON d1.node = e.u
                   ) t GROUP BY node),
            d3 AS (SELECT node, MIN(dist) AS dist FROM (
                     SELECT node, dist FROM d2
                     UNION ALL
                     SELECT e.v, d2.dist + e.w FROM d2 JOIN e ON d2.node = e.u
                   ) t GROUP BY node)
            SELECT node, dist FROM d3
        """,
        # gaps-and-islands interval merge over string-compared grams (the
        # engine folds intervals in-row over hash-matched hits)
        "duplicate_spans": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                          FROM documents),
            g0 AS (SELECT doc_id,
                          unnest(list_transform(range(1, len(ts) - 5 + 2),
                                 i -> {'pos': i,
                                       'gram': array_to_string(ts[i:i+5-1], ' ')}))
                              AS u
                   FROM toks WHERE len(ts) >= 5),
            g AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.gram FROM g0),
            dup AS (SELECT gram FROM (
                        SELECT gram, COUNT(DISTINCT doc_id) AS nd
                        FROM g GROUP BY gram) t
                    WHERE nd >= 2),
            hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
            s AS (SELECT doc_id, pos,
                         CASE WHEN pos <= COALESCE(MAX(pos) OVER (
                                    PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), -99999) + 5
                              THEN 0 ELSE 1 END AS brk
                  FROM hits),
            grp AS (SELECT doc_id, pos,
                           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos)
                               AS gid
                    FROM s)
            SELECT doc_id, MIN(pos) AS start_tok,
                   CAST(MAX(pos) + 5 - 1 AS BIGINT) AS end_tok,
                   CAST(MAX(pos) + 5 - MIN(pos) AS BIGINT) AS span_tokens
            FROM grp GROUP BY doc_id, gid
        """,
        # independent pair construction: self-join of the same unrolled
        # walks on |step diff| <= window, vs the engine's array-local plan
        "skipgram_pairs": f"""
            WITH walks AS ({_random_walks_oracle()}),
            p AS (SELECT a.node AS center, b.node AS context
                  FROM walks a JOIN walks b
                    ON a.start_node = b.start_node AND a.walk_k = b.walk_k
                   AND a.step <> b.step AND ABS(a.step - b.step) <= 2)
            SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM p GROUP BY center, context
        """,
        "ivf_ann_topk": f"""
            WITH {cosine_cte},
            cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
            assign AS (SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                                  c.cell ASC) AS rn
                FROM e CROSS JOIN cents c) WHERE rn = 1),
            probes AS (SELECT query_id, cell FROM (
                SELECT q.vec_id AS query_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY ROUND(list_cosine_similarity(q.v, c.cv), 6) DESC,
                                  c.cell ASC) AS pr
                FROM e q CROSS JOIN cents c WHERE q.vec_id < 8) WHERE pr <= 4),
            cand AS (SELECT p.query_id, a.vec_id
                     FROM probes p JOIN assign a ON p.cell = a.cell
                     WHERE a.vec_id <> p.query_id),
            scored AS (SELECT cand.query_id, cand.vec_id,
                              ROUND(list_cosine_similarity(q.v, c.v), 6) AS score
                       FROM cand
                       JOIN e q ON q.vec_id = cand.query_id
                       JOIN e c ON c.vec_id = cand.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rnk FROM scored)
            SELECT query_id, vec_id, score, rnk AS rank FROM r WHERE rnk <= 5
        """,
        "ivf_kmeans_topk": f"""
            WITH {cosine_cte},
            {_kmeans_ctes(16, 2)},
            assign AS (SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                                  c.cell ASC) AS rn
                FROM e CROSS JOIN c2 c) WHERE rn = 1),
            probes AS (SELECT query_id, cell FROM (
                SELECT q.vec_id AS query_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY ROUND(list_cosine_similarity(q.v, c.cv), 6) DESC,
                                  c.cell ASC) AS pr
                FROM e q CROSS JOIN c2 c WHERE q.vec_id < 8) WHERE pr <= 5),
            cand AS (SELECT p.query_id, a.vec_id
                     FROM probes p JOIN assign a ON p.cell = a.cell
                     WHERE a.vec_id <> p.query_id),
            scored AS (SELECT cand.query_id, cand.vec_id,
                              ROUND(list_cosine_similarity(q.v, c.v), 6) AS score
                       FROM cand
                       JOIN e q ON q.vec_id = cand.query_id
                       JOIN e c ON c.vec_id = cand.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rnk FROM scored)
            SELECT query_id, vec_id, score, rnk AS rank FROM r WHERE rnk <= 5
        """,
        "language_id": f"""
            WITH toks AS (SELECT doc_id,
                                 unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
                          FROM documents),
            hits AS (SELECT doc_id, lang, COUNT(*) AS n_hits
                     FROM toks JOIN {_stopword_values()} USING (word)
                     GROUP BY doc_id, lang),
            best AS (SELECT doc_id, lang, n_hits FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY n_hits DESC, lang ASC) AS rn FROM hits)
                WHERE rn = 1)
            SELECT d.doc_id, COALESCE(b.lang, 'und') AS pred_lang,
                   COALESCE(b.n_hits, 0) AS n_hits
            FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
        """,
        "quality_score": f"""
            WITH f AS (SELECT doc_id,
                length(text) AS n_chars,
                len(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> '')) AS n_tokens,
                len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x IN ({en_stop}))) AS n_stop,
                length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS punct,
                length(regexp_replace(text, '[^A-Z]', '', 'g')) AS upper
                FROM documents),
            r AS (SELECT doc_id, n_chars, n_tokens,
                ROUND((n_chars - (n_tokens - 1)) / GREATEST(n_tokens, 1)::DOUBLE, 6) AS mean_token_len,
                ROUND(punct / GREATEST(n_chars, 1)::DOUBLE, 6) AS punct_ratio,
                ROUND(n_stop / GREATEST(n_tokens, 1)::DOUBLE, 6) AS stopword_ratio,
                ROUND(upper / GREATEST(n_chars, 1)::DOUBLE, 6) AS upper_ratio
                FROM f)
            SELECT doc_id, n_chars, n_tokens, mean_token_len, punct_ratio,
                   stopword_ratio, upper_ratio,
                   ROUND(GREATEST(LEAST(0.5 + 0.9 * stopword_ratio
                         - 0.8 * punct_ratio - 0.5 * upper_ratio
                         + 0.1 * LEAST(n_tokens / 100.0, 1.0), 1.0), 0.0), 6)
                       AS quality_score
            FROM r
        """,
        "token_counts": """
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '')) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
            FROM documents
        """,
        "doc_fingerprint": f"""
            WITH sh AS (SELECT doc_id, {shingles_sql('text', 5)} AS shingles
                        FROM documents),
            h AS (SELECT doc_id, list_transform(shingles, s -> {h_sql('s')}) AS hs
                  FROM sh)
            SELECT doc_id, list_min(hs) AS fingerprint,
                   array_to_string(list_transform(list_sort(hs)[1:4],
                       x -> CAST(x AS VARCHAR)), ',') AS bottom_k
            FROM h
        """,
        "media_meta": f"""
            SELECT doc_id,
                   {mtype_case} AS media_type,
                   strlen(text) AS byte_len,
                   md5(text) AS content_md5,
                   CASE WHEN source IN ('src0', 'src1') THEN 'image'
                        WHEN source = 'src2' THEN 'audio'
                        WHEN source = 'src3' THEN 'video'
                        ELSE 'other' END AS modality
            FROM documents
        """,
        "media_decode": f"""
            SELECT doc_id,
                   {mtype_case} AS media_type,
                   CAST(strlen(text) AS BIGINT) AS byte_len,
                   CAST(16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) * 4
                        AS BIGINT) AS width,
                   CAST(16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) * 4
                        AS BIGINT) AS height,
                   CAST(1 + CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 64
                        AS BIGINT) AS n_frames,
                   'fake-md5' AS decoder
            FROM documents
        """,
        "frame_sample": """
            WITH m AS (SELECT doc_id,
                              1 + CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 64
                                  AS n_frames
                       FROM documents WHERE source = 'src3')
            SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
                   unnest(range(0, n_frames, 8)) AS frame_idx
            FROM m
        """,
        "payload_dedupe": f"""
            SELECT md5(text) AS content_md5,
                   {mtype_case} AS media_type,
                   MIN(doc_id) AS keeper_doc_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY 1, 2
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderstatus = 'F')
        """,
        "link_reassembly": """
            WITH links AS (
                SELECT user_id * 20 + event_id % 20 AS item_id, ts,
                       event_id AS link_id,
                       CASE event_type WHEN 'click' THEN 'alternate'
                                       WHEN 'view' THEN 'self'
                                       WHEN 'signup' THEN 'canonical'
                                       WHEN 'error' THEN 'replies'
                                       ELSE 'enclosure' END AS rel,
                       CASE WHEN event_type = 'purchase'
                            THEN 'https://cdn.example.com/f'
                                 || CAST(event_id % 7 AS VARCHAR) || '.mp3'
                            ELSE 'https://example.com/' || event_type || '/'
                                 || CAST(event_id AS VARCHAR) END AS href,
                       CASE WHEN event_type = 'purchase'
                            THEN CASE WHEN event_id % 2 = 0 THEN 'audio/mpeg'
                                      ELSE 'video/mp4' END END AS typ
                FROM events
            ),
            flagged AS (
                SELECT *,
                       ROW_NUMBER() OVER (PARTITION BY item_id, rel
                                          ORDER BY ts DESC, link_id DESC)
                           AS rn_last,
                       ROW_NUMBER() OVER (PARTITION BY item_id, rel
                                          ORDER BY ts, link_id) AS rn_first,
                       ROW_NUMBER() OVER (PARTITION BY item_id, rel, href, typ
                                          ORDER BY ts, link_id) AS rn_pair
                FROM links
            )
            SELECT item_id,
                   MAX(CASE WHEN rel = 'canonical' AND rn_last = 1
                            THEN href END) AS origlink,
                   COALESCE(MAX(CASE WHEN rel = 'alternate' AND rn_last = 1
                                     THEN href END),
                            MAX(CASE WHEN rel = 'self' AND rn_first = 1
                                     THEN href END)) AS link,
                   MAX(CASE WHEN rel = 'replies' AND rn_last = 1
                            THEN href END) AS comments,
                   STRING_AGG(CASE WHEN rel = 'enclosure' AND rn_pair = 1
                                   THEN href || '|' || typ END,
                              ',' ORDER BY ts, link_id) AS enclosures
            FROM flagged GROUP BY item_id
        """,
        "author_parse": _author_parse_oracle(),
        "precedence_dates": f"""
            WITH s AS (SELECT o_orderkey,
                CASE WHEN o_orderkey % 7 = 0 THEN strftime(o_orderdate, '%Y/%m/%d')
                     WHEN o_orderkey % 7 = 1 THEN strftime(o_orderdate, '%m-%d-%Y')
                     WHEN o_orderkey % 7 = 2 THEN strftime(o_orderdate, '%d.%m.%Y')
                     WHEN o_orderkey % 7 = 3 THEN strftime(o_orderdate, '%a, %d %b %Y')
                                                  || ' 15:04:05 +0530'
                     WHEN o_orderkey % 7 = 4 THEN strftime(o_orderdate, '%Y-%m-%d')
                                                  || 'T08:30:00-04:00'
                     WHEN o_orderkey % 7 = 5 THEN strftime(o_orderdate, '%a, %d %b %y')
                                                  || ' 15:04:05 PST'
                     ELSE strftime(o_orderdate, '%d %b %Y') || ' 16:45:00 EST'
                     END AS date_str
                FROM orders),
            -- textual normalization replicated from the Spark side: strip
            -- the weekday, swap ECMA-262 named zones for their fixed
            -- offsets, expand 2-digit years by the JS >=50 -> 19yy rule
            n AS (SELECT o_orderkey, date_str,
                         regexp_replace(
                           regexp_replace(
                             {_js_zone_replace_sql("regexp_replace(date_str, '^[A-Za-z]{3}, ', '')")},
                             '^([0-9]{{1,2}} [A-Za-z]{{3}} )([5-9][0-9])( )',
                             '\\119\\2\\3'),
                           '^([0-9]{{1,2}} [A-Za-z]{{3}} )([0-4][0-9])( )',
                           '\\120\\2\\3') AS named
                  FROM s)
            SELECT o_orderkey, date_str,
                   COALESCE(try_strptime(date_str, '%Y/%m/%d'),
                            try_strptime(date_str, '%m-%d-%Y'),
                            try_strptime(date_str, '%d.%m.%Y'),
                            try_strptime(named, '%d %b %Y %H:%M:%S %z')
                                AT TIME ZONE 'UTC',
                            try_strptime(date_str, '%Y-%m-%dT%H:%M:%S%z')
                                AT TIME ZONE 'UTC') AS pubdate
            FROM n
        """,
        "scalar_chains": """
            WITH g AS (SELECT p_partkey, p_brand, p_size, p_type,
                CASE WHEN p_partkey % 5 = 0
                     THEN 'https://parts.example/' || p_partkey
                     ELSE 'urn:part:' || p_partkey END AS guid,
                CASE WHEN p_partkey % 3 = 0 THEN 'false'
                     WHEN p_partkey % 3 = 1 THEN 'True' END AS ispermalink_attr
                FROM part)
            SELECT p_partkey,
                   concat_ws(' ', p_brand, 'v' || p_size, '(' || p_type || ')')
                       AS generator,
                   guid,
                   CASE WHEN regexp_matches(guid, '^https?:') THEN guid END AS link,
                   ispermalink_attr,
                   CASE WHEN NOT COALESCE(lower(ispermalink_attr) LIKE '%false%',
                                          FALSE)
                        THEN guid END AS permalink
            FROM g
        """,
        "explode_distinct": """
            SELECT p_partkey,
                   array_to_string(list_sort(list_distinct(list_concat(
                       string_split(p_name, ' '), string_split(p_type, ' ')))),
                       ',') AS categories
            FROM part
        """,
        "forward_fill": """
            SELECT event_id, user_id,
                   ROUND(last_value(CASE WHEN event_type = 'purchase'
                                         THEN value END IGNORE NULLS)
                         OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         4) AS last_purchase_value
            FROM events
        """,
        "set_except": """
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'purchase'
        """,
        "rollup_revenue": """
            SELECT r_name, n_name, COUNT(*) AS n_customers,
                   ROUND(SUM(c_acctbal), 4) AS total_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "whitespace_hoist": """
            SELECT doc_id,
                   NULLIF(TRIM(CASE WHEN doc_id % 7 = 0 THEN '   '
                               ELSE '  ' || lang || ' ' END), '') AS hoisted_lang
            FROM documents
        """,
        "ordered_collect": """
            SELECT user_id,
                   array_to_string(
                       list(event_type ORDER BY ts ASC, event_id ASC)[1:5],
                       ',') AS first_events
            FROM events GROUP BY user_id
        """,
        "map_normalize": """
            SELECT p_partkey,
                   array_to_string(list_sort([
                       'brand=' || p_brand,
                       'type=' || p_type
                   ]), ';') AS attrs,
                   '<item ' || array_to_string(list_sort([
                       'brand="' || p_brand || '"',
                       'type="' || p_type || '"'
                   ]), ' ') || '/>' AS serialized
            FROM part
        """,
        "url_resolve": """
            WITH s AS (
                SELECT event_id,
                       CASE WHEN event_id % 13 <> 0
                            THEN 'https://u' || user_id || '.example/a/b/'
                       END AS base_url,
                       CASE event_id % 7
                            WHEN 0 THEN '../c' || event_id
                            WHEN 1 THEN './d' || event_id
                            WHEN 2 THEN 'e' || event_id
                            WHEN 3 THEN '/f' || event_id
                            WHEN 4 THEN 'https://cdn.example/g' || event_id
                            WHEN 5 THEN 'urn:item:' || event_id
                            ELSE '' END AS url,
                       'https://u' || user_id || '.example' AS origin
                FROM events)
            SELECT event_id, base_url, url,
                   CASE WHEN base_url IS NULL OR url = '' THEN url
                        WHEN event_id % 7 = 0 THEN origin || '/a/c' || event_id
                        WHEN event_id % 7 = 1 THEN origin || '/a/b/d' || event_id
                        WHEN event_id % 7 = 2 THEN origin || '/a/b/e' || event_id
                        WHEN event_id % 7 = 3 THEN origin || '/f' || event_id
                        ELSE url END AS resolved
            FROM s
        """,
        "retro_resolve": """
            WITH u AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN event_type = 'signup'
                            THEN 'https://u' || user_id || '.example/s'
                                 || event_id || '/'
                            WHEN event_id % 3 = 0 THEN '../r' || event_id
                            WHEN event_id % 3 = 1 THEN 'p' || event_id
                            ELSE '/q' || event_id END AS url,
                       event_type = 'signup' AS is_abs
                FROM events),
            base AS (
                SELECT user_id, url AS base_url, event_id AS base_event
                FROM (SELECT user_id, url, event_id,
                             ROW_NUMBER() OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS rn
                      FROM u WHERE is_abs) WHERE rn = 1)
            SELECT u.event_id, u.user_id, u.url, b.base_url,
                   CASE WHEN b.base_url IS NULL OR u.is_abs THEN u.url
                        WHEN u.event_id % 3 = 0
                        THEN 'https://u' || u.user_id || '.example/r' || u.event_id
                        WHEN u.event_id % 3 = 1
                        THEN b.base_url || 'p' || u.event_id
                        ELSE 'https://u' || u.user_id || '.example/q' || u.event_id
                        END AS resolved_url
            FROM u LEFT JOIN base b ON u.user_id = b.user_id
        """,
        "salted_group_stats": """
            SELECT CAST(user_id AS VARCHAR) AS user_id,
                   COUNT(*) AS n_events,
                   CAST(SUM(strlen(event_type)) AS BIGINT) AS n_chars,
                   CAST(COUNT(props) AS BIGINT) AS n_with_props,
                   CAST(MAX(event_id) AS INT) AS max_event_id
            FROM events GROUP BY user_id
        """,
        "embedded_html_dispatch": """
            WITH s AS (SELECT event_id,
                (['content:encoded','description','summary','tagline',
                  'content','title','subtitle','link'])[CAST(event_id % 8 AS INT) + 1]
                    AS field_name,
                CASE user_id % 4 WHEN 0 THEN 'html' WHEN 1 THEN 'xhtml'
                                 WHEN 2 THEN 'text' END AS type_attr,
                'http://b' || (user_id % 5) || '.example' AS origin
            FROM events),
            r AS (SELECT *,
                COALESCE(field_name IN ('content:encoded','description',
                                        'summary','tagline')
                         OR (field_name IN ('content','title','subtitle','rights')
                             AND type_attr IN ('html','xhtml')), FALSE) AS routed
            FROM s)
            SELECT event_id, field_name, type_attr, routed,
                   CASE WHEN routed
                        THEN 'say <a href="' || origin || '/e' || event_id || '">go</a>'
                        ELSE 'say <a href="/e' || event_id || '">go</a>'
                   END AS out_text
            FROM r
        """,
        "sessionize": """
            WITH o AS (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sid AS (
                SELECT user_id, ts, value,
                       SUM(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - 1 AS session_id
                FROM o)
            SELECT user_id,
                   CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   ROUND(SUM(value), 4) AS total_value
            FROM sid GROUP BY user_id, session_id
        """,
        "click_attribution": """
            WITH p AS (SELECT event_id, user_id, ts
                       FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts, MAX(event_id) AS click_event_id
                  FROM events WHERE event_type = 'click'
                  GROUP BY user_id, ts)
            SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
                   c.ts AS click_ts, c.click_event_id,
                   epoch_us(p.ts) - epoch_us(c.ts) AS micros_since_click
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "triangle_count": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p,
                               's' || l_suppkey AS s
                        FROM lineitem WHERE l_quantity > 47),
            und AS (SELECT DISTINCT a.s AS u, b.s AS v
                    FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
            nodes AS (SELECT u AS node FROM und UNION SELECT v FROM und),
            tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                    FROM und e1
                    JOIN und e2 ON e2.u = e1.v
                    JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
            per AS (SELECT node, COUNT(*) AS t
                    FROM (SELECT a AS node FROM tri
                          UNION ALL SELECT b FROM tri
                          UNION ALL SELECT c FROM tri)
                    GROUP BY node)
            SELECT n.node, CAST(COALESCE(per.t, 0) AS BIGINT) AS triangles
            FROM nodes n LEFT JOIN per ON n.node = per.node
        """,
        "clustering_coeff": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p,
                               's' || l_suppkey AS s
                        FROM lineitem WHERE l_quantity > 47),
            und AS (SELECT DISTINCT a.s AS u, b.s AS v
                    FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
            nodes AS (SELECT u AS node FROM und UNION SELECT v FROM und),
            tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                    FROM und e1
                    JOIN und e2 ON e2.u = e1.v
                    JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
            per AS (SELECT node, COUNT(*) AS t
                    FROM (SELECT a AS node FROM tri
                          UNION ALL SELECT b FROM tri
                          UNION ALL SELECT c FROM tri)
                    GROUP BY node),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM (SELECT u AS node FROM und
                          UNION ALL SELECT v FROM und)
                    GROUP BY node)
            SELECT n.node, deg.deg,
                   CAST(COALESCE(per.t, 0) AS BIGINT) AS triangles,
                   ROUND(CASE WHEN deg.deg >= 2
                              THEN 2.0 * COALESCE(per.t, 0)
                                   / (deg.deg * (deg.deg - 1))
                              ELSE 0.0 END, 6) AS coeff
            FROM nodes n
            LEFT JOIN per ON n.node = per.node
            JOIN deg ON n.node = deg.node
        """,
        "ktruss": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p,
                               's' || l_suppkey AS s
                        FROM lineitem WHERE l_quantity > 47),
            e0 AS (SELECT DISTINCT a.s AS u, b.s AS v
                   FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
            t1 AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                   FROM e0 e1
                   JOIN e0 e2 ON e2.u = e1.v
                   JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
            s1 AS (SELECT u, v, COUNT(*) AS s FROM
                   (SELECT a AS u, b AS v FROM t1
                    UNION ALL SELECT a, c FROM t1
                    UNION ALL SELECT b, c FROM t1) GROUP BY 1, 2),
            e1r AS (SELECT e0.u, e0.v FROM e0 JOIN s1 USING (u, v)
                    WHERE s1.s >= 2),
            t2 AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                   FROM e1r e1
                   JOIN e1r e2 ON e2.u = e1.v
                   JOIN e1r e3 ON e3.u = e1.u AND e3.v = e2.v),
            s2 AS (SELECT u, v, COUNT(*) AS s FROM
                   (SELECT a AS u, b AS v FROM t2
                    UNION ALL SELECT a, c FROM t2
                    UNION ALL SELECT b, c FROM t2) GROUP BY 1, 2)
            SELECT e1r.u AS node_a, e1r.v AS node_b,
                   CAST(s2.s AS BIGINT) AS support
            FROM e1r JOIN s2 USING (u, v)
            WHERE s2.s >= 2
        """,
        "assortativity": """
            WITH e AS (SELECT DISTINCT 's' || l_suppkey AS a,
                              'p' || l_partkey AS b
                       FROM lineitem),
            und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
                    FROM e WHERE a <> b),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM (SELECT u AS node FROM und
                          UNION ALL SELECT v FROM und) GROUP BY 1),
            sym AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v
                    FROM und),
            j AS (SELECT du.deg AS ju, dv.deg AS jv
                  FROM sym JOIN deg du ON sym.u = du.node
                           JOIN deg dv ON sym.v = dv.node),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                         CAST(SUM(ju * jv) AS BIGINT) AS sjk,
                         CAST(SUM(ju) AS BIGINT) AS sj,
                         CAST(SUM(ju * ju) AS BIGINT) AS sj2
                  FROM j)
            SELECT CASE WHEN m2 * sj2 - sj * sj <> 0
                        THEN ROUND((m2 * sjk - sj * sj)
                                   / (m2 * sj2 - sj * sj), 6)
                   END AS assortativity,
                   CAST(m2 / 2 AS BIGINT) AS n_edges
            FROM s
        """,
        "reciprocity": """
            WITH e AS (
                SELECT DISTINCT 's' || l_suppkey AS s, 'p' || l_partkey AS d
                FROM lineitem WHERE l_returnflag = 'N'
                UNION
                SELECT DISTINCT 'p' || l_partkey, 's' || l_suppkey
                FROM lineitem WHERE l_returnflag = 'R'),
            mut AS (SELECT e.s, e.d,
                           CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END AS m
                    FROM e LEFT JOIN e r ON e.s = r.d AND e.d = r.s)
            SELECT ROUND(SUM(m) / COUNT(*), 6) AS reciprocity,
                   CAST(COUNT(*) AS BIGINT) AS n_edges,
                   CAST(SUM(m) AS BIGINT) AS n_mutual
            FROM mut
        """,
        "khop_reach": """
            WITH e AS (
                SELECT 'c' || o_custkey AS src, 'o' || o_orderkey AS dst
                FROM orders
                UNION ALL
                SELECT DISTINCT 'o' || l_orderkey, 'p' || l_partkey
                FROM lineitem
                UNION ALL
                SELECT DISTINCT 'p' || l_partkey, 's' || l_suppkey
                FROM lineitem),
            s0 AS (SELECT DISTINCT 'c' || c_custkey AS node
                   FROM customer WHERE c_custkey % 89 = 0),
            h1 AS (SELECT DISTINCT e.dst AS node FROM e JOIN s0 ON e.src = s0.node),
            h2 AS (SELECT DISTINCT e.dst AS node FROM e JOIN h1 ON e.src = h1.node),
            h3 AS (SELECT DISTINCT e.dst AS node FROM e JOIN h2 ON e.src = h2.node),
            lv AS (SELECT node, 0 AS d FROM s0
                   UNION ALL SELECT node, 1 FROM h1
                   UNION ALL SELECT node, 2 FROM h2
                   UNION ALL SELECT node, 3 FROM h3)
            SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM lv GROUP BY node
        """,
        "label_propagation": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p,
                               's' || l_suppkey AS s
                        FROM lineitem WHERE l_quantity > 49),
            und AS (SELECT DISTINCT a.s AS u, b.s AS v
                    FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
            nb AS (SELECT u, v FROM und UNION SELECT v, u FROM und),
            l0 AS (SELECT DISTINCT u AS node, u AS label FROM nb),
            v1 AS (SELECT nb.u AS node, l.label, COUNT(*) AS cnt
                   FROM nb JOIN l0 l ON nb.v = l.node GROUP BY 1, 2),
            l1 AS (SELECT node, label FROM (
                       SELECT node, label,
                              ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rn
                       FROM v1) WHERE rn = 1),
            v2 AS (SELECT nb.u AS node, l.label, COUNT(*) AS cnt
                   FROM nb JOIN l1 l ON nb.v = l.node GROUP BY 1, 2),
            l2 AS (SELECT node, label FROM (
                       SELECT node, label,
                              ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rn
                       FROM v2) WHERE rn = 1)
            SELECT node, label FROM l2
        """,
        "kg_snapshot_diff": """
            WITH li AS (SELECT l_orderkey, l_partkey, l_quantity FROM lineitem),
            old AS (SELECT 'c' || o.o_custkey AS src_id,
                           'p' || li.l_partkey AS dst_id,
                           ROUND(SUM(li.l_quantity), 2) AS old_weight
                    FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
                    WHERE o.o_orderdate < DATE '1999-01-01'
                    GROUP BY 1, 2),
            new AS (SELECT 'c' || o.o_custkey AS src_id,
                           'p' || li.l_partkey AS dst_id,
                           ROUND(SUM(li.l_quantity), 2) AS new_weight
                    FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
                    WHERE o.o_orderdate >= DATE '1996-01-01'
                    GROUP BY 1, 2)
            SELECT COALESCE(old.src_id, new.src_id) AS src_id,
                   COALESCE(old.dst_id, new.dst_id) AS dst_id,
                   old_weight, new_weight,
                   CASE WHEN old_weight IS NULL THEN 'added'
                        WHEN new_weight IS NULL THEN 'removed'
                        WHEN old_weight = new_weight THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM old FULL OUTER JOIN new
              ON old.src_id = new.src_id AND old.dst_id = new.dst_id
            WHERE CASE WHEN old_weight IS NULL THEN 'added'
                       WHEN new_weight IS NULL THEN 'removed'
                       WHEN old_weight = new_weight THEN 'unchanged'
                       ELSE 'changed' END <> 'unchanged'
        """,
        "kg_components": """
            WITH RECURSIVE c AS (SELECT CAST(c_custkey AS BIGINT) AS k,
                              c_nationkey AS nk
                       FROM customer),
            e0 AS (SELECT a.k AS src, b.k AS dst
                   FROM c a JOIN c b ON b.k = a.k + 1 AND a.nk = b.nk),
            edges AS (SELECT src AS a, dst AS b FROM e0
                      UNION SELECT dst, src FROM e0),
            reach(node, r) AS (
                SELECT a, b FROM edges
                UNION
                SELECT reach.node, edges.b
                FROM reach JOIN edges ON reach.r = edges.a),
            comp AS (SELECT node, LEAST(node, MIN(r)) AS component
                     FROM reach GROUP BY node)
            SELECT cc.k AS node, COALESCE(comp.component, cc.k) AS component
            FROM c cc LEFT JOIN comp ON cc.k = comp.node
        """,
        "scc": """
            WITH RECURSIVE b AS (
                SELECT CAST(c_custkey AS BIGINT) AS ck, c_nationkey AS nk,
                       ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                          ORDER BY c_custkey) - 1 AS rn
                FROM customer),
            bb AS (SELECT ck, nk, CAST(rn // 6 AS BIGINT) AS blk,
                          rn % 6 AS pos
                   FROM b),
            bs AS (SELECT *, COUNT(*) OVER (PARTITION BY nk, blk) AS bsz
                   FROM bb),
            ring AS (SELECT a.ck AS src, c.ck AS dst
                     FROM bs a JOIN bs c
                     ON a.nk = c.nk AND a.blk = c.blk
                        AND c.pos = (a.pos + 1) % a.bsz),
            mins AS (SELECT nk, blk, MIN(ck) AS mck FROM bb GROUP BY nk, blk),
            cross_e AS (SELECT hi.mck AS src, lo.mck AS dst
                        FROM mins hi JOIN mins lo
                        ON hi.nk = lo.nk AND hi.blk = lo.blk + 1),
            edges AS (SELECT DISTINCT src, dst
                      FROM (SELECT * FROM ring UNION ALL SELECT * FROM cross_e)
                      WHERE src <> dst),
            reach(src, dst) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
            mutual AS (SELECT r1.src AS node, MIN(r1.dst) AS mn
                       FROM reach r1 JOIN reach r2
                       ON r1.src = r2.dst AND r1.dst = r2.src
                       GROUP BY r1.src)
            SELECT bb.ck AS node,
                   CAST(LEAST(bb.ck, COALESCE(mutual.mn, bb.ck)) AS BIGINT)
                       AS scc_id
            FROM bb LEFT JOIN mutual ON bb.ck = mutual.node
        """,
        "link_calibrate": """
            WITH e AS (
                SELECT 's' || l_suppkey AS src_id,
                       l_returnflag AS pred,
                       'p' || l_partkey AS dst_id,
                       ROUND(CAST(SUM(l_quantity) AS DOUBLE), 6) AS weight
                FROM lineitem GROUP BY 1, 2, 3),
            st AS (SELECT pred, MIN(weight) AS wmin, MAX(weight) AS wmax
                   FROM e GROUP BY pred)
            SELECT e.src_id, e.pred, e.dst_id, e.weight,
                   ROUND(CASE WHEN st.wmax = st.wmin THEN 1.0
                              ELSE (e.weight - st.wmin)
                                   / (st.wmax - st.wmin) END,
                         6) AS confidence
            FROM e JOIN st ON e.pred IS NOT DISTINCT FROM st.pred
        """,
        "pagerank": """
            WITH e AS (
                SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst,
                       CAST(SUM(l_quantity) AS DOUBLE) AS w
                FROM lineitem GROUP BY 1, 2),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
            outs AS (SELECT src, SUM(w) AS out_w FROM e GROUP BY src),
            ef AS (SELECT e.src, e.dst, e.w / o.out_w AS frac
                   FROM e JOIN outs o ON e.src = o.src),
            r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
            d0 AS (SELECT COALESCE(SUM(r.rank), 0) AS m FROM r0 r
                   LEFT JOIN outs o ON r.node = o.src WHERE o.src IS NULL),
            c1 AS (SELECT ef.dst AS node, SUM(r.rank * ef.frac) AS c
                   FROM ef JOIN r0 r ON ef.src = r.node GROUP BY ef.dst),
            r1 AS (SELECT nd.node,
                          0.15 / (SELECT n FROM nn)
                          + 0.85 * (COALESCE(c1.c, 0)
                                    + (SELECT m FROM d0) / (SELECT n FROM nn))
                              AS rank
                   FROM nodes nd LEFT JOIN c1 ON nd.node = c1.node),
            d1 AS (SELECT COALESCE(SUM(r.rank), 0) AS m FROM r1 r
                   LEFT JOIN outs o ON r.node = o.src WHERE o.src IS NULL),
            c2 AS (SELECT ef.dst AS node, SUM(r.rank * ef.frac) AS c
                   FROM ef JOIN r1 r ON ef.src = r.node GROUP BY ef.dst),
            r2 AS (SELECT nd.node,
                          0.15 / (SELECT n FROM nn)
                          + 0.85 * (COALESCE(c2.c, 0)
                                    + (SELECT m FROM d1) / (SELECT n FROM nn))
                              AS rank
                   FROM nodes nd LEFT JOIN c2 ON nd.node = c2.node)
            SELECT node, ROUND(rank, 6) AS rank FROM r2
        """,
        "type_spread": """
            WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_nationkey AS nk
                       FROM customer),
            e0 AS (SELECT a.k AS u, b.k AS v FROM c a JOIN c b ON b.k = a.k + 1),
            sym AS (SELECT DISTINCT u, v FROM
                    (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v
                     FROM e0) WHERE u <> v),
            nodes AS (SELECT DISTINCT u AS node FROM sym),
            sd AS (SELECT k AS node, 'n' || nk AS type FROM c
                   WHERE k % 29 = 0),
            v1 AS (SELECT s.u AS node, l.type, COUNT(*) AS cnt
                   FROM sym s JOIN sd l ON s.v = l.node GROUP BY 1, 2),
            n1 AS (SELECT node, type FROM
                   (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
                        ORDER BY cnt DESC, type ASC) AS rn FROM v1)
                   WHERE rn = 1),
            l1 AS (SELECT * FROM sd
                   UNION ALL
                   SELECT n1.node, n1.type FROM n1 LEFT JOIN sd
                   ON n1.node = sd.node WHERE sd.node IS NULL),
            v2 AS (SELECT s.u AS node, l.type, COUNT(*) AS cnt
                   FROM sym s JOIN l1 l ON s.v = l.node GROUP BY 1, 2),
            n2 AS (SELECT node, type FROM
                   (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
                        ORDER BY cnt DESC, type ASC) AS rn FROM v2)
                   WHERE rn = 1),
            l2 AS (SELECT * FROM sd
                   UNION ALL
                   SELECT n2.node, n2.type FROM n2 LEFT JOIN sd
                   ON n2.node = sd.node WHERE sd.node IS NULL),
            allnodes AS (SELECT node FROM nodes
                         UNION SELECT node FROM sd)
            SELECT a.node, l2.type
            FROM allnodes a LEFT JOIN l2 ON a.node = l2.node
        """,
        "ppr": """
            WITH e AS (
                SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst,
                       CAST(SUM(l_quantity) AS DOUBLE) AS w
                FROM lineitem GROUP BY 1, 2),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            seeds AS (SELECT DISTINCT 's' || l_suppkey AS node
                      FROM lineitem WHERE l_suppkey <= 10),
            ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM seeds),
            sv AS (SELECT n.node,
                          CASE WHEN s.node IS NOT NULL
                               THEN 1.0 / (SELECT k FROM ns)
                               ELSE 0.0 END AS s
                   FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
            outs AS (SELECT src, SUM(w) AS out_w FROM e GROUP BY src),
            ef AS (SELECT e.src, e.dst, e.w / o.out_w AS frac
                   FROM e JOIN outs o ON e.src = o.src),
            r0 AS (SELECT node, s AS rank FROM sv),
            d0 AS (SELECT COALESCE(SUM(r.rank), 0) AS m FROM r0 r
                   LEFT JOIN outs o ON r.node = o.src WHERE o.src IS NULL),
            c1 AS (SELECT ef.dst AS node, SUM(r.rank * ef.frac) AS c
                   FROM ef JOIN r0 r ON ef.src = r.node GROUP BY ef.dst),
            r1 AS (SELECT sv.node,
                          0.15 * sv.s
                          + 0.85 * (COALESCE(c1.c, 0)
                                    + (SELECT m FROM d0) * sv.s) AS rank
                   FROM sv LEFT JOIN c1 ON sv.node = c1.node),
            d1 AS (SELECT COALESCE(SUM(r.rank), 0) AS m FROM r1 r
                   LEFT JOIN outs o ON r.node = o.src WHERE o.src IS NULL),
            c2 AS (SELECT ef.dst AS node, SUM(r.rank * ef.frac) AS c
                   FROM ef JOIN r1 r ON ef.src = r.node GROUP BY ef.dst),
            r2 AS (SELECT sv.node,
                          0.15 * sv.s
                          + 0.85 * (COALESCE(c2.c, 0)
                                    + (SELECT m FROM d1) * sv.s) AS rank
                   FROM sv LEFT JOIN c2 ON sv.node = c2.node)
            SELECT node, ROUND(rank, 6) AS rank FROM r2
        """,
        "xhtml_reserialize": """
            SELECT doc_id,
                   '<div id="d' || doc_id || '" class="c' || (doc_id % 5) || '">'
                   || substr(text, 1, 24)
                   || CASE WHEN doc_id % 3 >= 1 THEN
                        '<span lang="' || lang || '">' || substr(text, 25, 12)
                        || CASE WHEN doc_id % 3 = 2
                                THEN '<em>' || substr(text, 37, 6) || '</em>'
                                ELSE '' END
                        || '</span>'
                      ELSE '' END
                   || '</div> ' || source AS serialized
            FROM documents
        """,
        "html_uri_resolve": """
            WITH s AS (SELECT doc_id, lang,
                              'https://h' || (doc_id % 10) || '.example' AS o,
                              'https://h' || (doc_id % 10) || '.example/dir/' AS d
                       FROM documents)
            SELECT doc_id, d AS base_url,
                   '<a href="' || o || '/doc' || doc_id || '">' || lang
                   || '</a> <img src=' || d || 'img' || doc_id
                   || '.png srcset="' || d || 'a' || doc_id
                   || '.png 1x, ' || o || '/b' || doc_id
                   || '.png 2x"> <foo href="/skip">' AS resolved_html
            FROM s
        """,
        "near_dup_groups": f"""
            WITH RECURSIVE sh AS (
                SELECT doc_id, {shingles_sql('text', 3)} AS shingles
                FROM documents),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
                      / len(list_distinct(list_concat(a.shingles, b.shingles)))
                      >= 0.8),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach(node, r) AS (
                SELECT a, b FROM edges
                UNION
                SELECT reach.node, edges.b
                FROM reach JOIN edges ON reach.r = edges.a),
            comp AS (
                SELECT node, LEAST(node, MIN(r)) AS group_id
                FROM reach GROUP BY node)
            SELECT d.doc_id,
                   COALESCE(c.group_id, d.doc_id) AS group_id,
                   COALESCE(c.group_id, d.doc_id) = d.doc_id AS is_keeper
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
        """,
        "repetition_metrics": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
            g AS (SELECT doc_id, t,
                         CASE WHEN len(t) >= 3
                              THEN list_transform(range(1, len(t) - 3 + 2),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                              ELSE [] END AS grams
                  FROM toks),
            local AS (
                SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
                       ROUND(len(list_distinct(t))::DOUBLE / len(t), 6)
                           AS distinct_token_frac,
                       CASE WHEN len(grams) > 0
                            THEN ROUND(1 - len(list_distinct(grams))::DOUBLE
                                           / len(grams), 6)
                            ELSE 0.0 END AS dup_kgram_frac
                FROM g),
            modal AS (
                SELECT doc_id,
                       ROUND(MAX(n)::DOUBLE / SUM(n), 6) AS top_token_frac
                FROM (SELECT doc_id, tok, COUNT(*) AS n
                      FROM (SELECT doc_id,
                                   unnest(string_split(text, ' ')) AS tok
                            FROM documents)
                      GROUP BY doc_id, tok)
                GROUP BY doc_id)
            SELECT doc_id, n_tokens, distinct_token_frac, dup_kgram_frac,
                   top_token_frac
            FROM local JOIN modal USING (doc_id)
        """,
        "token_budget_sample": f"""
            WITH base AS (
                SELECT doc_id, lang,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                       {portable_hash60_sql_("CAST(doc_id AS VARCHAR)")} AS h
                FROM documents),
            cum AS (
                SELECT doc_id, lang, n_tokens,
                       CAST(SUM(n_tokens) OVER (
                            PARTITION BY lang
                            ORDER BY h % 32, h, doc_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                FROM base)
            SELECT doc_id, lang, n_tokens, cum_tokens
            FROM cum WHERE cum_tokens <= 5000
        """,
        "pii_scrub": f"""
            WITH aug AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 11 = 0
                               THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                    || '@mail.example.com'
                               ELSE '' END
                       || CASE WHEN doc_id % 13 = 0
                               THEN ' call +1-555-0100-1234'
                               ELSE '' END AS text2
                FROM documents)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text2, '{EMAIL_RE_}')) AS BIGINT)
                       AS n_emails,
                   CAST(len(regexp_extract_all(text2, '{PHONE_RE_}')) AS BIGINT)
                       AS n_phones,
                   regexp_replace(
                       regexp_replace(text2, '{EMAIL_RE_}', '<EMAIL>', 'g'),
                       '{PHONE_RE_}', '<PHONE>', 'g') AS clean_text
            FROM aug
        """,
        "decontaminate": f"""
            WITH ev AS (
                SELECT DISTINCT unnest({shingles_sql('text', 3)}) AS g
                FROM documents WHERE doc_id % 97 = 0),
            dg AS (
                SELECT doc_id, unnest({shingles_sql('text', 3)}) AS g
                FROM documents),
            hits AS (
                SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
                FROM dg JOIN ev USING (g) GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(h.n_overlap, 0) AS n_overlap,
                   COALESCE(h.n_overlap, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        "decontaminate_multi": f"""
            WITH ev AS (
                SELECT DISTINCT eval_set, g FROM (
                    SELECT 'suiteA' AS eval_set,
                           unnest({shingles_sql('text', 3)}) AS g
                    FROM documents WHERE doc_id % 97 = 0
                    UNION ALL
                    SELECT 'suiteB' AS eval_set,
                           unnest({shingles_sql('text', 3)}) AS g
                    FROM documents WHERE doc_id % 89 = 0) t),
            dg AS (
                SELECT doc_id, unnest({shingles_sql('text', 3)}) AS g
                FROM documents)
            SELECT doc_id, eval_set, CAST(COUNT(*) AS BIGINT) AS n_overlap
            FROM dg JOIN ev USING (g) GROUP BY doc_id, eval_set
        """,
        "mixture_weights": """
            WITH per AS (
                SELECT source, COUNT(*) AS n_docs,
                       CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                           AS n_tokens
                FROM documents GROUP BY source),
            p AS (SELECT source, n_docs, n_tokens,
                         n_tokens::DOUBLE / (SELECT SUM(n_tokens) FROM per) AS p
                  FROM per)
            SELECT source, n_docs, n_tokens,
                   ROUND(p, 6) AS token_share,
                   ROUND(pow(p, 0.3) / (SELECT SUM(pow(p, 0.3)) FROM p), 6)
                       AS mix_weight
            FROM p
        """,
        # boundaries embed the Spark side's EXACT accumulated Python floats
        # (0.8, then 0.8+0.1 = 0.9000000000000001): FLOOR(cum * n) must be
        # computed on bit-identical doubles in both engines or an n where
        # cum*n lands on an integer boundary flips a doc between splits
        "stratified_split": f"""
            WITH base AS (
                SELECT doc_id, lang,
                       {portable_hash60_sql_("CAST(doc_id AS VARCHAR)", 7)} AS h
                FROM documents),
            r AS (
                SELECT doc_id, lang,
                       CAST(ROW_NUMBER() OVER (
                            PARTITION BY lang
                            ORDER BY h % 32, h, doc_id) AS BIGINT) AS rank,
                       COUNT(*) OVER (PARTITION BY lang) AS n
                FROM base)
            SELECT doc_id, lang AS stratum, rank,
                   CASE WHEN rank <= FLOOR({0.8!r} * n) THEN 'train'
                        WHEN rank <= FLOOR({0.8 + 0.1!r} * n) THEN 'val'
                        ELSE 'test' END AS split
            FROM r
        """,
        "tfidf_topk": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS token
                FROM documents),
            tf AS (SELECT doc_id, token, COUNT(*) AS n_tf
                   FROM tok GROUP BY doc_id, token),
            df AS (SELECT token, COUNT(*) AS n_df FROM tf GROUP BY token),
            n AS (SELECT COUNT(*) AS n_docs FROM documents),
            s AS (SELECT tf.doc_id, tf.token,
                         ROUND(tf.n_tf * ln(CAST(n.n_docs AS DOUBLE) / df.n_df),
                               6) AS tfidf
                  FROM tf JOIN df USING (token) CROSS JOIN n),
            r AS (SELECT doc_id, token, tfidf,
                         CAST(ROW_NUMBER() OVER (
                              PARTITION BY doc_id
                              ORDER BY tfidf DESC, token ASC) AS BIGINT) AS rank
                  FROM s)
            SELECT doc_id, token, tfidf, rank FROM r WHERE rank <= 3
        """,
        # compares on the line STRING (the engine counts 60-bit line hashes;
        # a collision would surface here as a value mismatch)
        "boilerplate_scrub": """
            WITH aug AS (
                SELECT doc_id,
                       '=== ' || source || ' newsletter ===' || chr(10) ||
                       text || chr(10) ||
                       CASE WHEN doc_id % 7 = 0
                            THEN 'subscribe at example.com/news'
                            ELSE 'footer ' || CAST(doc_id AS VARCHAR)
                       END AS text
                FROM documents),
            d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug),
            l0 AS (SELECT doc_id,
                          unnest(list_transform(ls, (x, i) -> {'l': x, 'p': i}))
                              AS u
                   FROM d),
            l AS (SELECT doc_id, u.l AS line, CAST(u.p AS BIGINT) - 1 AS pos
                  FROM l0),
            freq AS (SELECT line FROM (
                        SELECT line, COUNT(DISTINCT doc_id) AS n
                        FROM l GROUP BY line) t
                     WHERE n >= 5),
            m AS (SELECT l.doc_id, l.pos, l.line, f.line IS NOT NULL AS boiler
                  FROM l LEFT JOIN freq f ON l.line = f.line)
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_boilerplate,
                   COALESCE(string_agg(CASE WHEN NOT boiler THEN line END,
                                       chr(10) ORDER BY pos), '')
                       AS clean_text
            FROM m GROUP BY doc_id
        """,
    }
    # composed independently from the two retrieval oracles it fuses
    d["rrf_fusion"] = f"""
        WITH a AS ({d['embedding_topk']}),
        b AS ({d['ivf_ann_topk']}),
        u AS (SELECT query_id, vec_id, rank FROM a
              UNION ALL SELECT query_id, vec_id, rank FROM b),
        s AS (SELECT query_id, vec_id,
                     ROUND(SUM(1.0 / (60 + rank)), 6) AS rrf_score
              FROM u GROUP BY query_id, vec_id),
        r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rrf_score DESC, vec_id ASC) AS BIGINT) AS rnk
              FROM s)
        SELECT query_id, vec_id, rrf_score, rnk AS rank FROM r WHERE rnk <= 5
    """
    # composed from the same two retrieval oracles; ground truth re-filtered
    # to the ANN lane's vec_id<8 query set (assert guards against the
    # brute-force oracle's literal drifting)
    _gt_sql = d["embedding_topk"].replace("q.vec_id < 10", "q.vec_id < 8")
    assert _gt_sql != d["embedding_topk"], "embedding_topk filter moved"
    d["ann_recall_eval"] = f"""
        WITH gt AS ({_gt_sql}),
        ann AS ({d['ivf_ann_topk']}),
        hits AS (SELECT g.query_id, CAST(COUNT(a.vec_id) AS BIGINT) AS n_hit
                 FROM gt g LEFT JOIN ann a
                   ON a.query_id = g.query_id AND a.vec_id = g.vec_id
                 GROUP BY 1),
        top1 AS (SELECT query_id, vec_id FROM gt WHERE rank = 1),
        mrr AS (SELECT t.query_id,
                       COALESCE(MAX(1.0 / a.rank), 0.0) AS rr
                FROM top1 t LEFT JOIN ann a
                  ON a.query_id = t.query_id AND a.vec_id = t.vec_id
                GROUP BY 1)
        SELECT h.query_id, h.n_hit,
               ROUND(h.n_hit / 5.0, 6) AS recall_at_5,
               ROUND(m.rr, 6) AS reciprocal_rank
        FROM hits h JOIN mrr m ON h.query_id = m.query_id
    """
    # --- knowledge fusion: unrolled 2-iteration trust/confidence fixed point
    d["truth_fusion"] = """
        WITH claims AS (
            SELECT DISTINCT subj, pred, obj, source FROM (
                SELECT 'p' || l_partkey AS subj, 'returnflag' AS pred,
                       l_returnflag AS obj, 's' || l_suppkey AS source
                FROM lineitem
                UNION ALL
                SELECT 'p' || l_partkey, 'linestatus',
                       l_linestatus, 's' || l_suppkey
                FROM lineitem) t),
        num1 AS (SELECT subj, pred, obj, ROUND(SUM(1.0), 9) AS num,
                        CAST(COUNT(*) AS BIGINT) AS n_sources
                 FROM claims GROUP BY 1, 2, 3),
        den1 AS (SELECT subj, pred, ROUND(SUM(1.0), 9) AS den
                 FROM claims GROUP BY 1, 2),
        conf1 AS (SELECT n.subj, n.pred, n.obj,
                         ROUND(n.num / d.den, 9) AS conf
                  FROM num1 n JOIN den1 d USING (subj, pred)),
        trust1 AS (SELECT c.source, ROUND(AVG(f.conf), 9) AS trust
                   FROM claims c JOIN conf1 f
                   ON c.subj = f.subj AND c.pred = f.pred AND c.obj = f.obj
                   GROUP BY 1),
        num2 AS (SELECT c.subj, c.pred, c.obj, ROUND(SUM(t.trust), 9) AS num,
                        CAST(COUNT(*) AS BIGINT) AS n_sources
                 FROM claims c JOIN trust1 t USING (source)
                 GROUP BY 1, 2, 3),
        den2 AS (SELECT c.subj, c.pred, ROUND(SUM(t.trust), 9) AS den
                 FROM claims c JOIN trust1 t USING (source)
                 GROUP BY 1, 2),
        conf2 AS (SELECT n.subj, n.pred, n.obj, n.n_sources,
                         ROUND(n.num / d.den, 9) AS conf
                  FROM num2 n JOIN den2 d USING (subj, pred)),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY subj, pred
                          ORDER BY conf DESC, obj ASC) AS rn
              FROM conf2)
        SELECT subj, pred, obj, ROUND(conf, 6) AS confidence, n_sources
        FROM r WHERE rn = 1
    """
    # --- HyperANF: identical portable registers, two unrolled max-merge
    # rounds over the undirected supplier<->part edges, same estimator
    # constants as hll_distinct (m=128 here) — max-merge of register
    # tables is exactly the sketch of the ball union, so the comparison
    # has no approximation slack
    _a128 = 0.7213 / (1 + 1.079 / 128) * 128 * 128
    d["hyperanf_reach"] = f"""
        WITH raw AS (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS a,
                            'p' || CAST(l_partkey AS VARCHAR) AS b
                     FROM lineitem WHERE l_orderkey % 4 = 0),
        e AS (SELECT DISTINCT a AS s, b AS d FROM raw
              UNION SELECT b, a FROM raw),
        nodes AS (SELECT DISTINCT s AS node FROM e),
        h AS (SELECT node,
                     CAST(('0x' || substr(md5(node), 1, 15)) AS BIGINT)
                         AS h
              FROM nodes),
        c0 AS (SELECT node, h % 128 AS bucket,
                      CASE WHEN (h >> 7) = 0 THEN 54
                           ELSE 54 - length(bin(h >> 7)) END AS register
               FROM h),
        c1 AS (SELECT node, bucket, MAX(register) AS register FROM (
                   SELECT node, bucket, register FROM c0
                   UNION ALL
                   SELECT e.s, c0.bucket, c0.register
                   FROM e JOIN c0 ON c0.node = e.d
               ) u GROUP BY 1, 2),
        c2 AS (SELECT node, bucket, MAX(register) AS register FROM (
                   SELECT node, bucket, register FROM c1
                   UNION ALL
                   SELECT e.s, c1.bucket, c1.register
                   FROM e JOIN c1 ON c1.node = e.d
               ) u GROUP BY 1, 2),
        est AS (
            SELECT node, CAST(1 AS BIGINT) AS radius,
                   CAST(COUNT(*) AS BIGINT) AS n_registers,
                   ROUND(SUM(POWER(2.0, -register)), 9) AS s
            FROM c1 GROUP BY 1
            UNION ALL
            SELECT node, CAST(2 AS BIGINT),
                   CAST(COUNT(*) AS BIGINT),
                   ROUND(SUM(POWER(2.0, -register)), 9)
            FROM c2 GROUP BY 1),
        fin AS (SELECT node, radius, n_registers,
                       CAST(128 - n_registers AS BIGINT) AS n_zero_buckets,
                       {_a128!r} / (s + (128 - n_registers)) AS raw_est
                FROM est)
        SELECT node, radius, n_registers, n_zero_buckets,
               ROUND(CASE WHEN raw_est <= 320.0 AND n_zero_buckets > 0
                          THEN 128.0 * LN(128.0 / n_zero_buckets)
                          ELSE raw_est END, 4) AS hll_estimate
        FROM fin
    """
    # --- effective diameter: the hyperanf register chain on the %8
    # projection, each 4-dp estimate scaled to an exact integer BEFORE the
    # global sum, threshold test in exact integer arithmetic (x10 vs x9)
    d["effective_diameter"] = f"""
        WITH raw AS (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS a,
                            'p' || CAST(l_partkey AS VARCHAR) AS b
                     FROM lineitem WHERE l_orderkey % 8 = 0),
        e AS (SELECT DISTINCT a AS s, b AS d FROM raw
              UNION SELECT b, a FROM raw),
        nodes AS (SELECT DISTINCT s AS node FROM e),
        h AS (SELECT node,
                     CAST(('0x' || substr(md5(node), 1, 15)) AS BIGINT)
                         AS h
              FROM nodes),
        c0 AS (SELECT node, h % 128 AS bucket,
                      CASE WHEN (h >> 7) = 0 THEN 54
                           ELSE 54 - length(bin(h >> 7)) END AS register
               FROM h),
        c1 AS (SELECT node, bucket, MAX(register) AS register FROM (
                   SELECT node, bucket, register FROM c0
                   UNION ALL
                   SELECT e.s, c0.bucket, c0.register
                   FROM e JOIN c0 ON c0.node = e.d
               ) u GROUP BY 1, 2),
        c2 AS (SELECT node, bucket, MAX(register) AS register FROM (
                   SELECT node, bucket, register FROM c1
                   UNION ALL
                   SELECT e.s, c1.bucket, c1.register
                   FROM e JOIN c1 ON c1.node = e.d
               ) u GROUP BY 1, 2),
        est AS (
            SELECT node, CAST(1 AS BIGINT) AS radius,
                   COUNT(*) AS n_registers,
                   ROUND(SUM(POWER(2.0, -register)), 9) AS s
            FROM c1 GROUP BY 1
            UNION ALL
            SELECT node, CAST(2 AS BIGINT), COUNT(*),
                   ROUND(SUM(POWER(2.0, -register)), 9)
            FROM c2 GROUP BY 1),
        fin AS (SELECT node, radius,
                       128 - n_registers AS nz,
                       {_a128!r} / (s + (128 - n_registers)) AS raw_est
                FROM est),
        r AS (SELECT node, radius,
                     ROUND(CASE WHEN raw_est <= 320.0 AND nz > 0
                                THEN 128.0 * LN(128.0 / nz)
                                ELSE raw_est END, 4) AS b
              FROM fin),
        nf AS (SELECT CAST(0 AS BIGINT) AS radius,
                      CAST(COUNT(*) AS BIGINT) * 10039 AS nf_fp
               FROM nodes
               UNION ALL
               SELECT radius,
                      SUM(CAST(ROUND(b * 10000, 0) AS BIGINT)) AS nf_fp
               FROM r GROUP BY radius),
        mx AS (SELECT nf_fp AS nf_max FROM nf WHERE radius = 2),
        eff AS (SELECT MIN(nf.radius) AS ed FROM nf, mx
                WHERE nf.nf_fp * 10 >= 9 * mx.nf_max)
        SELECT nf.radius,
               CAST(nf.nf_fp AS DOUBLE) / 10000.0 AS nf,
               ROUND(CAST(nf.nf_fp AS DOUBLE) / CAST(mx.nf_max AS DOUBLE),
                     6) AS frac_of_max,
               eff.ed AS effective_diameter
        FROM nf, mx, eff
    """
    # --- condensation: the scc oracle's recursive-CTE mutual-reachability
    # labels, composed with the same two label joins + filter + count
    d["scc_condensation"] = """
        WITH RECURSIVE b AS (
            SELECT CAST(c_custkey AS BIGINT) AS ck, c_nationkey AS nk,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_custkey) - 1 AS rn
            FROM customer),
        bb AS (SELECT ck, nk, CAST(rn // 6 AS BIGINT) AS blk,
                      rn % 6 AS pos
               FROM b),
        bs AS (SELECT *, COUNT(*) OVER (PARTITION BY nk, blk) AS bsz
               FROM bb),
        ring AS (SELECT a.ck AS src, c.ck AS dst
                 FROM bs a JOIN bs c
                 ON a.nk = c.nk AND a.blk = c.blk
                    AND c.pos = (a.pos + 1) % a.bsz),
        mins AS (SELECT nk, blk, MIN(ck) AS mck FROM bb GROUP BY nk, blk),
        cross_e AS (SELECT hi.mck AS src, lo.mck AS dst
                    FROM mins hi JOIN mins lo
                    ON hi.nk = lo.nk AND hi.blk = lo.blk + 1),
        edges AS (SELECT DISTINCT src, dst
                  FROM (SELECT * FROM ring UNION ALL SELECT * FROM cross_e)
                  WHERE src <> dst),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        mutual AS (SELECT r1.src AS node, MIN(r1.dst) AS mn
                   FROM reach r1 JOIN reach r2
                   ON r1.src = r2.dst AND r1.dst = r2.src
                   GROUP BY r1.src),
        labels AS (SELECT bb.ck AS node,
                          CAST(LEAST(bb.ck, COALESCE(mutual.mn, bb.ck))
                               AS BIGINT) AS scc_id
                   FROM bb LEFT JOIN mutual ON bb.ck = mutual.node)
        SELECT ls.scc_id AS src_scc, ld.scc_id AS dst_scc,
               CAST(COUNT(*) AS BIGINT) AS n_edges
        FROM edges e
        JOIN labels ls ON e.src = ls.node
        JOIN labels ld ON e.dst = ld.node
        WHERE ls.scc_id <> ld.scc_id
        GROUP BY 1, 2
    """
    # --- Katz: three unrolled integer walk-count relaxations, scaled
    # attenuation sum, one dyadic (float-exact) division — bit-identical
    d["katz"] = """
        WITH e AS (SELECT DISTINCT u, v FROM (
                   SELECT 's' || CAST(l_suppkey AS VARCHAR) AS u,
                          'p' || CAST(l_partkey AS VARCHAR) AS v
                   FROM lineitem WHERE l_orderkey % 8 = 5
                   UNION ALL
                   SELECT 'p' || CAST(l_partkey AS VARCHAR),
                          's' || CAST(l_suppkey AS VARCHAR)
                   FROM lineitem WHERE l_orderkey % 8 = 5)),
        w0 AS (SELECT node, CAST(1 AS BIGINT) AS w FROM (
               SELECT u AS node FROM e UNION SELECT v FROM e)),
        w1 AS (SELECT e.v AS node, CAST(SUM(w0.w) AS BIGINT) AS w
               FROM e JOIN w0 ON w0.node = e.u GROUP BY 1),
        w2 AS (SELECT e.v AS node, CAST(SUM(w1.w) AS BIGINT) AS w
               FROM e JOIN w1 ON w1.node = e.u GROUP BY 1),
        w3 AS (SELECT e.v AS node, CAST(SUM(w2.w) AS BIGINT) AS w
               FROM e JOIN w2 ON w2.node = e.u GROUP BY 1),
        acc AS (SELECT node, CAST(SUM(t) AS BIGINT) AS acc FROM (
                SELECT node, w * 16 AS t FROM w1
                UNION ALL SELECT node, w * 4 FROM w2
                UNION ALL SELECT node, w FROM w3)
                GROUP BY 1)
        SELECT node, acc / 64.0 AS katz FROM acc
    """
    # --- temporal reachability: three unrolled earliest-arrival
    # relaxations (join + time-respect filter + min-agg + full-outer
    # min-merge), exact timestamp arithmetic — bit-identical
    d["temporal_reach"] = """
        WITH e AS (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS u,
                          'p' || CAST(l_partkey AS VARCHAR) AS v,
                          l_shipdate AS t
                   FROM lineitem WHERE l_orderkey % 12 = 3
                   UNION ALL
                   SELECT 'p' || CAST(l_partkey AS VARCHAR),
                          's' || CAST(l_suppkey AS VARCHAR), l_shipdate
                   FROM lineitem WHERE l_orderkey % 12 = 3),
        a0 AS (SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node,
                      TIMESTAMP '1990-01-01' AS arrival,
                      CAST(0 AS BIGINT) AS first_hop
               FROM supplier WHERE s_suppkey <= 3),
        r1 AS (SELECT e.v AS node, MIN(e.t) AS new_arr
               FROM e JOIN a0 ON a0.node = e.u AND e.t >= a0.arrival
               GROUP BY 1),
        a1 AS (SELECT COALESCE(a0.node, r1.node) AS node,
                      LEAST(COALESCE(a0.arrival, r1.new_arr),
                            COALESCE(r1.new_arr, a0.arrival)) AS arrival,
                      COALESCE(a0.first_hop, 1) AS first_hop
               FROM a0 FULL JOIN r1 ON a0.node = r1.node),
        r2 AS (SELECT e.v AS node, MIN(e.t) AS new_arr
               FROM e JOIN a1 ON a1.node = e.u AND e.t >= a1.arrival
               GROUP BY 1),
        a2 AS (SELECT COALESCE(a1.node, r2.node) AS node,
                      LEAST(COALESCE(a1.arrival, r2.new_arr),
                            COALESCE(r2.new_arr, a1.arrival)) AS arrival,
                      COALESCE(a1.first_hop, 2) AS first_hop
               FROM a1 FULL JOIN r2 ON a1.node = r2.node),
        r3 AS (SELECT e.v AS node, MIN(e.t) AS new_arr
               FROM e JOIN a2 ON a2.node = e.u AND e.t >= a2.arrival
               GROUP BY 1),
        a3 AS (SELECT COALESCE(a2.node, r3.node) AS node,
                      LEAST(COALESCE(a2.arrival, r3.new_arr),
                            COALESCE(r3.new_arr, a2.arrival)) AS arrival,
                      COALESCE(a2.first_hop, 3) AS first_hop
               FROM a2 FULL JOIN r3 ON a2.node = r3.node)
        SELECT node, arrival, CAST(first_hop AS BIGINT) AS first_hop
        FROM a3
    """
    # --- Weisfeiler-Lehman: the same degree seed + two rounds of
    # md5-of-sorted-multiset relabeling; pure string/hash arithmetic, so
    # both engines produce bit-identical labels (lexicographic sort of
    # pure-ASCII labels is binary collation on both sides)
    d["wl_fingerprints"] = """
        WITH raw AS (SELECT DISTINCT
                            's' || CAST(l_suppkey AS VARCHAR) AS a,
                            'p' || CAST(l_partkey AS VARCHAR) AS b
                     FROM lineitem WHERE l_orderkey % 8 = 1),
        e AS (SELECT a AS s, b AS d FROM raw
              UNION SELECT b, a FROM raw),
        l0 AS (SELECT s AS node, CAST(COUNT(*) AS VARCHAR) AS lbl
               FROM e GROUP BY 1),
        n1 AS (SELECT e.s AS node,
                      array_to_string(list_sort(list(l0.lbl)), ',') AS nbrs
               FROM e JOIN l0 ON l0.node = e.d GROUP BY 1),
        l1 AS (SELECT n1.node,
                      substr(md5(l0.lbl || '|' || n1.nbrs), 1, 16) AS lbl
               FROM n1 JOIN l0 ON l0.node = n1.node),
        n2 AS (SELECT e.s AS node,
                      array_to_string(list_sort(list(l1.lbl)), ',') AS nbrs
               FROM e JOIN l1 ON l1.node = e.d GROUP BY 1),
        l2 AS (SELECT n2.node,
                      substr(md5(l1.lbl || '|' || n2.nbrs), 1, 16) AS lbl
               FROM n2 JOIN l1 ON l1.node = n2.node)
        SELECT l2.node AS node, l0.lbl AS wl0, l2.lbl AS wl,
               CAST(COUNT(*) OVER (PARTITION BY l2.lbl) AS BIGINT)
                   AS class_size
        FROM l2 JOIN l0 ON l0.node = l2.node
    """
    # --- k-source bounded Brandes: unroll the 3-level multi-source BFS
    # (exact BIGINT sigma) and the backward dependency accumulation with
    # the same per-level ROUND(...,6) the Spark side applies
    d["betweenness"] = """
        WITH raw AS (SELECT DISTINCT
                            's' || CAST(l_suppkey AS VARCHAR) AS a,
                            'p' || CAST(l_partkey AS VARCHAR) AS b
                     FROM lineitem WHERE l_orderkey % 4 = 0),
        e AS (SELECT a AS s, b AS d FROM raw
              UNION SELECT b, a FROM raw),
        src AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS s
                FROM supplier WHERE s_suppkey <= 4),
        l0 AS (SELECT s, s AS node, CAST(1 AS BIGINT) AS sigma FROM src),
        l1 AS (SELECT l0.s, e.d AS node,
                      CAST(SUM(l0.sigma) AS BIGINT) AS sigma
               FROM l0 JOIN e ON l0.node = e.s
               WHERE NOT EXISTS (SELECT 1 FROM l0 v
                                 WHERE v.s = l0.s AND v.node = e.d)
               GROUP BY 1, 2),
        l2 AS (SELECT l1.s, e.d AS node,
                      CAST(SUM(l1.sigma) AS BIGINT) AS sigma
               FROM l1 JOIN e ON l1.node = e.s
               WHERE NOT EXISTS (SELECT 1 FROM l0 v
                                 WHERE v.s = l1.s AND v.node = e.d)
                 AND NOT EXISTS (SELECT 1 FROM l1 v
                                 WHERE v.s = l1.s AND v.node = e.d)
               GROUP BY 1, 2),
        l3 AS (SELECT l2.s, e.d AS node,
                      CAST(SUM(l2.sigma) AS BIGINT) AS sigma
               FROM l2 JOIN e ON l2.node = e.s
               WHERE NOT EXISTS (SELECT 1 FROM l0 v
                                 WHERE v.s = l2.s AND v.node = e.d)
                 AND NOT EXISTS (SELECT 1 FROM l1 v
                                 WHERE v.s = l2.s AND v.node = e.d)
                 AND NOT EXISTS (SELECT 1 FROM l2 v
                                 WHERE v.s = l2.s AND v.node = e.d)
               GROUP BY 1, 2),
        d3 AS (SELECT s, node, 0.0 AS delta FROM l3),
        c2 AS (SELECT l2.s, l2.node,
                      ROUND(SUM(CAST(l2.sigma AS DOUBLE)
                                / CAST(l3.sigma AS DOUBLE)
                                * (1.0 + d3.delta)), 6) AS delta
               FROM l2 JOIN e ON l2.node = e.s
               JOIN l3 ON l3.s = l2.s AND l3.node = e.d
               JOIN d3 ON d3.s = l3.s AND d3.node = l3.node
               GROUP BY 1, 2),
        d2 AS (SELECT l2.s, l2.node, COALESCE(c2.delta, 0.0) AS delta
               FROM l2 LEFT JOIN c2
                 ON c2.s = l2.s AND c2.node = l2.node),
        c1 AS (SELECT l1.s, l1.node,
                      ROUND(SUM(CAST(l1.sigma AS DOUBLE)
                                / CAST(l2.sigma AS DOUBLE)
                                * (1.0 + d2.delta)), 6) AS delta
               FROM l1 JOIN e ON l1.node = e.s
               JOIN l2 ON l2.s = l1.s AND l2.node = e.d
               JOIN d2 ON d2.s = l2.s AND d2.node = l2.node
               GROUP BY 1, 2),
        d1 AS (SELECT l1.s, l1.node, COALESCE(c1.delta, 0.0) AS delta
               FROM l1 LEFT JOIN c1
                 ON c1.s = l1.s AND c1.node = l1.node),
        alld AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2
                 UNION ALL SELECT * FROM d3)
        SELECT node, ROUND(SUM(delta), 6) AS betweenness
        FROM alld GROUP BY 1
    """
    # --- harmonic centrality from the SAME register chain: difference the
    # identical 4-dp per-radius estimates, clamp, then the exact
    # fixed-point 1/t weighting (deltas x 10^4 as integers, one final
    # division by 20000) so neither engine ever decimal-rounds a
    # half-way 5th digit
    d["harmonic_centrality"] = f"""
        WITH raw AS (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS a,
                            'p' || CAST(l_partkey AS VARCHAR) AS b
                     FROM lineitem WHERE l_orderkey % 4 = 0),
        e AS (SELECT DISTINCT a AS s, b AS d FROM raw
              UNION SELECT b, a FROM raw),
        nodes AS (SELECT DISTINCT s AS node FROM e),
        h AS (SELECT node,
                     CAST(('0x' || substr(md5(node), 1, 15)) AS BIGINT)
                         AS h
              FROM nodes),
        c0 AS (SELECT node, h % 128 AS bucket,
                      CASE WHEN (h >> 7) = 0 THEN 54
                           ELSE 54 - length(bin(h >> 7)) END AS register
               FROM h),
        c1 AS (SELECT node, bucket, MAX(register) AS register FROM (
                   SELECT node, bucket, register FROM c0
                   UNION ALL
                   SELECT e.s, c0.bucket, c0.register
                   FROM e JOIN c0 ON c0.node = e.d
               ) u GROUP BY 1, 2),
        c2 AS (SELECT node, bucket, MAX(register) AS register FROM (
                   SELECT node, bucket, register FROM c1
                   UNION ALL
                   SELECT e.s, c1.bucket, c1.register
                   FROM e JOIN c1 ON c1.node = e.d
               ) u GROUP BY 1, 2),
        est AS (
            SELECT node, 1 AS radius, COUNT(*) AS n_registers,
                   ROUND(SUM(POWER(2.0, -register)), 9) AS s
            FROM c1 GROUP BY 1
            UNION ALL
            SELECT node, 2, COUNT(*), ROUND(SUM(POWER(2.0, -register)), 9)
            FROM c2 GROUP BY 1),
        fin AS (SELECT node, radius,
                       128 - n_registers AS nz,
                       {_a128!r} / (s + (128 - n_registers)) AS raw_est
                FROM est),
        r AS (SELECT node, radius,
                     ROUND(CASE WHEN raw_est <= 320.0 AND nz > 0
                                THEN 128.0 * LN(128.0 / nz)
                                ELSE raw_est END, 4) AS b
              FROM fin),
        piv AS (SELECT node,
                       MAX(CASE WHEN radius = 1 THEN b END) AS b1,
                       MAX(CASE WHEN radius = 2 THEN b END) AS b2
                FROM r GROUP BY 1)
        SELECT node, b2 AS anf_max,
               (CAST(ROUND(GREATEST(b1 - 1.0039, 0) * 10000, 0) AS BIGINT)
                    * 2
                + CAST(ROUND(GREATEST(b2 - b1, 0) * 10000, 0) AS BIGINT))
               / 20000.0 AS harmonic,
               CAST(CASE WHEN b1 >= 0.9 * b2 THEN 1 ELSE 2 END AS BIGINT)
                   AS effective_radius
        FROM piv
    """
    # --- SCD2 timeline: textbook lag/cumsum islands + lead(valid_from)
    d["entity_timelines"] = """
        WITH flags AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN ROW_NUMBER() OVER w = 1
                          OR event_type IS DISTINCT FROM
                             LAG(event_type) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        iv AS (SELECT user_id, event_type, ts,
                      CAST(SUM(chg) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS BIGINT) - 1
                          AS interval_id
               FROM flags),
        g AS (SELECT user_id, interval_id, MAX(event_type) AS event_type,
                     MIN(ts) AS valid_from,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM iv GROUP BY 1, 2)
        SELECT user_id, interval_id, event_type, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id
                    ORDER BY interval_id) AS valid_to,
               n_events
        FROM g
    """
    # --- temporal functional conflicts: naive range self-join (DuckDB's
    # IEJoin) over the same per-(user, source) assertion intervals the
    # Spark side builds — pins the bucketed overlap equi-join against a
    # genuinely different execution strategy
    d["temporal_conflicts"] = """
        WITH ev AS (SELECT user_id, event_id,
                           CAST(event_id % 2 AS BIGINT) AS src,
                           event_type AS val, ts AS vf
                    FROM events),
        mx AS (SELECT user_id, MAX(vf) AS user_max FROM ev GROUP BY 1),
        iv AS (SELECT e.user_id, e.event_id, e.src, e.val, e.vf,
                      COALESCE(LEAD(e.vf) OVER (PARTITION BY e.user_id,
                                   e.src ORDER BY e.vf, e.event_id),
                               m.user_max) AS vt
               FROM ev e JOIN mx m ON e.user_id = m.user_id)
        SELECT a.user_id,
               a.src AS source_a, b.src AS source_b,
               a.event_id AS id_a, b.event_id AS id_b,
               a.val AS value_a, b.val AS value_b,
               GREATEST(a.vf, b.vf) AS overlap_from,
               LEAST(a.vt, b.vt) AS overlap_to
        FROM iv a JOIN iv b
          ON a.user_id = b.user_id AND a.src < b.src
        WHERE a.vf < b.vt AND b.vf < a.vt AND a.val <> b.val
    """
    # --- FK orphan-rate profile (one stale dim exercises the >0 path)
    d["fk_profile"] = """
        WITH r1 AS (
            SELECT 'lineitem->orders' AS relation,
                   CAST(COUNT(*) AS BIGINT) AS n_child,
                   CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_orphan,
                   ROUND(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                         / COUNT(*), 6) AS orphan_rate
            FROM lineitem l LEFT JOIN
                 (SELECT DISTINCT o_orderkey FROM orders) o
                 ON l.l_orderkey = o.o_orderkey),
        r2 AS (
            SELECT 'orders->customer',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   ROUND(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                         / COUNT(*), 6)
            FROM orders o LEFT JOIN
                 (SELECT DISTINCT c_custkey FROM customer) c
                 ON o.o_custkey = c.c_custkey),
        r3 AS (
            SELECT 'lineitem->supplier_stale',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   ROUND(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                         / COUNT(*), 6)
            FROM lineitem l LEFT JOIN
                 (SELECT DISTINCT s_suppkey FROM supplier
                  WHERE s_suppkey % 7 <> 0) s
                 ON l.l_suppkey = s.s_suppkey)
        SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
        SELECT * FROM r3
    """
    # --- per-column string-domain profile of orders
    d["column_profile"] = """
        SELECT 'o_orderstatus' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT CAST(o_orderstatus AS VARCHAR)) AS BIGINT)
                   AS n_distinct,
               MIN(CAST(o_orderstatus AS VARCHAR)) AS min_s,
               MAX(CAST(o_orderstatus AS VARCHAR)) AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(DISTINCT CAST(o_orderpriority AS VARCHAR)) AS BIGINT),
               MIN(CAST(o_orderpriority AS VARCHAR)),
               MAX(CAST(o_orderpriority AS VARCHAR))
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(DISTINCT CAST(o_custkey AS VARCHAR)) AS BIGINT),
               MIN(CAST(o_custkey AS VARCHAR)),
               MAX(CAST(o_custkey AS VARCHAR))
        FROM orders
    """
    # --- exponentially time-decayed evidence weights (fixed now)
    d["time_decay"] = """
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               ROUND(SUM(ROUND(POW(2.0,
                   -(1706745600.0 - epoch_us(ts) / 1000000.0) / 604800.0),
                   9)), 6) AS w_decayed,
               ROUND(MAX(ROUND(POW(2.0,
                   -(1706745600.0 - epoch_us(ts) / 1000000.0) / 604800.0),
                   9)), 6) AS w_latest
        FROM events GROUP BY 1, 2
    """
    # --- windowed co-mention band self-join (naive range join as oracle)
    d["comention"] = """
        WITH p AS (SELECT user_id AS k, event_type AS it,
                          epoch_us(ts) AS t, event_id AS id
                   FROM events),
        pr AS (SELECT LEAST(a.it, b.it) AS item_a,
                      GREATEST(a.it, b.it) AS item_b
               FROM p a JOIN p b ON a.k = b.k
               WHERE (a.t < b.t OR (a.t = b.t AND a.id < b.id))
                 AND b.t - a.t <= CAST(3600 AS BIGINT) * 1000000
                 AND a.it <> b.it)
        SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_co
        FROM pr GROUP BY 1, 2 HAVING COUNT(*) >= 1
    """
    # --- Mann-Whitney ROC-AUC over the distinct-score histogram
    d["roc_auc"] = """
        WITH n AS (SELECT l_suppkey, l_partkey,
                          ROUND(CAST(SUM(l_quantity) AS DOUBLE), 6) AS score
                   FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1, 2),
        r AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
              WHERE l_returnflag = 'R'),
        lab AS (SELECT n.score,
                       CASE WHEN r.l_suppkey IS NULL THEN 0 ELSE 1 END AS label
                FROM n LEFT JOIN r ON n.l_suppkey = r.l_suppkey
                                  AND n.l_partkey = r.l_partkey),
        hist AS (SELECT score AS s, SUM(label) AS pos, SUM(1 - label) AS neg
                 FROM lab GROUP BY 1),
        u AS (SELECT pos, neg,
                     COALESCE(SUM(neg) OVER (ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS neg_below
              FROM hist)
        SELECT ROUND(SUM(pos * (neg_below + neg / 2.0))
                     / (SUM(pos) * SUM(neg)), 6) AS auc,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(neg) AS BIGINT) AS n_neg
        FROM u
    """
    # --- z-score burst detection over 6h event-type buckets
    d["burst_detect"] = """
        WITH cnts AS (SELECT event_type AS g,
                             (epoch_us(ts) // 1000000) // 21600 AS bkt,
                             COUNT(*) AS cnt
                      FROM events GROUP BY 1, 2),
        t AS (SELECT g, bkt, cnt,
                     COUNT(*) OVER w AS k,
                     SUM(cnt) OVER w AS s1,
                     SUM(cnt * cnt) OVER w AS s2
              FROM cnts
              WINDOW w AS (PARTITION BY g ORDER BY bkt
                           ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)),
        f AS (SELECT g, bkt, cnt, s1 / 8 AS mean,
                     SQRT(GREATEST((s2 - s1 * s1 / 8) / 7, 0.0)) AS std
              FROM t WHERE k = 8)
        SELECT g AS event_type,
               CAST(bkt * 21600 AS BIGINT) AS bucket_start_s,
               CAST(cnt AS BIGINT) AS cnt,
               ROUND(mean, 6) AS trail_mean,
               ROUND(std, 6) AS trail_std
        FROM f WHERE ROUND(cnt - mean - 2.0 * std, 6) > 0
    """
    # --- Allen interval algebra over per-customer order intervals
    d["allen_relations"] = """
        WITH iv AS (SELECT o_custkey AS ck, o_orderkey AS iid,
                           epoch_us(o_orderdate) AS s,
                           epoch_us(o_orderdate)
                               + ((o_orderkey % 29) + 1) * 86400000000 AS e
                    FROM orders),
        p AS (SELECT a.ck, a.iid AS a, b.iid AS b,
                     a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
              FROM iv a JOIN iv b ON a.ck = b.ck AND a.iid < b.iid)
        SELECT ck, a, b,
               CASE WHEN s1 = s2 AND e1 = e2 THEN 'equals'
                    WHEN e1 < s2 THEN 'before'
                    WHEN s1 > e2 THEN 'after'
                    WHEN e1 = s2 THEN 'meets'
                    WHEN s1 = e2 THEN 'met_by'
                    WHEN s1 = s2 AND e1 < e2 THEN 'starts'
                    WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
                    WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
                    WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
                    WHEN s1 > s2 AND e1 < e2 THEN 'during'
                    WHEN s1 < s2 AND e1 > e2 THEN 'contains'
                    WHEN s1 < s2 AND e1 < e2 THEN 'overlaps'
                    WHEN s1 > s2 AND e1 > e2 THEN 'overlapped_by'
               END AS rel
        FROM p
    """
    # --- filtered negative sampling: same portable hash + NOT EXISTS
    neg_hash = portable_hash60_sql_(
        "CAST(src_id AS VARCHAR) || chr(31) || CAST(dst_id AS VARCHAR) "
        "|| chr(31) || CAST(sample_idx AS VARCHAR)",
        seed=17,
    )
    d["negative_sampling"] = f"""
        WITH pos AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src_id,
                            CAST(l_partkey AS BIGINT) AS dst_id
                     FROM lineitem WHERE l_suppkey < 25),
        n AS (SELECT MAX(p_partkey) + 1 AS n_ent FROM part),
        cand AS (SELECT src_id, dst_id, CAST(j.sample_idx AS BIGINT)
                            AS sample_idx,
                        CAST({neg_hash} % (SELECT n_ent FROM n) AS BIGINT)
                            AS neg_dst
                 FROM pos CROSS JOIN (SELECT unnest(generate_series(1, 2))
                                      AS sample_idx) j)
        SELECT c.src_id, c.dst_id, c.sample_idx, c.neg_dst
        FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM pos p
                          WHERE p.src_id = c.src_id
                            AND p.dst_id = c.neg_dst)
    """
    # --- corpus-unigram LM score: add-one smoothing, mean ln p(w)
    d["unigram_lm"] = """
        WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                      FROM documents),
        counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM toks GROUP BY 1),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
                       CAST(COUNT(*) AS BIGINT) AS vocab
                FROM counts),
        s AS (SELECT doc_id,
                     ROUND(LN(CAST(cnt + 1 AS DOUBLE) / (n_total + vocab)), 9)
                         AS logp
              FROM toks JOIN counts USING (token) CROSS JOIN tot)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(logp), 4) AS avg_logp
        FROM s GROUP BY 1
    """
    # --- DSIR hashed-bigram importance weights (en subset vs corpus)
    dsir_bucket = portable_hash60_sql_("gram")
    d["dsir_weights"] = f"""
        WITH toks AS (SELECT doc_id, lang = 'en' AS is_tgt,
                             string_split(text, ' ') AS t
                      FROM documents),
        g1 AS (SELECT doc_id, is_tgt, t,
                      unnest(generate_series(1, len(t) - 1)) AS i
               FROM toks),
        grams AS (SELECT doc_id, is_tgt, t[i] || ' ' || t[i + 1] AS gram
                  FROM g1),
        b AS (SELECT doc_id, is_tgt, {dsir_bucket} % 1024 AS bucket
              FROM grams),
        src AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_src
                FROM b GROUP BY 1),
        tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tgt
                FROM b WHERE is_tgt GROUP BY 1),
        dim AS (SELECT s.bucket,
                       ROUND(LN(CAST(COALESCE(t.n_tgt, 0) + 1 AS DOUBLE)
                                / (s.n_src + 1)), 9) AS llr
                FROM src s LEFT JOIN tgt t ON s.bucket = t.bucket),
        w AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                     ROUND(AVG(llr), 4) AS weight
              FROM b JOIN dim ON b.bucket = dim.bucket
              GROUP BY 1)
        SELECT doc_id, n_grams, weight,
               CAST(ROW_NUMBER() OVER (ORDER BY weight DESC, doc_id ASC)
                    AS BIGINT) AS tgt_rank
        FROM w
    """
    # --- PMI co-occurrence over distinct baskets, mega-basket cap first
    d["pmi_pairs"] = """
        WITH m AS (SELECT DISTINCT l_orderkey AS basket_id,
                          l_partkey AS item_id
                   FROM lineitem),
        ok AS (SELECT basket_id FROM m GROUP BY 1 HAVING COUNT(*) <= 10),
        mm AS (SELECT m.* FROM m JOIN ok USING (basket_id)),
        nt AS (SELECT CAST(COUNT(DISTINCT basket_id) AS DOUBLE) AS n FROM mm),
        ni AS (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_item
               FROM mm GROUP BY 1),
        pp AS (SELECT a.item_id AS item_a, b.item_id AS item_b,
                      CAST(COUNT(*) AS BIGINT) AS n_ab
               FROM mm a JOIN mm b ON a.basket_id = b.basket_id
                                  AND a.item_id < b.item_id
               GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        SELECT item_a, item_b, n_ab,
               ROUND(LN(n_ab * nt.n / (na.n_item * nb.n_item)), 6) AS pmi
        FROM pp
        JOIN ni na ON na.item_id = pp.item_a
        JOIN ni nb ON nb.item_id = pp.item_b
        CROSS JOIN nt
    """
    # --- Dunning G2 over the same basket contingency tables
    d["g2_colloc"] = """
        WITH m AS (SELECT DISTINCT l_orderkey AS basket_id,
                          l_partkey AS item_id
                   FROM lineitem),
        ok AS (SELECT basket_id FROM m GROUP BY 1 HAVING COUNT(*) <= 10),
        mm AS (SELECT m.* FROM m JOIN ok USING (basket_id)),
        nt AS (SELECT CAST(COUNT(DISTINCT basket_id) AS BIGINT) AS ni,
                      CAST(COUNT(DISTINCT basket_id) AS DOUBLE) AS nd
               FROM mm),
        nitem AS (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_item
                  FROM mm GROUP BY 1),
        pp AS (SELECT a.item_id AS item_a, b.item_id AS item_b,
                      CAST(COUNT(*) AS BIGINT) AS n_ab
               FROM mm a JOIN mm b ON a.basket_id = b.basket_id
                                  AND a.item_id < b.item_id
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        k AS (SELECT item_a, item_b, n_ab,
                     na.n_item AS n_a, nb.n_item AS n_b, nt.ni, nt.nd
              FROM pp
              JOIN nitem na ON na.item_id = pp.item_a
              JOIN nitem nb ON nb.item_id = pp.item_b
              CROSS JOIN nt)
        SELECT item_a, item_b, n_ab,
               ROUND(2.0 * (
                   (CASE WHEN n_ab > 0 THEN n_ab *
                        LN(n_ab * nd / (n_a * n_b)) ELSE 0.0 END)
                 + (CASE WHEN n_a - n_ab > 0 THEN (n_a - n_ab) *
                        LN((n_a - n_ab) * nd / (n_a * (ni - n_b)))
                    ELSE 0.0 END)
                 + (CASE WHEN n_b - n_ab > 0 THEN (n_b - n_ab) *
                        LN((n_b - n_ab) * nd / ((ni - n_a) * n_b))
                    ELSE 0.0 END)
                 + (CASE WHEN ni - n_a - n_b + n_ab > 0
                    THEN (ni - n_a - n_b + n_ab) *
                        LN((ni - n_a - n_b + n_ab) * nd
                           / ((ni - n_a) * (ni - n_b)))
                    ELSE 0.0 END)
               ), 6) AS g2
        FROM k
    """
    # --- HITS: two unrolled integer-exact iterations, L1 normalize at end
    d["hits"] = """
        WITH e AS (
            SELECT DISTINCT 's' || l_suppkey AS s, 'p' || l_partkey AS d
            FROM lineitem WHERE l_returnflag = 'N'
            UNION
            SELECT DISTINCT 'p' || l_partkey, 's' || l_suppkey
            FROM lineitem WHERE l_returnflag = 'R'),
        nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
        h1 AS (SELECT n.node, COALESCE(x.h, 0) AS h
               FROM nodes n LEFT JOIN
                    (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS h
                     FROM e GROUP BY 1) x USING (node)),
        a1 AS (SELECT n.node, COALESCE(x.a, 0) AS a
               FROM nodes n LEFT JOIN
                    (SELECT e.d AS node, CAST(SUM(h1.h) AS BIGINT) AS a
                     FROM e JOIN h1 ON e.s = h1.node GROUP BY 1) x
                    USING (node)),
        h2 AS (SELECT n.node, COALESCE(x.h, 0) AS h
               FROM nodes n LEFT JOIN
                    (SELECT e.s AS node, CAST(SUM(a1.a) AS BIGINT) AS h
                     FROM e JOIN a1 ON e.d = a1.node GROUP BY 1) x
                    USING (node)),
        a2 AS (SELECT n.node, COALESCE(x.a, 0) AS a
               FROM nodes n LEFT JOIN
                    (SELECT e.d AS node, CAST(SUM(h2.h) AS BIGINT) AS a
                     FROM e JOIN h2 ON e.s = h2.node GROUP BY 1) x
                    USING (node)),
        norms AS (SELECT (SELECT CAST(SUM(h) AS BIGINT) FROM h2) AS nh,
                         (SELECT CAST(SUM(a) AS BIGINT) FROM a2) AS na)
        SELECT h2.node,
               ROUND(CASE WHEN nh > 0 THEN h2.h / nh ELSE 0.0 END, 6) AS hub,
               ROUND(CASE WHEN na > 0 THEN a2.a / na ELSE 0.0 END, 6) AS auth
        FROM h2 JOIN a2 ON h2.node = a2.node CROSS JOIN norms
    """
    # --- per-community Newman modularity of the nation partition
    d["modularity"] = """
        WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_nationkey AS nk
                   FROM customer),
        e0 AS (SELECT a.k AS u, b.k AS v FROM c a JOIN c b ON b.k = a.k + 1),
        m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS md FROM e0),
        lab AS (SELECT CAST(cu.nk AS VARCHAR) AS cu, CAST(cv.nk AS VARCHAR) AS cv
                FROM e0 JOIN c cu ON e0.u = cu.k JOIN c cv ON e0.v = cv.k),
        e_in AS (SELECT cu AS community, CAST(COUNT(*) AS BIGINT) AS n_in
                 FROM lab WHERE cu = cv GROUP BY 1),
        d_tot AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS d_tot FROM
                  (SELECT cu AS community FROM lab
                   UNION ALL SELECT cv FROM lab) GROUP BY 1)
        SELECT d_tot.community,
               CAST(COALESCE(e_in.n_in, 0) AS BIGINT) AS n_in,
               d_tot.d_tot,
               ROUND(COALESCE(e_in.n_in, 0) / m.md
                     - (d_tot.d_tot / (2 * m.md)) * (d_tot.d_tot / (2 * m.md)),
                     6) AS q_c
        FROM d_tot LEFT JOIN e_in USING (community) CROSS JOIN m
    """
    # --- Clauset-Shalizi-Newman power-law MLE over the degree histogram
    d["powerlaw_alpha"] = """
        WITH e AS (SELECT 's' || l_suppkey AS a, 'p' || l_partkey AS b
                   FROM lineitem),
        adj AS (SELECT DISTINCT a, b FROM
                (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e)
                WHERE a <> b),
        deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d
                FROM adj GROUP BY 1 HAVING COUNT(*) >= 3),
        hist AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM deg GROUP BY 1)
        SELECT ROUND(1.0 + SUM(cnt) / SUM(cnt * LN(d / 2.5)), 6) AS alpha,
               CAST(SUM(cnt) AS BIGINT) AS n_tail,
               CAST(3 AS BIGINT) AS dmin
        FROM hist
    """
    # --- k-core: 3 unrolled peeling rounds at k=30
    kcore_rounds = []
    for r in range(1, 4):
        kcore_rounds.append(f"""
        d{r} AS (SELECT src_id AS node, COUNT(*) AS deg
                 FROM e{r - 1} GROUP BY 1),
        k{r} AS (SELECT node FROM d{r} WHERE deg >= 30),
        e{r} AS (SELECT e.src_id, e.dst_id FROM e{r - 1} e
                 JOIN k{r} a ON e.src_id = a.node
                 JOIN k{r} b ON e.dst_id = b.node)""")
    d["kcore"] = f"""
        WITH e0 AS (SELECT DISTINCT src_id, dst_id FROM (
                SELECT 's' || l_suppkey AS src_id,
                       'p' || l_partkey AS dst_id FROM lineitem
                UNION ALL
                SELECT 'p' || l_partkey, 's' || l_suppkey FROM lineitem) t
            WHERE src_id <> dst_id),
        {",".join(kcore_rounds)}
        SELECT src_id AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM e3 GROUP BY 1
    """
    # --- shared mixed-predicate KG projection for rule mining / profiling
    def _kg_triples_sql(mod: int | None = None) -> str:
        ow = f"WHERE o_orderkey % {mod} = 0" if mod else ""
        lw = f"WHERE l_orderkey % {mod} = 0" if mod else ""
        bw = f"AND o_orderkey % {mod} = 0" if mod else ""
        return f"""
        t AS (SELECT DISTINCT subj, pred, obj FROM (
            SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred,
                   'n' || c_nationkey AS obj FROM customer
            UNION ALL
            SELECT 's' || s_suppkey, 'in_nation', 'n' || s_nationkey
            FROM supplier
            UNION ALL
            SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey
            FROM nation
            UNION ALL
            SELECT 'c' || c_custkey, 'in_region', 'r' || n_regionkey
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey % 2 = 1
            UNION ALL
            SELECT 'c' || o_custkey, 'placed', 'o' || o_orderkey
            FROM orders {ow}
            UNION ALL
            SELECT 'o' || l_orderkey, 'contains', 'p' || l_partkey
            FROM lineitem {lw}
            UNION ALL
            SELECT 'p' || l_partkey, 'supplied_by', 's' || l_suppkey
            FROM lineitem {lw}
            UNION ALL
            SELECT 'c' || o_custkey, 'bought', 'p' || l_partkey
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_custkey % 2 = 0 {bw}
        ) raw)
    """

    # --- AMIE-style 2-hop rule mining: identical caps + PCA denominator
    d["rule_mining"] = f"""
        WITH {_kg_triples_sql(mod=8)},
        ind AS (SELECT obj AS z, pred AS p1, COUNT(*) AS ind
                FROM t GROUP BY 1, 2),
        outd AS (SELECT subj AS z, pred AS p2, COUNT(*) AS outd
                 FROM t GROUP BY 1, 2),
        allowed AS (SELECT ind.z, p1, p2 FROM ind
                    JOIN outd ON ind.z = outd.z
                    WHERE ind.ind * outd.outd <= 100000),
        body AS (SELECT DISTINCT a.p1, a.p2, b1.subj AS x, b2.obj AS y
                 FROM t b1
                 JOIN allowed a ON b1.obj = a.z AND b1.pred = a.p1
                 JOIN t b2 ON b2.subj = a.z AND b2.pred = a.p2),
        nb AS (SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS n_body
               FROM body GROUP BY 1, 2),
        sup AS (SELECT p1, p2, h.pred AS p3,
                       CAST(COUNT(*) AS BIGINT) AS support
                FROM body JOIN t h ON h.subj = body.x AND h.obj = body.y
                GROUP BY 1, 2, 3),
        nh AS (SELECT pred AS p3, CAST(COUNT(*) AS BIGINT) AS n_head
               FROM t GROUP BY 1),
        pdom AS (SELECT DISTINCT pred AS p3, subj AS x FROM t),
        npca AS (SELECT p1, p2, p3, CAST(COUNT(*) AS BIGINT) AS n_pca
                 FROM body JOIN pdom ON pdom.x = body.x GROUP BY 1, 2, 3)
        SELECT p1, p2, p3, support, n_body, n_head,
               ROUND(support / CAST(n_body AS DOUBLE), 6) AS conf_std,
               ROUND(support / CAST(n_pca AS DOUBLE), 6) AS conf_pca,
               ROUND(support / CAST(n_head AS DOUBLE), 6) AS head_coverage
        FROM sup
        JOIN nb USING (p1, p2)
        JOIN nh USING (p3)
        JOIN npca USING (p1, p2, p3)
        WHERE support >= 500
    """
    # --- predicate functionality / domain-range profile
    d["rule_apply"] = f"""
        WITH {_kg_triples_sql()},
        b1 AS (SELECT subj AS x, obj AS y FROM t WHERE pred = 'placed'),
        b2 AS (SELECT subj AS y, obj AS z FROM t WHERE pred = 'contains'),
        inf AS (SELECT DISTINCT b1.x AS subj, b2.z AS obj
                FROM b1 JOIN b2 USING (y)),
        ex AS (SELECT subj, obj FROM t WHERE pred = 'bought')
        SELECT i.subj, 'bought' AS pred, i.obj
        FROM inf i LEFT JOIN ex
        ON i.subj = ex.subj AND i.obj = ex.obj
        WHERE ex.subj IS NULL
    """
    d["gini"] = """
        WITH e AS (SELECT ROUND(CAST(SUM(l_quantity) AS DOUBLE), 6) AS v
                   FROM lineitem GROUP BY l_suppkey, l_partkey),
        hist AS (SELECT v AS _v, CAST(COUNT(*) AS BIGINT) AS c
                 FROM e GROUP BY 1),
        t AS (SELECT _v, c,
                     COALESCE(SUM(c) OVER (ORDER BY _v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS nb
              FROM hist)
        SELECT ROUND(2.0 * SUM(_v * (c * nb + c * (c + 1) / 2.0))
                     / (SUM(c) * SUM(_v * c))
                     - (SUM(c) + 1) / SUM(c), 6) AS gini,
               CAST(SUM(c) AS BIGINT) AS n,
               ROUND(SUM(_v * c), 6) AS total
        FROM t
    """
    d["pred_stats"] = f"""
        WITH {_kg_triples_sql()},
        base AS (SELECT pred,
                        CAST(COUNT(*) AS BIGINT) AS n_triples,
                        CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subj,
                        CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_obj
                 FROM t GROUP BY 1),
        dcnt AS (SELECT pred, substring(subj, 1, 1) AS prefix,
                        CAST(COUNT(*) AS BIGINT) AS n
                 FROM t GROUP BY 1, 2),
        dtop AS (SELECT pred, MAX(n) AS top_n,
                        CAST(SUM(n) AS BIGINT) AS tot
                 FROM dcnt GROUP BY 1),
        dom AS (SELECT dcnt.pred, MIN(prefix) AS domain_prefix,
                       ROUND(top_n / CAST(tot AS DOUBLE), 6) AS domain_share
                FROM dcnt JOIN dtop ON dcnt.pred = dtop.pred
                                   AND dcnt.n = dtop.top_n
                GROUP BY dcnt.pred, top_n, tot),
        rcnt AS (SELECT pred, substring(obj, 1, 1) AS prefix,
                        CAST(COUNT(*) AS BIGINT) AS n
                 FROM t GROUP BY 1, 2),
        rtop AS (SELECT pred, MAX(n) AS top_n,
                        CAST(SUM(n) AS BIGINT) AS tot
                 FROM rcnt GROUP BY 1),
        rng AS (SELECT rcnt.pred, MIN(prefix) AS range_prefix,
                       ROUND(top_n / CAST(tot AS DOUBLE), 6) AS range_share
                FROM rcnt JOIN rtop ON rcnt.pred = rtop.pred
                                   AND rcnt.n = rtop.top_n
                GROUP BY rcnt.pred, top_n, tot)
        SELECT base.pred, n_triples, n_subj, n_obj,
               ROUND(n_subj / CAST(n_triples AS DOUBLE), 6) AS functionality,
               ROUND(n_obj / CAST(n_triples AS DOUBLE), 6)
                   AS inv_functionality,
               domain_prefix, domain_share, range_prefix, range_share
        FROM base
        JOIN dom ON base.pred = dom.pred
        JOIN rng ON base.pred = rng.pred
    """
    # --- VoID/ABSTAT schema graph: full typed-pattern profile + per-pred
    # share over the same distinct KG projection
    d["schema_graph"] = f"""
        WITH {_kg_triples_sql()},
        g AS (SELECT pred,
                     substring(subj, 1, 1) AS subj_type,
                     substring(obj, 1, 1) AS obj_type,
                     CAST(COUNT(*) AS BIGINT) AS n_triples,
                     CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subjects,
                     CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_objects
              FROM t GROUP BY 1, 2, 3)
        SELECT pred, subj_type, obj_type, n_triples, n_subjects, n_objects,
               ROUND(n_triples / CAST(SUM(n_triples) OVER (PARTITION BY pred)
                                      AS DOUBLE), 6) AS share
        FROM g
    """
    # --- basic-graph-pattern match: the same conjunction as explicit joins
    d["bgp_match"] = f"""
        WITH {_kg_triples_sql()}
        SELECT DISTINCT p1.subj AS c, p1.obj AS n, p3.obj AS o
        FROM t p1
        JOIN t p2 ON p2.subj = p1.obj
                 AND p2.pred = 'in_region' AND p2.obj = 'r1'
        JOIN t p3 ON p3.subj = p1.subj AND p3.pred = 'placed'
        WHERE p1.pred = 'in_nation'
    """
    # --- OPTIONAL + NOT EXISTS: same left join + anti subquery in SQL
    d["bgp_optional"] = f"""
        WITH {_kg_triples_sql()}
        SELECT DISTINCT p1.subj AS c, p1.obj AS n, p2.obj AS ord
        FROM t p1
        LEFT JOIN t p2 ON p2.subj = p1.subj AND p2.pred = 'placed'
        WHERE p1.pred = 'in_nation'
          AND NOT EXISTS (SELECT 1 FROM t x
                          WHERE x.subj = p1.subj AND x.pred = 'in_region')
    """
    # --- property path (in_nation|in_region){1,2}/^in_region: the same
    # alternation / bounded-repetition / inverse composition as explicit
    # set SQL over the distinct triple CTE
    d["path_query"] = f"""
        WITH {_kg_triples_sql()},
        loc AS (SELECT subj AS s, obj AS o FROM t
                WHERE pred IN ('in_nation', 'in_region')),
        up2 AS (SELECT s, o FROM loc
                UNION
                SELECT a.s, b.o FROM loc a JOIN loc b ON a.o = b.s)
        SELECT DISTINCT u.s AS src, tr.subj AS dst
        FROM up2 u
        JOIN t tr ON tr.pred = 'in_region' AND tr.obj = u.o
        WHERE tr.subj LIKE 'n%'
    """
    # --- unbounded closure (in_nation|in_region)+: a true recursive CTE
    # pins the fixpoint independently of the Spark round count
    d["path_closure"] = f"""
        WITH RECURSIVE {_kg_triples_sql()},
        loc AS (SELECT subj AS src, obj AS dst FROM t
                WHERE pred IN ('in_nation', 'in_region')),
        clo(src, dst) AS (
            SELECT src, dst FROM loc
            UNION
            SELECT c.src, l.dst FROM clo c JOIN loc l ON c.dst = l.src
        )
        SELECT src, dst FROM clo
    """
    # --- SHACL-lite validation: per-constraint checks replayed verbatim
    # over the same distinct triple set, aggregated to violation counts
    d["shacl_validate"] = f"""
        WITH {_kg_triples_sql()},
        ent AS (SELECT DISTINCT focus, substring(focus, 1, 1) AS p FROM (
                    SELECT subj AS focus FROM t
                    UNION ALL SELECT obj FROM t) u
                WHERE substring(focus, 1, 1) IN ('c', 'o')),
        cnt AS (SELECT subj AS focus, pred, COUNT(*) AS cnt FROM t
                WHERE pred IN ('in_region', 'placed', 'contains')
                GROUP BY 1, 2),
        viol AS (
            SELECT e.focus, 'in_region' AS pred, 'min_count' AS code
            FROM ent e LEFT JOIN cnt ON cnt.focus = e.focus
                                    AND cnt.pred = 'in_region'
            WHERE e.p = 'c' AND COALESCE(cnt.cnt, 0) < 1
            UNION ALL
            SELECT e.focus, 'placed', 'min_count'
            FROM ent e LEFT JOIN cnt ON cnt.focus = e.focus
                                    AND cnt.pred = 'placed'
            WHERE e.p = 'c' AND COALESCE(cnt.cnt, 0) < 1
            UNION ALL
            SELECT e.focus, 'placed', 'max_count'
            FROM ent e LEFT JOIN cnt ON cnt.focus = e.focus
                                    AND cnt.pred = 'placed'
            WHERE e.p = 'c' AND COALESCE(cnt.cnt, 0) > 15
            UNION ALL
            SELECT e.focus, 'contains', 'min_count'
            FROM ent e LEFT JOIN cnt ON cnt.focus = e.focus
                                    AND cnt.pred = 'contains'
            WHERE e.p = 'o' AND COALESCE(cnt.cnt, 0) < 1
            UNION ALL
            SELECT subj, 'supplied_by', 'range' FROM t
            WHERE pred = 'supplied_by' AND substring(subj, 1, 1) = 'p'
              AND substring(obj, 1, 1) <> 'n'
            UNION ALL
            SELECT subj, 'in_nation', 'pattern' FROM t
            WHERE pred = 'in_nation' AND substring(subj, 1, 1) = 'c'
              AND NOT regexp_matches(obj, '^(?:n[0-9])$')
            UNION ALL
            SELECT subj, 'in_region', 'range' FROM t
            WHERE pred = 'in_region' AND substring(subj, 1, 1) = 'n'
              AND substring(obj, 1, 1) <> 'r'
        )
        SELECT substring(focus, 1, 1) AS target_prefix, pred, code,
               CAST(COUNT(*) AS BIGINT) AS n_violations
        FROM viol GROUP BY 1, 2, 3
    """
    # --- RDFS entailment: recursive-CTE schema closure, same saturation
    d["rdfs_inferred"] = f"""
        WITH RECURSIVE {_kg_triples_sql()},
        spe(p, q) AS (VALUES ('bought', 'interacted_with'),
                             ('placed', 'interacted_with'),
                             ('in_nation', 'located_in'),
                             ('in_region', 'located_in'),
                             ('located_in', 'related_to')),
        sce(c, d) AS (VALUES ('Nation', 'Place'), ('Region', 'Place'),
                             ('Customer', 'Agent')),
        dome(p, c) AS (VALUES ('placed', 'Customer'),
                              ('supplied_by', 'Part')),
        rnge(p, c) AS (VALUES ('in_nation', 'Nation'),
                              ('in_region', 'Region')),
        sp AS (SELECT p, q FROM spe
               UNION SELECT sp.p, e.q FROM sp JOIN spe e ON sp.q = e.p),
        sc AS (SELECT c, d FROM sce
               UNION SELECT sc.c, e.d FROM sc JOIN sce e ON sc.d = e.c),
        spr AS (SELECT p, q FROM sp
                UNION SELECT p, p FROM (SELECT p FROM spe
                                        UNION SELECT q AS p FROM spe
                                        UNION SELECT p FROM dome
                                        UNION SELECT p FROM rnge) u),
        scr AS (SELECT c, d FROM sc
                UNION SELECT c, c FROM (SELECT c FROM sce
                                        UNION SELECT d AS c FROM sce
                                        UNION SELECT c FROM dome
                                        UNION SELECT c FROM rnge) u),
        dome_eff AS (SELECT DISTINCT spr.p, scr.d AS c FROM spr
                     JOIN dome ON dome.p = spr.q
                     JOIN scr ON scr.c = dome.c),
        rnge_eff AS (SELECT DISTINCT spr.p, scr.d AS c FROM spr
                     JOIN rnge ON rnge.p = spr.q
                     JOIN scr ON scr.c = rnge.c),
        inf AS (
            SELECT t.subj, sp.q AS pred, t.obj FROM t JOIN sp ON t.pred = sp.p
            UNION
            SELECT t.subj, 'type', de.c FROM t JOIN dome_eff de ON t.pred = de.p
            UNION
            SELECT t.obj, 'type', re.c FROM t JOIN rnge_eff re ON t.pred = re.p
            UNION
            SELECT t.subj, 'type', sc.d FROM t
            JOIN sc ON t.pred = 'type' AND t.obj = sc.c
        )
        SELECT subj, pred, obj FROM inf
        EXCEPT
        SELECT subj, pred, obj FROM t
    """
    # --- HLL distinct sketch: identical registers + estimator (p=8)
    from node_feedparser_spark.operators.sketch import _alpha as _hll_alpha

    _m = 256
    _amm = repr(_hll_alpha(_m) * _m * _m)
    d["hll_distinct"] = f"""
        WITH h AS (SELECT l_returnflag,
                          {portable_hash60_sql_("CAST(l_partkey AS VARCHAR)")}
                              AS h
                   FROM lineitem),
        r AS (SELECT l_returnflag, h % {_m} AS bucket,
                     CASE WHEN (h >> 8) = 0 THEN 53
                          ELSE 53 - length(bin(h >> 8)) END AS rho
              FROM h),
        reg AS (SELECT l_returnflag, bucket, MAX(rho) AS register
                FROM r GROUP BY 1, 2),
        a AS (SELECT l_returnflag,
                     CAST(COUNT(*) AS BIGINT) AS n_registers,
                     ROUND(SUM(POWER(2.0, -register)), 9) AS s
              FROM reg GROUP BY 1),
        est AS (SELECT l_returnflag, n_registers,
                       CAST({_m} - n_registers AS BIGINT) AS n_zero_buckets,
                       {_amm} / (s + ({_m} - n_registers)) AS raw
                FROM a)
        SELECT l_returnflag, n_registers, n_zero_buckets,
               ROUND(CASE WHEN raw <= {2.5 * _m} AND n_zero_buckets > 0
                          THEN {_m}.0 * LN({_m}.0 / n_zero_buckets)
                          ELSE raw END, 4) AS hll_estimate
        FROM est
    """
    # --- KMV / theta-sketch overlap: identical k-smallest-hash sketches
    # per side, thresholds, and combined-sketch estimator (k=256).  The
    # estimator multiplications stay exactly representable as doubles
    # (count * 2^60 with count <= 2k) and each division happens once, so
    # the 4-dp estimates match bit-for-bit.
    _kmv_k = 256
    _kmv_H = 1 << 60
    d["kmv_overlap"] = f"""
        WITH docs AS (SELECT doc_id % 2 AS side, text FROM documents),
        sh AS (SELECT side, unnest({shingles_sql('text', 3)}) AS elem
               FROM docs),
        dh AS (SELECT DISTINCT side,
                      {portable_hash60_sql_("CAST(elem AS VARCHAR)")} AS h
               FROM sh),
        sk AS (SELECT side, h, rn FROM (
                   SELECT side, h,
                          ROW_NUMBER() OVER (PARTITION BY side
                                             ORDER BY h) AS rn
                   FROM dh) WHERE rn <= {_kmv_k}),
        stats AS (SELECT side, COUNT(*) AS cnt,
                         MAX(CASE WHEN rn = {_kmv_k} THEN h END) AS kth
                  FROM sk GROUP BY side),
        st2 AS (SELECT side, cnt,
                       CASE WHEN cnt >= {_kmv_k} THEN kth
                            ELSE {_kmv_H} END AS thresh,
                       CASE WHEN cnt < {_kmv_k} THEN CAST(cnt AS DOUBLE)
                            ELSE ROUND((CAST({_kmv_k - 1} AS DOUBLE)
                                        * CAST({_kmv_H} AS DOUBLE))
                                       / CAST(kth AS DOUBLE), 4)
                       END AS est
                FROM stats),
        sides AS (SELECT MIN(side) AS side_a, MAX(side) AS side_b,
                         min_by(est, side) AS est_distinct_a,
                         max_by(est, side) AS est_distinct_b,
                         MIN(thresh) AS min_thresh
                  FROM st2),
        pruned AS (SELECT sk.side, sk.h FROM sk, sides
                   WHERE sk.h < sides.min_thresh),
        pc AS (SELECT h, COUNT(DISTINCT side) AS nsides
               FROM pruned GROUP BY h),
        cnts AS (SELECT CAST(COUNT(*) AS BIGINT) AS union_cnt,
                        CAST(COUNT(CASE WHEN nsides = 2 THEN 1 END)
                             AS BIGINT) AS inter_cnt
                 FROM pc)
        SELECT s.side_a, s.side_b, {_kmv_k} AS k,
               s.est_distinct_a, s.est_distinct_b,
               ROUND(CAST(c.union_cnt AS DOUBLE)
                     * CAST({_kmv_H} AS DOUBLE)
                     / CAST(s.min_thresh AS DOUBLE), 4) AS est_union,
               ROUND(CAST(c.inter_cnt AS DOUBLE)
                     * CAST({_kmv_H} AS DOUBLE)
                     / CAST(s.min_thresh AS DOUBLE), 4) AS est_intersection,
               CASE WHEN c.union_cnt > 0
                    THEN ROUND(CAST(c.inter_cnt AS DOUBLE)
                               / CAST(c.union_cnt AS DOUBLE), 4)
               END AS est_jaccard
        FROM sides s, cnts c
    """
    # --- all-pairs KMV overlap matrix: one k=128 sketch per source,
    # per-pair theta = LEAST of the two thresholds, then the three
    # estimators — identical integer sketches, single-division doubles
    _kpw_k = 128
    d["kmv_pairwise"] = f"""
        WITH sh AS (SELECT source AS side,
                           unnest({shingles_sql('text', 3)}) AS elem
                    FROM documents),
        dh AS (SELECT DISTINCT side,
                      {portable_hash60_sql_("CAST(elem AS VARCHAR)")} AS h
               FROM sh),
        sk AS (SELECT side, h, rn FROM (
                   SELECT side, h,
                          ROW_NUMBER() OVER (PARTITION BY side
                                             ORDER BY h) AS rn
                   FROM dh) WHERE rn <= {_kpw_k}),
        st AS (SELECT side,
                      CASE WHEN COUNT(*) >= {_kpw_k}
                           THEN MAX(CASE WHEN rn = {_kpw_k} THEN h END)
                           ELSE {_kmv_H} END AS thresh
               FROM sk GROUP BY side),
        pairs AS (SELECT a.side AS side_a, b.side AS side_b,
                         LEAST(a.thresh, b.thresh) AS th
                  FROM st a JOIN st b ON a.side < b.side),
        na AS (SELECT p.side_a, p.side_b, COUNT(*) AS na
               FROM pairs p JOIN sk s ON s.side = p.side_a
               WHERE s.h < p.th GROUP BY p.side_a, p.side_b),
        nb AS (SELECT p.side_a, p.side_b, COUNT(*) AS nb
               FROM pairs p JOIN sk s ON s.side = p.side_b
               WHERE s.h < p.th GROUP BY p.side_a, p.side_b),
        ni AS (SELECT p.side_a, p.side_b, COUNT(*) AS ni
               FROM pairs p
               JOIN sk s1 ON s1.side = p.side_a
               JOIN sk s2 ON s2.side = p.side_b AND s2.h = s1.h
               WHERE s1.h < p.th GROUP BY p.side_a, p.side_b),
        c AS (SELECT p.side_a, p.side_b, p.th,
                     COALESCE(na.na, 0) AS na, COALESCE(nb.nb, 0) AS nb,
                     COALESCE(ni.ni, 0) AS ni,
                     COALESCE(na.na, 0) + COALESCE(nb.nb, 0)
                         - COALESCE(ni.ni, 0) AS nu
              FROM pairs p
              LEFT JOIN na ON na.side_a = p.side_a AND na.side_b = p.side_b
              LEFT JOIN nb ON nb.side_a = p.side_a AND nb.side_b = p.side_b
              LEFT JOIN ni ON ni.side_a = p.side_a AND ni.side_b = p.side_b)
        SELECT side_a, side_b,
               ROUND(CAST(ni AS DOUBLE) * CAST({_kmv_H} AS DOUBLE)
                     / CAST(th AS DOUBLE), 4) AS est_intersection,
               ROUND(CAST(nu AS DOUBLE) * CAST({_kmv_H} AS DOUBLE)
                     / CAST(th AS DOUBLE), 4) AS est_union,
               CASE WHEN nu > 0
                    THEN ROUND(CAST(ni AS DOUBLE) / CAST(nu AS DOUBLE), 4)
               END AS est_jaccard
        FROM c
    """
    # --- GraphSAGE sampled neighbor agg: hash-ranked fanout-8 sample +
    # two unrolled floor-division mixing hops in micro-unit BIGINTs (the
    # operator's fixed-point discipline — no float rounding anywhere, so
    # the replay is bit-exact by construction).  floordiv(x, n) =
    # (x - pmod(x, n)) / n: the numerator is an exact multiple, so the
    # double division is exact and the cast lossless.
    na_hash = portable_hash60_sql_("src_id || chr(31) || dst_id", seed=23)

    def _fdiv(x: str, n: str) -> str:
        return f"CAST(({x} - ((({x}) % ({n}) + ({n})) % ({n}))) / ({n}) AS BIGINT)"

    d["neighbor_agg"] = f"""
        WITH e AS (SELECT DISTINCT src_id, dst_id FROM (
                SELECT 's' || l_suppkey AS src_id,
                       'p' || l_partkey AS dst_id FROM lineitem
                UNION ALL
                SELECT 'p' || l_partkey, 's' || l_suppkey FROM lineitem) t),
        adj AS (SELECT src_id, dst_id FROM (
                SELECT src_id, dst_id,
                       ROW_NUMBER() OVER (PARTITION BY src_id
                           ORDER BY {na_hash} ASC, dst_id ASC) AS rk
                FROM e) q WHERE rk <= 8),
        h0 AS (SELECT 's' || s_suppkey AS node,
                      CAST(ROUND(CAST(s_acctbal AS DOUBLE) * 1e6, 0)
                           AS BIGINT) AS feat FROM supplier
               UNION ALL
               SELECT 'p' || p_partkey,
                      CAST(ROUND(CAST(p_retailprice AS DOUBLE) * 1e6, 0)
                           AS BIGINT)
               FROM part),
        nb1 AS (SELECT a.src_id AS node,
                       {_fdiv("SUM(h.feat)", "COUNT(*)")} AS nb
                FROM adj a JOIN h0 h ON h.node = a.dst_id GROUP BY 1),
        h1 AS (SELECT h0.node,
                      CASE WHEN nb1.nb IS NULL THEN h0.feat
                           ELSE {_fdiv("h0.feat + nb1.nb", "2")} END
                          AS feat
               FROM h0 LEFT JOIN nb1 ON h0.node = nb1.node),
        nb2 AS (SELECT a.src_id AS node,
                       {_fdiv("SUM(h.feat)", "COUNT(*)")} AS nb
                FROM adj a JOIN h1 h ON h.node = a.dst_id GROUP BY 1),
        h2 AS (SELECT h1.node,
                      CASE WHEN nb2.nb IS NULL THEN h1.feat
                           ELSE {_fdiv("h1.feat + nb2.nb", "2")} END
                          AS feat
               FROM h1 LEFT JOIN nb2 ON h1.node = nb2.node)
        SELECT h0.node, h0.feat / 1e6 AS feat0, h2.feat / 1e6 AS feat
        FROM h0 JOIN h2 ON h0.node = h2.node
    """
    # --- CMS heavy hitters: identical d=4 x w=1024 counter table.  Seeded
    # hash rows replay portable_hash60(value, seed=r)'s "{r}\x1f" prefix;
    # int(threshold * total) truncation == FLOOR on positives.
    _cms_d, _cms_w, _cms_t = 4, 1024, 0.005

    def _cms_h(r: int) -> str:
        return portable_hash60_sql_("token", seed=r)

    _cms_rows = " UNION ALL ".join(
        f"SELECT {r} AS row, {_cms_h(r)} % {_cms_w} AS bucket FROM toks"
        for r in range(_cms_d)
    )
    _cms_probe = " UNION ALL ".join(
        f"SELECT token, {r} AS row, {_cms_h(r)} % {_cms_w} AS bucket FROM cand"
        for r in range(_cms_d)
    )
    d["cms_heavy_hitters"] = f"""
        WITH toks AS (SELECT t AS token
                      FROM documents, unnest(string_split(text, ' ')) AS u(t)
                      WHERE t <> ''),
        cells AS ({_cms_rows}),
        counters AS (SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM cells GROUP BY 1, 2),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
        cand AS (SELECT DISTINCT token FROM toks),
        probe AS ({_cms_probe}),
        est AS (SELECT p.token,
                       MIN(COALESCE(c.cnt, 0)) AS cms_count
                FROM probe p LEFT JOIN counters c
                     ON c.row = p.row AND c.bucket = p.bucket
                GROUP BY 1)
        SELECT token, CAST(cms_count AS BIGINT) AS cms_count,
               ROUND(cms_count / CAST(tot.n AS DOUBLE), 6) AS est_frac
        FROM est, tot
        WHERE cms_count >= CAST(FLOOR({_cms_t} * tot.n) AS BIGINT)
    """
    # --- Histogram quantiles: same 64-bucket fixed-width histogram,
    # cumulative covering-bucket rank, in-bucket linear interpolation.
    # Every arithmetic term is cast to DOUBLE so both engines do the same
    # IEEE ops (DuckDB VALUES decimals / HUGEINT sums would otherwise
    # compute rank boundaries exactly where Spark computes them in binary).
    _hb = 64
    d["hist_quantiles"] = f"""
        WITH v AS (SELECT l_returnflag AS g,
                          CAST(l_extendedprice AS DOUBLE) AS x
                   FROM lineitem),
        bounds AS (SELECT g, MIN(x) AS lo, MAX(x) AS hi FROM v GROUP BY 1),
        hist AS (SELECT v.g, lo, hi,
                        CAST(CASE WHEN hi > lo
                             THEN LEAST(FLOOR((x - lo) / (hi - lo) * {_hb}),
                                        {_hb - 1})
                             ELSE 0 END AS BIGINT) AS b,
                        CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM v JOIN bounds ON v.g = bounds.g
                 GROUP BY 1, 2, 3, 4),
        cum AS (SELECT g, lo, hi, b, cnt,
                       CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum,
                       CAST(SUM(cnt) OVER (PARTITION BY g) AS DOUBLE) AS tot
                FROM hist),
        qs AS (SELECT CAST(q AS DOUBLE) AS q
               FROM (VALUES (0.25), (0.5), (0.95)) t(q))
        SELECT g AS l_returnflag, q,
               ROUND(CASE WHEN hi > lo
                     THEN lo + (b + (q * tot - (cum - cnt)) / cnt)
                              * (hi - lo) / {_hb}
                     ELSE lo END, 6) AS quantile_est
        FROM cum CROSS JOIN qs
        WHERE cum >= q * tot AND (cum - cnt) < q * tot
    """
    # --- Bloom semi-join: identical 4096-bit filter packed 32 bits per
    # BIGINT word (1<<63 overflows DuckDB; positions seeded 100+i), built
    # from p_size > 45 parts, probed by distinct lineitem keys.
    _bm, _bk = 4096, 3

    def _bpos(expr: str, i: int) -> str:
        return f"({portable_hash60_sql_(expr, seed=100 + i)} % {_bm})"

    _bld = " UNION ALL ".join(
        f"SELECT {_bpos('CAST(p_partkey AS VARCHAR)', i)} AS pos FROM dim"
        for i in range(_bk)
    )
    _probe_cols = ", ".join(
        f"{_bpos('CAST(l_partkey AS VARCHAR)', i)} AS pos{i}"
        for i in range(_bk)
    )
    _joins = " ".join(
        f"LEFT JOIN words w{i} ON w{i}.widx = (pos{i} >> 5)"
        for i in range(_bk)
    )
    _conds = " AND ".join(
        f"w{i}.word IS NOT NULL"
        f" AND (w{i}.word & (CAST(1 AS BIGINT) << (pos{i} % 32))) <> 0"
        for i in range(_bk)
    )
    d["bloom_semi_join"] = f"""
        WITH dim AS (SELECT DISTINCT p_partkey FROM part WHERE p_size > 45),
        pos AS ({_bld}),
        words AS (SELECT pos >> 5 AS widx,
                         bit_or(CAST(1 AS BIGINT) << (pos % 32)) AS word
                  FROM pos GROUP BY 1),
        probe AS (SELECT DISTINCT l_partkey FROM lineitem),
        pp AS (SELECT l_partkey, {_probe_cols} FROM probe),
        hits AS (SELECT pp.l_partkey FROM pp {_joins} WHERE {_conds})
        SELECT h.l_partkey,
               (d2.p_partkey IS NOT NULL) AS is_true_member
        FROM hits h LEFT JOIN dim d2 ON d2.p_partkey = h.l_partkey
    """
    # --- Fellegi-Sunter linkage: same blocks, agreement vector, and
    # Python-literal log-ratio weights (no ln() in either engine); the
    # 0.1 length tolerance is cast to DOUBLE so DuckDB does not compare
    # against an exact DECIMAL where Spark compares against binary 0.1.
    from node_feedparser_spark.operators.linkage import DOC_FIELDS

    _fsw = {
        f.name: (repr(f.agree_weight), repr(f.disagree_weight))
        for f in DOC_FIELDS
    }
    _fs_score = " + ".join(
        f"(CASE WHEN {name} THEN {aw} ELSE {dw} END)"
        for name, (aw, dw) in _fsw.items()
    )
    d["fs_linkage"] = f"""
        WITH sh AS (SELECT doc_id, lang, source, n_chars,
                           substr(text, 1, 16) AS pfx,
                           {shingles_sql("text", 3)} AS sh
                    FROM documents),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     (ABS(a.n_chars - b.n_chars)
                      <= CAST(0.1 AS DOUBLE)
                         * GREATEST(a.n_chars, b.n_chars)) AS agree_len,
                     (a.pfx = b.pfx) AS agree_prefix,
                     (len(list_intersect(a.sh, b.sh))::DOUBLE
                      / len(list_distinct(list_concat(a.sh, b.sh)))
                      >= 0.5) AS agree_shingle
              FROM sh a JOIN sh b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id),
        s AS (SELECT doc_a, doc_b, agree_len, agree_prefix, agree_shingle,
                     ROUND({_fs_score}, 6) AS score
              FROM p)
        SELECT doc_a, doc_b, agree_len, agree_prefix, agree_shingle, score,
               CASE WHEN score >= 2.0 THEN 'match'
                    WHEN score <= -2.0 THEN 'non_match'
                    ELSE 'possible' END AS decision
        FROM s
    """
    # --- Sorted-neighborhood near-dup: both passes' LEAD windows, pair
    # canonicalization, exact shingle-Jaccard verify (window=4, thr=0.5)
    _snm_leads1 = " UNION ALL ".join(
        f"""SELECT doc_id AS x, LEAD(doc_id, {j}) OVER
            (PARTITION BY blk ORDER BY key, doc_id) AS y FROM p1"""
        for j in range(1, 4)
    )
    _snm_leads2 = " UNION ALL ".join(
        f"""SELECT doc_id AS x, LEAD(doc_id, {j}) OVER
            (PARTITION BY blk ORDER BY key, doc_id) AS y FROM p2"""
        for j in range(1, 4)
    )
    d["snm_near_dup"] = f"""
        WITH base AS (SELECT doc_id, n_chars,
                             substr(text, 1, 12) AS p12,
                             reverse(substr(text, 1, 24)) AS r24,
                             {shingles_sql("text", 3)} AS sh
                      FROM documents),
        p1 AS (SELECT doc_id, substr(p12, 1, 2) AS blk, p12 AS key
               FROM base),
        p2 AS (SELECT doc_id,
                      substr(lpad(CAST(n_chars AS VARCHAR), 6, '0'), 1, 4)
                          AS blk,
                      lpad(CAST(n_chars AS VARCHAR), 6, '0') || r24 AS key
               FROM base),
        l1 AS ({_snm_leads1}),
        l2 AS ({_snm_leads2}),
        cands AS (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
                  FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2) u
                  WHERE y IS NOT NULL),
        j AS (SELECT c.a AS doc_a, c.b AS doc_b,
                     ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                           / len(list_distinct(list_concat(sa.sh, sb.sh))),
                           6) AS jaccard
              FROM cands c
              JOIN base sa ON sa.doc_id = c.a
              JOIN base sb ON sb.doc_id = c.b)
        SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
    """
    # --- blocking-quality audit: SNM candidates (both LEAD passes) vs the
    # brute-force exact-Jaccard >= 0.7 truth set, same count arithmetic
    d["blocking_quality"] = f"""
        WITH base AS (SELECT doc_id, n_chars,
                             substr(text, 1, 12) AS p12,
                             reverse(substr(text, 1, 24)) AS r24,
                             {shingles_sql("text", 3)} AS sh
                      FROM documents),
        p1 AS (SELECT doc_id, substr(p12, 1, 2) AS blk, p12 AS key
               FROM base),
        p2 AS (SELECT doc_id,
                      substr(lpad(CAST(n_chars AS VARCHAR), 6, '0'), 1, 4)
                          AS blk,
                      lpad(CAST(n_chars AS VARCHAR), 6, '0') || r24 AS key
               FROM base),
        l1 AS ({_snm_leads1}),
        l2 AS ({_snm_leads2}),
        cands AS (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
                  FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2) u
                  WHERE y IS NOT NULL),
        truth AS (SELECT sa.doc_id AS a, sb.doc_id AS b
                  FROM base sa JOIN base sb ON sa.doc_id < sb.doc_id
                  WHERE ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                        / len(list_distinct(list_concat(sa.sh, sb.sh))),
                        6) >= 0.7),
        nrec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_records FROM base),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cands),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
        nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits FROM truth t
               WHERE EXISTS (SELECT 1 FROM cands c
                             WHERE c.a = t.a AND c.b = t.b))
        SELECT n_records,
               CAST((n_records * (n_records - 1)) // 2 AS BIGINT)
                   AS n_total_pairs,
               n_candidates, n_truth, n_hits,
               ROUND(1 - n_candidates
                     / CAST((n_records * (n_records - 1)) // 2 AS DOUBLE),
                     6) AS reduction_ratio,
               ROUND(n_hits / CAST(n_truth AS DOUBLE), 6)
                   AS pairs_completeness,
               ROUND(n_hits / CAST(n_candidates AS DOUBLE), 6)
                   AS pair_quality
        FROM nrec, nc, nt, nh
    """
    # --- ER clustering quality: the cheap 12-char-prefix fingerprint
    # clustering vs the exact-Jaccard truth closure, then the full
    # contingency-table metric arithmetic (B-cubed / pairwise / ARI)
    d["cluster_quality"] = f"""
        WITH RECURSIVE base AS (SELECT doc_id,
                             substr(text, 1, 12) AS p12,
                             {shingles_sql("text", 3)} AS sh
                      FROM documents),
        truth AS (SELECT sa.doc_id AS a, sb.doc_id AS b
                  FROM base sa JOIN base sb ON sa.doc_id < sb.doc_id
                  WHERE ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                        / len(list_distinct(list_concat(sa.sh, sb.sh))),
                        6) >= 0.7),
        te AS (SELECT a, b FROM truth UNION SELECT b, a FROM truth),
        treach(node, r) AS (
            SELECT a, b FROM te
            UNION
            SELECT treach.node, te.b FROM treach JOIN te ON treach.r = te.a),
        tcomp AS (SELECT node, LEAST(node, MIN(r)) AS g
                  FROM treach GROUP BY node),
        lab AS (SELECT substr(d.text, 1, 12) AS p,
                       COALESCE(tc.g, d.doc_id) AS t
                FROM documents d
                LEFT JOIN tcomp tc ON tc.node = d.doc_id),
        pt AS (SELECT p, t, CAST(COUNT(*) AS BIGINT) AS n_pt
               FROM lab GROUP BY 1, 2),
        byp AS (SELECT p, CAST(SUM(n_pt) AS BIGINT) AS n_p
                FROM pt GROUP BY 1),
        byt AS (SELECT t, CAST(SUM(n_pt) AS BIGINT) AS n_t
                FROM pt GROUP BY 1),
        cont AS (SELECT CAST(SUM(n_pt) AS BIGINT) AS n,
                        SUM(n_pt * (n_pt - 1) / 2) AS tp_pairs FROM pt),
        ps AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pred_clusters,
                      SUM(n_p * (n_p - 1) / 2) AS pred_pairs FROM byp),
        tsx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_clusters,
                       SUM(n_t * (n_t - 1) / 2) AS true_pairs FROM byt),
        b3 AS (SELECT ROUND(SUM(n_pt * n_pt / CAST(n_p AS DOUBLE)), 6)
                          AS b3p_sum,
                      ROUND(SUM(n_pt * n_pt / CAST(n_t AS DOUBLE)), 6)
                          AS b3r_sum
               FROM pt JOIN byp USING (p) JOIN byt USING (t))
        SELECT n AS n_items, n_pred_clusters, n_true_clusters,
               ROUND(b3p_sum / n, 6) AS b3_precision,
               ROUND(b3r_sum / n, 6) AS b3_recall,
               ROUND(CASE WHEN b3p_sum / n + b3r_sum / n > 0
                     THEN 2 * (b3p_sum / n) * (b3r_sum / n)
                          / (b3p_sum / n + b3r_sum / n)
                     ELSE 0.0 END, 6) AS b3_f1,
               ROUND(CASE WHEN pred_pairs > 0
                     THEN tp_pairs / pred_pairs ELSE 0.0 END, 6)
                   AS pair_precision,
               ROUND(CASE WHEN true_pairs > 0
                     THEN tp_pairs / true_pairs ELSE 0.0 END, 6)
                   AS pair_recall,
               ROUND(CASE WHEN (CASE WHEN pred_pairs > 0
                                THEN tp_pairs / pred_pairs ELSE 0.0 END)
                              + (CASE WHEN true_pairs > 0
                                 THEN tp_pairs / true_pairs ELSE 0.0 END) > 0
                     THEN 2 * (CASE WHEN pred_pairs > 0
                               THEN tp_pairs / pred_pairs ELSE 0.0 END)
                            * (CASE WHEN true_pairs > 0
                               THEN tp_pairs / true_pairs ELSE 0.0 END)
                          / ((CASE WHEN pred_pairs > 0
                              THEN tp_pairs / pred_pairs ELSE 0.0 END)
                             + (CASE WHEN true_pairs > 0
                                THEN tp_pairs / true_pairs ELSE 0.0 END))
                     ELSE 0.0 END, 6) AS pair_f1,
               ROUND(CASE WHEN (pred_pairs + true_pairs) / 2
                              - pred_pairs * true_pairs
                                / (n * (n - 1) / 2) <> 0
                     THEN (tp_pairs - pred_pairs * true_pairs
                                      / (n * (n - 1) / 2))
                          / ((pred_pairs + true_pairs) / 2
                             - pred_pairs * true_pairs / (n * (n - 1) / 2))
                     ELSE 0.0 END, 6) AS ari
        FROM cont, ps, tsx, b3
    """
    # --- A-ES weighted sample: identical (h+1)/2^60 -> ln(u)/w ordering
    _ws_h = portable_hash60_sql_("CAST(doc_id AS VARCHAR)", seed=11)
    d["weighted_sample"] = f"""
        WITH keyed AS (SELECT lang, doc_id, n_chars,
                              LN(({_ws_h} + 1) / 1152921504606846976.0)
                                  / CAST(n_chars AS DOUBLE) AS key
                       FROM documents
                       WHERE n_chars > 0),
        r AS (SELECT lang, doc_id, n_chars,
                     CAST(ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY key DESC, doc_id ASC) AS BIGINT) AS rank
              FROM keyed)
        SELECT lang, doc_id, n_chars, rank FROM r WHERE rank <= 5
    """
    # --- Funnel: same per-step first-occurrence frontiers (24 h hops)
    d["funnel"] = """
        WITH f1 AS (SELECT user_id AS u, MIN(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY 1),
        f2 AS (SELECT e.user_id AS u, MIN(e.ts) AS t
               FROM events e JOIN f1 ON f1.u = e.user_id
               WHERE e.event_type = 'click'
                 AND e.ts > f1.t AND e.ts <= f1.t + INTERVAL 24 HOUR
               GROUP BY 1),
        f3 AS (SELECT e.user_id AS u, MIN(e.ts) AS t
               FROM events e JOIN f2 ON f2.u = e.user_id
               WHERE e.event_type = 'purchase'
                 AND e.ts > f2.t AND e.ts <= f2.t + INTERVAL 24 HOUR
               GROUP BY 1),
        c AS (SELECT 1 AS step_idx, 'view' AS step,
                     CAST(COUNT(*) AS BIGINT) AS n_users FROM f1
              UNION ALL
              SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM f2
              UNION ALL
              SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM f3),
        base AS (SELECT GREATEST(CAST(COUNT(*) AS BIGINT), 1) AS b FROM f1)
        SELECT CAST(step_idx AS INT) AS step_idx, step, n_users,
               ROUND(n_users / CAST(base.b AS DOUBLE), 6) AS conversion_rate
        FROM c, base
    """
    # --- Cohort retention: Monday-truncated weeks in both engines;
    # offsets are exact multiples of 7 days
    d["cohort_retention"] = """
        WITH wk AS (SELECT user_id AS u, date_trunc('week', ts) AS w
                    FROM events),
        firsts AS (SELECT u, MIN(w) AS cohort_ts FROM wk GROUP BY 1),
        activity AS (SELECT DISTINCT u, w FROM wk),
        sizes AS (SELECT cohort_ts,
                         CAST(COUNT(DISTINCT u) AS BIGINT) AS cohort_size
                  FROM firsts GROUP BY 1),
        j AS (SELECT a.u, f.cohort_ts,
                     CAST(date_diff('day', f.cohort_ts, a.w) / 7 AS BIGINT)
                         AS week_offset
              FROM activity a JOIN firsts f ON a.u = f.u),
        g AS (SELECT cohort_ts, week_offset,
                     CAST(COUNT(DISTINCT u) AS BIGINT) AS n_active
              FROM j GROUP BY 1, 2)
        SELECT CAST(g.cohort_ts AS DATE) AS cohort_week, week_offset,
               n_active,
               ROUND(n_active / CAST(s.cohort_size AS DOUBLE), 6)
                   AS retention
        FROM g JOIN sizes s ON s.cohort_ts = g.cohort_ts
    """
    # --- Incremental CC: the oracle is the FULL closure over all edges —
    # passing means the two-batch incremental fold equals full recompute
    d["incremental_cc"] = """
        WITH RECURSIVE c AS (SELECT CAST(c_custkey AS BIGINT) AS k,
                          c_nationkey AS nk
                   FROM customer),
        e0 AS (SELECT a.k AS src, b.k AS dst
               FROM c a JOIN c b ON b.k = a.k + 1 AND a.nk = b.nk),
        edges AS (SELECT src AS a, dst AS b FROM e0
                  UNION SELECT dst, src FROM e0),
        reach(node, r) AS (
            SELECT a, b FROM edges
            UNION
            SELECT reach.node, edges.b
            FROM reach JOIN edges ON reach.r = edges.a),
        comp AS (SELECT node, LEAST(node, MIN(r)) AS component
                 FROM reach GROUP BY node)
        SELECT cc.k AS node, COALESCE(comp.component, cc.k) AS component
        FROM c cc LEFT JOIN comp ON cc.k = comp.node
    """
    # --- BM25: identical tf/df/dl/avgdl stats and scoring formula,
    # ranked by the ROUNDED score (matching the Spark side exactly)
    _bm_vals = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)
    d["bm25_topk"] = f"""
        WITH q AS (SELECT * FROM (VALUES {_bm_vals}) t(query_id, qtext)),
        qt AS (SELECT DISTINCT query_id,
                      unnest(list_filter(
                          regexp_split_to_array(lower(qtext), '\\s+'),
                          x -> x <> '')) AS token
               FROM q),
        tok AS (SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS token
                FROM documents),
        tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
               FROM tok GROUP BY 1),
        df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
               FROM tf GROUP BY 1),
        st AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                          AS n_docs,
                      CAST((SELECT COUNT(*) FROM tok) AS DOUBLE)
                      / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                          AS avgdl),
        s AS (SELECT qt.query_id, tf.doc_id,
                     ROUND(SUM(
                         LN(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * 2.2
                         / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
                     ), 6) AS score
              FROM tf JOIN qt USING (token)
                      JOIN df USING (token)
                      JOIN dl ON dl.doc_id = tf.doc_id
                      CROSS JOIN st
              GROUP BY 1, 2),
        r AS (SELECT query_id, doc_id, score,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
              FROM s)
        SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 5
    """
    # --- Z-order layout: identical bit interleave (8 bits x 2 cols,
    # 64 z-range files of width 2^16/64); FLOOR before the BIGINT cast —
    # DuckDB's double->int cast ROUNDS where Spark's truncates
    from node_feedparser_spark.operators.layout import zorder_key_sql

    _zcols = ["p_size", "p_retailprice"]
    _zexpr = zorder_key_sql(_zcols, bits=8)
    d["zorder_layout"] = f"""
        WITH bounds AS (SELECT
                MIN(CAST(p_size AS DOUBLE)) AS _lo_p_size,
                MAX(CAST(p_size AS DOUBLE)) AS _hi_p_size,
                MIN(CAST(p_retailprice AS DOUBLE)) AS _lo_p_retailprice,
                MAX(CAST(p_retailprice AS DOUBLE)) AS _hi_p_retailprice
            FROM part),
        z AS (SELECT p_size, p_retailprice, {_zexpr} AS zkey
              FROM part CROSS JOIN bounds),
        f AS (SELECT CAST(FLOOR(zkey / 1024) AS BIGINT) AS file_id,
                     p_size, p_retailprice
              FROM z)
        SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(p_size) AS p_size_min, MAX(p_size) AS p_size_max,
               MIN(p_retailprice) AS p_retailprice_min,
               MAX(p_retailprice) AS p_retailprice_max
        FROM f GROUP BY 1
    """
    # --- Sequence packing: the SEQUENTIAL definition (one global window) —
    # the Spark side runs the two-phase distributed scan; integer div/% so
    # no float rounding can diverge; window SUM -> HUGEINT needs the BIGINT
    # cast
    d["sequence_pack"] = """
        WITH t AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens
                     AS global_start
              FROM t)
        SELECT doc_id, n_tokens, global_start,
               global_start // 512 AS seq_id,
               global_start % 512 AS offset_in_seq,
               ((global_start + n_tokens - 1) // 512)
                 - (global_start // 512) + 1 AS n_seqs_spanned
        FROM c
    """
    # --- Winnowing: same positional 5-gram hash stream, same w=4 window
    # min over the (hash, pos) composite key, same valid-starts filter
    from node_feedparser_spark.functions.hashing import portable_hash60_sql

    _wparts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(5))
    _whash = portable_hash60_sql("gram")
    d["winnow_fingerprint"] = f"""
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                   FROM documents),
        g0 AS (SELECT doc_id,
                      CASE WHEN len(toks) >= 5
                           THEN list_transform(range(1, len(toks) - 3),
                                               i -> {_wparts})
                           ELSE [text] END AS grams
               FROM t),
        g AS (SELECT doc_id, len(grams) AS n_grams,
                     unnest(grams) AS gram,
                     generate_subscripts(grams, 1) AS pos
              FROM g0),
        kk AS (SELECT doc_id, n_grams, pos,
                      lpad(CAST({_whash} AS VARCHAR), 19, '0') || ':'
                        || lpad(CAST(pos AS VARCHAR), 10, '0') AS wkey
               FROM g),
        s AS (SELECT doc_id, n_grams, pos,
                     MIN(wkey) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selkey
              FROM kk)
        SELECT DISTINCT doc_id,
               CAST(substr(selkey, 21, 10) AS BIGINT) AS fp_pos,
               CAST(substr(selkey, 1, 19) AS BIGINT) AS fp_hash
        FROM s WHERE pos <= GREATEST(n_grams - 3, 1)
    """
    # --- Chunking: same window arithmetic (chunk 64 / overlap 8 / stride
    # 56); list_slice is 1-based inclusive-end and clamps like F.slice
    d["chunk_documents"] = f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        c AS (SELECT doc_id, toks,
                     GREATEST((GREATEST(CAST(len(toks) AS BIGINT) - 8, 0)
                               + 55) // 56, 1) AS n_chunks
              FROM t),
        e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id
              FROM c),
        p AS (SELECT doc_id, chunk_id,
                     array_to_string(
                       list_slice(toks, chunk_id * 56 + 1,
                                  chunk_id * 56 + 64), ' ') AS chunk_text,
                     CAST(len(list_slice(toks, chunk_id * 56 + 1,
                                         chunk_id * 56 + 64)) AS BIGINT)
                       AS n_chunk_tokens
              FROM e)
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(chunk_id * 56 + 1 AS BIGINT) AS start_token,
               n_chunk_tokens, chunk_text,
               {portable_hash60_sql('chunk_text')} AS chunk_hash
        FROM p
    """
    # --- BPE pair-count kernel: char symbols + '</w>', per-occurrence
    # multiplicity weighted by word count (bpe_merges / bpe_encode are
    # rows-only: the merge loop is an iterative rewrite)
    d["bpe_pair_counts"] = """
        WITH w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
                   FROM (SELECT unnest(string_split(text, ' ')) AS word
                         FROM documents)
                   WHERE word <> '' GROUP BY word),
        s AS (SELECT wc,
                     list_append(list_transform(range(1, len(word) + 1),
                                                i -> word[i:i]),
                                 '</w>') AS syms
              FROM w),
        p AS (SELECT wc, syms, unnest(range(1, len(syms))) AS i FROM s)
        SELECT syms[i] AS l_sym, syms[i+1] AS r_sym,
               CAST(SUM(wc) AS BIGINT) AS pair_count
        FROM p GROUP BY 1, 2
    """
    # --- ALS: oracle emitted from the same code as the Spark plan
    from node_feedparser_spark.operators.factorize import als_sql

    d["als_factorize"] = als_sql(n_alt=2)
    # --- Naive Bayes: same emitted-oracle discipline
    from node_feedparser_spark.operators.classify import naive_bayes_sql

    d["naive_bayes_lang"] = naive_bayes_sql()
    # --- Markov chain: emitted oracle
    from node_feedparser_spark.operators.markov import markov_sql

    d["markov_chain"] = markov_sql(n_steps=2)
    # --- MAD outliers: quantile_cont == Spark exact percentile (same
    # (n-1)*q linear interpolation); flag on the ROUNDED score both sides
    d["mad_outliers"] = """
        WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                     FROM events GROUP BY 1),
        mad AS (SELECT e.event_type,
                       quantile_cont(abs(e.value - m.med), 0.5) AS mad
                FROM events e JOIN med m USING (event_type) GROUP BY 1),
        s AS (SELECT e.event_id, e.event_type, e.value,
                     ROUND(m.med, 6) AS med, ROUND(d.mad, 6) AS mad,
                     ROUND(0.6745 * (e.value - m.med) / d.mad, 4) AS rz
              FROM events e JOIN med m USING (event_type)
                            JOIN mad d USING (event_type)
              WHERE d.mad > 0)
        SELECT * FROM s WHERE abs(rz) > 3.5
    """
    # --- PSI drift: integer-micros midpoint split, reference-decile bins,
    # +0.5 Laplace floors, 6 dp-rounded terms — replayed end to end
    _psi_edges = ", ".join(
        f"quantile_cont(value, {i / 10}) AS _e{i}" for i in range(1, 10)
    )
    _psi_bin = " + ".join(
        f"CASE WHEN value > _e{i} THEN 1 ELSE 0 END" for i in range(1, 10)
    )
    d["psi_drift"] = f"""
        WITH bnd AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
                     FROM events),
        r0 AS (SELECT value FROM events, bnd WHERE 2 * epoch_us(ts) <= lo + hi),
        c0 AS (SELECT value FROM events, bnd WHERE 2 * epoch_us(ts) > lo + hi),
        e AS (SELECT {_psi_edges} FROM r0),
        rb AS (SELECT CAST({_psi_bin} AS BIGINT) AS bin FROM r0 CROSS JOIN e),
        cb AS (SELECT CAST({_psi_bin} AS BIGINT) AS bin FROM c0 CROSS JOIN e),
        rc AS (SELECT bin, COUNT(*) AS n_ref FROM rb GROUP BY 1),
        cc AS (SELECT bin, COUNT(*) AS n_cur FROM cb GROUP BY 1),
        j AS (SELECT COALESCE(rc.bin, cc.bin) AS bin,
                     COALESCE(n_ref, 0) AS n_ref,
                     COALESCE(n_cur, 0) AS n_cur
              FROM rc FULL JOIN cc ON rc.bin = cc.bin),
        t AS (SELECT *, SUM(n_ref) OVER () AS rt, SUM(n_cur) OVER () AS ct
              FROM j)
        SELECT bin, CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               ROUND((n_ref + 0.5) / (rt + 5.0), 6) AS p_ref,
               ROUND((n_cur + 0.5) / (ct + 5.0), 6) AS p_cur,
               ROUND(((n_cur + 0.5) / (ct + 5.0) - (n_ref + 0.5) / (rt + 5.0))
                     * LN(((n_cur + 0.5) / (ct + 5.0))
                          / ((n_ref + 0.5) / (rt + 5.0))), 6) AS psi_term
        FROM t
    """
    # --- Skew profile: same share/width/salt arithmetic, same tie-break
    d["skew_profile"] = """
        WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key, COUNT(*) AS n
                   FROM events GROUP BY 1),
        t AS (SELECT *, SUM(n) OVER () AS tot FROM c),
        r AS (SELECT key, CAST(n AS BIGINT) AS n,
                     ROUND(n / CAST(tot AS DOUBLE), 6) AS share,
                     ROUND(n / CAST(tot AS DOUBLE) * 32, 6)
                       AS partition_widths,
                     GREATEST(CAST(CEIL(n / CAST(tot AS DOUBLE) * 32)
                                   AS BIGINT), 1) AS suggested_salt,
                     ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank
              FROM t)
        SELECT key, n, share, partition_widths, suggested_salt,
               CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 5
    """
    # --- SymSpell join: identical deletion neighborhood + levenshtein
    d["edit_distance_join"] = """
        WITH vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
                       FROM (SELECT unnest(string_split(text, ' ')) AS word
                             FROM documents)
                       WHERE word <> '' GROUP BY 1),
        k AS (SELECT word, wc,
                     unnest(list_append(
                        list_transform(range(1, len(word) + 1),
                           i -> substr(word, 1, i - 1) || substr(word, i + 1)),
                        word)) AS key
              FROM vocab),
        p AS (SELECT DISTINCT a.word AS w1, b.word AS w2,
                     a.wc AS n1, b.wc AS n2
              FROM k a JOIN k b ON a.key = b.key AND a.word < b.word)
        SELECT w1, w2, n1, n2,
               CAST(levenshtein(w1, w2) AS BIGINT) AS dist
        FROM p WHERE levenshtein(w1, w2) <= 1
    """
    # --- Poisson bootstrap: identical hash -> u -> CDF-table weight draw
    from node_feedparser_spark.operators.sketch import POISSON1_CDF

    _pb_hash = portable_hash60_sql("id || ':' || CAST(rep AS VARCHAR)")
    _pb_w = " + ".join(
        f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in POISSON1_CDF
    )
    d["poisson_bootstrap"] = f"""
        WITH rep AS (SELECT event_type AS grp, CAST(value AS DOUBLE) AS v,
                            CAST(event_id AS VARCHAR) AS id,
                            unnest(range(1, 51)) AS rep
                     FROM events),
        uu AS (SELECT grp, v, rep,
                      ({_pb_hash} % 1000000) / 1000000.0 AS u
               FROM rep),
        wt AS (SELECT grp, v, rep, CAST({_pb_w} AS DOUBLE) AS w FROM uu),
        pr AS (SELECT grp, rep, SUM(w * v) AS wv, SUM(w) AS ws
               FROM wt GROUP BY 1, 2),
        m AS (SELECT grp, rep, wv / ws AS m FROM pr WHERE ws > 0),
        plain AS (SELECT event_type AS grp,
                         ROUND(AVG(CAST(value AS DOUBLE)), 6) AS mean
                  FROM events GROUP BY 1),
        boot AS (SELECT grp, ROUND(AVG(m), 6) AS boot_mean,
                        ROUND(STDDEV_SAMP(m), 6) AS boot_se,
                        CAST(COUNT(*) AS BIGINT) AS n_reps
                 FROM m GROUP BY 1)
        SELECT grp AS event_type, mean, boot_mean, boot_se, n_reps
        FROM plain JOIN boot USING (grp)
    """
    # --- k-anonymity audit
    d["k_anonymity"] = """
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2 HAVING COUNT(*) < 12
    """
    # --- l-diversity: same qid tuple, distinct-sensitive floor (band =
    # 200-char length bucket standing in for the sensitive attribute)
    d["l_diversity"] = """
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT CAST(FLOOR(n_chars / 200.0) AS BIGINT))
                    AS BIGINT) AS n_distinct_sensitive
        FROM documents GROUP BY 1, 2
        HAVING COUNT(DISTINCT CAST(FLOOR(n_chars / 200.0) AS BIGINT)) < 3
    """
    # --- frequent itemsets: the same three A-priori levels with the
    # same exact integer relative-support threshold — bit-identical
    d["freq_itemsets"] = """
        WITH b AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS bk,
                          CAST(p_brand AS VARCHAR) AS i
                   FROM lineitem JOIN part ON l_partkey = p_partkey),
        n AS (SELECT COUNT(DISTINCT bk) AS n FROM b),
        f1 AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS support
               FROM b GROUP BY 1
               HAVING CAST(COUNT(*) AS BIGINT) * 10000
                      >= 15 * (SELECT n FROM n)),
        f2 AS (SELECT x.i AS i1, y.i AS i2,
                      CAST(COUNT(*) AS BIGINT) AS support
               FROM b x JOIN b y ON x.bk = y.bk AND x.i < y.i
               WHERE x.i IN (SELECT i FROM f1)
                 AND y.i IN (SELECT i FROM f1)
               GROUP BY 1, 2
               HAVING CAST(COUNT(*) AS BIGINT) * 10000
                      >= 15 * (SELECT n FROM n)),
        f3 AS (SELECT x.i AS i1, y.i AS i2, z.i AS i3,
                      CAST(COUNT(*) AS BIGINT) AS support
               FROM b x
               JOIN b y ON x.bk = y.bk AND x.i < y.i
               JOIN b z ON x.bk = z.bk AND y.i < z.i
               WHERE x.i IN (SELECT i FROM f1)
                 AND y.i IN (SELECT i FROM f1)
                 AND z.i IN (SELECT i FROM f1)
                 AND EXISTS (SELECT 1 FROM f2
                             WHERE f2.i1 = x.i AND f2.i2 = y.i)
                 AND EXISTS (SELECT 1 FROM f2
                             WHERE f2.i1 = x.i AND f2.i2 = z.i)
                 AND EXISTS (SELECT 1 FROM f2
                             WHERE f2.i1 = y.i AND f2.i2 = z.i)
               GROUP BY 1, 2, 3
               HAVING CAST(COUNT(*) AS BIGINT) * 10000
                      >= 15 * (SELECT n FROM n))
        SELECT CAST(1 AS BIGINT) AS k, i AS i1,
               CAST(NULL AS VARCHAR) AS i2, CAST(NULL AS VARCHAR) AS i3,
               support
        FROM f1
        UNION ALL
        SELECT 2, i1, i2, NULL, support FROM f2
        UNION ALL
        SELECT 3, i1, i2, i3, support FROM f3
    """
    # --- N-Triples: identical literal REPLACE chain (escape char first)
    d["ntriples_export"] = """
        SELECT '<urn:kg:e:'
               || REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(
                  REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(
                  CAST(doc_id AS VARCHAR),
                  '%', '%25'), '\\', '%5C'), ' ', '%20'), '<', '%3C'),
                  '>', '%3E'), '"', '%22'), '{', '%7B'), '}', '%7D'),
                  '|', '%7C'), '^', '%5E'), '`', '%60')
               || '> <urn:kg:p:text> "'
               || REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(
                  COALESCE(text, ''),
                  '\\', '\\\\'), '"', '\\"'), chr(10), '\\n'),
                  chr(13), '\\r'), chr(9), '\\t')
               || '" .' AS line
        FROM documents
    """
    # --- pivot: conditional aggregation, missing combos = 0
    d["pivot_counts"] = """
        SELECT user_id,
               CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT)
                   AS n_click,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT)
                   AS n_error,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
                   AS n_purchase,
               CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT)
                   AS n_signup,
               CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT)
                   AS n_view
        FROM events GROUP BY 1
    """
    # --- unpivot: UNION ALL of the four measures, values verbatim
    d["unpivot_measures"] = """
        WITH f AS (SELECT * FROM lineitem WHERE l_orderkey % 50 = 0)
        SELECT l_orderkey AS orderkey,
               CAST(l_linenumber AS BIGINT) AS linenumber,
               'l_quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM f
        UNION ALL
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
               'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM f
        UNION ALL
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
               'l_discount', CAST(l_discount AS DOUBLE) FROM f
        UNION ALL
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
               'l_tax', CAST(l_tax AS DOUBLE) FROM f
    """
    # --- rank family: band-only ordering for rank/dense_rank (ties
    # collapse), total order for ntile/row_number — all integers
    d["rank_analytics"] = """
        WITH b AS (SELECT c_nationkey AS nation, c_custkey AS custkey,
                          CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
                   FROM customer),
        r AS (SELECT nation, custkey, band,
                     CAST(RANK() OVER (PARTITION BY nation
                                       ORDER BY band DESC) AS BIGINT)
                         AS rnk,
                     CAST(DENSE_RANK() OVER (PARTITION BY nation
                                             ORDER BY band DESC) AS BIGINT)
                         AS drnk,
                     CAST(NTILE(4) OVER (PARTITION BY nation
                                         ORDER BY band DESC, custkey)
                          AS BIGINT) AS quartile,
                     CAST(ROW_NUMBER() OVER (PARTITION BY nation
                                             ORDER BY band DESC, custkey)
                          AS BIGINT) AS rn
              FROM b)
        SELECT * FROM r WHERE rn <= 7
    """
    # --- Cohen's kappa: same confusion-table marginal algebra, exact
    # integer num/den, sign/abs fixed point — bit-identical
    d["annotator_kappa"] = """
        WITH lab AS (SELECT source, lang AS a,
                            CASE WHEN doc_id % 7 = 0 THEN 'zz'
                                 ELSE lang END AS b
                     FROM documents),
        conf AS (SELECT source, a, b, CAST(COUNT(*) AS BIGINT) AS c
                 FROM lab GROUP BY 1, 2, 3),
        tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
                       CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END)
                            AS BIGINT) AS diag
                FROM conf GROUP BY 1),
        r AS (SELECT source, a AS lbl, CAST(SUM(c) AS BIGINT) AS r
              FROM conf GROUP BY 1, 2),
        cl AS (SELECT source, b AS lbl, CAST(SUM(c) AS BIGINT) AS cc
               FROM conf GROUP BY 1, 2),
        ch AS (SELECT r.source, CAST(SUM(r.r * cl.cc) AS BIGINT) AS rc
               FROM r JOIN cl ON r.source = cl.source AND r.lbl = cl.lbl
               GROUP BY 1)
        SELECT t.source, t.n,
               ((2 * t.diag * 1000000 + t.n) // (2 * t.n))
                   / 1000000.0 AS po,
               ((2 * ch.rc * 1000000 + t.n * t.n) // (2 * t.n * t.n))
                   / 1000000.0 AS pe,
               CASE WHEN t.n * t.n - ch.rc <> 0 THEN
                   CAST(SIGN(t.n * t.diag - ch.rc) AS BIGINT)
                   * ((2 * ABS(t.n * t.diag - ch.rc) * 1000000
                       + (t.n * t.n - ch.rc))
                      // (2 * (t.n * t.n - ch.rc)))
                   / 1000000.0
               END AS kappa
        FROM tot t JOIN ch ON t.source = ch.source
    """
    # --- sliding windows: each event explodes into its 3 epoch-aligned
    # covering windows (30 min / 10 min slide), exact microsecond ints
    d["sliding_counts"] = """
        WITH x AS (SELECT event_type, user_id,
                          (epoch_us(ts) // 600000000) * 600000000
                          - k.i * 600000000 AS ws
                   FROM events, range(0, 3) k(i))
        SELECT event_type, make_timestamp(ws) AS win_start,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM x GROUP BY 1, 2
    """
    # --- exact percentiles: same distinct-histogram + integer position
    # selection (type-1 quantile, no interpolation) — bit-identical
    d["exact_percentiles"] = """
        WITH h AS (SELECT l_returnflag, l_linestatus,
                          CAST(l_quantity AS BIGINT) AS v,
                          CAST(COUNT(*) AS BIGINT) AS c
                   FROM lineitem GROUP BY 1, 2, 3),
        cum AS (SELECT l_returnflag, l_linestatus, v,
                       SUM(c) OVER (PARTITION BY l_returnflag, l_linestatus
                                    ORDER BY v
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                       SUM(c) OVER (PARTITION BY l_returnflag,
                                    l_linestatus) AS n
                FROM h)
        SELECT l_returnflag, l_linestatus,
               CAST(MIN(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cum >= (n * 1 + 3) // 4 THEN v END)
                    AS BIGINT) AS p25,
               CAST(MIN(CASE WHEN cum >= (n * 1 + 1) // 2 THEN v END)
                    AS BIGINT) AS p50,
               CAST(MIN(CASE WHEN cum >= (n * 3 + 3) // 4 THEN v END)
                    AS BIGINT) AS p75
        FROM cum GROUP BY 1, 2
    """
    # --- cube: same 2^2 lattice, GROUPING() bitmask matches Spark's
    # grouping_id() first-arg-most-significant convention
    d["cube_pricing"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """
    # --- interval coverage: the INDEPENDENT single-window
    # gaps-and-islands plan (vs Spark's bucketed-clip plan) — exact
    # long microseconds, FLOOR before the cast
    d["interval_coverage"] = """
        WITH iv AS (SELECT user_id AS k, epoch_us(ts) AS s,
                           epoch_us(ts)
                           + CAST(FLOOR(value * 1000000) AS BIGINT) AS e
                    FROM events
                    WHERE epoch_us(ts)
                          + CAST(FLOOR(value * 1000000) AS BIGINT)
                          > epoch_us(ts)),
        m AS (SELECT k, s, e,
                     MAX(e) OVER (PARTITION BY k ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS rm
              FROM iv),
        f AS (SELECT k, s, e,
                     CASE WHEN rm IS NULL OR s > rm THEN 1 ELSE 0 END AS ni
              FROM m),
        g AS (SELECT k, s, e,
                     SUM(ni) OVER (PARTITION BY k ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS iid
              FROM f),
        isl AS (SELECT k, iid, MIN(s) AS ms, MAX(e) AS me,
                       COUNT(*) AS n_iv
                FROM g GROUP BY 1, 2)
        SELECT k AS key, CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(me - ms) AS BIGINT) AS covered_us
        FROM isl GROUP BY 1
    """
    # --- butterflies: same wedge self-join + pair count + C(w,2) sum,
    # pure integer — bit-identical
    d["butterflies"] = """
        WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,
                          CAST(l_partkey AS BIGINT) AS r
                   FROM lineitem WHERE l_orderkey % 6 = 1),
        p AS (SELECT a.u AS u1, b.u AS u2,
                     CAST(COUNT(*) AS BIGINT) AS w
              FROM e a JOIN e b ON a.r = b.r AND a.u < b.u
              GROUP BY 1, 2
              HAVING COUNT(*) >= 2),
        bf AS (SELECT u1, u2, w * (w - 1) // 2 AS bf FROM p)
        SELECT node, CAST(SUM(bf) AS BIGINT) AS butterflies
        FROM (SELECT u1 AS node, bf FROM bf
              UNION ALL
              SELECT u2, bf FROM bf)
        GROUP BY 1
    """
    # --- association rules: the freq_itemsets levels + the 8 rule
    # splits, integer confidence gate before the two rounded divisions
    d["assoc_rules"] = """
        WITH b AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS bk,
                          CAST(p_brand AS VARCHAR) AS i
                   FROM lineitem JOIN part ON l_partkey = p_partkey),
        n AS (SELECT COUNT(DISTINCT bk) AS n FROM b),
        f1 AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS support
               FROM b GROUP BY 1
               HAVING CAST(COUNT(*) AS BIGINT) * 10000
                      >= 15 * (SELECT n FROM n)),
        f2 AS (SELECT x.i AS i1, y.i AS i2,
                      CAST(COUNT(*) AS BIGINT) AS support
               FROM b x JOIN b y ON x.bk = y.bk AND x.i < y.i
               WHERE x.i IN (SELECT i FROM f1)
                 AND y.i IN (SELECT i FROM f1)
               GROUP BY 1, 2
               HAVING CAST(COUNT(*) AS BIGINT) * 10000
                      >= 15 * (SELECT n FROM n)),
        f3 AS (SELECT x.i AS i1, y.i AS i2, z.i AS i3,
                      CAST(COUNT(*) AS BIGINT) AS support
               FROM b x
               JOIN b y ON x.bk = y.bk AND x.i < y.i
               JOIN b z ON x.bk = z.bk AND y.i < z.i
               WHERE x.i IN (SELECT i FROM f1)
                 AND y.i IN (SELECT i FROM f1)
                 AND z.i IN (SELECT i FROM f1)
                 AND EXISTS (SELECT 1 FROM f2
                             WHERE f2.i1 = x.i AND f2.i2 = y.i)
                 AND EXISTS (SELECT 1 FROM f2
                             WHERE f2.i1 = x.i AND f2.i2 = z.i)
                 AND EXISTS (SELECT 1 FROM f2
                             WHERE f2.i1 = y.i AND f2.i2 = z.i)
               GROUP BY 1, 2, 3
               HAVING CAST(COUNT(*) AS BIGINT) * 10000
                      >= 15 * (SELECT n FROM n)),
        raw_rules AS (
            SELECT i1 AS ante, i2 AS cons, support,
                   (SELECT support FROM f1 WHERE i = f2.i1) AS sx,
                   (SELECT support FROM f1 WHERE i = f2.i2) AS sy
            FROM f2
            UNION ALL
            SELECT i2, i1, support,
                   (SELECT support FROM f1 WHERE i = f2.i2),
                   (SELECT support FROM f1 WHERE i = f2.i1)
            FROM f2
            UNION ALL
            SELECT i1, i2 || ',' || i3, support,
                   (SELECT support FROM f1 WHERE i = f3.i1),
                   (SELECT support FROM f2
                    WHERE i1 = f3.i2 AND i2 = f3.i3)
            FROM f3
            UNION ALL
            SELECT i2, i1 || ',' || i3, support,
                   (SELECT support FROM f1 WHERE i = f3.i2),
                   (SELECT support FROM f2
                    WHERE i1 = f3.i1 AND i2 = f3.i3)
            FROM f3
            UNION ALL
            SELECT i3, i1 || ',' || i2, support,
                   (SELECT support FROM f1 WHERE i = f3.i3),
                   (SELECT support FROM f2
                    WHERE i1 = f3.i1 AND i2 = f3.i2)
            FROM f3
            UNION ALL
            SELECT i1 || ',' || i2, i3, support,
                   (SELECT support FROM f2
                    WHERE i1 = f3.i1 AND i2 = f3.i2),
                   (SELECT support FROM f1 WHERE i = f3.i3)
            FROM f3
            UNION ALL
            SELECT i1 || ',' || i3, i2, support,
                   (SELECT support FROM f2
                    WHERE i1 = f3.i1 AND i2 = f3.i3),
                   (SELECT support FROM f1 WHERE i = f3.i2)
            FROM f3
            UNION ALL
            SELECT i2 || ',' || i3, i1, support,
                   (SELECT support FROM f2
                    WHERE i1 = f3.i2 AND i2 = f3.i3),
                   (SELECT support FROM f1 WHERE i = f3.i1)
            FROM f3)
        SELECT ante AS antecedent, cons AS consequent, support,
               ((2 * support * 1000000 + sx) // (2 * sx))
                   / 1000000.0 AS confidence,
               ((2 * support * (SELECT n FROM n) * 1000000 + sx * sy)
                   // (2 * sx * sy)) / 1000000.0 AS lift
        FROM raw_rules
        WHERE sx IS NOT NULL AND sy IS NOT NULL
          AND support * 20 >= 1 * sx
    """
    # --- topological layers: recursive-CTE longest path over the same
    # divisor DAG; every node seeds at 0, UNION ALL walk, MAX(len) per
    # node — pure integer arithmetic, bit-identical
    d["topo_layers"] = """
        WITH RECURSIVE mx AS (
            SELECT CAST(MAX(p_partkey) AS BIGINT) AS m FROM part),
        e AS (SELECT CAST(p_partkey AS BIGINT) AS src,
                     CAST(p_partkey * 2 AS BIGINT) AS dst
              FROM part, mx
              WHERE p_partkey * 2 <= m AND p_partkey > 0
              UNION ALL
              SELECT CAST(p_partkey AS BIGINT),
                     CAST(p_partkey * 3 AS BIGINT)
              FROM part, mx
              WHERE p_partkey * 3 <= m AND p_partkey > 0),
        walk(node, len) AS (
            SELECT CAST(p_partkey AS BIGINT), CAST(0 AS BIGINT) FROM part
            UNION ALL
            SELECT e.dst, w.len + 1 FROM walk w JOIN e ON e.src = w.node)
        SELECT node, CAST(MAX(len) AS BIGINT) AS layer
        FROM walk GROUP BY 1
    """
    # --- t-closeness: same pair/class/value/total re-aggregation chain,
    # exact integer numerators with the absent-domain mass folded in
    # algebraically, one 6-dp-rounded division — bit-identical
    d["t_closeness"] = """
        WITH pairs AS (
            SELECT lang, source,
                   COALESCE(CAST(CAST(FLOOR(n_chars / 200.0) AS BIGINT)
                                 AS VARCHAR), chr(0) || 'null') AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_cs
            FROM documents GROUP BY 1, 2, 3),
        pc AS (SELECT lang, source, CAST(SUM(n_cs) AS BIGINT) AS n_c
               FROM pairs GROUP BY 1, 2),
        pv AS (SELECT s, CAST(SUM(n_cs) AS BIGINT) AS n_s
               FROM pairs GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot FROM pv),
        a AS (SELECT p.lang, p.source, MIN(pc.n_c) AS n_c,
                     MIN(tot.n_tot) AS n_tot,
                     CAST(SUM(ABS(p.n_cs * tot.n_tot - pv.n_s * pc.n_c))
                          AS BIGINT) AS num_present,
                     CAST(SUM(pv.n_s) AS BIGINT) AS ns_present
              FROM pairs p
              JOIN pv USING (s)
              JOIN pc ON p.lang = pc.lang AND p.source = pc.source
              CROSS JOIN tot
              GROUP BY 1, 2)
        SELECT lang, source, n_c AS n,
               ROUND((num_present + n_c * (n_tot - ns_present))
                     / (2.0 * n_c * n_tot), 6) AS tv_distance
        FROM a
        WHERE ROUND((num_present + n_c * (n_tot - ns_present))
                    / (2.0 * n_c * n_tot), 6) > 0.15
    """
    # --- interval join: NAIVE range join on DuckDB's native IEJoin (an
    # independently-implemented range algorithm) vs Spark's bucketed plan
    d["interval_join"] = """
        WITH b AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
                   FROM events),
        iv AS (SELECT i AS iv_id,
                      lo + i * ((hi - lo) // 12) AS s_us,
                      lo + i * ((hi - lo) // 12) + ((hi - lo) // 24) AS e_us
               FROM b, range(0, 12) t(i)),
        p AS (SELECT event_id, epoch_us(ts) AS t_us
              FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, iv.iv_id
        FROM p JOIN iv ON p.t_us BETWEEN iv.s_us AND iv.e_us
    """
    # --- linear attribution: same user-keyed join + range + equal split
    d["linear_attribution"] = """
        WITH conv AS (SELECT user_id AS u, event_id AS conversion_id,
                             epoch_us(ts) AS cts,
                             CAST(value AS DOUBLE) AS val
                      FROM events WHERE event_type = 'purchase'),
        touch AS (SELECT user_id AS u, event_id AS touch_id,
                         epoch_us(ts) AS tts
                  FROM events WHERE event_type = 'click'),
        j AS (SELECT c.conversion_id, t.touch_id, c.val
              FROM conv c JOIN touch t ON c.u = t.u
              WHERE t.tts <= c.cts
                AND t.tts > c.cts - 24 * 3600 * 1000000::BIGINT),
        n AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY conversion_id)
                             AS BIGINT) AS n_touches
              FROM j)
        SELECT conversion_id, touch_id, n_touches,
               ROUND(val / n_touches, 6) AS credit
        FROM n
    """
    # --- ANN lane scoreboard: recall@5 + fixed-point MRR of every
    # PQ-family lane vs the exact float cosine top-5.  Composed VERBATIM
    # from each lane's own oracle SQL (the rrf_fusion discipline) so the
    # lanes here can never drift from the lanes the driver verifies; the
    # <10-query lanes are filtered to the shared <8 set, which equals an
    # <8 run because per-query results are independent of other queries.
    # MRR avoids a float summation: per query ROUND(1e6/minrank) BIGINT,
    # exact integer sum, ONE final division rounded to 4 dp.
    # the persisted-index probe is bit-identical to the in-memory lane by
    # design (tests/test_ann_index.py), so it SHARES ivfpq_topk's oracle
    d["ann_index_probe"] = d["ivfpq_topk"]
    _lanes = {
        "ivfpq": d["ivfpq_topk"],
        "ivfpq_residual": d["ivfpq_residual_topk"],
        "pq": d["pq_topk"],
        "quantized": d["quantized_topk"],
    }
    _lane_ctes = ",\n".join(
        f"lane_{name} AS (SELECT '{name}' AS lane, query_id, vec_id, rank "
        f"FROM ({sql}) t WHERE query_id < 8)"
        for name, sql in _lanes.items()
    )
    _lane_union = " UNION ALL ".join(
        f"SELECT * FROM lane_{name}" for name in _lanes
    )
    d["ann_lane_eval"] = f"""
        WITH truth AS (SELECT query_id, vec_id
                       FROM ({d["embedding_topk"]}) t WHERE query_id < 8),
        {_lane_ctes},
        lanes AS ({_lane_union}),
        hits AS (SELECT l.lane, l.query_id, l.vec_id, l.rank
                 FROM lanes l JOIN truth USING (query_id, vec_id)),
        base AS (SELECT DISTINCT lane FROM lanes),
        rec AS (SELECT lane, CAST(COUNT(*) AS BIGINT) AS n_hits
                FROM hits GROUP BY lane),
        mr AS (SELECT lane, query_id,
                      CAST(ROUND(1000000.0 / MIN(rank)) AS BIGINT) AS rr
               FROM hits GROUP BY lane, query_id),
        ms AS (SELECT lane, CAST(SUM(rr) AS BIGINT) AS s FROM mr GROUP BY lane)
        SELECT b.lane,
               ROUND(CAST(COALESCE(r.n_hits, 0) AS DOUBLE) / 40.0, 4)
                   AS recall_at_5,
               ROUND(CAST(COALESCE(ms.s, 0) AS DOUBLE) / 8000000.0, 4) AS mrr
        FROM base b
        LEFT JOIN rec r ON r.lane = b.lane
        LEFT JOIN ms ON ms.lane = b.lane
    """
    # --- round 4: preference-data prep + transcript profile ---
    d["dpo_pairs"] = """
        WITH c AS (SELECT DISTINCT l_orderkey AS prompt_id,
                          l_linenumber AS cand_id,
                          CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                              AS score
                   FROM lineitem),
        r AS (SELECT *,
                     ROW_NUMBER() OVER (PARTITION BY prompt_id
                         ORDER BY score DESC, cand_id ASC) AS rt,
                     ROW_NUMBER() OVER (PARTITION BY prompt_id
                         ORDER BY score ASC, cand_id DESC) AS rb,
                     COUNT(*) OVER (PARTITION BY prompt_id) AS nc
              FROM c),
        ch AS (SELECT prompt_id, cand_id AS chosen, score AS chosen_score,
                      CAST(nc AS BIGINT) AS n_cands
               FROM r WHERE rt = 1),
        rj AS (SELECT prompt_id, cand_id AS rejected,
                      score AS rejected_score
               FROM r WHERE rb = 1)
        SELECT ch.prompt_id, chosen, rejected, chosen_score, rejected_score,
               chosen_score - rejected_score AS margin, n_cands
        FROM ch JOIN rj USING (prompt_id)
        WHERE chosen <> rejected
          AND chosen_score - rejected_score >= 100
    """
    # Replays pairwise_counts + 2 unrolled MM rounds + sum-1 normalization
    # with the operator's exact ROUND placement (9 dp intermediates, 6 dp
    # final — operators/preference.py discipline).
    d["bradley_terry"] = """
        WITH l AS (SELECT l_orderkey, l_linenumber, p_brand AS brand,
                          CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                              AS cents
                   FROM lineitem JOIN part ON p_partkey = l_partkey),
        comp AS (SELECT CASE WHEN cur.cents > prv.cents
                             THEN cur.brand ELSE prv.brand END AS winner,
                        CASE WHEN cur.cents > prv.cents
                             THEN prv.brand ELSE cur.brand END AS loser
                 FROM l cur
                 JOIN l prv ON prv.l_orderkey = cur.l_orderkey
                           AND prv.l_linenumber = cur.l_linenumber - 1
                 WHERE cur.cents <> prv.cents AND cur.brand <> prv.brand),
        w AS (SELECT winner AS player, loser AS opponent,
                     CAST(COUNT(*) AS BIGINT) AS wins
              FROM comp WHERE winner <> loser GROUP BY 1, 2),
        ordx AS (SELECT player, opponent, CAST(SUM(wins) AS BIGINT) AS wins
                 FROM (SELECT player, opponent, wins FROM w
                       UNION ALL
                       SELECT opponent, player, 0 FROM w) u
                 GROUP BY 1, 2),
        pairs AS (SELECT o.player, o.opponent, o.wins,
                         CAST(o.wins + r.wins AS BIGINT) AS n
                  FROM ordx o
                  JOIN ordx r ON r.player = o.opponent
                             AND r.opponent = o.player),
        totals AS (SELECT player, CAST(SUM(wins) AS BIGINT) AS wins,
                          CAST(SUM(n) AS BIGINT) AS n_comparisons
                   FROM pairs GROUP BY 1),
        a0 AS (SELECT player, CAST(1.0 AS DOUBLE) AS ability FROM totals),
        t1 AS (SELECT p.player,
                      ROUND(p.n / (ai.ability + aj.ability), 9) AS term
               FROM pairs p
               JOIN a0 ai ON ai.player = p.player
               JOIN a0 aj ON aj.player = p.opponent),
        d1 AS (SELECT player, ROUND(SUM(term), 9) AS denom
               FROM t1 GROUP BY 1),
        a1 AS (SELECT t.player, ROUND(t.wins / d.denom, 9) AS ability
               FROM totals t JOIN d1 d USING (player)),
        t2 AS (SELECT p.player,
                      ROUND(p.n / (ai.ability + aj.ability), 9) AS term
               FROM pairs p
               JOIN a1 ai ON ai.player = p.player
               JOIN a1 aj ON aj.player = p.opponent),
        d2 AS (SELECT player, ROUND(SUM(term), 9) AS denom
               FROM t2 GROUP BY 1),
        a2 AS (SELECT t.player, ROUND(t.wins / d.denom, 9) AS ability
               FROM totals t JOIN d2 d USING (player)),
        z AS (SELECT ROUND(SUM(ability), 9) AS z FROM a2)
        SELECT t.player, t.wins, t.n_comparisons,
               ROUND(a.ability / z.z, 6) AS ability
        FROM totals t JOIN a2 a USING (player) CROSS JOIN z
    """
    d["conv_profile"] = """
        WITH tr AS (SELECT 'doc-' || CAST(doc_id % 50 AS VARCHAR) AS conv_id,
                           CAST(doc_id // 50 AS INT) AS turn_idx,
                           CASE WHEN doc_id % 3 = 0 THEN 'user'
                                WHEN doc_id % 3 = 1 THEN 'assistant'
                                ELSE 'tool' END AS role,
                           text,
                           CASE WHEN doc_id % 7 = 0 THEN source END AS tool,
                           (1736154000 + (doc_id // 50) * 60) * 1000000
                               AS ts_us
                    FROM documents),
        lagged AS (SELECT *,
                          LAG(role) OVER (PARTITION BY conv_id
                                          ORDER BY turn_idx) AS prev_role,
                          CAST(COALESCE(LENGTH(text), 0) AS BIGINT) AS chars
                   FROM tr)
        SELECT conv_id,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_user,
               CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_assistant,
               CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_tool_role,
               CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_tool_calls,
               CAST(SUM(chars) AS BIGINT) AS total_chars,
               CAST(SUM(CASE WHEN prev_role IS NOT NULL AND role <> prev_role
                             THEN 1 ELSE 0 END) AS BIGINT) AS role_switches,
               CAST((MAX(ts_us) - MIN(ts_us)) // 1000000 AS BIGINT)
                   AS span_seconds
        FROM lagged
        GROUP BY conv_id
    """
    d["sft_pairs"] = """
        WITH tr AS (SELECT 'doc-' || CAST(doc_id % 50 AS VARCHAR) AS conv_id,
                           CAST(doc_id // 50 AS INT) AS turn_idx,
                           CASE WHEN doc_id % 3 = 0 THEN 'user'
                                WHEN doc_id % 3 = 1 THEN 'assistant'
                                ELSE 'tool' END AS role,
                           text
                    FROM documents),
        ctx AS (SELECT conv_id, turn_idx, role, text,
                       STRING_AGG(role || ': ' || COALESCE(text, ''),
                                  chr(10)) OVER w AS prompt,
                       COUNT(*) OVER w AS n_ctx
                FROM tr
                WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
        SELECT conv_id, turn_idx, prompt, text AS response,
               CAST(n_ctx AS BIGINT) AS n_context_turns
        FROM ctx
        WHERE role = 'assistant'
          AND LENGTH(COALESCE(text, '')) >= 1
          AND n_ctx >= 1
    """
    d["predicate_align"] = """
        WITH a AS (SELECT DISTINCT subj, pred, obj FROM (
            SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred,
                   'n' || c_nationkey AS obj FROM customer
            UNION ALL
            SELECT 's' || s_suppkey, 'in_nation', 'n' || s_nationkey
            FROM supplier
            UNION ALL
            SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey
            FROM nation
            UNION ALL
            SELECT 'c' || c_custkey, 'in_region', 'r' || n_regionkey
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey % 2 = 1
            UNION ALL
            SELECT 'c' || o_custkey, 'placed', 'o' || o_orderkey
            FROM orders
            UNION ALL
            SELECT 'p' || l_partkey, 'supplied_by', 's' || l_suppkey
            FROM lineitem
        ) ra),
        b AS (SELECT DISTINCT subj, pred, obj FROM (
            SELECT 'c' || c_custkey AS subj, 'locatedIn' AS pred,
                   'n' || c_nationkey AS obj
            FROM customer WHERE c_custkey % 3 <> 0
            UNION ALL
            SELECT 's' || s_suppkey, 'locatedIn', 'n' || s_nationkey
            FROM supplier
            UNION ALL
            SELECT 'n' || n_nationkey, 'partOf', 'r' || n_regionkey
            FROM nation
            UNION ALL
            SELECT 'p' || l_partkey, 'soldBy', 's' || l_suppkey
            FROM lineitem
        ) rb),
        na AS (SELECT pred AS pred_a, CAST(COUNT(*) AS BIGINT) AS n_a
               FROM a GROUP BY 1),
        nb AS (SELECT pred AS pred_b, CAST(COUNT(*) AS BIGINT) AS n_b
               FROM b GROUP BY 1),
        j AS (SELECT a.pred AS pred_a, b.pred AS pred_b,
                     CAST(COUNT(*) AS BIGINT) AS n_joint
              FROM a JOIN b ON a.subj = b.subj AND a.obj = b.obj
              GROUP BY 1, 2)
        SELECT pred_a, pred_b, n_joint, n_a, n_b,
               ROUND(n_joint / CAST(n_a + n_b - n_joint AS DOUBLE), 6)
                   AS jaccard
        FROM j JOIN na USING (pred_a) JOIN nb USING (pred_b)
        WHERE n_joint >= 1
    """
    d["reward_whiten"] = """
        WITH c AS (SELECT DISTINCT l_orderkey AS prompt_id,
                          l_linenumber AS cand_id,
                          CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                              AS score
                   FROM lineitem),
        stats AS (SELECT prompt_id,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(score) AS BIGINT) AS s1,
                         CAST(SUM(score * score) AS BIGINT) AS s2
                  FROM c GROUP BY 1)
        SELECT c.prompt_id, c.cand_id, c.score,
               CASE WHEN n * s2 - s1 * s1 <= 0 THEN 0.0
                    ELSE ROUND((n * c.score - s1)
                               / SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)), 6)
               END AS z_score,
               n AS n_cands
        FROM c JOIN stats USING (prompt_id)
    """
    d["conv_near_dup"] = f"""
        WITH folded AS (SELECT doc_id // 4 AS conv_key,
                               STRING_AGG(text, ' ' ORDER BY doc_id % 4)
                                   AS text
                        FROM documents GROUP BY 1),
        convs AS (SELECT 'cv-' || CAST(conv_key AS VARCHAR) AS conv, text
                  FROM folded
                  UNION ALL
                  SELECT 'dup-' || CAST(conv_key AS VARCHAR), text
                  FROM folded WHERE conv_key % 10 = 0),
        sh AS (SELECT conv, {{shingles}} AS shingles FROM convs),
        j AS (SELECT a.conv AS conv_a, b.conv AS conv_b,
                     ROUND(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                           / len(list_distinct(
                                 list_concat(a.shingles, b.shingles))),
                           6) AS jaccard
              FROM sh a JOIN sh b ON a.conv < b.conv)
        SELECT conv_a, conv_b, jaccard FROM j WHERE jaccard >= 0.8
    """.format(shingles=shingles_sql("text", 3))
    # pass@2: the same per-factor 9 dp rounding chain as the operator
    pak_prod = "1.0"
    for _i in range(2):
        pak_prod = (
            f"ROUND({pak_prod} * GREATEST(n - c - {_i}, 0) / (n - {_i}), 9)"
        )
    d["pass_at_k"] = f"""
        WITH counts AS (SELECT l_orderkey AS prompt_id,
                               CAST(COUNT(*) AS BIGINT) AS n,
                               CAST(SUM(CASE WHEN l_returnflag = 'N'
                                             THEN 1 ELSE 0 END) AS BIGINT)
                                   AS c
                        FROM lineitem GROUP BY 1)
        SELECT prompt_id, n AS n_candidates, c AS n_passed,
               CASE WHEN n >= 2 THEN ROUND(1.0 - {pak_prod}, 6) END
                   AS pass_at_k
        FROM counts
    """
    # streaming PSI twin: same binning/floor/term arithmetic as the
    # stream_psi plan, tumbling 6 h epoch-aligned windows (DuckDB
    # time_bucket's 2000-01-03 origin is a multiple of 6 h from the
    # epoch, so buckets align with Spark's F.window)
    _pw_bin = " + ".join(
        f"(CASE WHEN value > {e} THEN 1 ELSE 0 END)"
        for e in _PSI_WINDOW_EDGES
    )
    _pw_counts = ", ".join(
        f"SUM(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS n{i}" for i in range(10)
    )
    _pw_terms = " + ".join(
        f"((n{i} + 0.5) / (n + 5.0) - 0.1)"
        f" * LN(((n{i} + 0.5) / (n + 5.0)) / 0.1)"
        for i in range(10)
    )
    d["psi_window"] = f"""
        WITH b AS (
          SELECT time_bucket(INTERVAL 6 HOUR, ts) AS ws,
                 ({_pw_bin}) AS bin
          FROM events),
        a AS (SELECT ws, COUNT(*) AS n, {_pw_counts} FROM b GROUP BY 1)
        SELECT ws AS window_start,
               ws + INTERVAL 6 HOUR AS window_end,
               CAST(n AS BIGINT) AS n,
               ROUND({_pw_terms}, 6) AS psi
        FROM a
    """
    # F17 meta side: feed-level link dispatch + hub/<cloud> merge.  The
    # first-cloud attributes are fetched by joining back on the min ord
    # (NOT arg_min per attribute: arg_min skips NULL values, and the first
    # cloud element's NULL domain must win over a later element's non-NULL
    # one).  hub-after-cloud needs the cloud position -> second pass.
    d["meta_cloud"] = """
        WITH els AS (
          SELECT user_id * 20 + event_id % 20 AS meta_id,
                 event_id AS ord,
                 CASE WHEN event_type = 'error' THEN 'cloud' ELSE 'link' END
                     AS kind,
                 CASE event_type WHEN 'click' THEN 'alternate'
                      WHEN 'view' THEN 'self'
                      WHEN 'purchase' THEN 'hub' END AS rel,
                 CASE WHEN event_type <> 'error'
                      THEN 'https://example.com/' || event_type || '/' ||
                           CAST(event_id AS VARCHAR) END AS href,
                 CASE WHEN event_type = 'error' AND event_id % 3 = 0
                      THEN 'rpc' || CAST(event_id % 7 AS VARCHAR) ||
                           '.example.com' END AS domain,
                 CASE WHEN event_type = 'error'
                      THEN CAST(80 + event_id % 2 AS VARCHAR) END AS port,
                 CASE WHEN event_type = 'error' THEN '/rpc' END AS path,
                 CASE WHEN event_type = 'error' THEN 'cloud.notify' END
                     AS register_procedure,
                 CASE WHEN event_type = 'error' THEN
                      CASE WHEN event_id % 2 = 0 THEN 'xml-rpc'
                           ELSE 'http-post' END END AS protocol
          FROM events),
        f AS (
          SELECT meta_id,
                 arg_min(href, ord)
                     FILTER (WHERE kind = 'link' AND rel = 'alternate')
                     AS link,
                 arg_max(href, ord)
                     FILTER (WHERE kind = 'link' AND rel = 'self') AS xmlurl,
                 min(ord) FILTER (WHERE kind = 'cloud') AS cloud_ord,
                 arg_min(href, ord)
                     FILTER (WHERE kind = 'link' AND rel = 'hub') AS hub_first
          FROM els GROUP BY 1),
        c AS (
          SELECT f.meta_id, e.href AS c_href, e.domain AS c_domain,
                 e.port AS c_port, e.path AS c_path,
                 e.register_procedure AS c_reg, e.protocol AS c_proto
          FROM f JOIN els e
            ON e.meta_id = f.meta_id AND e.ord = f.cloud_ord),
        ha AS (
          SELECT e.meta_id, arg_min(e.href, e.ord) AS hub_after
          FROM els e JOIN f ON e.meta_id = f.meta_id
          WHERE e.kind = 'link' AND e.rel = 'hub' AND e.ord > f.cloud_ord
          GROUP BY 1),
        sel AS (
          SELECT f.meta_id, f.link, f.xmlurl,
                 CASE WHEN f.cloud_ord IS NULL THEN f.hub_first
                      WHEN c.c_href IS NULL AND c.c_domain IS NULL
                      THEN ha.hub_after END AS hub_href,
                 c.c_href, c.c_domain, c.c_port, c.c_path, c.c_reg, c.c_proto
          FROM f
          LEFT JOIN c ON c.meta_id = f.meta_id
          LEFT JOIN ha ON ha.meta_id = f.meta_id)
        SELECT meta_id, link, xmlurl,
               CASE WHEN hub_href IS NOT NULL THEN 'hub' END AS cloud_type,
               COALESCE(c_href, hub_href) AS cloud_href,
               c_domain AS cloud_domain, c_port AS cloud_port,
               c_path AS cloud_path,
               c_reg AS cloud_register_procedure,
               c_proto AS cloud_protocol
        FROM sel
    """
    # judge fake: portable 60-bit md5 -> [0,1), the hashing.py discipline
    d["judge_scores"] = """
        SELECT doc_id, c.criterion,
               CASE WHEN text IS NOT NULL THEN
                    ROUND(CAST(('0x' || substr(md5(c.criterion || ':' || text),
                                               1, 15)) AS BIGINT)
                          / 1152921504606846976.0, 6)
               END AS score,
               CASE WHEN text IS NULL THEN 'null text'
                    ELSE CAST(NULL AS VARCHAR) END AS error
        FROM documents
        CROSS JOIN (SELECT 'helpfulness' AS criterion
                    UNION ALL SELECT 'factuality') c
    """
    return d
