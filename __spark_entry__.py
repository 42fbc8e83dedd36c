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
        .select("user_id", "event_id", "rn")
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
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
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
    }


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
    }
