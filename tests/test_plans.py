"""Physical-plan assertions — the 'is this the plan you'd want at 100 TB'
gate.  Each test pins a plan property that actually matters at scale:
broadcast instead of shuffle join, filter pushdown into the parquet scan,
column pruning, whole-stage codegen, and no shuffle ahead of stateless
extraction.  If a refactor regresses one of these, correctness tests stay
green but THESE fail — by design."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_dim_joins_are_broadcast(spark):
    """J1: tiny dims must broadcast — a shuffle join of customer vs nation
    would shuffle the whole fact side."""
    p = plan_of(entrymod.q_broadcast_dim_join(spark, SF_DIR), "simple")
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_alias_dim_join_is_broadcast(spark):
    from node_feedparser_spark.operators.canonicalize import surface_keys

    surfaces = spark.createDataFrame(
        [("K8s", 3), ("conv:x", 1)], "surface string, n_mentions long"
    )
    p = plan_of(surface_keys(spark, surfaces))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_filter_pushdown_reaches_scan(spark):
    p = plan_of(entrymod.q_agg_pricing_summary(spark, SF_DIR))
    assert "PushedFilters" in p
    assert "l_shipdate" in p.split("PushedFilters", 1)[1].split("]", 1)[0]


def test_column_pruning(spark):
    """token_stats projects 2 of 5 document columns; the scan must read
    only those (ReadSchema), not the full row."""
    p = plan_of(entrymod.q_token_stats(spark, SF_DIR))
    read_schema = p.split("ReadSchema", 1)[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_aggregation_is_partial_final(spark):
    """A1: groupBy aggregates must map-side combine (two HashAggregate
    nodes around the exchange), not ship raw rows."""
    p = plan_of(entrymod.q_agg_pricing_summary(spark, SF_DIR), "simple")
    assert p.count("HashAggregate") >= 2


def test_whole_stage_codegen_covers_agg(spark):
    """Scalar CASE dispatch + agg must codegen end-to-end ('*'-starred
    nodes in simple mode).  NB: queries built on higher-order array
    functions (transform/filter/aggregate) legitimately fall back to
    non-codegen Project — that's a Spark limitation, not a plan bug."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # (with AQE on, codegen subtrees only appear in the executed plan)
        p = plan_of(entrymod.q_case_dispatch(spark, SF_DIR), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in p
    assert not p.startswith("Found 0 ")


def test_extraction_has_no_shuffle(spark, corpus_path):
    """Stateless mapInPandas extraction must run on scan partitions as-is:
    any Exchange before it would shuffle the full corpus for nothing (and
    reintroduce mega-thread skew sensitivity)."""
    from node_feedparser_spark.operators.extract import extract_triples
    from node_feedparser_spark.sources.transcripts import read_transcripts

    p = plan_of(extract_triples(read_transcripts(spark, corpus_path)), "simple")
    assert "Exchange" not in p
    assert "MapInPandas" in p or "mapInPandas" in p.lower()


def test_dedupe_shuffles_composite_key(spark, corpus_path):
    """A2 first-wins dedupe partitions by the near-unique composite
    (conv_id, turn_idx) — one hash exchange, skew-free even for
    mega-threads."""
    from node_feedparser_spark.operators.extract import dedupe_first_wins
    from node_feedparser_spark.sources.transcripts import read_transcripts

    p = plan_of(dedupe_first_wins(read_transcripts(spark, corpus_path)), "simple")
    assert p.count("Exchange hashpartitioning(conv_id") == 1
    assert "turn_idx" in p.split("Exchange hashpartitioning", 1)[1].split(")", 1)[0]


def test_minhash_agg_is_partial_final(spark):
    """A7: the 63 min-aggregations after the shingle explode must map-side
    combine so the exchange carries one row per doc, not per shingle."""
    from node_feedparser_spark.operators.dedupe import minhash_signatures, shingled

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "c d e f g")], "doc_id long, text string"
    )
    p = plan_of(minhash_signatures(shingled(docs)), "simple")
    assert p.count("HashAggregate") >= 2


def test_ann_topk_shuffle_is_tiny(spark):
    """Similarity search: the corpus must NOT be shuffled — only the
    batch-local top-k rows move (one exchange on query_id for the final
    window)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from node_feedparser_spark.operators.similarity import cosine_topk

    p = plan_of(cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3), "simple")
    # exactly one exchange: hashpartitioning(query_id) for the global top-k
    assert p.count("Exchange hashpartitioning") == 1
    assert "query_id" in p


def test_pii_scrub_is_shuffle_free_codegen(spark):
    """Curation: PII scrub is a pure projection — no exchange at all, and
    the whole thing stays inside whole-stage codegen."""
    p = plan_of(entrymod.q_pii_scrub(spark, SF_DIR), "simple")
    assert "Exchange" not in p
    assert "*(1)" in p  # one codegen span covering the whole projection


def test_repetition_local_fractions_shuffle_free(spark):
    """Curation: the array-local repetition fractions must not shuffle; the
    full operator pays only the modal-token aggs + join on doc_id."""
    from node_feedparser_spark.operators.curation import repetition_metrics

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pyspark.sql.functions as SF
    toks = SF.split(SF.col("text"), " ")
    from node_feedparser_spark.operators.curation import _grams
    local = docs.select(
        "doc_id", SF.size(SF.array_distinct(toks)).alias("d"),
        SF.size(_grams(toks, 3)).alias("g"),
    )
    assert "Exchange" not in plan_of(local, "simple")
    # and the full operator reads only (doc_id, text) from the scan
    p = plan_of(repetition_metrics(docs))
    read_schema = p.split("ReadSchema", 1)[1].splitlines()[0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_token_budget_sample_no_global_sort_and_broadcast_offsets(spark):
    """Curation: the bucketed cumsum must not funnel a language through one
    task — no global Sort/Exchange rangepartitioning, offsets broadcast."""
    from node_feedparser_spark.operators.curation import token_budget_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_of(token_budget_sample(docs, budget=5000), "simple")
    assert "rangepartitioning" not in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_graph_ops_no_cartesian_or_bnlj(spark):
    """Round-3 graph family: none of the candidate/wedge/closure joins may
    degrade to a cartesian or broadcast-nested-loop join — all key equality
    (plus JVM-expression residual filters), at any size."""
    for name in (
        "triangle_count",
        "khop_reach",
        "kg_snapshot_diff",
        "label_propagation",
        "ngram_jaccard",
    ):
        p = plan_of(entrymod.queries()[name](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_snapshot_diff_single_full_outer_join(spark):
    """The diff itself is exactly ONE co-partitioned full-outer join —
    classification is a projection, not more joins."""
    p = plan_of(entrymod.q_kg_snapshot_diff(spark, SF_DIR), "simple")
    assert p.count("FullOuter") == 1


def test_pagerank_iterations_have_no_collect_barrier(spark):
    """The 2-iteration pagerank plan must keep dangling mass INSIDE the
    plan (broadcast 1-row aggregate), not as a driver collect between
    iterations: building the query must launch no Spark job at all."""
    df = entrymod.q_pagerank(spark, SF_DIR)
    # localCheckpoint(eager) of the static edge structure DOES run jobs;
    # q_pagerank at n_iter=2 with ckpt_every=3 must not checkpoint ranks,
    # and the per-iteration dangling aggregate must appear in the final
    # plan rather than having been resolved to a literal via collect()
    p = plan_of(df, "simple")
    assert p.count("BroadcastExchange") >= 2  # one lazy dangling agg per iter


def test_truth_fusion_trust_joins_are_broadcast(spark):
    """The per-source trust vector must ride back onto the claims as a
    BROADCAST join every iteration — a shuffle join would re-exchange the
    full claims table once per iteration just to attach one double per
    source."""
    p = plan_of(entrymod.q_truth_fusion(spark, SF_DIR), "simple")
    # 2 iterations x (num/den share one claims+trust broadcast each)
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_dsir_bucket_dims_are_broadcast(spark):
    """DSIR's two 1024-row bucket-count dims must broadcast onto the
    exploded gram stream, never shuffle it."""
    p = plan_of(entrymod.q_dsir_weights(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_negative_sampling_no_window_no_cartesian(spark):
    """Negative corruption is explode + hash + one anti-join: no window
    (nothing orders the corpus), no cartesian."""
    p = plan_of(entrymod.q_negative_sampling(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftAnti" in p


def test_new_graph_ops_no_cartesian_or_bnlj(spark):
    """kcore / pmi_pairs / entity_timelines: key-equality joins only."""
    for name in ("kcore", "pmi_pairs", "entity_timelines"):
        p = plan_of(entrymod.queries()[name](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_unigram_lm_totals_are_broadcast_not_collected(spark):
    """The (n_total, vocab) scalars stay INSIDE the plan as a broadcast
    1-row aggregate; building the query must not launch a job."""
    df = entrymod.q_unigram_lm(spark, SF_DIR)
    p = plan_of(df, "simple")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_freq_itemsets_prunes_are_broadcast(spark):
    """A-priori's scale claim: every monotonicity prune is a broadcast
    semi-join (LeftSemi + BroadcastHashJoin), and the pair/triple
    self-joins never fall back to SortMergeJoin on the corpus."""
    p = plan_of(entrymod.q_freq_itemsets(spark, SF_DIR), "simple")
    # every surviving semi prune is broadcast (Catalyst may merge some)
    assert p.count("LeftSemi") >= 3
    assert p.count("BroadcastHashJoin") >= 3
    # the only SortMergeJoins are the within-basket self-joins on the
    # basket key, and the only nested-loop join is the broadcast of the
    # 1-row global basket count — never an unbroadcast cartesian
    assert "CartesianProduct" not in p


def test_t_closeness_single_corpus_shuffle(spark):
    """The pair table (qid, sensitive) is the only corpus-sized
    aggregation; the global total joins in as a broadcast, never a
    shuffle."""
    p = plan_of(entrymod.q_t_closeness(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_interval_coverage_windows_are_bucket_local(spark):
    """The bucketed-clip plan must window on (key, bucket), never on the
    bare key — the mega-key discipline."""
    p = plan_of(entrymod.q_interval_coverage(spark, SF_DIR), "formatted")
    assert "bkt" in p  # bucket key present in the window/exchange spec
    assert "CartesianProduct" not in p


def test_exact_percentiles_histogram_before_window(spark):
    """The cumulative window must consume the distinct-value histogram
    (partial_count before the exchange), not raw rows."""
    p = plan_of(entrymod.q_exact_percentiles(spark, SF_DIR), "formatted")
    assert "partial_count" in p or "partial count" in p.lower()


def test_katz_and_butterflies_no_cartesian(spark):
    for q in (entrymod.q_katz, entrymod.q_butterflies):
        p = plan_of(q(spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_pq_lanes_corpus_never_shuffles(spark):
    """PQ-family ANN lanes: the scoring pass must keep the cosine_topk
    shape — quantize in-row, encode + score in one MapInPandas over scan
    partitions, and shuffle ONLY the pruned local top-k rows (a single
    hashpartitioning(query_id) exchange for the global window).  The
    Lloyd-training passes run at BUILD time (before the returned plan),
    so the returned plan itself must stay one-exchange."""
    from node_feedparser_spark.operators.similarity import (
        ivfpq_residual_topk,
        ivfpq_topk,
        pq_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    for op in (pq_topk, ivfpq_topk, ivfpq_residual_topk):
        p = plan_of(op(emb, q, k=3), "simple")
        assert p.count("Exchange hashpartitioning") == 1, op.__name__
        assert "query_id" in p, op.__name__
        assert "MapInPandas" in p, op.__name__


def test_kmv_is_all_jvm_and_sketch_sized(spark):
    """KMV overlap: zero Python nodes (pure JVM hashing + windows), and
    the only corpus-sized exchanges feed the distinct + bucketed
    k-smallest — everything after the sketch is <= 2k rows with the
    threshold row BROADCAST, never a corpus-side shuffle join."""
    from node_feedparser_spark.functions.hashing import token_shingles
    from node_feedparser_spark.operators.sketch import kmv_set_overlap

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    elems = docs.select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(token_shingles("text", 3)).alias("elem"),
    )
    p = plan_of(kmv_set_overlap(elems, k=64), "simple")
    assert "MapInPandas" not in p and "BatchEvalPython" not in p
    assert "BroadcastExchange" in p  # the min_thresh scalar rides broadcast
