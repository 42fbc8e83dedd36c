"""Mega-thread skew handling (FIXTURES.md `mega-` class, north_rule skew
clause): the corpus plants a conversation ~100x the median turn count, and
the pipeline must not let it become a straggler.

The two load-bearing properties, asserted physically:
1. extraction runs on scan partitions (no conv grouping) — plan-asserted in
   test_plans.py — so here: the mega conversation's rows SPAN partitions in
   the scan, not one;
2. the only pre-extraction shuffle keys on the near-unique composite
   (conv_id, turn_idx), so post-dedupe the mega conversation still spans
   most partitions (hash of the composite key spreads uniformly).
"""

from pyspark.sql import functions as F

from node_feedparser_spark.operators.extract import dedupe_first_wins
from node_feedparser_spark.sources.transcripts import read_transcripts


def _mega_spread(df):
    return (
        df.filter(F.col("conv_id").startswith("mega-"))
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )


def test_corpus_has_mega_thread(corpus_pdf):
    sizes = corpus_pdf.groupby("conv_id").size()
    mega = sizes[sizes.index.str.startswith("mega-")]
    assert len(mega) >= 1
    assert mega.max() >= 20 * sizes.median()


def test_mega_thread_spans_partitions_after_dedupe(spark, corpus_path):
    # AQE coalesces the tiny test corpus into one partition, hiding the
    # property under test (the KEY distribution of the shuffle); observe
    # the raw hash partitioning instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        deduped = dedupe_first_wins(read_transcripts(spark, corpus_path))
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        spread = _mega_spread(deduped)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # hash of (conv_id, turn_idx) must spread the mega conv across most
    # shuffle partitions — a conv_id-keyed shuffle would put it in exactly 1
    assert spread >= max(2, n_parts // 2), (spread, n_parts)


def test_extraction_balance(spark, corpus_path):
    """No partition of the post-dedupe extraction input may hold more than
    3x its fair share of the mega conversation's rows."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        deduped = dedupe_first_wins(read_transcripts(spark, corpus_path))
        per_pid = (
            deduped.filter(F.col("conv_id").startswith("mega-"))
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    counts = [r["count"] for r in per_pid]
    total = sum(counts)
    fair = total / len(counts)
    assert max(counts) <= 3 * fair, (max(counts), fair)


def test_simhash_hot_block_guard(spark):
    """Degenerate corpus: 10k near-empty docs would make every 15-bit
    block a hot value and the pigeonhole self-join quadratic (plus an
    O(n^2) legitimate pair output for identical docs).  With the
    min_tokens guard they are excluded up front; only the real documents
    join, and the run completes promptly."""
    import time

    from node_feedparser_spark.operators.dedupe import simhash_near_dup_pairs

    empties = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    real = spark.createDataFrame(
        [
            (100_000, "the quick brown fox jumps over the lazy dog today"),
            (100_001, "the quick brown fox jumps over the lazy dog today"),
            (100_002, "completely different text about spark shuffle joins"),
        ],
        "doc_id long, text string",
    )
    docs = empties.unionByName(real)
    t0 = time.monotonic()
    pairs = simhash_near_dup_pairs(docs, max_hamming=3, min_tokens=2).collect()
    elapsed = time.monotonic() - t0
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert all(a >= 100_000 and b >= 100_000 for a, b in got)
    assert (100_000, 100_001) in got
    assert elapsed < 60, f"guarded run took {elapsed:.1f}s — straggler suspected"
