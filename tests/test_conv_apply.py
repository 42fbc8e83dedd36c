"""Salted per-conversation apply: identical results to an unsalted
groupBy, and the mega thread really is split into bounded chunks."""

from pyspark.sql import functions as F

from node_feedparser_spark.operators.conv_apply import conversation_stats, salted
from node_feedparser_spark.sources.transcripts import read_transcripts


def test_salted_chunks_mega_only(spark, corpus_path):
    df = read_transcripts(spark, corpus_path)
    s = salted(df, mega_threshold=100, chunk_rows=50)
    per_conv = (
        s.groupBy("conv_id")
        .agg(F.countDistinct("salt").alias("n_salts"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in per_conv:
        if r["conv_id"].startswith("mega-"):
            assert r["n_salts"] > 1, "mega thread not chunked"
        elif r["n"] <= 100:
            assert r["n_salts"] == 1, f"small conv {r['conv_id']} salted"
    # chunk boundedness: no (conv, salt) group exceeds chunk_rows
    max_group = (
        s.groupBy("conv_id", "salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_group <= 50


def test_conversation_stats_match_plain_groupby(spark, corpus_path):
    df = read_transcripts(spark, corpus_path)
    got = {
        r["conv_id"]: (r["n_turns"], r["n_chars"], r["n_tool_turns"], r["max_turn_idx"])
        for r in conversation_stats(df, mega_threshold=100, chunk_rows=50).collect()
    }
    want = {
        r["conv_id"]: (r["n_turns"], r["n_chars"], r["n_tool_turns"], r["max_turn_idx"])
        for r in df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("n_chars"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias(
                "n_tool_turns"
            ),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .collect()
    }
    assert got == want


def test_hash_salt_bounds_chunks_for_global_ids(spark):
    """Range-salting a GLOBAL id degenerates to one chunk per row (each
    group's ids are spread across the whole id space); hash-salting bounds
    the chunk count at ceil(n/chunk_rows) regardless of id density."""
    rows = [(f"u{i % 20}", i, "x" * 10, "t" if i % 3 == 0 else None)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, tool string")

    hashed = salted(df, mega_threshold=50, chunk_rows=40, mode="hash")
    per_group = (
        hashed.groupBy("conv_id")
        .agg(F.countDistinct("salt").alias("n_salts"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in per_group:
        # every group here has 200 rows > threshold 50 -> exactly
        # ceil(200/40) = 5 salt buckets (pmod range), not 200 singletons
        assert r["n"] == 200
        assert r["n_salts"] == 5, f"{r['conv_id']}: {r['n_salts']} salts"
    # no degenerate explosion: total (group, salt) pairs = 20 * 5
    assert hashed.select("conv_id", "salt").distinct().count() == 100

    ranged = salted(df, mega_threshold=50, chunk_rows=40, mode="range")
    # the pathology the hash mode exists to avoid: ~one chunk per row
    assert ranged.select("conv_id", "salt").distinct().count() > 1000


def test_conversation_stats_hash_mode_sparse_order_col(spark):
    """conversation_stats default (hash) equals a plain groupBy on a
    corpus whose order col is a global id."""
    rows = [(f"u{i % 7}", i * 13 + 5, ("y" * (i % 11)) or None,
             "tool" if i % 4 == 0 else None) for i in range(700)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, tool string")
    got = {
        r["conv_id"]: (r["n_turns"], r["n_chars"], r["n_tool_turns"], r["max_turn_idx"])
        for r in conversation_stats(df, mega_threshold=30, chunk_rows=10).collect()
    }
    want = {
        r["conv_id"]: (r["n_turns"], r["n_chars"], r["n_tool_turns"], r["max_turn_idx"])
        for r in df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("n_chars"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias(
                "n_tool_turns"
            ),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .collect()
    }
    assert got == want


def test_salted_rejects_unknown_mode(spark, corpus_path):
    df = read_transcripts(spark, corpus_path)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted(df, mode="zigzag")
