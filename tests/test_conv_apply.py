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
