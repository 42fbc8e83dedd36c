"""Streaming incremental edge maintenance (streaming/graph_merge.py):
drained drops of triple files MERGE into the persistent edge aggregate;
the result equals the batch one-shot aggregate over all drops, resume
drains only new files, and crash-replays of an applied batch are no-ops."""

import os

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.schemas import TRIPLES
from node_feedparser_spark.streaming.graph_merge import (
    merge_batch_into_edges,
    stream_edge_merge,
)


def _triples_df(spark, rows):
    """rows: (conv, turn, subj, pred, obj, score, subj_id, obj_id)"""
    return spark.createDataFrame(
        [
            (c, t, s, p, o, sc, sid, oid, None)
            for (c, t, s, p, o, sc, sid, oid) in rows
        ],
        TRIPLES,
    )


DROP1 = [
    ("c1", 0, "a", "invokes", "b", 0.9, 1, 2),
    ("c1", 1, "a", "invokes", "b", 0.5, 1, 2),
    ("c2", 0, "b", "mentions", "c", 1.0, 2, 3),
]
DROP2 = [
    ("c3", 0, "a", "invokes", "b", 0.25, 1, 2),   # strengthens 1->2
    ("c3", 1, "c", "mentions", "a", 0.75, 3, 1),  # new edge
]


def _edges_map(spark, path):
    return {
        (r["src_id"], r["pred"], r["dst_id"]): r["weight"]
        for r in spark.read.parquet(path).collect()
    }


def test_drain_merge_equals_batch_aggregate(spark, tmp_path):
    in_dir = str(tmp_path / "triples_in")
    edges = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    _triples_df(spark, DROP1).write.mode("append").parquet(in_dir)
    q = stream_edge_merge(spark, in_dir, edges, ckpt)
    q.awaitTermination()
    got1 = _edges_map(spark, edges)
    assert got1 == {
        (1, "invokes", 2): 1.4,
        (2, "mentions", 3): 1.0,
    }

    # second drop: resume drain consumes only the new files and merges
    _triples_df(spark, DROP2).write.mode("append").parquet(in_dir)
    q = stream_edge_merge(spark, in_dir, edges, ckpt)
    q.awaitTermination()
    got2 = _edges_map(spark, edges)

    # equals the batch one-shot aggregate over the union of drops
    want = {
        (r["src_id"], r["pred"], r["dst_id"]): r["weight"]
        for r in _triples_df(spark, DROP1 + DROP2)
        .groupBy(F.col("subj_id").alias("src_id"), "pred",
                 F.col("obj_id").alias("dst_id"))
        .agg(F.round(F.sum("score"), 6).alias("weight"))
        .collect()
    }
    assert got2 == want
    assert got2[(1, "invokes", 2)] == pytest.approx(1.65)

    # drain with nothing new: edges unchanged
    q = stream_edge_merge(spark, in_dir, edges, ckpt)
    q.awaitTermination()
    assert _edges_map(spark, edges) == got2


def test_batch_replay_is_noop(spark, tmp_path):
    edges = str(tmp_path / "edges")
    b0 = _triples_df(spark, DROP1).select(
        F.col("subj_id").alias("src_id"), "pred",
        F.col("obj_id").alias("dst_id"), "score",
    )
    assert merge_batch_into_edges(spark, b0, 0, edges) is True
    before = _edges_map(spark, edges)
    # foreachBatch at-least-once: the same batch id may be replayed after a
    # crash between sink write and checkpoint commit — must not double-count
    assert merge_batch_into_edges(spark, b0, 0, edges) is False
    assert _edges_map(spark, edges) == before
    # an out-of-order older batch id is equally refused
    assert merge_batch_into_edges(spark, b0, -5, edges) is False
    b1 = _triples_df(spark, DROP2).select(
        F.col("subj_id").alias("src_id"), "pred",
        F.col("obj_id").alias("dst_id"), "score",
    )
    assert merge_batch_into_edges(spark, b1, 1, edges) is True
    assert _edges_map(spark, edges)[(1, "invokes", 2)] == pytest.approx(1.65)


def test_merge_over_pipeline_triples(spark, tmp_path):
    """End-to-end: feed build_kg's own triples output through the streaming
    merge; the resulting edge table equals build_kg's edges."""
    from node_feedparser_spark.datagen import write_transcripts
    from node_feedparser_spark.plans.pipeline import build_kg

    corpus = str(tmp_path / "transcripts.parquet")
    write_transcripts(corpus, seed=42, scale=0.5)
    s = build_kg(spark, corpus, str(tmp_path / "kg"), n_buckets=4, resume=False)

    in_dir = str(tmp_path / "triples_in")
    os.makedirs(in_dir)
    # strip partition columns; keep the TRIPLES shape the stream pins
    (
        spark.read.parquet(str(tmp_path / "kg/triples"))
        .select(*[f.name for f in TRIPLES.fields])
        .write.mode("append")
        .parquet(in_dir)
    )
    edges = str(tmp_path / "edges_stream")
    q = stream_edge_merge(
        spark, in_dir, edges, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination()
    got = _edges_map(spark, edges)
    want = _edges_map(spark, str(tmp_path / "kg/edges"))
    assert got == want and len(got) == s["n_edges"]
