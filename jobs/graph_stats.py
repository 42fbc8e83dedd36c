"""spark-submit entry point for analytics over a built KG (the consumer
face of jobs/build_kg.py's outputs): PageRank, triangle counts, label-
propagation communities, and an optional snapshot diff against a second
KG directory.

Usage:
    spark-submit jobs/graph_stats.py --kg /path/kg \
        [--diff-against /path/kg_old] [--top 10] \
        [--pagerank-iters 10] [--lpa-iters 5] \
        [--output /path/stats_dir] [--master local[8]]

Reads <kg>/edges (src_id, pred, dst_id, weight) as written by build_kg.
Prints a single JSON summary line; with --output, also writes the full
per-node rank/community/triangle table and (if diffing) the diff rows as
parquet.  Each algorithm is one DataFrame plan over the same cached edge
list — at cluster scale the edge table is read once and every iteration
is a co-partitioned join + agg (see operators/graph_algo.py docstrings
for the per-operator shuffle story).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg", required=True, help="build_kg output dir")
    ap.add_argument("--diff-against", default=None,
                    help="older build_kg output dir to diff edges against")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--pagerank-iters", type=int, default=10)
    ap.add_argument("--lpa-iters", type=int, default=5)
    ap.add_argument("--output", default=None,
                    help="write per-node stats (and diff) as parquet here")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from node_feedparser_spark.operators.graph_algo import (
        label_propagation,
        pagerank,
        snapshot_diff,
        triangle_count,
    )
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="graph_stats",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()
    edges = spark.read.parquet(os.path.join(args.kg, "edges")).cache()
    n_edges = edges.count()

    ranks = pagerank(edges, n_iter=args.pagerank_iters)
    tris = triangle_count(edges)
    comms = label_propagation(edges, n_iter=args.lpa_iters)
    stats = (
        ranks.join(tris, "node", "full_outer")
        .join(comms, "node", "full_outer")
        .select(
            "node",
            F.round("rank", 8).alias("rank"),
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.coalesce("label", F.col("node")).alias("community"),
        )
    )
    stats.cache()
    n_nodes = stats.count()
    top = [
        {"node": r["node"], "rank": r["rank"], "triangles": r["triangles"]}
        for r in stats.orderBy(F.desc("rank"), "node").limit(args.top).collect()
    ]
    n_communities = stats.select("community").distinct().count()
    total_triangles = int(
        stats.agg(
            F.coalesce((F.sum("triangles") / 3).cast("long"), F.lit(0)).alias("t")
        ).collect()[0]["t"]
    )

    summary = {
        "kg": args.kg,
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "n_communities": n_communities,
        "n_triangles": total_triangles,
        "top_by_rank": top,
    }

    if args.diff_against:
        old = spark.read.parquet(os.path.join(args.diff_against, "edges"))
        d = snapshot_diff(old, edges).cache()
        summary["diff"] = {
            r["status"]: r["n"]
            for r in d.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if args.output:
            d.write.mode("overwrite").parquet(os.path.join(args.output, "edge_diff"))

    if args.output:
        stats.write.mode("overwrite").parquet(os.path.join(args.output, "node_stats"))
        summary["output"] = args.output

    summary["wall_s"] = round(time.monotonic() - t0, 3)
    summary["master"] = spark.sparkContext.master
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
