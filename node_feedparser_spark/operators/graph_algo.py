"""PageRank on DataFrames — iterative message passing over the KG edges.

The KG pipeline materializes an edge table (plans/pipeline.py); ranking its
vertices is the canonical "iterative algorithm over the graph you just
built" (the reference's analog is feedparser consumers ranking feeds by
link structure — the reference itself stops at emitting items, so this is
a first-class addition like the curation/similarity families).

Plan shape, per iteration:

- one join of the (static, cached) normalized edge list with the current
  rank vector on src + one groupBy(dst) sum — O(|E|) shuffle, partial
  aggregation map-side;
- dangling mass (rank sitting on nodes with no out-edges) is ONE scalar
  aggregate per iteration, redistributed uniformly — no per-row driver
  work;
- `localCheckpoint` every iteration truncates the lineage exactly as
  operators/components.py does (plan size, not data size, is what breaks
  long iterative chains);
- the edge normalization (w / out-degree-sum) is computed ONCE outside
  the loop — the transition structure is static, only the rank vector
  iterates.

At 100 TB the rank vector is |V| rows (orders of magnitude smaller than
the corpus) and each iteration is one co-partitioned join + agg; skewed
in-degree (celebrity entities) is an agg-side hot key, handled by partial
aggregation (sum is associative) rather than by salting.

Fixed iteration count (the DuckDB oracle unrolls the same two
iterations); convergence-threshold stopping would compare successive
vectors — one more scalar agg — but is deliberately not the oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src_id",
    dst: str = "dst_id",
    weight: str | None = "weight",
    checkpoint: bool = True,
) -> DataFrame:
    """edges(src, dst[, weight]) -> (node, rank), ranks summing to 1.

    Weighted PageRank with uniform teleport and uniform dangling-mass
    redistribution:

        rank'(v) = (1-d)/N + d * ( sum_{(u,v) in E} rank(u) * w(u,v)/W(u)
                                   + dangling_mass / N )

    where W(u) is u's total out-weight and dangling_mass is the rank held
    by nodes with no out-edges.  `weight=None` treats every edge as 1.
    Parallel edges are combined by summing their weights first, so the
    result is multigraph-safe and matches the SQL oracle's pre-aggregated
    edge list.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.groupBy(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .agg(F.sum(w_col).alias("_w"))
    )
    out = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    frac = (
        e.join(out, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_out_w")).alias("_frac"))
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    # static across iterations: materialize once
    frac = frac.localCheckpoint() if checkpoint else frac.cache()
    nodes = nodes.localCheckpoint() if checkpoint else nodes.cache()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    # nodes with no out-edges, as a static flag on the rank vector
    dangling_nodes = nodes.join(
        out.select(F.col("_src").alias("node")), "node", "left_anti"
    ).withColumn("_dangling", F.lit(True))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).join(
        dangling_nodes.select("node", "_dangling"), "node", "left"
    )
    for _ in range(n_iter):
        # scalar aggregate: total rank sitting on dangling nodes this round
        dangling_mass = (
            ranks.filter(F.col("_dangling").isNotNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        contribs = (
            frac.join(ranks.select(F.col("node").alias("_src"), "rank"), "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_frac")).alias("_c"))
        )
        ranks = (
            ranks.drop("rank")
            .join(contribs, "node", "left")
            .withColumn(
                "rank",
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.lit(dangling_mass / n)),
            )
            .drop("_c")
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", "rank")
