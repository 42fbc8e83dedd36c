"""Strongly connected components on DataFrames — iterative coloring.

The KG the pipeline materializes is DIRECTED (subj --pred--> obj), and the
existing components.py deliberately symmetrizes it (canonicalization wants
undirected equivalence).  Cycle analysis — "which entities mutually imply
each other through follow/cites/derived-from edges", condensing the graph
into its DAG before reachability work — needs the directed notion: SCCs.

Implements the coloring algorithm for parallel SCC (Orzan's thesis /
"On Identifying Strongly Connected Components in Parallel", Fleischer,
Hendrickson & Pinar, IPDPS'00 — public literature, same family as the
Spark/GraphX reference implementation) purely with DataFrame joins:

  repeat until no vertices remain:
    1. FORWARD MIN-COLORING to fixpoint: color(v) = min vertex id that
       reaches v in the remaining subgraph.  Each round is one
       join + groupBy(min): O(|E|) shuffle, converges in diameter rounds.
    2. Vertices with color(v) == v are roots.  SCC(root r) is exactly the
       set of vertices with color r that reach r — and every vertex on
       such a path itself has color r, so the BACKWARD reachability can be
       restricted to intra-color edges (proof: if v has color r and
       v ->* r, then any w on the path has r ->* w via v's coloring and
       w ->* r, hence color(w) = r).  Each backward round is one
       join + distinct + anti-join frontier expansion.
    3. Extract all root SCCs simultaneously, delete them, iterate.

At scale: every round is linear in the surviving edge set; there is no
O(n^2) closure anywhere (the oracle in __spark_entry__ builds the closure
— that is exactly what this operator exists to avoid).  The outer loop
peels at least one SCC per color class per round; on KGs whose condensation
order correlates with entity age (ids grow over time, links point back to
older entities) the first coloring already separates every SCC and the loop
finishes in ONE outer round.  `localCheckpoint` per round truncates lineage
exactly as components.py does — without it the plan doubles per iteration.

Reference behavior anchor: node-feedparser resolves cyclic element
references (e.g. atom:link rel chains) by first-wins traversal
(feedparser.js handling of nested/self-referencing links); the graph-shaped
generalization of "find the cycles before you linearize" is SCC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strongly_connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_outer: int = 50,
    max_inner: int = 200,
) -> DataFrame:
    """SCCs of the directed graph ``edges(src, dst)``.

    Returns (node, scc_id) with scc_id = MIN member id of the component —
    the same labeling contract as connected_components, so downstream
    canonical-id joins work identically.  ``nodes`` optionally supplies
    isolated vertices (their own singleton SCCs); self-loops are dropped
    (a single vertex is trivially its own SCC either way).
    """
    raw = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    e_all = (
        raw.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    )
    # vertex set from the PRE-filter edge list: a self-loop-only vertex is
    # still its own singleton SCC and must not vanish with its loop edge
    seen = raw.select(F.col("src").alias("node")).union(
        raw.select(F.col("dst").alias("node"))
    ).distinct()
    if nodes is not None:
        seen = seen.union(nodes.select(F.col("node").cast("long"))).distinct()
    remaining = seen.localCheckpoint()
    rem_edges = e_all
    spark = edges.sparkSession
    done = spark.createDataFrame([], "node long, scc_id long")

    for _outer in range(max_outer):
        if remaining.isEmpty():
            return done
        # -- 1. forward min-color fixpoint ---------------------------------
        colors = remaining.select(
            "node", F.col("node").alias("color")
        ).localCheckpoint()
        for _ in range(max_inner):
            cand = (
                rem_edges.join(
                    colors.select(
                        F.col("node").alias("src"), F.col("color").alias("cs")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("cs").alias("cin"))
            )
            nxt = colors.join(cand, "node", "left").select(
                "node",
                F.least("color", F.coalesce("cin", F.col("color"))).alias("color"),
            )
            nxt = nxt.localCheckpoint()
            n_changed = (
                nxt.alias("n")
                .join(colors.alias("o"), "node")
                .filter(F.col("n.color") != F.col("o.color"))
                .count()
            )
            colors = nxt
            if n_changed == 0:
                break
        # -- 2. backward reach from roots over intra-color edges -----------
        ec = (
            rem_edges.join(
                colors.select(F.col("node").alias("src"), F.col("color").alias("cs")),
                "src",
            )
            .join(
                colors.select(F.col("node").alias("dst"), F.col("color").alias("cd")),
                "dst",
            )
            .filter(F.col("cs") == F.col("cd"))
            .select("src", "dst")
            .localCheckpoint()
        )
        reached = colors.filter(F.col("node") == F.col("color")).select("node")
        frontier = reached.localCheckpoint()
        reached = frontier
        for _ in range(max_inner):
            frontier = (
                ec.join(frontier.select(F.col("node").alias("dst")), "dst")
                .select(F.col("src").alias("node"))
                .distinct()
                .join(reached, "node", "left_anti")
                .localCheckpoint()
            )
            if frontier.isEmpty():
                break
            reached = reached.union(frontier).localCheckpoint()
        # -- 3. extract, delete, iterate ------------------------------------
        scc_round = reached.join(colors, "node").select(
            "node", F.col("color").alias("scc_id")
        )
        done = done.union(scc_round).localCheckpoint()
        remaining = remaining.join(reached, "node", "left_anti").localCheckpoint()
        rem_edges = (
            rem_edges.join(
                remaining.select(F.col("node").alias("src")), "src"
            )
            .join(remaining.select(F.col("node").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint()
        )
    raise RuntimeError(f"SCC did not converge in {max_outer} outer rounds")


def condensation(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_outer: int = 50,
    max_inner: int = 200,
) -> DataFrame:
    """Condensation DAG of the directed graph: every SCC contracted to its
    ``scc_id`` (MIN member, the strongly_connected_components contract),
    one row per ordered pair of DISTINCT components with a cross edge,
    carrying the count of distinct underlying edges.  Acyclic by
    construction (a cycle between condensation vertices would merge the
    SCCs) — the object cycle/feedback analysis, topological scheduling,
    and hierarchy extraction over the KG actually consume after SCC
    detection.

    Plan: the scc label table (|V| rows) equi-joins the distinct edge
    list twice (src label, dst label), intra-component edges filter out
    row-locally, and one map-side-combinable count groups the survivors —
    nothing beyond the SCC computation itself exceeds one |E|-bounded
    shuffle, and the output is condensation-sized (<= #SCC-adjacencies).

    Returns (src_scc, dst_scc, n_edges).
    """
    labels = strongly_connected_components(
        edges, nodes, max_outer=max_outer, max_inner=max_inner
    )
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return (
        e.join(
            labels.select(
                F.col("node").alias("src"), F.col("scc_id").alias("src_scc")
            ),
            "src",
        )
        .join(
            labels.select(
                F.col("node").alias("dst"), F.col("scc_id").alias("dst_scc")
            ),
            "dst",
        )
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .groupBy("src_scc", "dst_scc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )


def topological_layers(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_rounds: int = 60,
) -> DataFrame:
    """Longest-path layer of every node of a DAG: layer(v) = length of
    the longest directed path ending at v (equivalently, from some
    in-degree-0 source — in a DAG any path extends backward to one).
    This is the level assignment topological scheduling actually wants:
    all nodes in one layer are mutually independent and a schedule of
    exactly depth+1 waves is optimal — the natural consumer of
    `condensation` (its docstring names this), since real dependency
    graphs must be cycle-contracted first.

    Level-synchronous max-relaxation (the PERT/critical-path recurrence):

        layer_0(v) = 0
        layer_t(v) = max(layer_{t-1}(v),
                         1 + max over in-edges (u,v) of layer_{t-1}(u))

    Layers only ever increase and the total sum is stationary exactly at
    the fixpoint, so convergence is detected by ONE map-side-combinable
    sum per round — no row-diff join.  A cycle never reaches a fixpoint
    (its layers rise forever), so exhausting ``max_rounds`` raises: this
    operator refuses cyclic input instead of silently looping, and the
    error says to condense first.  Pure integer arithmetic — the
    recursive-CTE oracle is bit-identical.

    Plan per round: one edge-vector equi-join + max-agg on dst + one
    left-join merge; the layer vector is |V| rows, the edge list is
    hash-partitioned once and never re-shuffles.  The vector is consumed
    by join, merge, AND the sum probe, so each round is eagerly
    localCheckpoint-ed (the scc/khop multi-consumer lesson).  Rounds =
    DAG depth + 1 — the inherent sequential critical path; any
    topological schedule takes that many waves, so no log-round
    shortcut is attempted (transitive doubling would square the edge
    set at 100 TB for a constant-factor latency win).

    Returns (node, layer) for every vertex; isolated vertices (via
    ``nodes``) sit at layer 0.
    """
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    raw = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    e = raw.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    seen = (
        raw.select(F.col("src").alias("node"))
        .union(raw.select(F.col("dst").alias("node")))
        .distinct()
    )
    if nodes is not None:
        seen = seen.union(nodes.select(F.col("node").cast("long"))).distinct()
    lay = seen.select(
        "node", F.lit(0).cast("long").alias("layer")
    ).localCheckpoint()
    prev = 0
    for _ in range(max_rounds):
        relax = (
            e.join(lay.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg((F.max("layer") + 1).alias("cand"))
        )
        lay = (
            lay.join(relax, "node", "left")
            .select(
                "node",
                F.greatest(
                    F.col("layer"), F.coalesce("cand", F.col("layer"))
                ).alias("layer"),
            )
            .localCheckpoint()
        )
        total = lay.agg(F.sum("layer")).first()[0] or 0
        if total == prev:
            return lay
        prev = total
    raise ValueError(
        f"no fixpoint after {max_rounds} rounds: the graph has a cycle "
        "(condense SCCs first) or its depth exceeds max_rounds"
    )
