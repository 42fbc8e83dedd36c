"""Graph algorithms on DataFrames — analytics over the KG edge shape.

PageRank (iterative message passing), degree-ordered triangle counting,
k-hop BFS reachability, and snapshot diff — the query layer a consumer of
the built KG runs next.

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

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src_id",
    dst: str = "dst_id",
    weight: str | None = "weight",
    checkpoint: bool = True,
    ckpt_every: int = 3,
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
    for it in range(n_iter):
        # total rank on dangling nodes, as a LAZY broadcast 1-row aggregate
        # crossJoined into the update — NOT a driver collect(): the loop
        # builds one plan with no per-iteration driver synchronization, so
        # on a real cluster iterations pipeline through the scheduler
        # without a round-trip each (and at bench scale a 2-iteration run
        # stops paying ~2 jobs of pure latency per iteration)
        dm = ranks.filter(F.col("_dangling").isNotNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            frac.join(ranks.select(F.col("node").alias("_src"), "rank"), "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_frac")).alias("_c"))
        )
        ranks = (
            ranks.drop("rank")
            .join(contribs, "node", "left")
            .crossJoin(F.broadcast(dm))
            .withColumn(
                "rank",
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / F.lit(float(n))),
            )
            .drop("_c", "_dm")
        )
        # truncate lineage periodically, not every iteration: plan DEPTH is
        # what breaks long chains, and every eager localCheckpoint is a
        # materialization barrier — one every ckpt_every iterations bounds
        # both
        if checkpoint and (it + 1) % max(1, ckpt_every) == 0:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """edges(src, dst) -> (node, triangles): per-node triangle counts of the
    UNDIRECTED simple graph (direction dropped, self-loops and parallel
    edges collapsed).  Every node of the input graph appears, zeros kept.

    Degree-ordered node-iterator: each undirected edge is oriented from its
    lower-(degree, id) endpoint to the higher one, wedges are generated only
    from each node's oriented out-neighborhood, and a wedge (b, c) closes
    iff the oriented edge b->c exists.  Orientation bounds every node's
    out-degree by O(sqrt(m)), so wedge generation is O(m^(3/2)) total work
    regardless of skew — a celebrity node of degree d contributes d wedges
    as a LOW-rank endpoint spread across its neighbors' lists, not d^2
    (the naive neighbor self-join blows up exactly there).  Plan: two
    shuffles (self-join on the wedge pivot, semi-join of candidate closures
    against the oriented edge list) + one explode/groupBy for the per-node
    counts.  No driver-side state; the oracle counts the same triangles via
    an independent a<b<c three-way join.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = und.select(F.col("u").alias("node")).union(
        und.select(F.col("v").alias("node"))
    ).distinct()
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # total order for orientation: (degree, id) — ties broken by id so the
    # orientation is deterministic
    ranked = (
        und.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(deg.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("deg", "dv")
    )
    lo_first = F.struct(F.col("du").alias("d"), F.col("u").alias("n")) < F.struct(
        F.col("dv").alias("d"), F.col("v").alias("n")
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    # wedges from each pivot a's out-list; order the two tips so the
    # candidate closing edge (b, c) is itself in oriented orientation
    l = oriented.select("a", F.col("b").alias("x"), F.col("db").alias("dx"))
    r = oriented.select("a", F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = l.join(r, "a").filter(
        F.struct(F.col("dx").alias("d"), F.col("x").alias("n"))
        < F.struct(F.col("dy").alias("d"), F.col("y").alias("n"))
    )
    tris = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_semi",
    ).select(F.col("a").alias("n1"), F.col("x").alias("n2"), F.col("y").alias("n3"))
    per_node = (
        tris.select(F.explode(F.array("n1", "n2", "n3")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def khop(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src_id",
    dst: str = "dst_id",
    checkpoint: bool = False,
) -> DataFrame:
    """Directed BFS: (node, dist) for every node reachable from `seeds`
    (a one-column DataFrame of node ids) in <= max_hops forward hops,
    dist = MINIMUM hop count (seeds themselves at dist 0).

    Frontier expansion: each hop is one join of the CURRENT FRONTIER
    (only the nodes first reached last hop, not everything visited) with
    the edge list + an anti-join against the visited set — the classic
    delta iteration, so per-hop work tracks the frontier size, not the
    cumulative reachable set.  `localCheckpoint` truncates lineage per hop
    (operators/components.py discipline).  At 100 TB the edge list is the
    big side and stays put; the frontier is the small side of every join
    and is broadcast-eligible whenever it fits — we leave the choice to
    AQE rather than forcing it, since a supernode hop can explode the
    frontier past broadcast size.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    # static across hops: materialize once (pagerank discipline) — without
    # this every hop re-runs the full edge-derivation plan upstream
    e = e.localCheckpoint() if checkpoint else e.cache()
    visited = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct().withColumn(
        "dist", F.lit(0)
    )
    if checkpoint:
        visited = visited.localCheckpoint()
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        if checkpoint:
            nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        visited = visited.union(nxt)
        if checkpoint:
            visited = visited.localCheckpoint()
        frontier = nxt
    return visited


def label_propagation(
    edges: DataFrame,
    n_iter: int = 2,
    src: str = "src_id",
    dst: str = "dst_id",
    checkpoint: bool = False,
) -> DataFrame:
    """Synchronous label-propagation communities over the UNDIRECTED simple
    graph: every node starts labeled with its own id; each iteration
    relabels every node with the most frequent label among its neighbors,
    ties broken by the SMALLEST label.  Nodes are the endpoints of
    non-self-loop edges, so every node has >= 1 neighbor.  Fully
    deterministic (no async sweep order), so a fixed iteration count is
    exactly reproducible by an unrolled SQL oracle.

    Plan per iteration: one join of the static (cached) undirected edge
    list with the label vector + one two-level agg — count per (node,
    neighbor-label), then argmax via min over struct((-count), label), the
    same map-side-combinable shape merge_vertices uses.  Celebrity nodes
    are agg hot keys handled by partial aggregation, not salting.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # both directions once: neighbor lists without double-counting parallels
    nbrs = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    nbrs = nbrs.localCheckpoint() if checkpoint else nbrs.cache()
    nodes = nbrs.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(n_iter):
        votes = (
            nbrs.join(labels.select(F.col("node").alias("v"), "label"), "v")
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("neg"), F.col("label").alias("l"))
                ).alias("best")
            )
            .select("node", F.col("best.l").alias("label"))
        )
        labels = winner
        if checkpoint:
            labels = labels.localCheckpoint()
    return labels


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | None = None,
    value: str = "weight",
) -> DataFrame:
    """Diff two edge-aggregate snapshots of the graph: one row per key
    present in either side, classified 'added' / 'removed' / 'changed' /
    'unchanged', with both sides' values (`old_<value>` / `new_<value>`,
    NULL where absent).

    This is the consumer-side query over the KG pipeline's snap-partitioned
    outputs (plans/pipeline.py writes triples partitioned by (snap, bucket),
    so reading two snapshots prunes to exactly their partitions).  The plan
    is ONE full-outer join co-partitioned on the key columns + a pure
    projection for the classification — both sides shuffle once on the same
    key, no broadcast needed at any scale, and value comparison happens
    JVM-side with null-safe equality (<=>).
    """
    keys = keys or ["src_id", "pred", "dst_id"]
    # presence markers, NOT value nullability: a present row whose value is
    # NULL must still read as present (else it misclassifies as added/removed)
    o = old.select(
        *keys, F.col(value).alias("old_" + value), F.lit(True).alias("_in_old")
    )
    n = new.select(
        *keys, F.col(value).alias("new_" + value), F.lit(True).alias("_in_new")
    )
    ov, nv = F.col("old_" + value), F.col("new_" + value)
    return (
        o.join(n, keys, "full_outer")
        .withColumn(
            "status",
            F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(ov.eqNullSafe(nv), F.lit("unchanged"))
            .otherwise(F.lit("changed")),
        )
        .drop("_in_old", "_in_new")
    )


def link_predict(
    edges: DataFrame,
    src: str = "src_id",
    dst: str = "dst_id",
    max_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-overlap link prediction over the UNDIRECTED simple
    graph: for every NON-adjacent node pair (a < b) sharing at least one
    neighbor, emit

    - ``n_common`` — number of common neighbors,
    - ``aa_score`` — Adamic-Adar: sum over common neighbors z of
      1 / ln(deg(z)) (a shared rare neighbor is stronger evidence than a
      shared hub; deg(z) >= 2 for any common neighbor, so ln never hits 0),
    - ``jaccard`` — |N(a) ∩ N(b)| / |N(a) ∪ N(b)| over FULL degrees.

    This is the KG-completion primitive ("which entities should probably
    be linked?") run over the edge aggregate the pipeline materializes.

    Skew, and why ``max_degree`` exists: wedge generation self-joins the
    adjacency list on the pivot z, so a celebrity pivot of degree d emits
    d^2/2 candidate pairs — THE scale killer on power-law graphs.  With
    ``max_degree`` set, pivots with deg > max_degree are excluded from
    wedge generation (only as pivots — they still count toward endpoint
    degrees and can appear as endpoints).  AA already discounts hub
    evidence toward 1/ln(d) ~ 0, so the cap loses the least-informative
    wedges first; n_common/jaccard become lower bounds for pairs whose
    only shared neighbors are hubs — the standard trade, stated rather
    than hidden.  With max_degree=None the result is exact.

    Plan: canonical distinct undirected edges (one shuffle), degree agg
    (map-side combinable), pivot self-join keyed on z (deg(z) carried on
    the build side, so no per-wedge degree lookup), one (a, b) agg, an
    anti-join against the edge list to drop already-adjacent pairs, and
    two |V|-sized degree joins for jaccard.  Every shuffle is linear in
    wedges or edges; nothing touches the driver.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = und.select(F.col("u").alias("z"), F.col("v").alias("n")).union(
        und.select(F.col("v").alias("z"), F.col("u").alias("n"))
    )
    deg = adj.groupBy(F.col("z").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    piv = adj.join(deg.withColumnRenamed("node", "z"), "z")
    if max_degree is not None:
        piv = piv.filter(F.col("d") <= max_degree)
    l = piv.select("z", F.col("n").alias("pa"), F.col("d").alias("dz"))
    r = piv.select("z", F.col("n").alias("pb"))
    scores = (
        l.join(r, "z")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(1.0 / F.log(F.col("dz"))).alias("_aa"),
        )
    )
    non_adj = scores.join(
        und,
        (scores.pa == und.u) & (scores.pb == und.v),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("pa"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("pb"), F.col("d").alias("db"))
    return (
        non_adj.join(da, "pa")
        .join(db, "pb")
        .select(
            F.col("pa").alias("node_a"),
            F.col("pb").alias("node_b"),
            "n_common",
            F.round("_aa", 6).alias("aa_score"),
            F.round(
                F.col("n_common") / (F.col("da") + F.col("db") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 3,
    walks_per_node: int = 2,
    seed: int = 11,
    src: str = "src_id",
    dst: str = "dst_id",
    checkpoint: bool = False,
) -> DataFrame:
    """Deterministic random-walk corpus over the DIRECTED simple graph —
    the node2vec/DeepWalk sampling stage of a graph-embedding training
    pipeline, made reproducible: step t of walk k from node s moves to
    neighbor number

        portable_hash60(seed \\x1f s \\x1f k \\x1f t \\x1f current) mod outdeg(current)

    of the current node's neighbor list ordered by neighbor id.  Hash-indexed
    choice instead of an RNG means the same walk corpus on every run, every
    partitioning, and in the DuckDB oracle (which unrolls the steps as SQL).
    Walks stop early at dangling nodes (no out-edges).

    Output: one row per visited position — (start_node, walk_k, step, node),
    step 0 = the start node itself; every node starts walks_per_node walks.

    Plan: neighbor lists are ranked once (ROW_NUMBER per src over dst — the
    ONE per-node window in the job; a celebrity node pays its degree once
    at build time, never per step) and out-degrees are one map-side
    combinable agg.  Each step is then two equi-joins: a 1:1 degree lookup
    (node-sized table — no skew) that computes choice = h mod deg, and a
    join of the frontier against the ranked neighbor table on the composite
    key (node, idx) — which spreads a celebrity node's adjacency across its
    whole neighbor list instead of funneling deg(u) rows into one task.
    walk_len step rounds total, each linear in |frontier|; no driver-side
    state, no RNG state to synchronize.  At 100 TB the frontier is
    nodes x walks_per_node rows regardless of edge count.
    """
    from ..functions.hashing import portable_hash60

    dedges = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("n"))
        .filter(F.col("u") != F.col("n"))
        .distinct()
    )
    w_rank = Window.partitionBy("u").orderBy("n")
    nbr = dedges.select(
        "u", "n", (F.row_number().over(w_rank) - 1).alias("idx")
    )
    degs = dedges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # checkpoint=False by default, and deliberately so: the output union's
    # branch t shares its whole lineage prefix with branches t+1.., but
    # Spark reuses completed shuffle MAP stages across branches (skipped
    # stages), so the "recompute" is only the final stage of each branch —
    # measured 6.6 s vs 7.6 s WITH eager checkpoints at sf0.1/local[32],
    # walk_len 3.  For LONG walks (lineage depth ~ walk_len) flip
    # checkpoint=True: it trades one materialization per step for lineage
    # truncation, the khop/pagerank discipline.
    if checkpoint:
        nbr = nbr.localCheckpoint()
        degs = degs.localCheckpoint()
    nodes = (
        dedges.select(F.col("u").alias("node"))
        .union(dedges.select(F.col("n").alias("node")))
        .distinct()
    )
    ks = F.explode(
        F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1))
    ).alias("walk_k")
    frontier = nodes.select(
        F.col("node").alias("start_node"), ks
    ).withColumn("node", F.col("start_node"))
    out = frontier.select(
        "start_node", "walk_k", F.lit(0).cast("long").alias("step"), "node"
    )
    for t in range(1, int(walk_len) + 1):
        h = portable_hash60(
            F.concat_ws(
                "\x1f",
                F.lit(str(seed)),
                F.col("start_node"),
                F.col("walk_k").cast("string"),
                F.lit(str(t)),
                F.col("node"),
            )
        )
        # two-phase step: (1) 1:1 degree lookup (node-sized table, no
        # skew), choice = h mod deg; (2) EQUI-join on (node, idx), which
        # spreads a celebrity node's adjacency across its whole neighbor
        # list instead of funneling deg(u) rows into one task per step
        frontier = (
            frontier.join(degs, frontier.node == degs.u)
            .withColumn("choice", F.pmod(h, F.col("deg")))
            .select("start_node", "walk_k", "node", "choice")
            .join(
                nbr,
                (F.col("node") == nbr.u) & (F.col("choice") == nbr.idx),
            )
            .select("start_node", "walk_k", F.col("n").alias("node"))
        )
        # each frontier feeds BOTH its output branch and every later step:
        # truncate lineage so step t isn't recomputed by steps t+1..walk_len
        if checkpoint:
            frontier = frontier.localCheckpoint()
        out = out.union(
            frontier.select(
                "start_node",
                "walk_k",
                F.lit(t).cast("long").alias("step"),
                "node",
            )
        )
    return out.withColumn("walk_k", F.col("walk_k").cast("long"))


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) co-occurrence pairs from a walk corpus — the
    skip-gram training examples a node-embedding model (node2vec/DeepWalk)
    consumes.  For every walk, every ordered position pair (i, j) with
    i != j and |i - j| <= window yields one (node_i, node_j) pair; the
    output is the aggregated multiset (center, context, n_pairs).

    Index-pair generation is deliberate: pairing VALUES and filtering
    context != center would silently drop self-pairs of revisited nodes
    (walks on cycles legitimately emit (a, a) when the walk returns within
    the window) — the index comparison keeps them.

    Plan: ONE shuffle assembles each walk into an in-row array (walks are
    walk_len+1 long, so collect_list is bounded); pair generation is
    array-local JVM (sequence/transform/filter over indices — the node
    array is materialized as a plain column first, so element_at is an
    O(1) access, not a re-evaluated expression); then one map-side
    combinable count agg.  Nothing is quadratic in anything but the
    window, which is a small constant.
    """
    seq = walks.groupBy("start_node", "walk_k").agg(
        F.array_sort(F.collect_list(F.struct("step", "node"))).alias("sq")
    )
    arr = seq.select(
        F.transform("sq", lambda s: s["node"]).alias("arr")
    )
    idx = F.sequence(F.lit(0), F.size("arr") - 1)
    w = F.lit(int(window))
    pairs = arr.select(
        F.explode(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.filter(
                            F.sequence(F.lit(0), F.size("arr") - 1),
                            lambda j: (j != i) & (F.abs(j - i) <= w),
                        ),
                        lambda j: F.struct(
                            F.element_at(F.col("arr"), i + 1).alias("center"),
                            F.element_at(F.col("arr"), j + 1).alias("context"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select(F.col("p.center").alias("center"), F.col("p.context").alias("context"))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def biased_walks(
    edges: DataFrame,
    walk_len: int = 3,
    walks_per_node: int = 1,
    seed: int = 13,
    w_return: int = 1,
    w_common: int = 2,
    w_out: int = 1,
    src: str = "src_id",
    dst: str = "dst_id",
    checkpoint: bool = False,
) -> DataFrame:
    """Second-order (node2vec-style) biased random walks over the
    UNDIRECTED simple graph.  Step 1 is uniform (no previous node); from
    step 2 on, each neighbor x of the current node is weighted by where it
    sits relative to the PREVIOUS node — the node2vec 1/p / 1 / 1/q search
    bias, expressed as INTEGER weights so the deterministic choice (and the
    DuckDB oracle) are exact:

        x == prev                      -> w_return   (node2vec 1/p)
        x adjacent to prev             -> w_common   (node2vec 1)
        otherwise                      -> w_out      (node2vec 1/q)

    The defaults (1, 2, 1) correspond to p = q = 2 scaled by 2.  The pick
    is r = portable_hash60(seed, start, k, t, prev, cur) mod total_weight,
    mapped into the cumulative-weight ranges of the id-ordered neighbor
    list — same hash-indexed discipline as random_walks, so the corpus is
    identical across runs, partitionings, and the unrolled-SQL oracle.

    Cost shape (intrinsic to second-order walks): a step at node u must
    weigh ALL deg(u) neighbors (the bias depends on each one's relation to
    prev), so per-step work is sum over frontier of deg(cur) — unlike
    first-order walks' O(1) indexed pick.  The plan pays it as: one
    (cur = u) join against the ranked adjacency, one broadcast-eligible
    LEFT join against the canonical edge set for the is-adjacent-to-prev
    test keyed on (least, greatest), and ONE window over (start, k) whose
    partitions are exactly one node's neighborhood — bounded by max
    degree, the same bound node2vec's alias tables pay in memory.
    Dangling nodes end walks early; walks on an undirected graph never
    dangle after step 1 (prev is always a neighbor).
    """
    from ..functions.hashing import portable_hash60

    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # the canonical edge set feeds nbr, degs, nodes AND the per-step
    # adjacency probe — when the caller's edge derivation is itself a join
    # (e.g. a co-occurrence self-join), truncating here stops every
    # consumer from re-running it
    if checkpoint:
        und = und.localCheckpoint(eager=False)
    dedges = und.select(F.col("a").alias("u"), F.col("b").alias("n")).union(
        und.select(F.col("b").alias("u"), F.col("a").alias("n"))
    )
    w_rank = Window.partitionBy("u").orderBy("n")
    nbr = dedges.select(
        "u", "n", (F.row_number().over(w_rank) - 1).alias("idx")
    )
    degs = dedges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = dedges.select(F.col("u").alias("node")).distinct()
    ks = F.explode(
        F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1))
    ).alias("walk_k")
    cur0 = nodes.select(F.col("node").alias("start_node"), ks).withColumn(
        "node", F.col("start_node")
    )
    out = cur0.select(
        "start_node",
        F.col("walk_k").cast("long").alias("walk_k"),
        F.lit(0).cast("long").alias("step"),
        "node",
    )
    if walk_len < 1:
        return out

    # step 1: uniform indexed pick (no prev yet) — random_walks shape
    h1 = portable_hash60(
        F.concat_ws(
            "\x1f",
            F.lit(str(seed)),
            F.col("start_node"),
            F.col("walk_k").cast("string"),
            F.lit("1"),
            F.col("node"),
        )
    )
    frontier = (
        cur0.join(degs, cur0.node == degs.u)
        .withColumn("choice", F.pmod(h1, F.col("deg")))
        .select("start_node", "walk_k", "node", "choice")
        .join(nbr, (F.col("node") == nbr.u) & (F.col("choice") == nbr.idx))
        .select(
            "start_node", "walk_k",
            F.col("node").alias("prev"), F.col("n").alias("node"),
        )
    )
    out = out.union(
        frontier.select(
            "start_node",
            F.col("walk_k").cast("long"),
            F.lit(1).cast("long").alias("step"),
            "node",
        )
    )

    wt = (
        F.when(F.col("n") == F.col("prev"), F.lit(int(w_return)))
        .when(F.col("_adj").isNotNull(), F.lit(int(w_common)))
        .otherwise(F.lit(int(w_out)))
        .cast("long")
    )
    adj = und.select(
        F.col("a").alias("_pa"), F.col("b").alias("_pb"),
        F.lit(1).alias("_adj"),
    )
    for t in range(2, int(walk_len) + 1):
        cand = frontier.join(nbr, frontier.node == nbr.u).join(
            adj,
            (F.least(F.col("prev"), F.col("n")) == F.col("_pa"))
            & (F.greatest(F.col("prev"), F.col("n")) == F.col("_pb")),
            "left",
        ).withColumn("wt", wt)
        w_walk = Window.partitionBy("start_node", "walk_k")
        w_cum = w_walk.orderBy("idx").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ht = portable_hash60(
            F.concat_ws(
                "\x1f",
                F.lit(str(seed)),
                F.col("start_node"),
                F.col("walk_k").cast("string"),
                F.lit(str(t)),
                F.col("prev"),
                F.col("node"),
            )
        )
        picked = (
            cand.withColumn("cum", F.sum("wt").over(w_cum))
            .withColumn("tot", F.sum("wt").over(w_walk))
            # tot = 0 (every candidate weighted 0, e.g. w_return=0 at a
            # degree-1 dead end) legally ends the walk: NULL r fails both
            # range predicates, and ANSI mode would reject pmod(h, 0)
            .withColumn(
                "r", F.when(F.col("tot") > 0, F.pmod(ht, F.col("tot")))
            )
            .filter(
                (F.col("r") >= F.col("cum") - F.col("wt"))
                & (F.col("r") < F.col("cum"))
            )
        )
        frontier = picked.select(
            "start_node", "walk_k",
            F.col("node").alias("prev"), F.col("n").alias("node"),
        )
        # the output union references frontier_t once per LATER step, so
        # without lineage truncation each step's join+window subtree is
        # recomputed (walk_len - t + 1) times; lazy localCheckpoint makes
        # each step compute once (checkpoint=True when steps are expensive
        # — second-order steps carry two windows)
        if checkpoint:
            frontier = frontier.localCheckpoint(eager=False)
        out = out.union(
            frontier.select(
                "start_node",
                F.col("walk_k").cast("long"),
                F.lit(t).cast("long").alias("step"),
                "node",
            )
        )
    return out


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src_id",
    dst: str = "dst_id",
    weight: str = "weight",
    checkpoint: bool = True,
) -> DataFrame:
    """Weighted single-source (multi-seed) shortest paths, bounded to
    ``max_hops`` relaxation rounds — Bellman-Ford on DataFrames.  Output:
    (node, dist) for every node reachable from any seed within max_hops
    directed hops, dist = minimum total edge weight (seeds at 0.0).

    khop's unweighted cousin: where khop expands a delta frontier (set
    semantics), weighted relaxation must revisit nodes whose DISTANCE
    improves, so each round is

        dist' = min(dist, min over edges (u,v,w) of dist[u] + w)

    — one join of the current distance table with the static min-weight
    edge list plus one map-side-combinable min agg.  Parallel edges
    collapse to their minimum weight up front (any heavier duplicate can
    never win a relaxation).  The frontier optimization: only rows whose
    distance CHANGED last round are joined against the edges (improved
    set), so settled regions stop costing — the classic delta refinement,
    same reason khop tracks a frontier.  localCheckpoint per round
    truncates lineage (components.py discipline).  All arithmetic is
    IEEE additions of the same operands in both engines, so the DuckDB
    oracle's unrolled rounds agree exactly.
    """
    e = (
        edges.select(
            F.col(src).alias("_s"),
            F.col(dst).alias("_d"),
            F.col(weight).cast("double").alias("_w"),
        )
        .filter(F.col("_s") != F.col("_d"))
        .groupBy("_s", "_d")
        .agg(F.min("_w").alias("_w"))
    )
    e = e.localCheckpoint() if checkpoint else e.cache()
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0.0))
    )
    if checkpoint:
        dist = dist.localCheckpoint()
    improved = dist
    for _ in range(int(max_hops)):
        relaxed = (
            improved.join(e, improved.node == e._s)
            .select(F.col("_d").alias("node"), (F.col("dist") + F.col("_w")).alias("dist"))
        )
        nxt = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if checkpoint:
            nxt = nxt.localCheckpoint()
        improved = nxt.join(
            dist.withColumnRenamed("dist", "_old"), "node", "left"
        ).filter(
            F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
        ).select("node", "dist")
        if checkpoint:
            improved = improved.localCheckpoint()
        if improved.isEmpty():
            return nxt
        dist = nxt
    return dist


def kcore(
    edges: DataFrame,
    k: int,
    n_rounds: int = 3,
    checkpoint: bool = False,
) -> DataFrame:
    """Bounded k-core peeling: iteratively drop nodes of degree < ``k``
    (and their edges) for ``n_rounds`` rounds; return the surviving nodes
    with their degree in the surviving subgraph.

    The k-core is the standard density filter before expensive
    graph-embedding / community stages (peripheral entities mentioned once
    contribute noise, not structure).  Full peeling iterates to a fixed
    point; like pagerank/khop this runs a FIXED round count so the DuckDB
    oracle can unroll the identical rounds — at a fixed diameter the
    result is already monotone-correct (every dropped node is provably
    outside the k-core; extra rounds only drop more).

    `edges` is directed input (src_id, dst_id); degree counts BOTH
    directions after symmetrize+distinct, parallel edges collapse.  Each
    round is one groupBy(node) count + one semi-join of edges against the
    surviving node set — O(|E|) per round, map-side-combinable, no
    windows.  `checkpoint` truncates lineage for deep peels (same knob as
    random_walks).
    """
    e = (
        edges.select("src_id", "dst_id")
        .union(edges.select(F.col("dst_id"), F.col("src_id")))
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )
    for _ in range(n_rounds):
        deg = e.groupBy(F.col("src_id").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("degree")
        )
        keep = deg.filter(F.col("degree") >= k).select("node")
        e = (
            e.join(keep, e.src_id == keep.node, "left_semi")
            .join(keep, F.col("dst_id") == keep.node, "left_semi")
        )
        if checkpoint:
            e = e.localCheckpoint(eager=False)
    return e.groupBy(F.col("src_id").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )


def negative_samples(
    edges: DataFrame,
    n_entities: int,
    k: int = 2,
    seed: int = 17,
) -> DataFrame:
    """Deterministic filtered negative sampling for KG-embedding training.

    For every distinct positive edge ``(src_id, dst_id:int)`` emit up to
    ``k`` corrupted-tail candidates ``neg_dst = hash(src, dst, j, seed)
    mod n_entities`` (j = 1..k), then FILTER out candidates that are
    themselves true edges of the same src (the standard "filtered"
    protocol — unfiltered negatives teach the model that true facts are
    false).  Tails are assumed densely indexed 0..n_entities-1 (the KG
    pipeline's canonical IDs; a non-dense space gets a dense rank dim
    first).

    Scale shape: one array explode (k small), one portable 60-bit hash
    (JVM-side md5, functions/hashing.py), and one self anti-join on
    (src_id, dst) — the join key is the corrupted pair, so it
    co-partitions with the positives; no randomness, no driver state, and
    reruns are bit-identical (resume-safe, matching the pipeline's
    determinism discipline).  Self-corruptions (neg == the very positive
    being corrupted) fall out via the anti-join.
    """
    from node_feedparser_spark.functions.hashing import portable_hash60

    pos = edges.select("src_id", "dst_id").distinct()
    cand = (
        pos.select(
            "src_id",
            "dst_id",
            F.explode(
                F.sequence(F.lit(1), F.lit(k))
            ).alias("sample_idx"),
        )
        .withColumn(
            "neg_dst",
            F.pmod(
                portable_hash60(
                    F.concat_ws(
                        "\x1f",
                        F.col("src_id").cast("string"),
                        F.col("dst_id").cast("string"),
                        F.col("sample_idx").cast("string"),
                    ),
                    seed=seed,
                ),
                F.lit(n_entities),
            ).cast("long"),
        )
    )
    true_pairs = pos.select(
        F.col("src_id").alias("t_src"), F.col("dst_id").alias("t_dst")
    )
    return cand.join(
        true_pairs,
        (cand.src_id == true_pairs.t_src) & (cand.neg_dst == true_pairs.t_dst),
        "left_anti",
    ).select("src_id", "dst_id", "sample_idx", "neg_dst")


def pmi_edges(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    min_count: int = 2,
    max_basket: int = 64,
) -> DataFrame:
    """Pointwise-mutual-information co-occurrence edges.

    From a (basket, item) membership table, weight each unordered item
    pair by ``pmi = ln(n_ab * N / (n_a * n_b))`` where counts are over
    distinct baskets — the classic PPMI edge builder for co-mention
    graphs (entities co-occurring in a conversation window) and word-word
    association.

    Skew: the pair generation is a per-basket self-join, O(d^2) in basket
    size — one 10^6-item mega-basket would generate 10^12 pairs.
    ``max_basket`` drops oversized baskets BEFORE pairing (the cap is a
    declared semantic of the operator, replayed by the oracle, exactly
    like link_predict's max_degree pivot cap).  Counts n_a / N are over
    the SURVIVING baskets so the probability space stays consistent.
    """
    m = baskets.select(
        F.col(basket_col).alias("basket_id"), F.col(item_col).alias("item_id")
    ).distinct()
    sized = m.groupBy("basket_id").agg(F.count(F.lit(1)).alias("_sz"))
    ok = sized.filter(F.col("_sz") <= max_basket).select("basket_id")
    m = m.join(ok, "basket_id", "left_semi")

    n_total = m.select("basket_id").distinct().count()
    item_n = m.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a, b = m.alias("a"), m.alias("b")
    pair_n = (
        a.join(b, "basket_id")
        .filter(F.col("a.item_id") < F.col("b.item_id"))
        .groupBy(
            F.col("a.item_id").alias("item_a"),
            F.col("b.item_id").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    na = item_n.select(
        F.col("item_id").alias("item_a"), F.col("n_item").alias("n_a")
    )
    nb = item_n.select(
        F.col("item_id").alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair_n.join(na, "item_a")
        .join(nb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.lit(float(n_total))
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def neighbor_agg(
    edges: DataFrame,
    features: DataFrame,
    n_hops: int = 2,
    fanout: int = 8,
    seed: int = 23,
) -> DataFrame:
    """GraphSAGE-style sampled neighbor aggregation — the feature side of
    graph-embedding training data (Hamilton et al. 2017's sample-and-
    aggregate, deterministic).

    Per hop, every node averages the previous-hop features of at most
    ``fanout`` DETERMINISTICALLY sampled out-neighbors (rank by portable
    60-bit hash of (seed, src, dst), ties by dst) and folds them into its
    own representation.  All arithmetic is FIXED-POINT INTEGER in
    micro-units (feat × 10^6 as BIGINT, floor division) — the same
    integer-weights discipline as node2vec_walks: float rounding of
    ``0.5*h + 0.5*nb`` lands on exact decimal midpoints where Spark
    (shortest-decimal HALF_UP) and other engines (binary-value rounding)
    disagree by one ulp, while floor-division of integers is bit-identical
    everywhere::

        h_0(v)  = round(feat * 10^6)                       (BIGINT)
        nb_t(v) = floordiv(sum over sampled u of h_{t-1}(u), n_sampled)
        h_t(v)  = floordiv(h_{t-1}(v) + nb_t(v), 2)
                  (h_{t-1}(v) unchanged when v has no sampled neighbors)

    Returns (node, feat0, feat) with feat0/feat = h_0/h_{n_hops} divided
    back to doubles (exact: the integers are far below 2^53).

    Scale shape: the adjacency sample is computed ONCE (it is
    hop-independent) with a per-src rank window — bounded by max degree,
    the same celebrity-node cost center as link_predict, and the same
    mitigation applies (cap/pre-filter hub adjacency by hash threshold
    before ranking).  Each hop is then one join of the sampled adjacency
    (<= fanout rows per node) with the current feature vector + one
    map-side-combinable sum/count — O(fanout * |V|) per hop regardless of
    |E|, which is the entire point of sampling.  Hash-ranked sampling is
    bit-stable across reruns and engines (the DuckDB oracle replays it),
    unlike rand()-based sampling which breaks resume determinism.
    """
    from ..functions.hashing import portable_hash60

    e = edges.select("src_id", "dst_id").distinct()
    rank_w = Window.partitionBy("src_id").orderBy(
        portable_hash60(
            F.concat_ws(
                "\x1f", F.col("src_id"), F.col("dst_id")
            ),
            seed=seed,
        ).asc(),
        F.col("dst_id").asc(),
    )
    adj = (
        e.withColumn("_rk", F.row_number().over(rank_w))
        .filter(F.col("_rk") <= fanout)
        .select("src_id", "dst_id")
    )

    def _floordiv(x, n):
        # exact floor division on longs (pmod is non-negative, so the
        # numerator is an exact multiple — the double division is exact)
        return ((x - F.pmod(x, n)) / n).cast("long")

    h0 = features.select(
        F.col("node"),
        F.round(F.col("feat").cast("double") * 1e6, 0)
        .cast("long")
        .alias("feat"),
    )
    h = h0
    for _ in range(n_hops):
        nb = (
            adj.join(
                h.select(
                    F.col("node").alias("dst_id"), F.col("feat").alias("_nf")
                ),
                "dst_id",
            )
            .groupBy(F.col("src_id").alias("node"))
            .agg(
                _floordiv(F.sum("_nf"), F.count(F.lit(1))).alias("_nb")
            )
        )
        h = (
            h.join(nb, "node", "left")
            .select(
                "node",
                F.when(F.col("_nb").isNull(), F.col("feat"))
                .otherwise(
                    _floordiv(F.col("feat") + F.col("_nb"), F.lit(2))
                )
                .alias("feat"),
            )
        )
    return (
        h0.select("node", (F.col("feat") / 1e6).alias("feat0"))
        .join(h, "node")
        .select("node", "feat0", (F.col("feat") / 1e6).alias("feat"))
    )


def ranking_eval(
    scored: DataFrame,
    truth: DataFrame,
    group: str = "group_id",
    item: str = "item_id",
    score: str = "score",
    ks: tuple[int, ...] = (1, 3, 10),
) -> DataFrame:
    """Ranking-quality evaluation for link prediction / KG completion:
    MRR, Hits@k, and mean rank of held-out true items against a scored
    candidate list — the standard KG-completion protocol (Bordes et al.
    2013's ranking metrics), closing the eval family next to
    ann_recall_eval / cluster_quality / blocking_quality.

    ``scored`` is (group, item, score) candidate lists; ``truth`` is
    (group, item) held-out positives.  Per group, candidates are ranked
    by (score DESC, item ASC) — rank ties broken on the item id so the
    ranking is deterministic and engine-portable; callers should pass a
    DECIMAL-ROUNDED score column (link_predict already emits 6-dp
    scores), otherwise float sum-order noise can flip near-ties between
    engines.  A positive absent from the candidate list is a miss: it
    contributes reciprocal rank 0 and hits 0 (the honest convention —
    dropping unscored positives would inflate every metric), and is
    excluded only from ``mean_rank``, which averages found ranks.

    Input contract: the candidate list must be unique per (group, item)
    — a duplicate would receive two ranks and double-count any truth row
    that joins it (link_predict and the other scorers in this module all
    emit set-semantics pairs, so this holds by construction upstream).
    Truth duplicates are harmless: truth is distinct-ed here.

    Returns ONE row: n_truth, n_scored (positives that appeared in the
    candidate list), mrr, hits_<k> per k, mean_rank — all rates rounded
    to 6 dp.

    Plan: one row_number window partitioned by group (shuffle on group,
    per-group local sort — no global sort), one equi-join of the truth
    pairs onto the ranked candidates on (group, item), and one global
    aggregation that is map-side combinable.  Candidate lists are
    per-group bounded, so the window never sees a mega-partition unless
    the scorer itself emitted one — skew belongs to (and is handled by)
    the upstream scorer, e.g. link_predict's max_degree pivot cap.
    """
    w = Window.partitionBy(group).orderBy(
        F.col(score).desc(), F.col(item).asc()
    )
    ranked = scored.select(group, item, score).withColumn(
        "rank", F.row_number().over(w)
    )
    t = truth.select(group, item).distinct()
    j = t.join(ranked.select(group, item, "rank"), [group, item], "left")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_truth"),
        F.count("rank").cast("long").alias("n_scored"),
        F.round(
            F.avg(F.coalesce(F.lit(1.0) / F.col("rank"), F.lit(0.0))), 6
        ).alias("mrr"),
    ]
    for k in ks:
        aggs.append(
            F.round(
                F.avg(
                    F.when(F.col("rank") <= k, F.lit(1.0)).otherwise(0.0)
                ),
                6,
            ).alias(f"hits_{k}")
        )
    aggs.append(
        F.round(F.avg(F.col("rank").cast("double")), 6).alias("mean_rank")
    )
    return j.agg(*aggs)


def betweenness(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int,
    src: str = "src_id",
    dst: str = "dst_id",
    checkpoint: bool = True,
) -> DataFrame:
    """k-source Brandes betweenness centrality (Brandes 2001; the fixed
    deterministic source set makes it the Riondato-Kornaropoulos sampled
    estimator): for every node v, the summed pair dependency
    delta_s(v) = Σ_{w} (σ_sv / σ_sw) · (1 + delta_s(w)) over the chosen
    sources s — "how much shortest-path traffic flows THROUGH v", the
    broker/bottleneck score no degree or ball-size centrality captures.
    Exact betweenness is all-sources ( |V| BFS trees); the sampled form
    with a fixed seed set is the standard scale substitute, and paths are
    truncated at ``max_depth`` hops (k-betweenness), the same bounded-
    rounds contract as kcore/sssp — every counted dependency is real.

    Two passes, both level-synchronous and oracle-unrollable:

    - FORWARD multi-source BFS over the distinct directed edge list:
      level t+1 = (frontier ⋈ edges) anti-join visited, with
      σ(s, v) = Σ_{u pred} σ(s, u) — path counts are EXACT LONGS, one
      map-side-combinable sum per level, frontier keyed (source, node)
      so all k trees advance in the same join.
    - BACKWARD dependency accumulation, deepest level first: each level
      is one 3-way equi-join (level-t nodes ⋈ edges ⋈ level-t+1 nodes
      carrying their δ) + one sum agg; δ is rounded to 6 dp AT EACH
      LEVEL'S AGGREGATE (the ALS/naive-bayes cross-engine float-sum
      discipline) so Spark and the SQL oracle never diverge past a ULP
      reorder.

    Per-level cost is one shuffle bounded by the BFS-DAG edges touched —
    never |V|², never a window, never Python.  Level frames are
    localCheckpoint-ed: each is consumed by BOTH the next forward level
    (join + anti-join) and its backward pass, the khop/kcore multi-
    consumer recompute signature.

    Returns (node, betweenness): every node reached at 1 <= dist <=
    max_depth by some source, with its summed (6 dp) dependency; sources
    score only via paths through them from OTHER sources (delta of the
    s == v row is excluded per Brandes).
    """
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    e = e.localCheckpoint() if checkpoint else e.cache()
    lvl0 = (
        sources.select(F.col(sources.columns[0]).alias("s"))
        .distinct()
        .select("s", F.col("s").alias("node"))
        .withColumn("sigma", F.lit(1).cast("long"))
    )
    if checkpoint:
        lvl0 = lvl0.localCheckpoint()
    levels = [lvl0]
    visited = lvl0.select("s", "node")
    for _ in range(max_depth):
        cand = (
            levels[-1]
            .join(e, levels[-1]["node"] == e["_s"])
            .select("s", F.col("_d").alias("node"), "sigma")
            .join(visited, ["s", "node"], "left_anti")
            .groupBy("s", "node")
            .agg(F.sum("sigma").alias("sigma"))
        )
        if checkpoint:
            cand = cand.localCheckpoint()
        if cand.isEmpty():
            break
        levels.append(cand)
        visited = visited.union(cand.select("s", "node"))
        if checkpoint:
            visited = visited.localCheckpoint()
    # backward: deepest level's delta is 0; walk levels up, each node's
    # delta = round(sum over DAG successors of sigma_v/sigma_w*(1+delta_w), 6)
    deltas = [None] * len(levels)
    deltas[-1] = levels[-1].select(
        "s", "node", F.lit(0.0).alias("delta")
    )
    for t in range(len(levels) - 2, -1, -1):
        succ = levels[t + 1].join(deltas[t + 1], ["s", "node"]).select(
            "s",
            F.col("node").alias("_w"),
            F.col("sigma").alias("_sigma_w"),
            F.col("delta").alias("_delta_w"),
        )
        contrib = (
            levels[t]
            .join(e, levels[t]["node"] == e["_s"])
            .join(
                succ,
                (F.col("_d") == succ["_w"])
                & (levels[t]["s"] == succ["s"]),
            )
            .select(
                levels[t]["s"].alias("s"),
                levels[t]["node"].alias("node"),
                (
                    F.col("sigma").cast("double")
                    / F.col("_sigma_w").cast("double")
                    * (F.lit(1.0) + F.col("_delta_w"))
                ).alias("term"),
            )
            .groupBy("s", "node")
            .agg(F.round(F.sum("term"), 6).alias("delta"))
        )
        d = (
            levels[t]
            .select("s", "node")
            .join(contrib, ["s", "node"], "left")
            .select(
                "s", "node", F.coalesce("delta", F.lit(0.0)).alias("delta")
            )
        )
        if checkpoint:
            d = d.localCheckpoint()
        deltas[t] = d
    acc = None
    for t in range(1, len(levels)):  # level 0 is the source itself
        acc = deltas[t] if acc is None else acc.unionByName(deltas[t])
    if acc is None:
        return lvl0.select("node").withColumn(
            "betweenness", F.lit(0.0)
        ).limit(0)
    return acc.groupBy("node").agg(
        F.round(F.sum("delta"), 6).alias("betweenness")
    )


def hyperanf(
    edges: DataFrame,
    rounds: int = 2,
    p: int = 7,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """HyperANF (Boldi & Vigna 2011): the approximate neighborhood
    function — for every node, an HLL estimate of |ball(v, t)| (nodes
    reachable in <= t hops along OUT edges, v included) for t = 1..rounds
    — THE scalable reachability/effective-diameter tool for graphs where
    exact per-node BFS ball materialization (sum of ball sizes, easily
    |V|^2 on small-diameter graphs) is impossible.

    Algebra: an HLL register table max-merges, and max-merge of sketches
    IS the sketch of the union — exactly, not approximately (the
    approximation lives only in the final estimate).  So the ball
    recurrence B(v, t+1) = {v} ∪ ⋃_{(v,u)∈E} B(u, t) becomes: counter
    C_0(v) = registers({v}); each round joins every edge to its head's
    counter and elementwise-maxes into the tail's.  Correctness is
    pinned against hll_distinct over the explicitly-enumerated ball
    (tests/test_hyperanf.py) — same registers, same estimator, zero
    slack.

    Plan: counters stay in the SPARSE (node, bucket, register) shape of
    operators/sketch.py (<= min(ball, 2^p) rows per node, mergeable).
    Each round is ONE equi-join of the distinct edge list against the
    counter table on the head node plus ONE groupBy(node, bucket) max —
    map-side combinable, so the per-round shuffle is bounded by
    |V| * 2^p regardless of edge fan-out; the join's intermediate
    (edge x head-registers, up to |E| * 2^p) is compute local to the
    join stage, the knob being p (default 2^7 registers ~ 6.5% rse).
    Parallel edges and self-loops are harmless (max-merge is idempotent)
    but the edge list is distinct-ed once so every round joins the
    minimal relation.  Counters feed three consumers per round (union,
    next join, estimate), so for rounds >= 3 each round's counter is
    lazily localCheckpoint-ed (the khop/kcore lineage lesson); at the
    default rounds=2 the plan stays a static, oracle-replayable unroll.
    A 100 TB refinement (noted, not needed at this scale): pack the m
    registers into one fixed-width array per node to cut the sparse
    row overhead — the merge algebra is unchanged.

    Returns (node, radius, n_registers, n_zero_buckets, hll_estimate),
    one row per node per t in 1..rounds.
    """
    from .sketch import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    c = hll_registers(nodes, ["node"], "node", p)
    out = None
    for t in range(1, rounds + 1):
        nb = e.join(c.withColumnRenamed("node", "_d"), "_d").select(
            F.col("_s").alias("node"), "bucket", "register"
        )
        c = hll_merge(c.unionByName(nb), ["node"])
        if rounds >= 3:
            # a non-final counter has THREE consumers (its estimate, the
            # next round's union arm and join arm) — the khop/kcore
            # recompute-fan-out signature.  Measured at rounds=2, though,
            # checkpointing is a wash (12.6 s vs 11.8 s at sf0.1):
            # ReusedExchange already dedupes the identical groupBy
            # subtrees, the biased_walks finding.  Keep the truncation
            # only where plan DEPTH compounds (rounds >= 3).
            c = c.localCheckpoint(eager=False)
        est = hll_estimate_from_registers(c, ["node"], p).withColumn(
            "radius", F.lit(t).cast("long")
        )
        out = est if out is None else out.unionByName(est)
    return out.select(
        "node", "radius", "n_registers", "n_zero_buckets", "hll_estimate"
    )


def harmonic_centrality_anf(
    edges: DataFrame | None = None,
    rounds: int = 2,
    p: int = 7,
    src: str = "src_id",
    dst: str = "dst_id",
    anf: DataFrame | None = None,
) -> DataFrame:
    """Truncated harmonic centrality H(v) = Σ_{u≠v} 1/d(v,u) estimated
    from the HyperANF neighborhood function — Boldi & Vigna's own
    flagship application (Boldi & Vigna, "Four Degrees of Separation" /
    HyperANF 2011): the count of nodes at distance EXACTLY t is the ball
    delta B_t(v) − B_{t−1}(v), so H(v) ≈ Σ_{t=1..rounds} (B_t − B_{t−1})/t,
    truncated at `rounds` hops (every farther node contributes less than
    1/rounds; the whole point of ANF is never enumerating that tail).
    Exact harmonic centrality needs all-pairs BFS — |V|² ball rows on a
    small-diameter graph; this reads it off sketches that are |V|·2^p.

    Also emits the per-node effective radius: the smallest t with
    B_t ≥ 0.9·B_rounds — the node-local reading of the effective-diameter
    statistic ANF was built for.

    Determinism/oracle contract: consumes the 4-dp-rounded per-radius
    `hyperanf` estimates, so both engines difference IDENTICAL doubles;
    deltas clamp at 0 (registers only grow, but the bias-corrected
    estimator may dip across its linear-counting/raw branch boundary).
    The 1/t-weighted sum runs in exact fixed-point: each delta scales to
    an integer (x 10^4 — exact, the inputs are 4-dp), weights become the
    integer lcm(1..rounds)/t, and ONE final division by the constant
    lcm x 10^4 produces the double.  Division of exact integers is
    correctly rounded in IEEE-754, so Spark and any oracle engine emit
    bit-identical harmonics — no decimal ROUND on a half-way 5th digit
    (which HALF_UP vs binary-round engines split on) ever happens.

    Plan: hyperanf's per-round join+max-merge, then ONE map-side-combinable
    conditional-max pivot groupBy(node) — no window, no extra join; the
    harmonic sum and radius CASE are a codegen projection over `rounds`
    pivoted columns.

    Shared-frame path (round 4): pass `anf` — a frame with hyperanf's
    output shape computed with the SAME rounds/p (caller contract; the
    frame carries no parameter metadata) — to skip the register chain.
    The registry runs hyperanf_reach and harmonic_centrality on the same
    graph, so the driver pays the |E| x 2^p join fan once, not twice;
    the standalone edges path stays for the oracle.

    Returns (node, anf_max, harmonic, effective_radius).
    """
    if anf is None:
        if edges is None:
            raise ValueError("harmonic_centrality_anf needs edges or anf")
        anf = hyperanf(edges, rounds=rounds, p=p, src=src, dst=dst)
    piv = anf.groupBy("node").agg(
        *[
            F.max(
                F.when(F.col("radius") == t, F.col("hll_estimate"))
            ).alias(f"_b{t}")
            for t in range(1, rounds + 1)
        ]
    )
    lcm = 1
    for t in range(2, rounds + 1):
        lcm = lcm * t // math.gcd(lcm, t)
    # B_0 is the SKETCH's estimate of the singleton ball {v} — the
    # linear-counting value of one occupied register, m*ln(m/(m-1)) at
    # the same 4-dp rounding as hyperanf's outputs — NOT the literal
    # 1.0: differencing an estimate against an exact count leaks the
    # estimator's fixed singleton bias (+0.0039 at p=7) into every
    # node, giving sinks a phantom nonzero harmonic.
    m = float(1 << p)
    b0 = round(m * math.log(m / (m - 1.0)), 4)
    prev = F.lit(b0)
    h_scaled = F.lit(0).cast("long")
    for t in range(1, rounds + 1):
        bt = F.col(f"_b{t}")
        delta_int = F.round(
            F.greatest(bt - prev, F.lit(0.0)) * 10000, 0
        ).cast("long")
        h_scaled = h_scaled + delta_int * F.lit(lcm // t)
        prev = bt
    h = h_scaled.cast("double") / F.lit(float(lcm * 10000))
    bmax = F.col(f"_b{rounds}")
    eff = F.lit(rounds).cast("long")
    for t in range(rounds - 1, 0, -1):
        eff = F.when(
            F.col(f"_b{t}") >= F.lit(0.9) * bmax, F.lit(t).cast("long")
        ).otherwise(eff)
    return piv.select(
        "node",
        bmax.alias("anf_max"),
        h.alias("harmonic"),
        eff.alias("effective_radius"),
    )


def effective_diameter(
    edges: DataFrame | None = None,
    rounds: int = 2,
    p: int = 7,
    threshold_num: int = 9,
    threshold_den: int = 10,
    src: str = "src_id",
    dst: str = "dst_id",
    anf: DataFrame | None = None,
) -> DataFrame:
    """GLOBAL effective diameter from HyperANF — the statistic ANF was
    invented for (Palmer-Gibbons-Faloutsos ANF 2002; Boldi & Vigna's
    "Four Degrees of Separation" runs exactly this over Facebook): the
    smallest t such that the neighborhood function N(t) = Σ_v |ball(v,t)|
    reaches `threshold` (default 9/10) of its value at the truncation
    horizon.  harmonic_centrality_anf reads the per-NODE effective
    radius off the same sketches; this is the per-GRAPH reading — one
    number an analyst quotes ("90 % of reachable pairs are within t
    hops").

    Exact N(t) is all-pairs BFS (|V|² ball rows); here it is ONE
    radius-keyed sum over hyperanf's |V|·rounds estimate rows.

    Determinism/oracle contract: per-node estimates are hyperanf's
    4-dp-rounded doubles, scaled to exact integers (x 10^4) BEFORE the
    global sum, so N(t) is a bit-portable BIGINT in both engines (float
    summation order can never leak in).  N(0) uses the sketch's own
    singleton-ball estimate (m·ln(m/(m−1)) at the same 4-dp rounding,
    the harmonic_centrality_anf B_0 discipline) times |V| — differencing
    or ratio-ing sketch values against exact counts would leak the
    estimator's fixed singleton bias.  The threshold test runs in exact
    integer arithmetic (nf_fp·den ≥ num·nf_fp_max), never on a rounded
    ratio, so an engine pair can never disagree on the diameter at the
    boundary.  The reported `frac_of_max` is one IEEE long/long division
    (exactly rounded) for display.

    Plan: hyperanf's per-round join + max-merge (the intrinsic cost),
    then one map-side-combinable groupBy(radius) sum — the window that
    picks the diameter runs over a (rounds+1)-row frame, never the
    corpus.

    `anf` (round 4): precomputed hyperanf frame with the same rounds/p —
    the harmonic_centrality_anf shared-frame contract; the edges path
    stays for the oracle.

    Returns one row per t in 0..rounds:
    (radius, nf, frac_of_max, effective_diameter) — `effective_diameter`
    repeated on every row (NULL only if no radius meets the threshold,
    impossible for t = rounds where frac = 1).
    """
    if threshold_num <= 0 or threshold_den <= 0:
        raise ValueError("threshold must be a positive rational")
    if anf is None:
        if edges is None:
            raise ValueError("effective_diameter needs edges or anf")
        anf = hyperanf(edges, rounds=rounds, p=p, src=src, dst=dst)
    m = float(1 << p)
    b0_fp = int(round(round(m * math.log(m / (m - 1.0)), 4) * 10000))
    per_t = anf.groupBy(F.col("radius").cast("long").alias("radius")).agg(
        F.sum(
            F.round(F.col("hll_estimate") * 10000, 0).cast("long")
        ).alias("nf_fp")
    )
    t0 = (
        anf.filter(F.col("radius") == 1)
        .agg((F.count(F.lit(1)) * F.lit(b0_fp)).alias("nf_fp"))
        .select(F.lit(0).cast("long").alias("radius"), "nf_fp")
    )
    nf = t0.unionByName(per_t)
    w = Window.partitionBy()  # (rounds+1)-row frame, never the corpus
    nf_max = F.max(
        F.when(F.col("radius") == rounds, F.col("nf_fp"))
    ).over(w)
    meets = F.col("nf_fp") * F.lit(threshold_den) >= F.lit(
        threshold_num
    ) * nf_max
    eff = F.min(F.when(meets, F.col("radius"))).over(w)
    return nf.select(
        "radius",
        (F.col("nf_fp").cast("double") / F.lit(10000.0)).alias("nf"),
        F.round(F.col("nf_fp").cast("double") / nf_max.cast("double"), 6).alias(
            "frac_of_max"
        ),
        eff.alias("effective_diameter"),
    )


def hits(
    edges: DataFrame, src: str = "src", dst: str = "dst", iters: int = 2
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM'99) over the directed KG
    edge shape — "which entities point at the good stuff (hubs) and which
    ARE the good stuff (authorities)", the bipartite-reinforcement
    complement of pagerank above.

    Normalize-at-END variant with a0 = 1: every per-iteration
    accumulation (h = sum of successors' a, then a = sum of NEW
    predecessors' h) stays a WHOLE NUMBER carried in a long — sums of
    integers have no float-order sensitivity, so the unrolled DuckDB
    oracle matches exactly.  Per-iteration rescaling only divides both
    vectors by a shared constant and HITS scores are scale-free, so the
    direction after k rounds is identical to the textbook loop; the one
    normalization here is L1 (scores sum to 1, PageRank-style mass), so
    the norm itself is an integer sum too — no sum-of-squares overflow
    anywhere (bound: max long needed is ~(max_deg)^(2*iters) * |V|; keep
    iters small, default 2, exactly like the unrolled pagerank oracle).

    Each iteration is two edge joins + two map-side-combinable sum aggs;
    nothing iterates over the driver except the tiny loop counter.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )
    a = nodes.withColumn("a", F.lit(1).cast("long"))
    h = nodes.withColumn("h", F.lit(1).cast("long"))
    for _ in range(iters):
        hn = (
            e.join(a.select(F.col("node").alias("d"), "a"), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        h = nodes.join(hn, "node", "left").select(
            "node", F.coalesce("h", F.lit(0).cast("long")).alias("h")
        )
        an = (
            e.join(h.select(F.col("node").alias("s"), "h"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        a = nodes.join(an, "node", "left").select(
            "node", F.coalesce("a", F.lit(0).cast("long")).alias("a")
        )
    sc = h.join(a, "node")
    norms = sc.agg(
        F.sum("h").cast("long").alias("nh"), F.sum("a").cast("long").alias("na")
    )
    return sc.join(F.broadcast(norms)).select(
        "node",
        F.round(
            F.when(F.col("nh") > 0, F.col("h") / F.col("nh")).otherwise(0.0), 6
        ).alias("hub"),
        F.round(
            F.when(F.col("na") > 0, F.col("a") / F.col("na")).otherwise(0.0), 6
        ).alias("auth"),
    )


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    node: str = "node",
    community: str = "community",
) -> DataFrame:
    """Per-community Newman modularity contributions of a GIVEN partition
    over the undirected simple graph: for community c,

        q_c = e_c / m  -  (d_c / (2m))^2

    (e_c = intra-community edges, d_c = total degree mass, m = |E|);
    global Q = sum of q_c — the quality score for label_propagation /
    kg_components output, emitted per community so every number derives
    from INTEGER counts via one identical expression (no cross-community
    float sum to be order-sensitive about).

    One canonical-edge distinct, one tiny m count, two broadcast-sized
    joins of the assignment onto edge endpoints, two map-side-combinable
    count aggs.  Nodes missing from ``assign`` are their own community.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    m = und.count()
    amap = assign.select(
        F.col(node).alias("_n"), F.col(community).alias("_c")
    )
    cu = amap.select(F.col("_n").alias("u"), F.col("_c").alias("cu"))
    cv = amap.select(F.col("_n").alias("v"), F.col("_c").alias("cv"))
    lab = und.join(cu, "u", "left").join(cv, "v", "left").select(
        F.coalesce(F.col("cu").cast("string"), F.col("u").cast("string")).alias("cu"),
        F.coalesce(F.col("cv").cast("string"), F.col("v").cast("string")).alias("cv"),
    )
    e_in = (
        lab.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_in"))
    )
    d_tot = (
        lab.select(F.col("cu").alias("community"))
        .union(lab.select(F.col("cv").alias("community")))
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("long").alias("d_tot"))
    )
    return (
        d_tot.join(e_in, "community", "left")
        .select(
            "community",
            F.coalesce("n_in", F.lit(0).cast("long")).alias("n_in"),
            "d_tot",
            F.round(
                F.coalesce("n_in", F.lit(0).cast("long")) / F.lit(float(m))
                - (F.col("d_tot") / F.lit(2.0 * m))
                * (F.col("d_tot") / F.lit(2.0 * m)),
                6,
            ).alias("q_c"),
        )
    )


def powerlaw_alpha(edges: DataFrame, dmin: int = 3) -> DataFrame:
    """Degree-distribution power-law exponent, the continuous MLE of
    Clauset-Shalizi-Newman (SIAM Rev. 2009, eq. 3.7 discrete
    approximation): alpha = 1 + n / sum_i ln(d_i / (dmin - 1/2)) over the
    n nodes with degree >= dmin — the one-row "is this KG scale-free and
    how heavy is the hub tail" profile that decides whether skew salting
    and pivot caps (link_predict max_degree, conv_apply salting) are
    load-bearing at the next scale-up.

    The per-node ln never materializes: degrees collapse to a distinct-
    degree histogram first (bounded by max degree), and the log-sum runs
    over cnt_d * ln(d / (dmin - 0.5)) — the only float sum is over that
    tiny histogram, 6dp-rounded inside the ratio's operands' derivation
    being identical SQL, same discipline as unigram_lm's log-mass.
    """
    adj = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    deg = (
        adj.union(adj.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") >= dmin)
    )
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return hist.agg(
        F.round(
            1.0
            + F.sum("cnt")
            / F.sum(F.col("cnt") * F.log(F.col("d") / F.lit(dmin - 0.5))),
            6,
        ).alias("alpha"),
        F.sum("cnt").cast("long").alias("n_tail"),
        F.lit(dmin).cast("long").alias("dmin"),
    )


def g2_edges(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    min_count: int = 2,
    max_basket: int = 64,
) -> DataFrame:
    """Dunning log-likelihood-ratio (G^2) co-occurrence edges — the
    small-count-honest companion to pmi_edges above ("Accurate Methods
    for the Statistics of Surprise and Coincidence", Dunning, CL 1993):
    PMI explodes for rare pairs; G^2 weights each cell of the 2x2
    basket-membership contingency table by its evidence mass,

        g2 = 2 * sum_ij O_ij * ln(O_ij / E_ij),   E_ij = row_i*col_j/N

    with zero cells contributing zero.  Same pair plumbing and the same
    declared mega-basket cap as pmi_edges (the d^2 self-join guard);
    every G^2 is computed row-locally from integer counts by one
    expression the oracle repeats verbatim — no cross-row float sums.
    """
    m = baskets.select(
        F.col(basket_col).alias("basket_id"), F.col(item_col).alias("item_id")
    ).distinct()
    sized = m.groupBy("basket_id").agg(F.count(F.lit(1)).alias("_sz"))
    ok = sized.filter(F.col("_sz") <= max_basket).select("basket_id")
    m = m.join(ok, "basket_id", "left_semi")

    n_total = m.select("basket_id").distinct().count()
    item_n = m.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a, b = m.alias("a"), m.alias("b")
    pair_n = (
        a.join(b, "basket_id")
        .filter(F.col("a.item_id") < F.col("b.item_id"))
        .groupBy(
            F.col("a.item_id").alias("item_a"),
            F.col("b.item_id").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    na = item_n.select(
        F.col("item_id").alias("item_a"), F.col("n_item").alias("n_a")
    )
    nb = item_n.select(
        F.col("item_id").alias("item_b"), F.col("n_item").alias("n_b")
    )
    N = F.lit(float(n_total))
    k11 = F.col("n_ab")
    k12 = F.col("n_a") - F.col("n_ab")
    k21 = F.col("n_b") - F.col("n_ab")
    k22 = F.lit(n_total) - F.col("n_a") - F.col("n_b") + F.col("n_ab")

    def _term(k, row, col):
        return F.when(k > 0, k * F.log(k * N / (row * col))).otherwise(0.0)

    g2 = 2.0 * (
        _term(k11, F.col("n_a"), F.col("n_b"))
        + _term(k12, F.col("n_a"), F.lit(n_total) - F.col("n_b"))
        + _term(k21, F.lit(n_total) - F.col("n_a"), F.col("n_b"))
        + _term(k22, F.lit(n_total) - F.col("n_a"), F.lit(n_total) - F.col("n_b"))
    )
    return (
        pair_n.join(na, "item_a")
        .join(nb, "item_b")
        .select("item_a", "item_b", "n_ab", F.round(g2, 6).alias("g2"))
    )


def clustering_coeff(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """Per-node local clustering coefficient of the undirected simple
    graph: cc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)), 0 for deg < 2 — "how
    clique-ish is this entity's neighborhood", the per-node refinement of
    triangle_count above (Watts-Strogatz, Nature 1998).  Reuses the
    degree-ordered O(m^1.5) triangle kernel, adds one degree join; the
    coefficient is a row-local ratio of integer counts, so the oracle
    repeats it verbatim on its independently-counted triangles.
    """
    tri = triangle_count(edges, src=src, dst=dst)
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return tri.join(deg, "node").select(
        "node",
        "deg",
        "triangles",
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(0.0),
            6,
        ).alias("coeff"),
    )


def assortativity(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """Degree-assortativity coefficient (Newman, PRL 2002) of the
    undirected simple graph, as ONE row (assortativity, n_edges):
    the Pearson correlation of endpoint degrees over the symmetrized
    stub list, assembled from four INTEGER sums so the whole number is

        r = (M2*s_jk - s_j^2) / (M2*s_j2 - s_j^2)

    with exactly one float division at the end — bit-reproducible, no
    order-sensitive float accumulation (overflow bound: M2*s_jk needs
    |E|^2 * max_deg^2 < 2^63; shard-and-sum as decimals past ~10^9
    edges).  Disassortative KGs (hubs link to leaves, r < 0) are the
    shape where link_predict's pivot cap and salting earn their keep —
    this is the one-number probe, beside powerlaw_alpha's tail fit.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    j = sym.join(deg.withColumnRenamed("node", "u"), "u").withColumnRenamed(
        "deg", "ju"
    ).join(deg.withColumnRenamed("node", "v"), "v").withColumnRenamed("deg", "jv")
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum(F.col("ju") * F.col("jv")).alias("sjk"),
        F.sum("ju").alias("sj"),
        F.sum(F.col("ju") * F.col("ju")).alias("sj2"),
    )
    num = F.col("m2") * F.col("sjk") - F.col("sj") * F.col("sj")
    den = F.col("m2") * F.col("sj2") - F.col("sj") * F.col("sj")
    # regular graph => zero degree variance => undefined r (NULL), and the
    # guard keeps ANSI mode from throwing DIVIDE_BY_ZERO
    return s.select(
        F.when(den != 0, F.round(num / den, 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("assortativity"),
        (F.col("m2") / F.lit(2)).cast("long").alias("n_edges"),
    )


def reciprocity(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """Directed-edge reciprocity as ONE row (reciprocity, n_edges,
    n_mutual): the fraction of distinct non-loop directed edges whose
    reverse edge also exists — the "is this predicate family symmetric
    in practice" probe that decides whether rdfs-style symmetric-pred
    materialization would double the edge table.  One distinct + one
    self-semi-join; the ratio is a row-local integer division.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d")).withColumn(
        "_r", F.lit(1).cast("long")
    )
    # left join + indicator instead of a semi-join so the ratio stays
    # in-plan (F.round is HALF_UP; Python round is banker's)
    mut = e.join(rev, ["s", "d"], "left")
    return mut.agg(
        F.round(
            F.sum(F.coalesce("_r", F.lit(0).cast("long"))) / F.count(F.lit(1)),
            6,
        ).alias("reciprocity"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.coalesce("_r", F.lit(0).cast("long"))).cast("long").alias("n_mutual"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 2,
    damping: float = 0.85,
    src: str = "src_id",
    dst: str = "dst_id",
    weight: str | None = "weight",
    checkpoint: bool = True,
    ckpt_every: int = 3,
) -> DataFrame:
    """Personalized PageRank: pagerank above with teleport AND dangling
    mass restarting at a SEED SET instead of everywhere,

        rank'(v) = (1-d)*s(v) + d*( sum contribs + dangling_mass * s(v) ),
        s(v) = 1/|S| for v in S else 0,

    the topic-sensitive entity-relevance primitive (Haveliwala, WWW'02;
    Jeh-Widom "scaling personalized web search"): "which entities matter
    FROM THIS conversation's seeds", the query-time counterpart of the
    global pagerank signal.  Same plan shape as pagerank — pre-aggregated
    multigraph-safe edges, lazy broadcast 1-row dangling aggregate (no
    driver collect in the loop), periodic localCheckpoint.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.groupBy(F.col(src).alias("_src"), F.col(dst).alias("_dst")).agg(
        F.sum(w_col).alias("_w")
    )
    out = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    frac = e.join(out, "_src").select(
        "_src", "_dst", (F.col("_w") / F.col("_out_w")).alias("_frac")
    )
    sd = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .union(sd)
        .distinct()
    )
    frac = frac.localCheckpoint() if checkpoint else frac.cache()
    nodes = nodes.localCheckpoint() if checkpoint else nodes.cache()
    k = sd.count()
    if k == 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    dangling_nodes = nodes.join(
        out.select(F.col("_src").alias("node")), "node", "left_anti"
    ).withColumn("_dangling", F.lit(True))
    svec = nodes.join(sd.withColumn("_is_seed", F.lit(True)), "node", "left").select(
        "node",
        F.when(F.col("_is_seed").isNotNull(), F.lit(1.0 / k))
        .otherwise(F.lit(0.0))
        .alias("_s"),
    )
    ranks = (
        svec.withColumn("rank", F.col("_s"))
        .join(dangling_nodes.select("node", "_dangling"), "node", "left")
    )
    for it in range(n_iter):
        dm = ranks.filter(F.col("_dangling").isNotNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            frac.join(ranks.select(F.col("node").alias("_src"), "rank"), "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_frac")).alias("_c"))
        )
        ranks = (
            ranks.drop("rank")
            .join(contribs, "node", "left")
            .crossJoin(F.broadcast(dm))
            .withColumn(
                "rank",
                F.lit(1.0 - damping) * F.col("_s")
                + F.lit(damping)
                * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") * F.col("_s")),
            )
            .drop("_c", "_dm")
        )
        if checkpoint and (it + 1) % max(1, ckpt_every) == 0:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def type_spread(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Seeded label spreading for entity TYPING — the semi-supervised
    sibling of label_propagation above (Zhu-Ghahramani label propagation
    with clamped seeds, deterministic discrete variant): seed nodes carry
    fixed types; each round every other node takes the MAJORITY type of
    its currently-typed neighbors, ties broken by lexicographically
    smallest type so the fixpoint is unique and oracle-replayable.  The
    KG use: propagate a small human-curated entity-type dimension
    (suppliers, parts, people) over the edge structure to type the long
    tail no rule matched.

    Returns (node, type) for EVERY node of the graph — NULL type means
    unreached within n_rounds (an honest "still untyped", never a guess).
    Each round is one edge join + one (node, type) count agg + one
    per-node argmax window over type cardinality, all bounded; seeds are
    re-clamped after every round so spread can never overwrite ground
    truth.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    sd = seeds.select(
        F.col(seeds.columns[0]).alias("node"),
        F.col(seeds.columns[1]).cast("string").alias("type"),
    ).distinct()
    labels = sd
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("type").asc()
    )
    for _ in range(n_rounds):
        votes = (
            sym.join(
                labels.select(F.col("node").alias("v"), "type"), "v"
            )
            .groupBy(F.col("u").alias("node"), "type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        new = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "type")
        )
        # clamp: seeds always win; spread fills everything else
        labels = sd.union(new.join(sd.select("node"), "node", "left_anti"))
        labels = labels.localCheckpoint()
    out_nodes = nodes.union(sd.select("node")).distinct()
    return out_nodes.join(labels, "node", "left").select("node", "type")


def _edge_support(und: DataFrame) -> DataFrame:
    """(u, v, support): per-edge triangle count over canonical edges,
    via the same degree-ordered O(m^1.5) kernel as triangle_count."""
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(deg.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("deg", "dv")
    )
    lo_first = F.struct(F.col("du").alias("d"), F.col("u").alias("n")) < F.struct(
        F.col("dv").alias("d"), F.col("v").alias("n")
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    l = oriented.select("a", F.col("b").alias("x"), F.col("db").alias("dx"))
    r = oriented.select("a", F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = l.join(r, "a").filter(
        F.struct(F.col("dx").alias("d"), F.col("x").alias("n"))
        < F.struct(F.col("dy").alias("d"), F.col("y").alias("n"))
    )
    tris = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_semi",
    ).select(F.col("a").alias("n1"), F.col("x").alias("n2"), F.col("y").alias("n3"))
    pair = F.explode(
        F.array(
            F.struct(
                F.least("n1", "n2").alias("u"), F.greatest("n1", "n2").alias("v")
            ),
            F.struct(
                F.least("n1", "n3").alias("u"), F.greatest("n1", "n3").alias("v")
            ),
            F.struct(
                F.least("n2", "n3").alias("u"), F.greatest("n2", "n3").alias("v")
            ),
        )
    )
    sup = (
        tris.select(pair.alias("p"))
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return und.join(sup, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).alias("support")
    )


def ktruss(
    edges: DataFrame,
    k: int = 4,
    n_rounds: int = 2,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """Bounded-round k-truss peeling — the EDGE-level density filter
    completing kcore (node-level) and triangle_count (counting): an edge
    survives a round iff it participates in >= k-2 triangles among the
    surviving edges (Cohen, "Trusses: cohesive subgraphs for social
    network analysis", 2008).  ``n_rounds`` bounds the peel exactly like
    kcore's bounded drop-degree rounds — the declared-truncation trade,
    replayed by the oracle round for round; each round is one oriented
    O(m^1.5) support computation + a filter, lineage cut per round.
    Returns surviving edges with the support that qualified them in the
    final round.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    out = None
    for _ in range(n_rounds):
        sup = _edge_support(und)
        out = sup.filter(F.col("support") >= k - 2)
        und = out.select("u", "v").localCheckpoint()
    return out.select(
        F.col("u").alias("node_a"),
        F.col("v").alias("node_b"),
        F.col("support").cast("long").alias("support"),
    )


def wl_fingerprints(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """Weisfeiler-Lehman structural fingerprints — iterative color
    refinement (1-WL), the standard structural-role signature and the
    primitive behind WL graph kernels (Shervashidze et al. 2011) and the
    GIN expressiveness bound.  Two nodes share a round-t label iff their
    t-hop neighborhood trees are isomorphic (up to hash collisions), so
    the final label partitions the KG into structural-equivalence
    classes: "all leaf suppliers attached to a degree-2 part look alike"
    — the role discovery / graph-dedup reading the centrality family
    (pagerank/betweenness/harmonic) can't give.

    Refinement step (classic sorted-multiset form)::

        lbl_0(v) = str(out_degree(v))
        lbl_t(v) = md5(lbl_{t-1}(v) || '|' ||
                       ','.join(sorted(lbl_{t-1}(u) for u in N_out(v))))[:16]

    Callers symmetrize ``edges`` for the undirected reading.  Nodes with
    no out-neighbors hash an empty multiset (''), so sinks refine too.

    Determinism/oracle contract: md5 and lexicographic string sort are
    bit-portable (pure-ASCII labels, binary collation on both engines),
    so every round's labels are identical across Spark and DuckDB — no
    float, no platform hash.

    Plan, per round: one shuffle join (edge x current label, |E| rows) +
    one groupBy(src) with sort_array(collect_list(..)) — the multiset
    row is bounded by max out-degree, which makes CELEBRITY HUBS the cost
    center (a 10^6-degree node builds a 10^6-element array on one task).
    At hub scale swap the sorted-concat for a commutative per-neighbor
    hash fold (sum of md5-derived longs — map-side combinable, no array),
    which preserves the multiset-equality semantics modulo collisions;
    the sorted form is kept here because it is the citable 1-WL and the
    class partition is what downstream reads.  Label width is fixed
    (16 hex chars), so round t+1's shuffle never grows with t.

    Returns (node, wl0, wl, class_size): initial and final labels plus
    the size of the node's final structural-equivalence class
    (window partitioned BY LABEL — never a global window).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    nodes = e.select("s").union(e.select("d")).distinct().toDF("node")
    deg = e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    lbl = nodes.join(deg, "node", "left").select(
        "node",
        F.coalesce(F.col("_deg"), F.lit(0)).cast("string").alias("lbl"),
    )
    for _ in range(rounds):
        nbrs = (
            e.join(
                lbl.select(F.col("node").alias("d"), F.col("lbl").alias("_nl")),
                "d",
            )
            .groupBy(F.col("s").alias("node"))
            .agg(
                F.concat_ws(",", F.sort_array(F.collect_list("_nl"))).alias(
                    "_nbrs"
                )
            )
        )
        lbl = (
            lbl.join(nbrs, "node", "left")
            .select(
                "node",
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col("lbl"), F.coalesce("_nbrs", F.lit(""))
                        )
                    ),
                    1,
                    16,
                ).alias("lbl"),
            )
            .localCheckpoint(eager=False)
        )
    l0 = nodes.join(deg, "node", "left").select(
        "node",
        F.coalesce(F.col("_deg"), F.lit(0)).cast("string").alias("wl0"),
    )
    cls_w = Window.partitionBy("lbl")
    return (
        l0.join(lbl, "node")
        .select(
            "node",
            "wl0",
            F.col("lbl").alias("wl"),
            F.count(F.lit(1)).over(cls_w).cast("long").alias("class_size"),
        )
    )


def temporal_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "src_id",
    dst: str = "dst_id",
    ts: str = "ts",
) -> DataFrame:
    """Time-respecting reachability over a TEMPORAL graph (Holme &
    Saramaki temporal networks; Kempe-Kleinberg-Kumar time-respecting
    paths): an edge (u, v, t) can forward only if u was already reached
    at some a_u <= t, and v's arrival becomes the earliest such t.  The
    question static khop cannot answer: "could information have flowed
    from A to B?" — a path that exists topologically but runs BACKWARD
    in time transmits nothing.  On a KG this is provenance/contagion
    over timestamped interaction edges.

    Earliest-arrival relaxation (temporal Bellman-Ford), ``rounds``
    synchronous rounds::

        a_0(v)   = seed arrival (seeds carry their own release time)
        a_t(v)   = min(a_{t-1}(v),
                       min { t_e : (u, v, t_e), t_e >= a_{t-1}(u) })

    A LONGER path can deliver an EARLIER arrival, so arrivals may keep
    falling after a node first becomes reachable — ``first_hop`` (the
    round a node first appeared) and ``arrival`` (the converged earliest
    time within the horizon) are therefore separate facts and both are
    returned.  Everything is exact timestamp comparison — no floats, so
    the unrolled DuckDB oracle is bit-identical.

    Plan per round: one join of the static temporal edge list with the
    current arrival vector on u + the time-respect filter + one
    map-side-combinable min-agg on v, then a full-outer min-merge with
    the previous vector.  The arrival vector is |reached| rows (<= |V|,
    starts at |seeds|); the edge list never re-shuffles (hash-partition
    once on u).  The vector is consumed TWICE per round (join + merge),
    so each round is lazily localCheckpoint-ed — the kcore/khop lesson,
    not the random_walks one.

    Returns (node, arrival timestamp, first_hop long) for nodes reached
    within the horizon (seeds: their seed arrival, first_hop 0).
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(ts).alias("t")
    )
    arr = seeds.select(
        F.col("node"),
        F.col("arrival").cast("timestamp").alias("arrival"),
        F.lit(0).cast("long").alias("first_hop"),
    ).localCheckpoint(eager=False)
    for r in range(1, rounds + 1):
        relax = (
            e.join(
                arr.select(F.col("node").alias("u"), F.col("arrival").alias("a_u")),
                "u",
            )
            .filter(F.col("t") >= F.col("a_u"))
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("t").alias("new_arr"))
        )
        arr = (
            arr.join(relax, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce("arrival", F.col("new_arr")),
                    F.coalesce("new_arr", F.col("arrival")),
                ).alias("arrival"),
                F.coalesce("first_hop", F.lit(r)).cast("long").alias("first_hop"),
            )
            .localCheckpoint(eager=False)
        )
    return arr


def katz_centrality(
    edges: DataFrame,
    rounds: int = 3,
    beta_den: int = 4,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """Truncated Katz centrality (Katz 1953): katz(v) = sum over walk
    lengths k = 1..rounds of beta^k * (number of length-k walks ending
    at v), with attenuation beta = 1/beta_den.  The WALK-counting
    centrality: unlike PageRank there is no per-node normalization (a
    hub passes its full count to every successor), unlike the ball-size
    family (hyperanf/harmonic) repeated paths count every time, and
    unlike betweenness it scores termination, not brokerage.

    Exactness: walk counts are exact LONG integers (w_k(v) = sum of
    w_{k-1} over in-neighbors, w_0 = 1 everywhere); the attenuated sum
    is accumulated SCALED by beta_den^rounds —

        acc(v) = sum_k w_k(v) * beta_den^(rounds-k)   (pure integer)
        katz(v) = acc(v) / beta_den^rounds

    and with beta_den a power of two the final division is EXACT in
    binary floating point (one dyadic division, no rounding) — the
    unrolled SQL oracle is bit-identical with zero rounding discipline.
    Walk counts grow like (avg degree)^rounds; the long accumulator is
    sound while d^rounds * beta_den^rounds < 2^63 — truncation depth is
    the caller's contract, same as khop/betweenness.

    Plan per round: ONE equi-join of the static edge list with the
    current walk vector on the source + one map-side-combinable sum on
    the destination, then an integer-weighted full-outer merge into the
    accumulator.  The walk vector (<= |V| rows) is consumed twice per
    round (next relaxation + merge), so rounds are lazily
    localCheckpoint-ed; the edge list never re-shuffles.

    Returns (node, katz) for nodes with at least one incoming walk
    within the horizon.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if beta_den < 2 or (beta_den & (beta_den - 1)) != 0:
        raise ValueError("beta_den must be a power of two >= 2")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    w = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.lit(1).cast("long").alias("w"))
        .localCheckpoint(eager=False)
    )
    acc = None
    for k in range(1, rounds + 1):
        w = (
            e.join(w.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("w").cast("long").alias("w"))
            .localCheckpoint(eager=False)
        )
        scale = beta_den ** (rounds - k)
        term = w.select(
            "node", (F.col("w") * F.lit(scale)).cast("long").alias("t")
        )
        if acc is None:
            acc = term.withColumnRenamed("t", "acc")
        else:
            acc = (
                acc.join(term, "node", "full")
                .select(
                    "node",
                    (F.coalesce("acc", F.lit(0)) + F.coalesce("t", F.lit(0)))
                    .cast("long")
                    .alias("acc"),
                )
                .localCheckpoint(eager=False)
            )
    denom = float(beta_den**rounds)
    return acc.select("node", (F.col("acc") / F.lit(denom)).alias("katz"))


def boruvka_mst(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_rounds: int = 30,
) -> DataFrame:
    """Minimum spanning forest via Boruvka's algorithm (1926 — THE
    textbook distributed MST: Kruskal needs a global edge sort and
    sequential union-find, Prim grows one frontier; Boruvka lets every
    component pick its cheapest outgoing edge simultaneously, so each
    round is three joins + one min_by agg and the component count at
    least HALVES — <= log2(V) rounds).  On the KG this is the backbone
    extraction / single-linkage clustering primitive (cut the k heaviest
    MST edges = k clusters).

    Determinism without a uniqueness assumption: edges canonicalize to
    (a < b), parallel edges keep the min weight, and every selection is
    min_by the lexicographic struct (w, a, b) — a total order on edge
    keys — so the forest is unique and equals Kruskal run with the same
    tie-break (pinned by test against a pure-Python union-find).

    Per round: label each edge's endpoints with their component (two
    joins against the |V| label vector), drop intra-component edges,
    pick per-component minima (map-side-combinable min_by from BOTH
    endpoints' perspectives, then distinct — both components may pick
    the same edge), then CONTRACT by running connected_components on
    the selection graph, which has at most one edge per live component
    and halves every round (the tiny-input regime where
    `components.connected_components`' hybrid local path applies).
    Weights must be integer-typed for the exact-equality contract
    (scale fixed-point upstream); the accumulated forest and label
    vector are lazily checkpoint-ed per round.

    Not SQL-expressible (priority selection inside a fixpoint), so the
    named query takes the driver's rows-only check; correctness is
    pinned by the Kruskal-parity pytest.  Returns (a, b, w): the forest
    edges, |V| - #components rows.
    """
    from node_feedparser_spark.operators.components import (
        connected_components,
    )

    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("long").alias("a"),
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("b"),
            F.col(weight).cast("long").alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    comp = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint()
    )
    mst = None
    for _ in range(max_rounds):
        lab = (
            e.join(
                comp.select(
                    F.col("node").alias("a"), F.col("comp").alias("ca")
                ),
                "a",
            )
            .join(
                comp.select(
                    F.col("node").alias("b"), F.col("comp").alias("cb")
                ),
                "b",
            )
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=False)
        )
        if lab.isEmpty():
            break
        cand = lab.select(
            F.col("ca").alias("c"), "a", "b", "w"
        ).union(lab.select(F.col("cb").alias("c"), "a", "b", "w"))
        key = F.struct("w", "a", "b")
        sel = (
            cand.groupBy("c")
            .agg(F.min_by(key, key).alias("e"))
            .select("e.a", "e.b", "e.w")
            .distinct()
            .localCheckpoint()
        )
        mst = sel if mst is None else mst.union(sel).localCheckpoint(
            eager=False
        )
        selc = (
            sel.join(
                comp.select(
                    F.col("node").alias("a"), F.col("comp").alias("ca")
                ),
                "a",
            )
            .join(
                comp.select(
                    F.col("node").alias("b"), F.col("comp").alias("cb")
                ),
                "b",
            )
            .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        )
        relab = connected_components(selc)
        comp = (
            comp.join(
                relab.withColumnRenamed("node", "comp"), "comp", "left"
            )
            .select(
                "node",
                F.coalesce("component", F.col("comp")).alias("comp"),
            )
            .localCheckpoint()
        )
    if mst is None:
        return e.filter(F.lit(False)).select("a", "b", "w")
    return mst.distinct()


def luby_mis(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 40,
) -> DataFrame:
    """Maximal independent set via Luby's algorithm (1986) — the
    foundational symmetry-breaking primitive of distributed graph
    computing (greedy MIS is inherently sequential; Luby finishes in
    O(log n) rounds w.h.p.): every active node draws a priority, joins
    the MIS iff its priority beats every active neighbor's, then
    winners AND their neighborhoods deactivate.  Downstream uses:
    conflict-free scheduling over the co-mention graph, graph coloring
    seeds, landmark/anchor selection.

    Deterministic, not pseudo-random-seeded: the round-r priority of
    node v is ``md5(v || ':' || r)`` (hex) suffixed with the zero-padded
    node id — a reproducible total order both engines and a pure-Python
    replica compute bit-identically (the WL-fingerprint md5 discipline),
    so the output is a FUNCTION of the graph, testable by exact
    equality.  `Date`-free, seed-free, retry-safe.

    Plan per round: one join of the symmetrized active edge list with
    the priority vector + a min agg per node (its best neighbor), one
    comparison projection (winners), one join to collect the
    deactivated neighborhood, two anti-joins to shrink the active set,
    and a semi-join pair to shrink the edge list — everything bounded
    by the ACTIVE subgraph, which empties in O(log n) rounds.  Isolated
    nodes win their first round by definition (no neighbors).

    Raises if the active set survives ``max_rounds`` (cannot happen on
    a finite simple graph within O(log n) w.h.p. — the guard catches
    caller bugs like self-loops in disguise).  Self-loops are dropped.
    Returns (node,) — the MIS members.
    """
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    raw = edges.select(F.col(src).cast("long"), F.col(dst).cast("long"))
    e = raw.filter(F.col(src) != F.col(dst))
    sym = (
        e.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(e.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    active = raw.select(F.col(src).alias("node")).union(
        raw.select(F.col(dst).alias("node"))
    ).distinct()
    if nodes is not None:
        active = active.union(
            nodes.select(F.col("node").cast("long"))
        ).distinct()
    active = active.localCheckpoint()
    mis = None
    for r in range(max_rounds):
        if active.isEmpty():
            return (
                mis
                if mis is not None
                else active.select("node")
            )
        prio = active.select(
            "node",
            F.concat(
                F.md5(F.concat(F.col("node").cast("string"), F.lit(f":{r}"))),
                F.lit(":"),
                F.lpad(F.col("node").cast("string"), 20, "0"),
            ).alias("p"),
        ).localCheckpoint(eager=False)
        nbr_best = (
            sym.join(prio.select(F.col("node").alias("u"), "p"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("p").alias("np"))
        )
        winners = (
            prio.join(nbr_best, "node", "left")
            .filter(F.col("np").isNull() | (F.col("p") < F.col("np")))
            .select("node")
            .localCheckpoint()
        )
        mis = winners if mis is None else mis.union(winners).localCheckpoint(
            eager=False
        )
        dead = winners.union(
            sym.join(
                winners.withColumnRenamed("node", "u"), "u"
            ).select(F.col("v").alias("node"))
        ).distinct()
        active = active.join(dead, "node", "anti").localCheckpoint()
        sym = (
            sym.join(active.withColumnRenamed("node", "u"), "u", "semi")
            .join(active.withColumnRenamed("node", "v"), "v", "semi")
            .select("u", "v")
            .localCheckpoint()
        )
    raise ValueError(f"active set survived {max_rounds} rounds")


def greedy_coloring(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_colors: int = 50,
) -> DataFrame:
    """Distributed graph coloring by ITERATED MIS (the Luby reduction:
    color c = a maximal independent set of the residual graph, then
    delete it) — the conflict-serialization schedule for a KG: nodes of
    one color touch no common edge, so all of color c's updates/merges
    can run concurrently and the color count is the schedule length.
    Jones-Plassmann in its classic iterated form; colors <= Delta + 1
    on any graph because an MIS is maximal (every uncolored node loses
    a neighbor each round... strictly: every node is colored by round
    deg(v)+1, since an uncolored node always has an MIS neighbor).

    Fully deterministic: inherits `luby_mis`'s md5 priority chain on
    each residual graph, so the coloring is a pure function of the
    graph — pinned bit-exact against a pure-Python replica.  Cost is
    (#colors) x (MIS rounds); suited to the bounded-degree graphs a
    canonicalized KG has, with the `max_colors` guard raising on
    degenerate inputs (a clique of size > max_colors).

    Returns (node, color): color ids 0..k-1 in assignment order.
    Self-loops are dropped (a self-adjacent node cannot be properly
    colored under any convention).
    """
    if max_colors < 1:
        raise ValueError("max_colors must be >= 1")
    raw = edges.select(F.col(src).cast("long"), F.col(dst).cast("long"))
    e = (
        raw.filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    remaining = raw.select(F.col(src).alias("node")).union(
        raw.select(F.col(dst).alias("node"))
    ).distinct()
    if nodes is not None:
        remaining = remaining.union(
            nodes.select(F.col("node").cast("long"))
        ).distinct()
    remaining = remaining.localCheckpoint()
    out = None
    for color in range(max_colors):
        if remaining.isEmpty():
            return out if out is not None else remaining.select(
                "node", F.lit(0).cast("long").alias("color")
            )
        mis = luby_mis(e, nodes=remaining).select(
            "node", F.lit(color).cast("long").alias("color")
        ).localCheckpoint()
        out = mis if out is None else out.union(mis).localCheckpoint(
            eager=False
        )
        remaining = remaining.join(mis, "node", "anti").localCheckpoint()
        e = (
            e.join(remaining.withColumnRenamed("node", "src"), "src", "semi")
            .join(remaining.withColumnRenamed("node", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint()
        )
    raise ValueError(f"graph not colored within {max_colors} colors")
