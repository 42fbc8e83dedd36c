"""Similarity search over an embedding column — brute-force cosine top-k
(the exact baseline) and a deterministic IVF cell-probe variant (the scale
path).

Design for 100 TB:
- the query set is SMALL (10s-1000s of vectors); the corpus is huge.  So the
  query matrix is broadcast (a few MB of numpy) and scoring is a single
  mapInPandas pass over the corpus: one Arrow-batched numpy matmul per
  batch, NO shuffle of the corpus, and each batch emits only its LOCAL
  top-k per query.  The global top-k then reduces q*k*n_batches rows — a
  shuffle measured in kilobytes regardless of corpus size.
- IVF: centroids are a deterministic function of the data (the first
  n_cells vec_ids), every vector is assigned to its argmax-cosine cell, and
  a query probes only its own top-n_probe cells.  Deterministic => the
  DuckDB oracle reproduces it exactly; at scale the cell assignment becomes
  the partitioning key, so a probe touches n_probe/n_cells of the data.
- all floating-point scoring is float64 numpy; scores are rounded to 6 dp
  and tie-broken by vec_id so results are stable across engines and
  parallelism levels.

Reference analog: the reference has no vector ops; this belongs to the
"operations a large-scale training-data pipeline needs" mandate.  Its
keep-first/deterministic-tie-break discipline IS the reference's
(first-wins, /root/reference/lib/feedparser.js:939).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOPK_SCHEMA = "query_id long, vec_id long, score double"


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    pdf = df.select(id_col, vec_col).toPandas().sort_values(id_col)
    ids = pdf[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    return ids, mat


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k corpus vectors with
    the highest cosine similarity (excluding self-matches by id).

    queries must be small (collected to the driver, broadcast to executors).
    Returns (query_id, vec_id, score, rank) with score rounded to 6 dp and
    rank tie-broken ascending by vec_id.
    """
    spark = corpus.sparkSession
    q_ids, q_mat = _collect_matrix(queries, query_id_col, vec_col)
    q_norm = _normalize_rows(q_mat)
    bc = spark.sparkContext.broadcast((q_ids, q_norm))

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[id_col].to_numpy()
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sims = _normalize_rows(mat) @ qn.T  # (batch, n_queries)
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(ids):
                col = sims[:, j]
                keep = vids != qid  # exclude self
                # round BEFORE the local prune: the global tie-break is
                # (rounded score desc, vec_id asc), so pruning on raw floats
                # could drop a row that ties at the k-th rounded score and
                # would have won the vec_id tie-break.  Keep every row whose
                # rounded score >= the k-th largest rounded score (>= k rows).
                cv, cs = vids[keep], np.round(col[keep], 6)
                if len(cv) > k:
                    kth = np.partition(cs, len(cs) - k)[len(cs) - k]
                    sel = cs >= kth
                    cv, cs = cv[sel], cs[sel]
                out_q.extend([qid] * len(cv))
                out_v.extend(cv.tolist())
                out_s.extend(cs.tolist())
            yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    local = corpus.select(id_col, vec_col).mapInPandas(score_batches, TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def cosine_threshold_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_side: int = 100_000,
) -> DataFrame:
    """Embedding near-duplicate join: all pairs (a < b) with cosine >=
    threshold.  The smaller representation of the corpus is broadcast as one
    numpy matrix and each Arrow batch matmuls against it — an O(n^2) score
    computation with O(matches) output and no corpus shuffle.  This is the
    exact small-n baseline and the recall oracle; beyond max_side use
    cosine_threshold_pairs_blocked, the driver-collect-free scale path."""
    spark = corpus.sparkSession
    ids, mat = _collect_matrix(corpus, id_col, vec_col)
    if len(ids) > max_side:
        raise ValueError(
            f"cosine_threshold_pairs broadcast side {len(ids)} > {max_side}; "
            "pre-block with ivf_assign for corpora this large"
        )
    bc = spark.sparkContext.broadcast((ids, _normalize_rows(mat)))

    def pair_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_norm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[id_col].to_numpy()
            mat_b = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sims = _normalize_rows(mat_b) @ all_norm.T
            rows_i, cols_j = np.where(np.round(sims, 6) >= threshold)
            va = vids[rows_i]
            vb = all_ids[cols_j]
            keep = va < vb  # each unordered pair exactly once
            yield pd.DataFrame(
                {
                    "doc_a": va[keep],
                    "doc_b": vb[keep],
                    "score": np.round(sims[rows_i, cols_j][keep], 6),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        pair_batches, "doc_a long, doc_b long, score double"
    )


def cosine_threshold_pairs_auto(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    small_n_cutoff: int = 50_000,
    n_cells: int = 16,
    n_probe: int = 4,
    target_cell_rows: int = 10_000,
) -> DataFrame:
    """The NAMED near-duplicate pair join (round 3): dispatch on corpus
    size so the query a user grabs by name is scale-safe by construction.

    - n <= small_n_cutoff: exact brute force (`cosine_threshold_pairs`) —
      the recall-1.0 baseline, cheap at this size; its driver broadcast is
      bounded by the cutoff, so its ValueError guard is unreachable from
      here.
    - n > small_n_cutoff: the blocked IVF multi-probe plan
      (`cosine_threshold_pairs_blocked`) — zero driver collect of the
      corpus, cells scaled with the corpus (~target_cell_rows vectors per
      cell) so per-block matmuls stay in executor memory at any scale.

    The one count() this costs is a columnar parquet count — trivially
    cheap next to either plan, and the price of never letting an O(n^2)
    driver collect hide behind a green small-scale test.
    """
    n = corpus.count()
    if n <= small_n_cutoff:
        return cosine_threshold_pairs(
            corpus, threshold, id_col, vec_col, max_side=small_n_cutoff
        )
    cells = max(n_cells, n // max(1, target_cell_rows))
    return cosine_threshold_pairs_blocked(
        corpus, threshold, n_cells=cells, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )


def cosine_threshold_pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for the near-duplicate join: NO driver collect of the
    corpus, no O(n^2) global scoring.  Measured recall vs brute force at
    the defaults (16 cells, 4 probes): 0.94/0.92/0.95 at sf0.001/0.01/0.1,
    zero false positives, byte-identical scores on found pairs.

    Plan: (1) multi-probe IVF assignment — every vector lands in its
    top-n_probe cells by rounded cosine against the deterministic centroids
    (one mapInPandas pass, embedding carried along so no rejoin); (2) one
    shuffle of n*n_probe rows on `cell`; (3) per-cell applyInPandas block
    matmul emitting only pairs (a < b) with rounded score >= threshold;
    (4) global distinct, because a pair sharing two probe cells is emitted
    twice with an identical rounded score (same two float64 vectors =>
    same np.dot in any block).

    Recall < 1 by construction (a qualifying pair probing disjoint cells is
    missed); the brute-force twin `cosine_threshold_pairs` is the
    correctness baseline and tests pin measured recall.  At 100 TB,
    n_cells scales with the corpus (cells of ~10^4-10^5 vectors keep the
    per-block matmul in memory), so per-cell work is bounded and the only
    global costs are one narrow shuffle and the output-sized distinct.
    """
    spark = corpus.sparkSession
    cents = corpus.filter(F.col(id_col) < n_cells)
    c_ids, c_mat = _collect_matrix(cents, id_col, vec_col)
    bc = spark.sparkContext.broadcast((c_ids, _normalize_rows(c_mat)))

    def assign_multi(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, cn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[id_col].to_numpy()
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sims = np.round(_normalize_rows(mat) @ cn.T, 6)
            # top-n_probe cells per vector; stable argsort of -sims keeps
            # column order (= ascending cell id) on ties, matching the
            # oracle's ORDER BY score DESC, cell ASC.
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            reps = order.shape[1]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vids, reps),
                    "cell": ids[order].ravel(),
                    "emb": [v for v in pdf[vec_col] for _ in range(reps)],
                }
            )

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign_multi, "vec_id long, cell long, emb array<float>"
    )

    def pair_block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "score": []})
        pdf = pdf.sort_values("vec_id")
        vids = pdf["vec_id"].to_numpy()
        mat = _normalize_rows(
            np.array([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
        )
        sims = np.round(mat @ mat.T, 6)
        ai, bi = np.where(np.triu(sims >= threshold, k=1))
        # a vector probing 2 cells can meet itself under two cell ids only
        # in DIFFERENT blocks, but duplicate vec_ids inside one block are
        # impossible (a vector's probe cells are distinct); still, ids are
        # sorted so triu guarantees vids[ai] < vids[bi].
        return pd.DataFrame(
            {
                "doc_a": vids[ai],
                "doc_b": vids[bi],
                "score": sims[ai, bi],
            }
        )

    pairs = assigned.groupBy("cell").applyInPandas(
        pair_block, "doc_a long, doc_b long, score double"
    )
    return pairs.distinct()


def semantic_dedupe(
    corpus: DataFrame,
    threshold: float,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding space,
    connect within-cluster pairs with rounded cosine >= ``threshold``,
    transitively close, and keep ONE representative per semantic-duplicate
    group.  Output: (vec_id, cell, group_id, is_keeper) for every corpus
    vector — group_id = min vec_id of the component (singletons label
    themselves), is_keeper = first-wins (lowest id survives, the repo-wide
    keeper discipline; the SemDeDup paper keeps the lowest-centroid-cosine
    member instead — a one-line ORDER BY swap, first-wins keeps the oracle
    and the reference's guid rule aligned).

    Plan, and why it survives 100 TB: this is the embedding analog of
    near_dup_groups —
    - within-cluster pairs come from cosine_threshold_pairs_blocked with
      n_probe=1, i.e. exactly one cell per vector (its argmax-cosine
      centroid, ties to the lowest cell id — identical to ivf_assign, both
      are stable first-max argsorts): one narrow shuffle of (cell, emb)
      rows, one per-cell block matmul, NO driver collect, no cross-cell
      O(n^2).
    - the pair graph is output-sized (semantic dups ≪ corpus), so the
      connected-components closure runs over a tiny edge list.
    - labeling is one left join of the corpus ids against the label table.
    Recall < 1 by construction (a qualifying pair split across two cells is
    missed — the SemDeDup trade); the exact twin is cosine_threshold_pairs
    + components, which tests pin on small corpora.  n_cells scales with
    the corpus (~10^4-10^5 vectors per cell) like the blocked pair join.
    """
    from .components import connected_components

    assigned = ivf_assign(corpus, n_cells, id_col, vec_col)
    pairs = cosine_threshold_pairs_blocked(
        corpus, threshold, n_cells=n_cells, n_probe=1,
        id_col=id_col, vec_col=vec_col,
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = connected_components(edges).withColumnRenamed("node", "vec_id")
    return (
        corpus.select(F.col(id_col).alias("vec_id"))
        .join(assigned, "vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce("component", F.col("vec_id")).alias("group_id"),
        )
        .withColumn("is_keeper", F.col("group_id") == F.col("vec_id"))
    )


def _first_n_centroids(
    corpus: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> DataFrame:
    """Seed centroids: the vectors with the n_cells smallest ids — a
    seed-free, oracle-reproducible choice.  Output: (cell, cvec)."""
    return corpus.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic k-means refinement of the first-N seed centroids:
    each iteration assigns every vector to its nearest centroid (rounded
    cosine, ties to the lowest cell id) and recomputes each centroid as
    the per-dimension mean ROUNDED TO 4 DP — the rounding collapses
    float-summation-order differences so Spark and the unrolled-SQL DuckDB
    oracle converge to identical centroids.  A cluster that loses all its
    members keeps its previous centroid.

    Each iteration is one mapInPandas assignment pass (centroids broadcast
    as a numpy matrix) plus one posexplode/avg aggregation — linear, one
    narrow shuffle of (cell, pos) partial means; only the n_cells centroid
    rows ever reach the driver.  Output: (cell, cvec array<double>).
    """
    spark = corpus.sparkSession
    cells, cmat = _collect_matrix(
        _first_n_centroids(corpus, n_cells, id_col, vec_col), "cell", "cvec"
    )
    vec = corpus.select(id_col, vec_col)
    for _ in range(n_iters):
        bc = spark.sparkContext.broadcast((cells, _normalize_rows(cmat)))

        def assign_with_emb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids, cn = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                sims = np.round(_normalize_rows(mat) @ cn.T, 6)
                yield pd.DataFrame(
                    {"cell": ids[np.argmax(sims, axis=1)], "emb": pdf[vec_col]}
                )

        assigned = vec.mapInPandas(assign_with_emb, "cell long, emb array<float>")
        means = (
            assigned.select("cell", F.posexplode("emb").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), 4).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("cvec"))
        )
        new = {r["cell"]: np.asarray(r["cvec"], dtype=np.float64) for r in means.collect()}
        cmat = np.stack([new.get(int(c), cmat[i]) for i, c in enumerate(cells)])
    return spark.createDataFrame(
        [(int(c), [float(x) for x in cmat[i]]) for i, c in enumerate(cells)],
        "cell long, cvec array<double>",
    )


def ivf_assign(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its argmax-cosine cell among deterministic
    centroids (default: first-N seed; pass kmeans_centroids output for the
    refined variant — the plan is identical).  Ties break to the lowest
    cell id.  Output: (vec_id, cell)."""
    spark = corpus.sparkSession
    cents = (
        centroids
        if centroids is not None
        else _first_n_centroids(corpus, n_cells, id_col, vec_col)
    )
    c_ids, c_mat = _collect_matrix(cents, "cell", "cvec")
    bc = spark.sparkContext.broadcast((c_ids, _normalize_rows(c_mat)))

    def assign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, cn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[id_col].to_numpy()
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sims = np.round(_normalize_rows(mat) @ cn.T, 6)
            # argmax with lowest-id tie-break: argmax returns first max, and
            # columns are sorted ascending by centroid id already.
            cell = ids[np.argmax(sims, axis=1)]
            yield pd.DataFrame({"vec_id": vids, "cell": cell})

    return corpus.select(id_col, vec_col).mapInPandas(
        assign_batches, "vec_id long, cell long"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF cell-probe ANN: score only vectors living in the query's
    n_probe closest cells.  Exactly reproducible (deterministic centroids,
    rounded scores, id tie-breaks) — the DuckDB oracle runs the same
    algorithm in SQL.  Recall < 1 by design; the brute-force twin
    cosine_topk is the correctness baseline.  centroids defaults to the
    first-N seed; pass kmeans_centroids(...) for the refined variant."""
    cents = (
        centroids
        if centroids is not None
        else _first_n_centroids(corpus, n_cells, id_col, vec_col)
    )
    assigned = ivf_assign(corpus, n_cells, id_col, vec_col, centroids=cents)
    # queries' probe cells: rank centroids per query by the same rounded
    # cosine, keep n_probe (cell ties -> lowest cell id, same as assignment).
    probes = (
        _score_cross(queries.select(F.col(id_col).alias("query_id"), vec_col), cents)
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cscore").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "cell")
    )
    member = corpus.join(assigned, id_col).select(id_col, vec_col, "cell")
    cand = F.broadcast(probes).join(member, "cell").filter(
        F.col("query_id") != F.col(id_col)
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        cand.join(F.broadcast(qvec), "query_id")
        .withColumn("score", _cosine_col(F.col(vec_col), F.col("qvec")))
        .select("query_id", F.col(id_col).alias("vec_id"), "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def _cosine_col(a, b):
    """JVM-side cosine of two array<float|double> columns (zip_with dot,
    aggregate norms) — sequential left-fold, deterministic, rounded to 6.
    Kept for small candidate sets where a Python exchange isn't worth it."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, x: s + x * x))
    return F.round(dot / (na * nb), 6)


def _score_cross(queries: DataFrame, cents: DataFrame) -> DataFrame:
    """Tiny cross join (queries x centroids), JVM-side cosine."""
    return queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "cell",
        _cosine_col(F.col("embedding"), F.col("cvec")).alias("cscore"),
    )


def _quantization_stats(
    corpus: DataFrame, vec_col: str, n_levels: int
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, scale) over the corpus — ONE posexplode
    partial/final agg; only dim-sized rows (64 for this table) reach the
    driver, the kmeans_centroids discipline.  scale = (max-min)/(levels-1);
    a constant dimension gets scale 0 and quantizes to 0."""
    rows = (
        corpus.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").cast("double").alias("mn"),
             F.max("x").cast("double").alias("mx"))
        .collect()
    )
    dim = max(r["pos"] for r in rows) + 1
    mn = [0.0] * dim
    sc = [0.0] * dim
    for r in rows:
        mn[r["pos"]] = r["mn"]
        sc[r["pos"]] = (r["mx"] - r["mn"]) / (n_levels - 1)
    return mn, sc


def quantize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_levels: int = 256,
) -> DataFrame:
    """Scalar (int8-style) quantization of an embedding column: each
    dimension is min-max scaled to [0, n_levels-1] and rounded — 4x
    smaller at rest than float32, the standard first step before a
    memory-bound ANN corpus ships.  Deterministic and engine-portable:
    min/max are exact aggregates (no float summation), (x-min)/scale is
    one IEEE division, and rounding is half-up on a non-negative value, so
    Spark's JVM round and the oracle's ROUND agree bit-for-bit.

    Output: (vec_id, qvec array<int>).  The per-dim stats are embedded as
    LITERAL arrays (dim-sized, from one agg) so quantization itself is a
    pure in-row projection — the corpus is never shuffled.
    """
    mn, sc = _quantization_stats(corpus, vec_col, n_levels)
    mn_lit = F.array(*[F.lit(v) for v in mn])
    sc_lit = F.array(*[F.lit(v) for v in sc])
    q = F.transform(
        F.col(vec_col),
        lambda x, i: F.when(
            F.element_at(sc_lit, i + 1) > 0.0,
            F.round(
                (x.cast("double") - F.element_at(mn_lit, i + 1))
                / F.element_at(sc_lit, i + 1)
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return corpus.select(F.col(id_col).alias("vec_id"), q.alias("qvec"))


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_levels: int = 256,
) -> DataFrame:
    """Cosine top-k over the QUANTIZED corpus: vectors are quantized
    (quantize_embeddings), dequantized in-row to min + q*scale doubles,
    and scored with the exact brute-force plan (broadcast float queries,
    per-batch matmul) — so the only approximation is the quantization
    error itself, and recall vs the float baseline is measurable and
    pinned by tests.  At 100 TB this is the plan for an ANN corpus that
    only fits in memory quantized; queries stay float.
    """
    mn, sc = _quantization_stats(corpus, vec_col, n_levels)
    mn_lit = F.array(*[F.lit(v) for v in mn])
    sc_lit = F.array(*[F.lit(v) for v in sc])
    dq = F.transform(
        F.col(vec_col),
        lambda x, i: F.when(
            F.element_at(sc_lit, i + 1) > 0.0,
            F.element_at(mn_lit, i + 1)
            + F.round(
                (x.cast("double") - F.element_at(mn_lit, i + 1))
                / F.element_at(sc_lit, i + 1)
            )
            * F.element_at(sc_lit, i + 1),
        ).otherwise(F.element_at(mn_lit, i + 1)),
    )
    corpus_dq = corpus.select(F.col(id_col).alias(id_col), dq.alias(vec_col))
    return cosine_topk(
        corpus_dq, queries, k=k,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )


def rrf_fuse(
    rankings: list[DataFrame], k: int = 5, c: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion of ranked retrieval lists — the standard way
    to combine heterogeneous ANN/retrieval strategies (exact, IVF,
    quantized, lexical) without comparable scores: each list contributes
    1/(c + rank) per (query, candidate), fused score = the sum, re-ranked
    top-k with the repo's (score desc, vec_id asc) tie-break.

    Inputs are (query_id, vec_id, rank) frames (cosine_topk / ivf_topk /
    quantized_topk shapes).  Plan: one union (no recompute of the inputs
    beyond their own plans), one map-side-combinable sum keyed by
    (query, candidate) — output-sized, since every input is already a
    top-k list — and one window over per-query groups bounded by
    k * len(rankings).  Nothing here ever touches the corpus.
    """
    u = rankings[0].select("query_id", "vec_id", "rank")
    for r in rankings[1:]:
        u = u.union(r.select("query_id", "vec_id", "rank"))
    fused = u.groupBy("query_id", "vec_id").agg(
        F.round(F.sum(1.0 / (F.lit(int(c)) + F.col("rank"))), 6).alias(
            "rrf_score"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("vec_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rrf_score", "rank")
    )


def _quantize_with_stats(
    df: DataFrame,
    mn: list[float],
    sc: list[float],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Quantize a vector column with PRE-COMPUTED per-dimension (min, scale)
    stats — the shared projection behind quantize_embeddings and pq_topk, so
    a query frame can be quantized with the CORPUS's stats.  Pure in-row
    transform (literal dim-sized arrays), JVM-side F.round (HALF_UP on the
    non-negative (x-min)/scale), no shuffle."""
    mn_lit = F.array(*[F.lit(v) for v in mn])
    sc_lit = F.array(*[F.lit(v) for v in sc])
    q = F.transform(
        F.col(vec_col),
        lambda x, i: F.when(
            F.element_at(sc_lit, i + 1) > 0.0,
            F.round(
                (x.cast("double") - F.element_at(mn_lit, i + 1))
                / F.element_at(sc_lit, i + 1)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return df.select(F.col(id_col).alias("vec_id"), q.alias("qvec"))


def _sq_dists_sub(x3: np.ndarray, c3: np.ndarray) -> np.ndarray:
    """Exact int64 per-subspace squared L2 between x3 (B, m, d) and a
    codebook c3 (J, m, d) -> (B, J, m), via the ||x||^2 - 2 x.c + ||c||^2
    expansion: identical integers to ((x3[:,None]-c3[None])**2).sum(-1)
    (products and sums stay in int64; inputs are <= n_levels so no term
    can approach overflow) WITHOUT materializing the (B, J, m, d)
    difference tensor — at the round-4 production shape (J=256, m=16)
    that tensor was ~131 KB/row/batch and dominated the encode wall."""
    x2 = (x3 * x3).sum(-1)                   # (B, m)
    c2 = (c3 * c3).sum(-1)                   # (J, m)
    xc = np.einsum("bmd,jmd->bjm", x3, c3)   # (B, J, m)
    return x2[:, None, :] + c2[None, :, :] - 2 * xc


def _sq_dists_full(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact int64 full-vector squared L2 between X (B, dim) and
    centroids C (J, dim) -> (B, J), same expansion as _sq_dists_sub."""
    x2 = (X * X).sum(-1)
    c2 = (C * C).sum(-1)
    return x2[:, None] + c2[None, :] - 2 * (X @ C.T)


def _pq_lloyd_round(
    corpus_q: DataFrame, cent3: np.ndarray
) -> np.ndarray:
    """One deterministic Lloyd refinement of the PQ codebooks: assign every
    corpus subvector to its argmin code (ties -> smallest code), replace
    each centroid with the INTEGER mean of its members — round-half-up via
    pure integer arithmetic, (2*sum + n) // (2*n), so Spark and the oracle
    agree bit-for-bit with zero float ops.  Empty cells keep their seed.

    Plan: ONE mapInPandas pass emitting per-Arrow-batch PARTIAL
    (m, code, d, sum, count) aggregates — batch-count-sized, not
    corpus-sized — then a m_sub*n_codes*sub_dim-row final agg to the
    driver (1024 rows here): the kmeans_centroids partial/final
    discipline, corpus never shuffled."""
    n_codes, m_sub, sub = cent3.shape
    c3 = cent3

    def train_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x3 = np.array(
                [np.asarray(v, dtype=np.int64) for v in pdf["qvec"]]
            ).reshape(len(pdf), m_sub, sub)
            codes = _sq_dists_sub(x3, c3).argmin(axis=1)  # (batch, m_sub)
            out_m: list[int] = []
            out_c: list[int] = []
            out_d: list[int] = []
            out_s: list[int] = []
            out_n: list[int] = []
            for m in range(m_sub):
                cs = codes[:, m]
                sums = np.zeros((n_codes, sub), dtype=np.int64)
                np.add.at(sums, cs, x3[:, m, :])
                cnts = np.bincount(cs, minlength=n_codes)
                for j in range(n_codes):
                    if cnts[j] == 0:
                        continue
                    for d in range(sub):
                        out_m.append(m)
                        out_c.append(j)
                        out_d.append(d)
                        out_s.append(int(sums[j, d]))
                        out_n.append(int(cnts[j]))
            yield pd.DataFrame(
                {"m": out_m, "code": out_c, "d": out_d, "s": out_s, "n": out_n}
            )

    rows = (
        corpus_q.mapInPandas(
            train_partials, "m int, code int, d int, s long, n long"
        )
        .groupBy("m", "code", "d")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    refined = cent3.copy()
    for r in rows:
        s, n = int(r["s"]), int(r["n"])
        refined[r["code"], r["m"], r["d"]] = (2 * s + n) // (2 * n)
    return refined


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_codes: int = 256,
    m_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_levels: int = 256,
    train_iters: int = 2,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): the vector is split into m_sub
    subvectors, each subspace gets an n_codes codebook, and a corpus vector
    is stored as m_sub small codes — log2(n_codes)*m_sub bits per vector
    (256 codes x 16 subspaces = 16 B/vector vs 256 B float32/64d — the
    standard FAISS 8-bit-codebook PQ16 shape, recall@5 0.70 vs exact
    cosine on the sf0.01 table), the representation that lets a 100 TB
    embedding corpus live in cluster memory.  Queries score candidates with the classic ADC table: one
    (m_sub x n_codes) distance table per query, approximate distance =
    m_sub table lookups + a sum, never a full d-dim op per candidate.

    Engine-portable by construction: vectors are first scalar-quantized to
    integers (the quantize_embeddings projection, JVM F.round == oracle
    ROUND), codebooks seed from the quantized subvectors of the n_codes
    smallest vec_ids (the _first_n_centroids discipline) and are refined by
    train_iters deterministic Lloyd rounds with pure-integer means
    ((2*sum + n) // (2*n), _pq_lloyd_round), and every distance is an
    exact int64 sum of squared integer differences — zero float summation
    anywhere, so the DuckDB oracle's top-k is bit-identical, ties broken
    (adist asc, vec_id asc) with argmin-first == smallest-code on encode.

    Plan shape (cosine_topk discipline): corpus is quantized in-row and
    encoded + scored in ONE mapInPandas pass (vectorized int numpy, local
    top-k prune per Arrow batch), query ADC tables are a broadcast of
    nq x m_sub x n_codes int64 — the global top-k reduces q*k*n_batches
    rows.  No corpus shuffle; composes with ivf_assign for IVF-PQ at scale.

    Returns (query_id, vec_id, adist, rank): ascending approximate squared
    L2 distance in quantized-integer units.
    """
    spark = corpus.sparkSession
    mn, sc = _quantization_stats(corpus, vec_col, n_levels)
    dim = len(mn)
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub

    corpus_q = _quantize_with_stats(corpus, mn, sc, id_col, vec_col)
    queries_q = _quantize_with_stats(queries, mn, sc, query_id_col, vec_col)

    # codebooks: quantized subvectors of the n_codes smallest ids — tiny,
    # deterministic, oracle-reproducible (n_codes * dim ints to the driver)
    cent = np.zeros((n_codes, dim), dtype=np.int64)
    for r in corpus_q.filter(F.col("vec_id") < n_codes).collect():
        cent[int(r["vec_id"])] = np.asarray(r["qvec"], dtype=np.int64)
    cent3 = cent.reshape(n_codes, m_sub, sub)
    for _ in range(max(0, train_iters)):
        cent3 = _pq_lloyd_round(corpus_q, cent3)

    # per-query ADC tables (queries are small by the cosine_topk contract)
    q_rows = queries_q.collect()
    q_ids = np.array([int(r["vec_id"]) for r in q_rows], dtype=np.int64)
    qmat = np.array(
        [np.asarray(r["qvec"], dtype=np.int64) for r in q_rows]
    ).reshape(len(q_ids), m_sub, sub)
    # (nq, n_codes, m_sub) -> (nq, m_sub, n_codes)
    qtab = np.transpose(_sq_dists_sub(qmat, cent3), (0, 2, 1))
    bc = spark.sparkContext.broadcast((q_ids, qtab, cent3))

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, tabs, c3 = bc.value
        marange = np.arange(c3.shape[1])
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf["vec_id"].to_numpy()
            x3 = np.array(
                [np.asarray(v, dtype=np.int64) for v in pdf["qvec"]]
            ).reshape(len(vids), c3.shape[1], c3.shape[2])
            # encode: per (row, subspace) the argmin code; numpy argmin
            # takes the FIRST minimum == smallest code, the oracle tie-break
            codes = _sq_dists_sub(x3, c3).argmin(axis=1)  # (batch, m_sub)
            out_q: list[int] = []
            out_v: list[int] = []
            out_d: list[int] = []
            for qi, qid in enumerate(ids):
                ad = tabs[qi][marange[None, :], codes].sum(axis=1)
                keep = vids != qid  # exclude self
                cv, cd = vids[keep], ad[keep]
                if len(cv) > k:
                    # integer distances: keep everything <= the k-th
                    # smallest so the global (adist, vec_id) tie-break
                    # never loses a contender
                    kth = np.partition(cd, k - 1)[k - 1]
                    sel = cd <= kth
                    cv, cd = cv[sel], cd[sel]
                out_q.extend([qid] * len(cv))
                out_v.extend(cv.tolist())
                out_d.extend(cd.tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "adist": out_d}
            )

    local = corpus_q.mapInPandas(
        score_batches, "query_id long, vec_id long, adist long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adist", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 8,
    n_codes: int = 256,
    m_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_levels: int = 256,
    train_iters: int = 2,
) -> DataFrame:
    """IVF-PQ: the production 100 TB ANN shape (FAISS IVFx,PQy) — a coarse
    inverted-file quantizer prunes the corpus to the query's n_probe
    nearest cells, and candidates inside those cells are scored with the
    PQ ADC tables, so per query the scan touches ~n_probe/n_cells of the
    data and each candidate costs m_sub table lookups.

    Both layers use the repo's integer discipline end-to-end: the coarse
    quantizer is squared-L2 over the scalar-quantized vectors against
    n_cells centroids (seeded from the n_cells smallest vec_ids, refined
    by one pure-integer Lloyd round — _pq_lloyd_round with a single
    "subspace" spanning the full vector), cell ties break to the smallest
    cell; the PQ layer reuses pq_topk's codebook discipline (global,
    non-residual — the residual variant is the production refinement, same
    plumbing; train_iters Lloyd rounds) and exact int64 ADC sums.  Zero float arithmetic anywhere, so the DuckDB
    oracle replays coarse seed, coarse Lloyd, assignment, probe sets, PQ
    encode, and the (adist asc, vec_id asc) top-k bit-identically.

    Plan: ONE mapInPandas pass over the quantized corpus computes cell +
    codes + masked ADC scores per Arrow batch (probe sets and both
    codebooks ride one broadcast); at real scale the cell becomes the
    partition key so a probe is partition pruning, not a mask.
    """
    spark = corpus.sparkSession
    mn, sc = _quantization_stats(corpus, vec_col, n_levels)
    dim = len(mn)
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub

    corpus_q = _quantize_with_stats(corpus, mn, sc, id_col, vec_col)
    queries_q = _quantize_with_stats(queries, mn, sc, query_id_col, vec_col)

    seeds = np.zeros((max(n_cells, n_codes), dim), dtype=np.int64)
    for r in corpus_q.filter(F.col("vec_id") < max(n_cells, n_codes)).collect():
        seeds[int(r["vec_id"])] = np.asarray(r["qvec"], dtype=np.int64)

    # coarse quantizer: one full-vector "subspace", one integer Lloyd round
    coarse = _pq_lloyd_round(
        corpus_q, seeds[:n_cells].reshape(n_cells, 1, dim)
    ).reshape(n_cells, dim)
    # PQ codebooks: the pq_topk discipline (seed + train_iters Lloyd rounds)
    cent3 = seeds[:n_codes].reshape(n_codes, m_sub, sub)
    for _ in range(max(0, train_iters)):
        cent3 = _pq_lloyd_round(corpus_q, cent3)

    q_rows = queries_q.collect()
    q_ids = np.array([int(r["vec_id"]) for r in q_rows], dtype=np.int64)
    qmat = np.array([np.asarray(r["qvec"], dtype=np.int64) for r in q_rows])
    # probe sets: n_probe cells with the smallest integer L2 (ties -> cell asc)
    qcd = _sq_dists_full(qmat, coarse)  # (nq, cells)
    probes = np.argsort(qcd, axis=1, kind="stable")[:, :n_probe]
    q3 = qmat.reshape(len(q_ids), m_sub, sub)
    qtab = np.transpose(_sq_dists_sub(q3, cent3), (0, 2, 1))
    bc = spark.sparkContext.broadcast((q_ids, probes, qtab, coarse, cent3))

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, prb, tabs, co, c3 = bc.value
        msub, subd = c3.shape[1], c3.shape[2]
        marange = np.arange(msub)
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf["vec_id"].to_numpy()
            X = np.array([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            cells = _sq_dists_full(X, co).argmin(1)
            x3 = X.reshape(len(vids), msub, subd)
            codes = _sq_dists_sub(x3, c3).argmin(axis=1)
            out_q: list[int] = []
            out_v: list[int] = []
            out_d: list[int] = []
            for qi, qid in enumerate(ids):
                keep = np.isin(cells, prb[qi]) & (vids != qid)
                if not keep.any():
                    continue
                ad = tabs[qi][marange[None, :], codes[keep]].sum(axis=1)
                cv = vids[keep]
                if len(cv) > k:
                    kth = np.partition(ad, k - 1)[k - 1]
                    sel = ad <= kth
                    cv, ad = cv[sel], ad[sel]
                out_q.extend([qid] * len(cv))
                out_v.extend(cv.tolist())
                out_d.extend(ad.tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "adist": out_d}
            )

    local = corpus_q.mapInPandas(
        score_batches, "query_id long, vec_id long, adist long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adist", "rank")
    )


def _pq_lloyd_round_residual(
    corpus_q: DataFrame, coarse: np.ndarray, rcent3: np.ndarray
) -> np.ndarray:
    """_pq_lloyd_round's residual twin: each batch first assigns its rows
    to coarse cells (argmin integer L2, ties -> smallest cell), subtracts
    the cell centroid, then runs the same assign-and-partial-sum over the
    RESIDUAL subvectors.  Residual sums can be NEGATIVE, and Python //
    floors while DuckDB // truncates toward zero — so the integer mean is
    sign-symmetric half-AWAY-from-zero, sign(s) * (2*|s| + n) // (2*n)
    (the Cohen's-kappa fixed-point discipline), which both engines
    compute identically."""
    n_codes, m_sub, sub = rcent3.shape
    c3 = rcent3
    co = coarse

    def train_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            cells = _sq_dists_full(X, co).argmin(1)
            r3 = (X - co[cells]).reshape(len(X), m_sub, sub)
            codes = _sq_dists_sub(r3, c3).argmin(axis=1)
            out: list[tuple[int, int, int, int, int]] = []
            for m in range(m_sub):
                cs = codes[:, m]
                sums = np.zeros((n_codes, sub), dtype=np.int64)
                np.add.at(sums, cs, r3[:, m, :])
                cnts = np.bincount(cs, minlength=n_codes)
                for j in range(n_codes):
                    if cnts[j] == 0:
                        continue
                    for d in range(sub):
                        out.append((m, j, d, int(sums[j, d]), int(cnts[j])))
            yield pd.DataFrame(
                out, columns=["m", "code", "d", "s", "n"]
            )

    rows = (
        corpus_q.mapInPandas(
            train_partials, "m int, code int, d int, s long, n long"
        )
        .groupBy("m", "code", "d")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    refined = rcent3.copy()
    for r in rows:
        s, n = int(r["s"]), int(r["n"])
        v = (2 * abs(s) + n) // (2 * n)
        refined[r["code"], r["m"], r["d"]] = v if s >= 0 else -v
    return refined


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 8,
    n_codes: int = 256,
    m_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_levels: int = 256,
    train_iters: int = 2,
) -> DataFrame:
    """Residual IVF-PQ — the exact FAISS IndexIVFPQ semantics: PQ encodes
    x − centroid(cell(x)) instead of x, so the codebooks only have to
    cover the (much tighter) within-cell residual distribution, and each
    query builds a SEPARATE ADC table per probed cell from its residual
    against THAT cell's centroid.  This is what makes 8-byte codes usable
    at production recall; ivfpq_topk's global-codebook variant is the
    same plumbing minus the residual subtraction.

    Integer discipline throughout (scalar-quantized vectors, integer
    coarse Lloyd, residual codebooks seeded from the n_codes smallest
    ids' residuals + one integer Lloyd round with sign-symmetric
    half-away-from-zero means — Python // floors but DuckDB // truncates
    on negatives, so the mean is sign(s)*(2|s|+n)//(2n) on both engines —
    and exact int64 ADC sums): the oracle replays every stage
    bit-identically with zero float arithmetic.

    Plan: same single scoring pass as ivfpq_topk; the broadcast carries
    per-(query, probed-cell) ADC tables (nq x n_probe x m_sub x n_codes
    int64 — still tiny) and candidates are matched to the table of their
    OWN cell.
    """
    spark = corpus.sparkSession
    mn, sc = _quantization_stats(corpus, vec_col, n_levels)
    dim = len(mn)
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub

    corpus_q = _quantize_with_stats(corpus, mn, sc, id_col, vec_col)
    queries_q = _quantize_with_stats(queries, mn, sc, query_id_col, vec_col)

    seeds = np.zeros((max(n_cells, n_codes), dim), dtype=np.int64)
    for r in corpus_q.filter(F.col("vec_id") < max(n_cells, n_codes)).collect():
        seeds[int(r["vec_id"])] = np.asarray(r["qvec"], dtype=np.int64)

    coarse = _pq_lloyd_round(
        corpus_q, seeds[:n_cells].reshape(n_cells, 1, dim)
    ).reshape(n_cells, dim)

    # residual codebook seeds: the first n_codes vectors' residuals vs
    # their OWN (refined-coarse) cells — same rule the oracle replays
    seed_cells = _sq_dists_full(seeds[:n_codes], coarse).argmin(1)
    rseeds = (seeds[:n_codes] - coarse[seed_cells]).reshape(n_codes, m_sub, sub)
    rcent3 = rseeds
    for _ in range(max(0, train_iters)):
        rcent3 = _pq_lloyd_round_residual(corpus_q, coarse, rcent3)

    q_rows = queries_q.collect()
    q_ids = np.array([int(r["vec_id"]) for r in q_rows], dtype=np.int64)
    qmat = np.array([np.asarray(r["qvec"], dtype=np.int64) for r in q_rows])
    qcd = _sq_dists_full(qmat, coarse)
    probes = np.argsort(qcd, axis=1, kind="stable")[:, :n_probe]  # (nq, np)
    # per-(query, probed cell) ADC tables over the query's residual vs
    # that cell: (nq, n_probe, m_sub, n_codes)
    qres = (qmat[:, None, :] - coarse[probes]).reshape(
        len(q_ids), n_probe, m_sub, sub
    )
    qtab = np.transpose(
        _sq_dists_sub(
            qres.reshape(len(q_ids) * n_probe, m_sub, sub), rcent3
        ).reshape(len(q_ids), n_probe, rcent3.shape[0], m_sub),
        (0, 1, 3, 2),
    )
    bc = spark.sparkContext.broadcast((q_ids, probes, qtab, coarse, rcent3))

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, prb, tabs, co, c3 = bc.value
        msub, subd = c3.shape[1], c3.shape[2]
        marange = np.arange(msub)
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf["vec_id"].to_numpy()
            X = np.array([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            cells = _sq_dists_full(X, co).argmin(1)
            r3 = (X - co[cells]).reshape(len(X), msub, subd)
            codes = _sq_dists_sub(r3, c3).argmin(axis=1)
            out_q: list[int] = []
            out_v: list[int] = []
            out_d: list[int] = []
            for qi, qid in enumerate(ids):
                for p, cell in enumerate(prb[qi]):
                    keep = (cells == cell) & (vids != qid)
                    if not keep.any():
                        continue
                    ad = tabs[qi, p][marange[None, :], codes[keep]].sum(axis=1)
                    cv = vids[keep]
                    if len(cv) > k:
                        kth = np.partition(ad, k - 1)[k - 1]
                        sel = ad <= kth
                        cv, ad = cv[sel], ad[sel]
                    out_q.extend([qid] * len(cv))
                    out_v.extend(cv.tolist())
                    out_d.extend(ad.tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "adist": out_d}
            )

    local = corpus_q.mapInPandas(
        score_batches, "query_id long, vec_id long, adist long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adist", "rank")
    )
