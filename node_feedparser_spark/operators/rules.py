"""Horn-rule mining and predicate profiling over the KG triple shape.

Once the pipeline has materialized ``(subj, pred, obj)`` triples, the
standard next step in KG construction is *schema induction*: mine the
2-hop path rules ``p1(x,z) AND p2(z,y) => p3(x,y)`` with their support /
confidence statistics (AMIE-style, under the Partial Completeness
Assumption), and profile each predicate's functionality — the statistics
that drive both rule pruning and record-linkage weighting.  The reference
hard-codes its one such inference (guid looks-like-a-link => link,
/root/reference/lib/feedparser.js:485-492 — a rule whose "confidence" is
a regex); at corpus scale the analog is mining such implications from the
data with measured confidence.

Semantics (public AMIE definitions, Galárraga et al., WWW'13):

- support(r)       = |{(x,y) : body(x,y) AND p3(x,y)}|   (distinct pairs)
- n_body(r)        = |{(x,y) : body(x,y)}|
- conf_std(r)      = support / n_body
- conf_pca(r)      = support / |{(x,y) : body(x,y) AND EXISTS y': p3(x,y')}|
  — the PCA denominator only counts body pairs whose subject x asserts
  *some* p3 fact, so predicates with partial coverage are not punished
  for the unknown rows (the open-world correction).
- head_coverage(r) = support / |p3|

Scale shape (the part that matters at 10^12 triples):

- Everything is distinct / groupBy / equi-join on (pred, node) keys — no
  windows, no Python, no driver state.  The body enumeration is the one
  quadratic hazard: joining t1.obj = t2.subj multiplies, per connecting
  node z, its p1 in-degree by its p2 out-degree.  A celebrity entity
  (one mentioned in 10^8 turns) would explode that join, so the operator
  takes ``max_pairs``: connecting instantiations whose per-(z, p1, p2)
  in*out product exceeds the cap are dropped BEFORE the join, from two
  tiny degree aggregates — a declared semantic of the operator that the
  DuckDB oracle replays verbatim (same discipline as pmi_edges'
  max_basket and link_predict's max_degree).
- The degree/allowed tables are O(|nodes| * |preds|) — broadcast-sized
  relative to the triple table; the big side shuffles once per join key
  it is actually joined on.
- ``min_support`` prunes the rule list post-aggregation (output sizing,
  not compute sizing — compute is capped by max_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_path_rules(
    triples: DataFrame,
    min_support: int = 100,
    max_pairs: int = 100_000,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Mine ``p1(x,z) AND p2(z,y) => p3(x,y)`` rules with AMIE statistics.

    Returns one row per (p1, p2, p3) with support >= ``min_support``:
    ``(p1, p2, p3, support, n_body, n_head, conf_std, conf_pca,
    head_coverage)`` — counts BIGINT, ratios rounded to 6 dp.
    """
    # cached: six plan branches (degree dims, both body sides, heads, PCA
    # domain) consume the same distinct triple table — without the cache
    # each branch re-runs the upstream union/joins (canonicalize.py's
    # multi-consumer discipline)
    t = triples.select(
        F.col(subj).alias("subj"),
        F.col(pred).alias("pred"),
        F.col(obj).alias("obj"),
    ).distinct().cache()

    # Per-(z, p1, p2) blow-up guard: in-degree of z under p1 times
    # out-degree of z under p2 must not exceed max_pairs.
    ind = t.groupBy(F.col("obj").alias("z"), F.col("pred").alias("p1")).agg(
        F.count(F.lit(1)).alias("ind")
    )
    outd = t.groupBy(F.col("subj").alias("z"), F.col("pred").alias("p2")).agg(
        F.count(F.lit(1)).alias("outd")
    )
    allowed = ind.join(outd, "z").filter(
        F.col("ind") * F.col("outd") <= F.lit(int(max_pairs))
    ).select("z", "p1", "p2")

    # Body instantiations: expand the left edge by its allowed p2s first
    # (pred count is tiny), THEN join the right edge — the capped pairs
    # never materialize.
    b1 = t.select(
        F.col("subj").alias("x"), F.col("pred").alias("p1"), F.col("obj").alias("z")
    )
    b2 = t.select(
        F.col("subj").alias("z"), F.col("pred").alias("p2"), F.col("obj").alias("y")
    )
    # cached: n_body, the support join, and the PCA denominator all read
    # the body pair set — uncached, the expensive b1⋈b2 distinct re-runs
    # once per consumer
    body_pairs = (
        b1.join(allowed, ["z", "p1"])
        .join(b2, ["z", "p2"])
        .select("p1", "p2", "x", "y")
        .distinct()
        .cache()
    )

    n_body = body_pairs.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).cast("long").alias("n_body")
    )
    heads = t.select(
        F.col("pred").alias("p3"), F.col("subj").alias("x"), F.col("obj").alias("y")
    )
    # cached: the surviving rule list is tiny and read four times (result
    # spine + two broadcast prunes + the PCA semi-join)
    support = (
        body_pairs.join(heads, ["x", "y"])
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= F.lit(int(min_support)))
        .cache()
    )
    n_head = heads.groupBy("p3").agg(F.count(F.lit(1)).cast("long").alias("n_head"))
    # PCA denominator: body pairs whose x asserts SOME p3 fact — computed
    # ONLY for rules that already cleared min_support (the rule list is
    # tiny and broadcasts; the naive order would multiply EVERY body pair
    # by every predicate its x touches, the most expensive join in the
    # plan for a denominator that is then thrown away for 99% of combos).
    surviving = support.select("p1", "p2", "p3").distinct()
    pca_dom = (
        t.select(F.col("pred").alias("p3"), F.col("subj").alias("x"))
        .distinct()
        .join(surviving.select("p3").distinct(), "p3", "left_semi")
    )
    n_pca = (
        body_pairs.join(
            F.broadcast(surviving.select("p1", "p2").distinct()), ["p1", "p2"]
        )
        .join(pca_dom, "x")
        .join(F.broadcast(surviving), ["p1", "p2", "p3"], "left_semi")
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pca"))
    )

    return (
        support.join(n_body, ["p1", "p2"])
        .join(n_head, "p3")
        .join(n_pca, ["p1", "p2", "p3"])
        .select(
            "p1",
            "p2",
            "p3",
            "support",
            "n_body",
            "n_head",
            F.round(F.col("support") / F.col("n_body"), 6).alias("conf_std"),
            F.round(F.col("support") / F.col("n_pca"), 6).alias("conf_pca"),
            F.round(F.col("support") / F.col("n_head"), 6).alias("head_coverage"),
        )
    )


def predicate_stats(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Per-predicate functionality profile over distinct triples.

    For each predicate: triple count, distinct subject / object counts,
    ``functionality = n_subj / n_triples`` (1.0 means every subject has
    exactly one object — a functional property, the precondition for
    conflict resolution via truth_fusion and for PCA mining), the inverse
    ``inv_functionality = n_obj / n_triples``, and the dominant subject /
    object namespace prefix (first character of the entity id — the KG
    pipeline's type tag) with its share of the predicate's triples: the
    domain/range induction a schema layer needs before typing edges.

    One distinct + two groupBys; the prefix mode is a max_by over a
    (pred, prefix) count table — all map-side combinable, no windows.
    """
    # cached: the base counts and both prefix profiles re-read it
    t = triples.select(
        F.col(subj).alias("subj"),
        F.col(pred).alias("pred"),
        F.col(obj).alias("obj"),
    ).distinct().cache()

    base = t.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subj"),
        F.countDistinct("obj").cast("long").alias("n_obj"),
    )

    # Dominant prefix with deterministic ties (highest n, then prefix
    # ascending): per-pred max count, filter to it, min(prefix) — two tiny
    # aggregates over the (pred, prefix) count table, portable to any
    # engine (the DuckDB oracle replays it verbatim).
    def _dominant(col: str, pre_out: str, share_out: str) -> DataFrame:
        cnt = t.groupBy(
            "pred", F.substring(F.col(col), 1, 1).alias("prefix")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        tops = cnt.groupBy("pred").agg(
            F.max("n").alias("_top_n"), F.sum("n").alias("_tot")
        )
        return (
            cnt.join(tops, "pred")
            .filter(F.col("n") == F.col("_top_n"))
            .groupBy("pred", "_top_n", "_tot")
            .agg(F.min("prefix").alias(pre_out))
            .select(
                "pred",
                pre_out,
                F.round(F.col("_top_n") / F.col("_tot"), 6).alias(share_out),
            )
        )

    dom = _dominant("subj", "domain_prefix", "domain_share")
    rng = _dominant("obj", "range_prefix", "range_share")

    return (
        base.join(dom, "pred")
        .join(rng, "pred")
        .select(
            "pred",
            "n_triples",
            "n_subj",
            "n_obj",
            F.round(F.col("n_subj") / F.col("n_triples"), 6).alias("functionality"),
            F.round(F.col("n_obj") / F.col("n_triples"), 6).alias("inv_functionality"),
            "domain_prefix",
            "domain_share",
            "range_prefix",
            "range_share",
        )
    )


def rule_apply(
    triples: DataFrame, p1: str, p2: str, head: str
) -> DataFrame:
    """Apply one 2-hop horn rule p1(x,y) ∧ p2(y,z) → head(x,z): emit the
    INFERRED head triples not already asserted — the application half of
    mine_path_rules' AMIE loop (mine the rule, measure its PCA
    confidence, then MATERIALIZE what it predicts; inferred-minus-known
    is exactly the KG-completion delta a curator reviews).

    One equi-join on the shared variable + distinct (set semantics, same
    discipline as eval_path composition) + one anti join against the
    asserted head relation.  All shuffles are linear in the relation
    sizes; the pred filters push into the scan/union exactly as bgp.py's
    constant-folded pattern scans do.
    """
    b1 = triples.filter(F.col("pred") == p1).select(
        F.col("subj").alias("x"), F.col("obj").alias("y")
    )
    b2 = triples.filter(F.col("pred") == p2).select(
        F.col("subj").alias("y"), F.col("obj").alias("z")
    )
    inferred = (
        b1.join(b2, "y")
        .select(F.col("x").alias("subj"), F.col("z").alias("obj"))
        .distinct()
    )
    existing = triples.filter(F.col("pred") == head).select("subj", "obj")
    return inferred.join(existing, ["subj", "obj"], "left_anti").select(
        "subj", F.lit(head).alias("pred"), "obj"
    )


def schema_summary(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """VoID/ABSTAT-style schema graph induced from the instance data: one
    row per observed (subject type, predicate, object type) pattern over
    distinct triples, with triple / distinct-entity counts and the
    pattern's share of its predicate — the class-partition +
    property-partition statistics of the W3C VoID vocabulary, and the
    minimal "abstraction" ABSTAT summarizes LOD datasets with.  Types are
    the 1-char entity-namespace prefix (the KG pipeline's type tag, same
    convention as predicate_stats).

    Where predicate_stats keeps only each side's DOMINANT prefix, this is
    the full typed-pattern profile: the shape a query planner, a SHACL
    author, or an ontology-drift monitor reads ("0.3 % of `placed` edges
    now point at a `p` node — upstream extraction regressed").

    Plan: distinct -> ONE groupBy(pred, subj_type, obj_type) carrying
    count + two-phase partial-distinct entity counts; the per-predicate
    share window runs over the SUMMARY table only (<= |preds| x observed
    type pairs — dozens of rows at any corpus size, the mixture_weights
    tiny-window discipline), never the triple set.
    """
    from pyspark.sql import Window

    t = (
        triples.select(
            F.col(subj).alias("_s"),
            F.col(pred).alias("pred"),
            F.col(obj).alias("_o"),
        )
        .distinct()
    )
    g = (
        t.select(
            "pred",
            F.substring("_s", 1, 1).alias("subj_type"),
            F.substring("_o", 1, 1).alias("obj_type"),
            "_s",
            "_o",
        )
        .groupBy("pred", "subj_type", "obj_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_triples"),
            F.countDistinct("_s").cast("long").alias("n_subjects"),
            F.countDistinct("_o").cast("long").alias("n_objects"),
        )
    )
    w = Window.partitionBy("pred")
    return g.select(
        "pred",
        "subj_type",
        "obj_type",
        "n_triples",
        "n_subjects",
        "n_objects",
        F.round(
            F.col("n_triples") / F.sum("n_triples").over(w), 6
        ).alias("share"),
    )


def predicate_align(
    triples_a: DataFrame,
    triples_b: DataFrame,
    min_overlap: int = 1,
) -> DataFrame:
    """Ontology alignment lite (PARIS, Suchanek et al. 2011, reduced to
    its extensional core): score every (pred_a, pred_b) vocabulary pair by
    the Jaccard similarity of their distinct (subj, obj) pair sets —
    the evidence two predicates from different KG slices mean the same
    relation.  The cross-vocabulary face of the reference's namespace
    canonicalization (lib/constants.js maps many ns URIs to one prefix by
    a static table; alignment DERIVES the table from instance overlap).

    Returns (pred_a, pred_b, n_joint, n_a, n_b, jaccard) for pairs with
    ``n_joint >= min_overlap`` shared distinct pairs; jaccard =
    n_joint / (n_a + n_b - n_joint) at 6 dp (one float division per
    bounded output row — no cross-row float sums).

    Scale shape: each side is distinct-ed once, then ONE (subj, obj)
    equi-join — a pair key appears at most n_predicates times per side
    after the distinct, so the join fan per key is vocabulary²-bounded,
    never corpus-shaped.  Per-predicate totals are predicate-count-sized
    and broadcast onto the joint counts.
    """
    a = triples_a.select("subj", "pred", "obj").distinct()
    b = triples_b.select("subj", "pred", "obj").distinct()
    n_a = a.groupBy(F.col("pred").alias("pred_a")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    n_b = b.groupBy(F.col("pred").alias("pred_b")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    joint = (
        a.select("subj", "obj", F.col("pred").alias("pred_a"))
        .join(b.select("subj", "obj", F.col("pred").alias("pred_b")),
              ["subj", "obj"])
        .groupBy("pred_a", "pred_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_joint"))
        .filter(F.col("n_joint") >= int(min_overlap))
    )
    return (
        joint.join(F.broadcast(n_a), "pred_a")
        .join(F.broadcast(n_b), "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "n_joint",
            "n_a",
            "n_b",
            F.round(
                F.col("n_joint")
                / (F.col("n_a") + F.col("n_b") - F.col("n_joint")),
                6,
            ).alias("jaccard"),
        )
    )
