"""SHACL-lite shape validation over the KG triple shape: declared
per-namespace constraints (cardinality, range namespace, object pattern)
checked in bulk, emitting one row per violation.

The constraint vocabulary (a deliberately small, engine-portable subset of
W3C SHACL):
- ``target_prefix`` — the 1-char entity-namespace prefix the shape targets
  (the pipeline's canonical IDs are namespace-prefixed; predicate_stats
  induces these prefixes, this operator enforces them);
- ``pred`` — the constrained predicate;
- ``min_count`` / ``max_count`` — per-focus-node cardinality bounds
  (NULL = unbounded); min_count counts ALL target-prefix entities seen
  anywhere in the graph (subject or object position), so an entity with
  zero assertions of ``pred`` is a minCount violation, exactly like
  SHACL's focus-node semantics;
- ``range_prefix`` — required 1-char namespace of the object (NULL = any);
- ``obj_pattern`` — regex the object must fully match (NULL = any).

Reference analog: feedparser normalizes every input to ONE schema and
null-prefills missing fields (SURVEY §2 P-family); shape validation is the
KG-side dual — assert the normalized graph actually satisfies the schema
the consumers assume.

Scale design (100 TB triple table):
- the constraint set is a tiny literal dimension -> broadcast everywhere;
- cardinality checks are ONE groupBy (focus, pred) count over the triples
  whose pred appears in any constraint (pushed semi-filter), partial
  aggregation map-side;
- the focus-node universe for minCount is distinct(prefix-filtered
  subjects) UNION distinct(objects) — two column-pruned scans feeding one
  distinct, no Python anywhere;
- range / pattern checks are pure per-row projections (codegen) over the
  same pred-filtered scan; violations unioned at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSTRAINT_SCHEMA = (
    "target_prefix string, pred string, min_count long, max_count long, "
    "range_prefix string, obj_pattern string"
)

VIOLATION_COLS = ("focus", "pred", "code", "detail")


def shacl_validate(
    triples: DataFrame,
    constraints: list[dict],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    distinct_input: bool = False,
) -> DataFrame:
    """Validate ``triples`` against ``constraints`` (dicts with keys of
    CONSTRAINT_SCHEMA; missing keys = NULL = unconstrained).  Returns
    (focus, pred, code, detail) with code in {min_count, max_count,
    range, pattern}; detail is the observed count (as a string) for
    cardinality codes and the offending object for value codes.
    Deterministic: pure set semantics, no floats, no sampling.
    """
    if not constraints:
        raise ValueError("shacl_validate: empty constraint list")
    spark = triples.sparkSession
    rows = [
        (
            c["target_prefix"],
            c["pred"],
            c.get("min_count"),
            c.get("max_count"),
            c.get("range_prefix"),
            c.get("obj_pattern"),
        )
        for c in constraints
    ]
    dim = F.broadcast(spark.createDataFrame(rows, CONSTRAINT_SCHEMA))

    t = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    )
    preds = sorted({c["pred"] for c in constraints})
    rel = t.filter(F.col("pred").isin(preds))  # pushed to the scan

    # ---- focus-node universe per target prefix (for minCount-on-absent):
    # every entity of the prefix seen anywhere in the graph.  The prefix
    # filter lands BEFORE the distinct, so only cardinality-constrained
    # namespaces pay the dedupe shuffle.
    card_prefixes = sorted(
        {
            c["target_prefix"]
            for c in constraints
            if c.get("min_count") is not None or c.get("max_count") is not None
        }
    )
    # one scan (explode of the two entity positions), not a two-scan union
    entities = (
        t.select(F.explode(F.array("subj", "obj")).alias("focus"))
        .withColumn("target_prefix", F.substring("focus", 1, 1))
        .filter(F.col("target_prefix").isin(card_prefixes) if card_prefixes else F.lit(False))
        .distinct()
    )

    # ---- per-(focus, pred) assertion counts over constrained predicates
    counts = rel.groupBy(
        F.col("subj").alias("focus"), F.col("pred").alias("pred")
    ).agg(F.count(F.lit(1)).alias("cnt"))

    card_dim = dim.filter(
        F.col("min_count").isNotNull() | F.col("max_count").isNotNull()
    )
    # focus universe x cardinality constraints (both tiny-broadcast on the
    # dim side), left join observed counts, absent -> 0
    focus_card = (
        entities.join(card_dim, "target_prefix")
        .join(counts, ["focus", "pred"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    v_min = focus_card.filter(
        F.col("min_count").isNotNull() & (F.col("cnt") < F.col("min_count"))
    ).select(
        "focus", "pred", F.lit("min_count").alias("code"),
        F.col("cnt").cast("string").alias("detail"),
    )
    v_max = focus_card.filter(
        F.col("max_count").isNotNull() & (F.col("cnt") > F.col("max_count"))
    ).select(
        "focus", "pred", F.lit("max_count").alias("code"),
        F.col("cnt").cast("string").alias("detail"),
    )

    # ---- per-row value checks: the constraint list is driver-side and
    # tiny, so each range/pattern constraint becomes its own LITERAL
    # filter branch over the pred-filtered scan — regex patterns compile
    # once per constraint in codegen instead of per row (a column-valued
    # regexp_like pattern recompiles per row: measured 3x the whole
    # operator's cost at sf0.1), and Catalyst unions the branches into
    # one pass over the scan.
    value_parts = []
    for c in constraints:
        base = rel.filter(
            (F.col("pred") == c["pred"])
            & (F.substring("subj", 1, 1) == c["target_prefix"])
        )
        if c.get("range_prefix") is not None:
            value_parts.append(
                base.filter(
                    F.substring("obj", 1, 1) != F.lit(c["range_prefix"])
                ).select(
                    F.col("subj").alias("focus"), "pred",
                    F.lit("range").alias("code"), F.col("obj").alias("detail"),
                )
            )
        if c.get("obj_pattern") is not None:
            value_parts.append(
                base.filter(
                    ~F.col("obj").rlike(f"^(?:{c['obj_pattern']})$")
                ).select(
                    F.col("subj").alias("focus"), "pred",
                    F.lit("pattern").alias("code"), F.col("obj").alias("detail"),
                )
            )

    out = v_min.unionAll(v_max)
    for p in value_parts:
        out = out.unionAll(p)
    # when the input is already a set (distinct_input=True — a KG triple
    # STORE is one; the pipeline materializes distinct triples) every
    # violation row is provably unique: cardinality rows are one-per-
    # (focus, constraint) by construction and value rows map 1:1 to
    # distinct offending triples under per-(prefix,pred)-unique
    # constraints — so the output-sized dedupe shuffle can be skipped.
    return out if distinct_input else out.distinct()
