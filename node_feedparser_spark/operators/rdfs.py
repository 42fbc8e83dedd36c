"""RDFS entailment materialization over the KG triple shape — the
ontology-reasoning stage of a knowledge-graph pipeline: given instance
triples and a (tiny) schema of ``subclass_of`` / ``subprop_of`` /
``domain`` / ``range`` assertions, materialize every triple the RDFS
rules entail (rdfs2/3/5/7/9/11 in W3C numbering):

- rdfs5/7  subproperty transitivity + inheritance:
           p ⊑ q  ∧ (x p y)  ⇒ (x q y)
- rdfs11/9 subclass transitivity + type lifting:
           c ⊑ d  ∧ (x type c) ⇒ (x type d)
- rdfs2    (p domain c) ∧ (x p y) ⇒ (x type c)
- rdfs3    (p range  c) ∧ (x p y) ⇒ (y type c)

Scale design (the whole point): the SCHEMA is dimension-sized — hundreds
of classes/properties, never corpus-sized — so its transitive closures are
computed in pure Python ON THE DRIVER and shipped as broadcast literal
dimensions.  Because the closures are pre-saturated (effective domains /
ranges are closed over BOTH superproperties and superclasses), instance
inference reaches the RDFS fixpoint in ONE pass over the big table: four
broadcast joins + union + distinct.  No iteration ever touches the
corpus, so the plan is identical at 10^8 and 10^12 triples; the only
corpus-scale costs are the scan and the output-sized distinct.

Reference analog: feedparser normalizes every dialect to one canonical
schema by applying a fixed rule table (SURVEY §2 P/A families); RDFS
materialization is the same discipline one level up — a fixed entailment
rule table saturating the normalized graph.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCHEMA_PREDS = ("subclass_of", "subprop_of", "domain", "range")


def _transitive(pairs: list[tuple[str, str]]) -> set[tuple[str, str]]:
    """Strict transitive closure of a tiny edge list (driver-side; cycles
    are fine — each (a, b) with b reachable from a is emitted once)."""
    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
    out: set[tuple[str, str]] = set()
    for a in adj:
        seen: set[str] = set()
        stack = list(adj[a])
        while stack:
            b = stack.pop()
            if b in seen:
                continue
            seen.add(b)
            out.add((a, b))
            stack.extend(adj.get(b, ()))
    return out


def _saturate_schema(schema: list[tuple[str, str, str]]):
    """Driver-side saturation: strict sub-property / sub-class closures and
    the EFFECTIVE domain/range maps (closed over superproperties and
    superclasses), so instance inference is single-pass."""
    sp_edges = [(s, o) for s, p, o in schema if p == "subprop_of"]
    sc_edges = [(s, o) for s, p, o in schema if p == "subclass_of"]
    dom = [(s, o) for s, p, o in schema if p == "domain"]
    rng = [(s, o) for s, p, o in schema if p == "range"]
    bad = [p for _, p, _ in schema if p not in SCHEMA_PREDS]
    if bad:
        raise ValueError(f"rdfs: unknown schema predicates {sorted(set(bad))}")

    sp = _transitive(sp_edges)
    sc = _transitive(sc_edges)
    props = {a for a, _ in sp_edges} | {b for _, b in sp_edges}
    props |= {p for p, _ in dom} | {p for p, _ in rng}
    classes = {a for a, _ in sc_edges} | {b for _, b in sc_edges}
    classes |= {c for _, c in dom} | {c for _, c in rng}
    sp_refl = sp | {(p, p) for p in props}
    sc_refl = sc | {(c, c) for c in classes}

    def _effective(direct: list[tuple[str, str]]) -> set[tuple[str, str]]:
        by_prop: dict[str, set[str]] = defaultdict(set)
        for p, c in direct:
            by_prop[p].add(c)
        out: set[tuple[str, str]] = set()
        for p, q in sp_refl:
            for c in by_prop.get(q, ()):
                for cc, d in sc_refl:
                    if cc == c:
                        out.add((p, d))
        return out

    return sp, sc, _effective(dom), _effective(rng)


def rdfs_closure(
    triples: DataFrame,
    schema: list[tuple[str, str, str]],
    type_pred: str = "type",
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Full RDFS entailment: asserted ∪ inferred triples, distinct."""
    t = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    )
    return t.unionAll(
        _inferred_raw(t, schema, type_pred)
    ).distinct()


def rdfs_inferred(
    triples: DataFrame,
    schema: list[tuple[str, str, str]],
    type_pred: str = "type",
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Only the NEW entailments: RDFS closure minus asserted triples (set
    semantics on both sides, like SPARQL CONSTRUCT of fresh facts)."""
    t = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    )
    return _inferred_raw(t, schema, type_pred).subtract(t)


def _inferred_raw(
    t: DataFrame, schema: list[tuple[str, str, str]], type_pred: str
) -> DataFrame:
    spark = t.sparkSession
    sp, sc, dom_eff, rng_eff = _saturate_schema(schema)
    shape = "p string, c string"

    def _dim(pairs: set[tuple[str, str]]) -> DataFrame | None:
        if not pairs:
            return None
        return F.broadcast(spark.createDataFrame(sorted(pairs), shape))

    parts: list[DataFrame] = []
    d = _dim(sp)  # rdfs7: property inheritance through the strict closure
    if d is not None:
        parts.append(
            t.join(d, t["pred"] == d["p"]).select(
                "subj", F.col("c").alias("pred"), "obj"
            )
        )
    d = _dim(dom_eff)  # rdfs2 (+5/9 via saturation)
    if d is not None:
        parts.append(
            t.join(d, t["pred"] == d["p"]).select(
                "subj", F.lit(type_pred).alias("pred"), F.col("c").alias("obj")
            )
        )
    d = _dim(rng_eff)  # rdfs3 (+5/9 via saturation)
    if d is not None:
        parts.append(
            t.join(d, t["pred"] == d["p"]).select(
                F.col("obj").alias("subj"),
                F.lit(type_pred).alias("pred"),
                F.col("c").alias("obj"),
            )
        )
    d = _dim(sc)  # rdfs9: lift asserted types through the strict closure
    if d is not None:
        typed = t.filter(F.col("pred") == type_pred)
        parts.append(
            typed.join(d, typed["obj"] == d["p"]).select(
                "subj", F.lit(type_pred).alias("pred"), F.col("c").alias("obj")
            )
        )
    if not parts:
        raise ValueError("rdfs: schema entails nothing (no usable assertions)")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
