"""SPARQL 1.1 property-path evaluation over the KG triple shape — the
path-query companion to :mod:`operators/bgp` (conjunctions) for a built
knowledge graph.

A path expression is a nested-tuple AST:

- ``("pred", p)``       — one forward step over predicate ``p``
- ``("inv", e)``        — SPARQL ``^e`` (swap src/dst)
- ``("seq", e1, e2, …)`` — SPARQL ``e1/e2/…`` (composition)
- ``("alt", e1, e2, …)`` — SPARQL ``e1|e2|…`` (union)
- ``("upto", e, k)``    — bounded repetition ``e{1,k}`` (1..k steps)
- ``("plus", e)``       — SPARQL ``e+`` (transitive closure, fixpoint)
- ``("star", e)``       — SPARQL ``e*`` (``e+`` ∪ zero-length paths)

``eval_path`` returns the DISTINCT ``(src, dst)`` endpoint pairs connected
by the path — SPARQL set semantics (the engine-useful contract: sequence
paths in bag semantics multiply duplicates without bound; SPARQL itself
mandates set semantics for ``+``/``*``).  ``plus`` runs the semi-naive
datalog fixpoint: each round composes only the DELTA (pairs discovered
last round) with the base step and anti-joins the accumulated closure, so
per-round work is proportional to NEW pairs, never closure × closure —
the evaluation strategy that survives a 100 TB edge set with a small
diameter.  Rounds reference the prior delta/accumulator more than once,
so both are lazily localCheckpoint-ed per round (the khop/kcore lineage
lesson).  ``star`` adds the zero-length paths: per SPARQL, one ``(t, t)``
row for EVERY term of the graph (all subjects and objects), which is a
deliberate, documented corpus-sized union.

Reference analog: the reference resolves a CHAIN of fallbacks across the
normalized model (e.g. guid→link inference walks alternative fields,
lib/feedparser.js:939-1010); the KG read-side generalization of
"follow this chain of relations, whichever branch exists" is exactly an
alternation/sequence property path.

Scale design (100 TB triple table):
- a ``("pred", p)`` leaf compiles to ``filter(pred = lit)`` directly over
  the triples relation — against a parquet triple store the literal is
  PUSHED into the scan; against a union-of-projections view Catalyst
  constant-folds the filter per branch and prunes non-matching branches
  to empty relations (asserted by test), so each leaf reads only its own
  predicate's rows either way.
- every binary composition is one equi-join (dst = src) followed by an
  endpoint-pair ``distinct``: intermediates never exceed the reachability
  relation itself, the dedupe is map-side-combinable, and join strategy
  (broadcast vs shuffle per side) is left to AQE — a selective predicate
  leaf is typically broadcast-sized.
- ``upto`` unrolls to k-1 delta joins over the SAME compiled leaf, so the
  plan is static, oracle-replayable SQL — no driver-side iteration state.
- NO Python nodes anywhere: scans + joins + distinct only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = ("pred", "inv", "seq", "alt", "upto", "plus", "star")


def _validate(expr) -> None:
    if not isinstance(expr, tuple) or not expr or expr[0] not in _OPS:
        raise ValueError(f"path_query: malformed path expression {expr!r}")
    op = expr[0]
    if op == "pred":
        if len(expr) != 2 or not isinstance(expr[1], str) or not expr[1]:
            raise ValueError(f"path_query: malformed pred leaf {expr!r}")
    elif op == "inv":
        if len(expr) != 2:
            raise ValueError(f"path_query: inv takes one operand {expr!r}")
        _validate(expr[1])
    elif op in ("seq", "alt"):
        if len(expr) < 3:
            raise ValueError(f"path_query: {op} needs >=2 operands {expr!r}")
        for sub in expr[1:]:
            _validate(sub)
    elif op == "upto":
        if len(expr) != 3 or not isinstance(expr[2], int) or expr[2] < 1:
            raise ValueError(
                f"path_query: upto needs (expr, k>=1), got {expr!r}"
            )
        _validate(expr[1])
    elif op in ("plus", "star"):
        if len(expr) != 2:
            raise ValueError(f"path_query: {op} takes one operand {expr!r}")
        _validate(expr[1])


def _seq2(a: DataFrame, b: DataFrame) -> DataFrame:
    left, right = a.alias("l"), b.alias("r")
    return (
        left.join(right, F.col("l.dst") == F.col("r.src"))
        .select(F.col("l.src").alias("src"), F.col("r.dst").alias("dst"))
        .distinct()
    )


def eval_path(
    triples: DataFrame,
    expr,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    max_iters: int = 30,
) -> DataFrame:
    """Evaluate a property-path AST over ``triples``; returns the distinct
    ``(src, dst)`` endpoint pairs.  Input need not be deduplicated — every
    composition re-establishes set semantics.  ``plus``/``star`` evaluate
    a semi-naive fixpoint ON THE DRIVER LOOP (each round is one delta
    compose + anti join; ``max_iters`` bounds the graph diameter and a
    longer chain raises rather than silently truncating)."""
    _validate(expr)
    base = triples.select(
        F.col(subj).alias("src"), F.col(pred).alias("pred"), F.col(obj).alias("dst")
    )

    def compile_expr(e) -> DataFrame:
        op = e[0]
        if op == "pred":
            return base.filter(F.col("pred") == F.lit(e[1])).select("src", "dst")
        if op == "inv":
            inner = compile_expr(e[1])
            return inner.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        if op == "seq":
            acc = compile_expr(e[1])
            for sub in e[2:]:
                acc = _seq2(acc, compile_expr(sub))
            return acc
        if op == "alt":
            parts = [compile_expr(sub) for sub in e[1:]]
            acc = parts[0]
            for p in parts[1:]:
                acc = acc.unionByName(p)
            return acc.distinct()
        if op in ("plus", "star"):
            # semi-naive transitive closure: compose only the delta, anti
            # join the accumulated closure — per-round cost ∝ new pairs
            step = compile_expr(e[1]).distinct().localCheckpoint(eager=False)
            acc, delta = step, step
            for _ in range(max_iters):
                delta = (
                    _seq2(delta, step)
                    .join(acc, on=["src", "dst"], how="anti")
                    .localCheckpoint(eager=False)
                )
                if delta.isEmpty():
                    break
                # acc and delta are disjoint by the anti join — no distinct
                acc = acc.unionByName(delta).localCheckpoint(eager=False)
            else:
                raise RuntimeError(
                    f"path_query: {op} did not converge within "
                    f"max_iters={max_iters} rounds — raise max_iters for "
                    "deeper graphs"
                )
            if op == "star":
                # SPARQL zero-length paths: one (t, t) per term of the
                # graph — a documented corpus-sized union
                terms = base.select("src").unionByName(
                    base.select(F.col("dst").alias("src"))
                ).distinct()
                acc = acc.unionByName(
                    terms.select("src", F.col("src").alias("dst"))
                ).distinct()
            return acc
        # upto: alternation of powers 1..k of one compiled sub-plan
        step = compile_expr(e[1])
        k = e[2]
        powers, cur = [step], step
        for _ in range(k - 1):
            cur = _seq2(cur, step)
            powers.append(cur)
        acc = powers[0]
        for p in powers[1:]:
            acc = acc.unionByName(p)
        return acc.distinct()

    def already_set(e) -> bool:
        # seq/alt/upto/plus/star end deduped; a pred leaf (or inv chains
        # down to one) is a plain projection of possibly-duplicated input
        return e[0] != "pred" and (e[0] != "inv" or already_set(e[1]))

    out = compile_expr(expr)
    return out if already_set(expr) else out.distinct()
