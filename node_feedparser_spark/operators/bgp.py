"""Basic-graph-pattern (BGP) matching over the KG triple shape — the
SPARQL-style conjunctive query capability for a built knowledge graph.

A pattern is a (subj, pred, obj) 3-tuple of TERMS; a term starting with
``?`` is a variable, anything else is a constant.  ``bgp_match`` returns
the DISTINCT variable bindings satisfying ALL patterns (SPARQL
``SELECT DISTINCT`` semantics over the conjunction).

Reference analog: the reference builds one normalized item model and lets
callers pick fields off it (lib/feedparser.js handleItem/handleMeta); a KG
engine's equivalent read surface is pattern matching over the normalized
triple store.  This belongs to the KG-construction mandate's query side —
a user who materialized edges with the pipeline needs a first-class way to
ask conjunctive questions of them.

Scale design (100 TB triple table):
- every pattern compiles to a FILTERED SCAN of the one triples table —
  constants (pred above all) are pushed into the parquet scan, so a
  pattern touching one predicate reads one predicate's row groups when the
  table is laid out by pred (the pipeline's bucketed layout sorts within
  partitions, and zorder_layout exists for exactly this).
- join ORDER is chosen greedily by static selectivity (most-constant
  pattern first, then always a pattern sharing >=1 variable with the bound
  set) so intermediate binding sets shrink as early as possible and no
  accidental cartesian product appears when a connected order exists.
- joins are plain equi-joins on the shared variable columns: Catalyst/AQE
  pick broadcast vs shuffle per side at runtime (a bound-constant pattern
  over a selective predicate is typically broadcast-sized).
- NO Python nodes, no windows — the whole plan is scans + joins +
  aggregate-free distinct, i.e. exactly the shape AQE optimizes best.
- SPARQL FILTER NOT EXISTS compiles to an ANTI join over the DISTINCT
  projection of the clause's shared variables (the smallest possible right
  side), and OPTIONAL to a LEFT OUTER join — both run after the required
  conjunction so the anti join shrinks bindings before optional widens
  them, and both stay broadcastable whenever the clause's predicate is
  selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _var(term: str) -> str:
    return term[1:]


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    not_exists: list[tuple[str, str, str]] | None = None,
    optional: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Match a conjunction of triple patterns; return one row per DISTINCT
    binding of all variables (columns = variable names without ``?``,
    sorted for a stable schema).

    ``not_exists`` patterns are SPARQL ``FILTER NOT EXISTS`` clauses: each
    compiles to one ANTI join on its variables shared with the required
    conjunction (constants filtered first), removing bindings for which a
    matching triple exists.  ``optional`` patterns are SPARQL ``OPTIONAL``
    clauses (one pattern per clause): each compiles to one LEFT OUTER join
    on the shared variables, extending bindings with possibly-NULL new
    variables; multiple matches multiply bindings — SPARQL's per-solution
    semantics.  Evaluation order is documented and fixed: required
    conjunction, then NOT EXISTS filters (shrink before widening), then
    OPTIONAL extensions, then DISTINCT.  Both clause kinds must share at
    least one variable with the required conjunction — an unconstrained
    clause is a semantic error, not a cross join.

    Constraints enforced up front (clear errors beat silent wrong plans):
    - every pattern must contain at least one variable (a fully ground
      pattern is an EXISTS assertion, not a binding producer — lift it
      into a filter on the caller side);
    - at least one required pattern; terms must be non-empty strings.

    A repeated variable WITHIN a pattern (e.g. ``(?x, likes, ?x)``)
    compiles to an intra-row equality filter.  If the pattern graph is
    disconnected, the (documented) cross join between components is
    explicit in the plan — the greedy order only falls back to it when no
    unused pattern shares a variable with the bound set.
    """
    if not patterns:
        raise ValueError("bgp_match: empty pattern list")
    for t in list(patterns) + list(not_exists or []) + list(optional or []):
        if len(t) != 3 or not all(isinstance(x, str) and x for x in t):
            raise ValueError(f"bgp_match: malformed pattern {t!r}")
        if not any(_is_var(x) for x in t):
            raise ValueError(
                f"bgp_match: fully ground pattern {t!r} — lift EXISTS "
                "assertions into a caller-side filter"
            )

    base = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj")
    )

    def compile_pattern(p: tuple[str, str, str]) -> tuple[DataFrame, set[str]]:
        df = base
        # constants -> pushed filters
        for col, term in zip(_POS, p):
            if not _is_var(term):
                df = df.filter(F.col(col) == F.lit(term))
        # intra-pattern repeated variables -> equality filters
        seen: dict[str, str] = {}
        for col, term in zip(_POS, p):
            if _is_var(term):
                v = _var(term)
                if v in seen:
                    df = df.filter(F.col(col) == F.col(seen[v]))
                else:
                    seen[v] = col
        proj = [F.col(c).alias(v) for v, c in seen.items()]
        return df.select(*proj), set(seen)

    n_const = [sum(0 if _is_var(t) else 1 for t in p) for p in patterns]
    order: list[int] = []
    remaining = list(range(len(patterns)))
    # seed: most constants, ties by position (deterministic plan)
    seed = max(remaining, key=lambda i: (n_const[i], -i))
    order.append(seed)
    remaining.remove(seed)
    compiled = [compile_pattern(p) for p in patterns]
    bound: set[str] = set(compiled[seed][1])
    while remaining:
        connected = [i for i in remaining if compiled[i][1] & bound]
        pick_from = connected if connected else remaining
        nxt = max(pick_from, key=lambda i: (n_const[i], -i))
        order.append(nxt)
        remaining.remove(nxt)
        bound |= compiled[nxt][1]

    acc, acc_vars = compiled[order[0]]
    for i in order[1:]:
        df, vs = compiled[i]
        shared = sorted(acc_vars & vs)
        acc = acc.join(df, on=shared) if shared else acc.crossJoin(df)
        acc_vars |= vs

    for p in not_exists or []:
        df, vs = compile_pattern(p)
        shared = sorted(acc_vars & vs)
        if not shared:
            raise ValueError(
                f"bgp_match: NOT EXISTS pattern {p!r} shares no variable "
                "with the required conjunction"
            )
        acc = acc.join(df.select(*shared).distinct(), on=shared, how="anti")

    for p in optional or []:
        df, vs = compile_pattern(p)
        shared = sorted(acc_vars & vs)
        if not shared:
            raise ValueError(
                f"bgp_match: OPTIONAL pattern {p!r} shares no variable "
                "with the required conjunction"
            )
        acc = acc.join(df, on=shared, how="left")
        acc_vars |= vs

    return acc.select(*sorted(acc_vars)).distinct()
