"""N-Triples export — the KG's standard-format exit door.

A knowledge graph that can only be read back by this pipeline is a silo:
the W3C N-Triples line format (one `<s> <p> "o" .` statement per line,
RDF 1.1 N-Triples spec) is the lowest-common-denominator interchange
every triple store ingests.  This module serializes the pipeline's
(subj, pred, obj) rows to spec-escaped lines ENTIRELY with JVM string
builtins (chained literal replaces — no regex engine, no Python), so the
export is one codegen projection over the triples table and the DuckDB
oracle reproduces it byte-for-byte with the same REPLACE chain.

Escaping (the spec's ECHAR/UCHAR discipline, minimal deterministic
profile):

- literals: backslash FIRST, then double-quote, LF, CR, TAB — the five
  escapes N-Triples requires inside STRING_LITERAL_QUOTE;
- IRI local names: the characters N-Triples forbids inside IRIREF
  (space, angle brackets, quote, braces, pipe, caret, backtick,
  backslash) percent-encoded, backslash/percent first so the encoding
  is unambiguous and reversible.

Reference analog: the reference re-serializes parsed XHTML subtrees back
to markup text (`lib/feedparser.js:304-320`, the F13 row) — the same
"structured value back to wire format" contract, applied to the KG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (search, replace) pairs, order significant: the escape char itself first
_LITERAL_ESCAPES = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]
_IRI_ESCAPES = [
    ("%", "%25"),
    ("\\", "%5C"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
]


def _chain(col: Column, pairs) -> Column:
    for s, r in pairs:
        col = F.replace(col, F.lit(s), F.lit(r))
    return col


def escape_literal(col: Column) -> Column:
    """Spec escaping for STRING_LITERAL_QUOTE content."""
    return _chain(col, _LITERAL_ESCAPES)


def escape_iri_component(col: Column) -> Column:
    """Percent-encode the characters IRIREF forbids (reversible:
    '%' encodes first)."""
    return _chain(col, _IRI_ESCAPES)


def to_ntriples(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    entity_ns: str = "urn:kg:e:",
    pred_ns: str = "urn:kg:p:",
) -> DataFrame:
    """Serialize (subj, pred, obj) rows to N-Triples lines: subject and
    predicate become IRIs under the given namespaces, the object a
    quoted literal.  One codegen projection; returns a single-column
    (line) DataFrame ready for ``df.write.text`` — line order is
    whatever the partitions emit, as the format intends (N-Triples is
    order-insensitive by spec: a document is a SET of statements).

    NULL objects are serialized as the empty literal ``""`` (the
    pipeline's triples table never carries NULL subj/pred).
    """
    return triples.select(
        F.concat(
            F.lit("<" + entity_ns),
            escape_iri_component(F.col(subj_col).cast("string")),
            F.lit("> <" + pred_ns),
            escape_iri_component(F.col(pred_col).cast("string")),
            F.lit('> "'),
            escape_literal(
                F.coalesce(F.col(obj_col).cast("string"), F.lit(""))
            ),
            F.lit('" .'),
        ).alias("line")
    )
