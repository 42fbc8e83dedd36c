"""F13 — true XHTML subtree re-serialization as a bottom-up tree fold.

The reference rebuilds the markup of an ``type="xhtml"`` content subtree
while the sax stream walks it (/root/reference/lib/feedparser.js):

- open tag: ``'<' + name`` then one `` name="value"`` per attribute in
  insertion order, raw (unescaped) values, then ``'>'``
  (lib/feedparser.js:198-204);
- text nodes: appended verbatim, no escaping (lib/feedparser.js:401-402);
- close tag: ``'</' + name + '>'`` (lib/feedparser.js:318);
- the container element finally receives the **trimmed** concatenation of
  its children's serializations (``n['#'] += this.xhtml['#'].trim()``,
  lib/feedparser.js:308).

The reference can do this as a streaming walk because one sax parser owns
one document.  The Spark-native shape is a flat **node table** — one row
per element or text node —

    (doc_id, node_id, parent_id, pos, depth, kind, name, attrs, text)

where ``pos`` orders siblings (text and element nodes interleave, unique
within one parent), ``depth`` is the distance from the container (its
direct children are depth 0), ``kind`` is ``'elem'`` or ``'text'`` and
``attrs`` is an ``array<struct<k,v>>`` (an array, not a map: the reference
emits attributes in insertion order and a map would lose it).

``serialize_subtrees`` folds that table bottom-up: serialize the deepest
level, aggregate each level's strings onto their parents (one hash
aggregation keyed on ``(doc_id, parent_id)``), splice them into the
parent's ``<open>children</close>``, repeat.  Everything is JVM-side
codegen (``concat`` / ``aggregate`` / ``sort_array``); the only driver
value is the max-depth scalar.

At 100 TB: the loop runs ``max_depth + 1`` times — bounded by markup
nesting (tens), not data size — and each iteration shuffles only the rows
of one tree level, keyed by ``(doc_id, parent_id)``, so the work is a
handful of partial/final aggs over disjoint row sets.  No collect, no
window over the corpus, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def _open_tag(name: Column, attrs: Column) -> Column:
    """``<name k1="v1" k2="v2">`` — attrs in array (= insertion) order,
    values raw, exactly lib/feedparser.js:200-204."""
    rendered = F.aggregate(
        F.coalesce(attrs, F.array()),
        F.lit(""),
        lambda acc, a: F.concat(
            acc, F.lit(" "), a["k"], F.lit('="'), a["v"], F.lit('"')
        ),
    )
    return F.concat(F.lit("<"), name, rendered, F.lit(">"))


def _render(level: DataFrame, child_str: Column) -> Column:
    """One node's serialization given the concatenation of its already-
    serialized children (empty string for leaves)."""
    elem = F.concat(
        _open_tag(F.col("name"), F.col("attrs")),
        child_str,
        F.concat(F.lit("</"), F.col("name"), F.lit(">")),
    )
    return F.when(F.col("kind") == "text", F.coalesce(F.col("text"), F.lit(""))).otherwise(elem)


def serialize_subtrees(nodes: DataFrame) -> DataFrame:
    """Bottom-up re-serialization of every node in a flat tree table.

    Input columns: ``doc_id, node_id, parent_id, pos, depth, kind, name,
    attrs (array<struct<k,v>>), text`` — see the module docstring for the
    contract (``pos`` unique among siblings, ``depth`` = parent depth + 1,
    container's direct children at depth 0 with ``parent_id`` NULL).

    Returns one row per depth-0 node: ``(doc_id, pos, ser)`` where ``ser``
    is the full markup of that subtree.  Feed the result to
    :func:`container_inner` for the reference's container-level value.
    """
    # cache the node table: every level of the fold filters it, and the
    # max-depth probe below materializes the cache — without this the
    # final plan re-embeds (and re-computes) the full upstream node
    # derivation once per level, O(depth^2) source scans (the
    # operators/components.py lineage discipline)
    nodes = nodes.cache()
    # One scalar to the driver: tree height, bounded by markup nesting.
    max_depth = nodes.agg(F.max("depth")).first()[0]
    if max_depth is None:
        empty = nodes.select(
            "doc_id", "pos", F.lit("").alias("ser")
        ).limit(0).localCheckpoint()
        nodes.unpersist()
        return empty

    acc: DataFrame | None = None  # serialized rows of depth d+1
    for d in range(int(max_depth), -1, -1):
        level = nodes.filter(F.col("depth") == d)
        if acc is None:
            child = F.lit("")
        else:
            kids = (
                acc.groupBy(
                    F.col("doc_id").alias("_did"), F.col("parent_id").alias("_pid")
                )
                .agg(
                    F.aggregate(
                        F.sort_array(F.collect_list(F.struct("pos", "ser"))),
                        F.lit(""),
                        lambda a, s: F.concat(a, s["ser"]),
                    ).alias("child_str")
                )
            )
            level = level.join(
                kids,
                (F.col("node_id") == F.col("_pid"))
                & (F.col("doc_id") == F.col("_did")),
                "left",
            ).drop("_did", "_pid")
            child = F.coalesce(F.col("child_str"), F.lit(""))
        acc = level.select(
            "doc_id",
            "parent_id",
            "pos",
            _render(level, child).alias("ser"),
        )
        if d > 0:
            # truncate the per-level lineage: each level otherwise nests
            # the whole plan of the level below it (plan depth = tree
            # depth, analysis cost quadratic) — same per-iteration cut as
            # graph_algo.pagerank / khop
            acc = acc.localCheckpoint(eager=False)
    # EAGER final checkpoint: the result (depth-0 rows only) materializes
    # here, cutting every reference to the cached node table so the cache
    # can be released before returning — a long-lived session calling this
    # repeatedly must not accumulate pinned copies of node tables
    result = acc.select("doc_id", "pos", "ser").localCheckpoint()
    nodes.unpersist()
    return result


def container_inner(roots: DataFrame) -> DataFrame:
    """Reference container semantics (lib/feedparser.js:308): the xhtml
    container's value is the TRIMMED concatenation of its children's
    serializations in document order.  One hash agg keyed on doc_id."""
    return roots.groupBy("doc_id").agg(
        F.btrim(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "ser"))),
                F.lit(""),
                lambda a, s: F.concat(a, s["ser"]),
            ),
            F.lit(" \t\n\r"),
        ).alias("serialized")
    )
