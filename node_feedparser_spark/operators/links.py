"""F17 — Atom link `rel` dispatch with exploded-link reassembly.

The reference walks every <link> element of an item in document order and
routes it by its `rel` attribute into the item's output fields
(/root/reference/lib/feedparser.js:891-940; test/link.js:5-16):

- ``rel="canonical"`` -> ``origlink``   (assignment overwrites: LAST wins)
- ``rel="alternate"`` -> ``link``       (assignment overwrites: LAST wins)
- ``rel="self"``      -> ``link`` only if ``link`` is still unset at that
  point in document order -> FIRST self wins, and any alternate anywhere
  in the document beats every self (the unconditional alternate assignment
  overwrites a self that arrived earlier, and a self that arrives later
  sees ``link`` already set and is skipped)
- ``rel="replies"``   -> ``comments``   (LAST wins)
- ``rel="enclosure"`` -> appended to ``enclosures`` in document order,
  deduped by ``(url, type)`` keeping the FIRST occurrence
  (`indexOfObject(item.enclosures, enclosure, ['url','type'])`,
  lib/feedparser.js:905-908).

Spark-first plan: ONE hash aggregation (partial/final, map-side combined) —
no window functions, no second shuffle.  Last/first-wins scalars are
conditional ``max``/``min`` over ``struct(order..., href)`` (struct
comparison is lexicographic, so the order columns decide and the unique
tiebreaker makes it deterministic).  The document-order deduped enclosure
list is ``collect_list`` -> ``sort_array`` -> a JVM ``aggregate`` fold that
appends a pair only if it is not already present — all whole-stage-codegen
eligible except the fold, which is still JVM-side (no Python).

At 100 TB: the shuffle carries one partially-aggregated row per item (a few
scalars + the enclosure array, bounded by enclosures-per-item), not one row
per link — the same shape as a TPC-H Q1 agg, and AQE handles hot items.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def _ordered(order_cols: Sequence[str], payload: Column) -> Column:
    return F.struct(*[F.col(c) for c in order_cols], payload.alias("v"))


def reassemble_links(
    links: DataFrame,
    item_col: str = "item_id",
    rel_col: str = "rel",
    href_col: str = "href",
    type_col: str = "type",
    order_cols: Sequence[str] = ("ts", "link_id"),
) -> DataFrame:
    """One row per item: (item, origlink, link, comments, enclosures).

    ``enclosures`` is a document-order, (url,type)-deduped-keep-first,
    comma-joined list of ``url|type`` pairs (NULL when the item has none).
    ``order_cols`` must end in a unique column for determinism.
    """
    rel = F.col(rel_col)
    href = F.col(href_col)

    def last_of(rel_value: str) -> Column:
        return F.max(F.when(rel == rel_value, _ordered(order_cols, href)))["v"]

    def first_of(rel_value: str) -> Column:
        return F.min(F.when(rel == rel_value, _ordered(order_cols, href)))["v"]

    # Dedupe on the FIELD TUPLE (href, type), not a serialized string: the
    # reference compares indexOfObject(..., ['url','type']) on the object —
    # an href containing '|' must not alias a different pair, and a NULL
    # type must not collide with a non-null one (concat_ws drops nulls).
    pair = F.struct(href.alias("href"), F.col(type_col).alias("type"))
    enclosures_sorted = F.sort_array(
        F.collect_list(F.when(rel == "enclosure", _ordered(order_cols, pair)))
    )
    # Fold in document order, appending a pair only on first sight — the
    # reference's indexOfObject(..., ['url','type']) === -1 check.
    # eqNullSafe: a NULL type matches only another NULL type.
    enclosures_dedup = F.aggregate(
        enclosures_sorted,
        F.expr("cast(array() as array<struct<href:string,type:string>>)"),
        lambda acc, x: F.when(
            F.exists(acc, lambda e: e.eqNullSafe(x["v"])), acc
        ).otherwise(F.concat(acc, F.array(x["v"]))),
    )
    # serialize to 'url|type' only AT THE END (output contract unchanged:
    # a NULL type serializes to the bare href, as concat_ws did)
    enclosures_dedup = F.transform(
        enclosures_dedup,
        lambda e: F.when(e["type"].isNull(), e["href"]).otherwise(
            F.concat(e["href"], F.lit("|"), e["type"])
        ),
    )

    return links.groupBy(F.col(item_col)).agg(
        last_of("canonical").alias("origlink"),
        F.coalesce(last_of("alternate"), first_of("self")).alias("link"),
        last_of("replies").alias("comments"),
        F.when(F.size(enclosures_dedup) > 0, F.array_join(enclosures_dedup, ",")).alias(
            "enclosures"
        ),
    )


def infer_link_from_guid(link: Column, guid: Column, guidlink: bool = True) -> Column:
    """F14 guid->link inference, gated by the reference's `guidlink` option
    (default true; /root/reference/lib/feedparser.js:80,1172;
    test/link.js:80 'should not infer item link from guid when guidlink is
    false'): only when the link is missing, only when the option is on, and
    only when the guid looks like an http(s) URL."""
    if not guidlink:
        return link
    return F.coalesce(link, F.when(guid.rlike("^https?:"), guid))
