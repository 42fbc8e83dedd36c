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


def reassemble_meta_links(
    elements: DataFrame,
    meta_col: str = "meta_id",
    kind_col: str = "kind",
    rel_col: str = "rel",
    href_col: str = "href",
    attr_cols: Sequence[str] = (
        "domain",
        "port",
        "path",
        "register_procedure",
        "protocol",
    ),
    order_cols: Sequence[str] = ("ts", "el_id"),
) -> DataFrame:
    """F17 meta side — feed-level link `rel` dispatch plus the
    PubSubHubbub hub-link / rssCloud `<cloud>` element merge the item-side
    ``reassemble_links`` doesn't cover (/root/reference/lib/feedparser.js
    :498 ``meta.cloud = {}``, :550-552 & :584-586 ``rel=hub`` guarded by
    ``!(meta.cloud.href || meta.cloud.domain)``, :621-626 the `<cloud>`
    element resets ``meta.cloud`` and copies the FIRST element's
    attributes — "rssCloud wins"; exercised by the reference's
    intertwingly.atom fixture carrying ``<link rel="hub">``).

    Input: one row per feed-level element, ``kind_col`` in
    {'link', 'cloud'}; link rows carry ``rel``/``href``, cloud rows carry
    the rssCloud attributes (``attr_cols``; ``href_col`` doubles as the
    cloud element's own href attribute when present).  ``attr_cols`` must
    include ``domain`` — it is half of the reference's hub guard.
    ``order_cols`` define document order and must end in a unique column.

    Document-order fold semantics (the reference's state machine):

    - ``rel=alternate`` -> ``link``, FIRST wins (``if (!meta.link)`` —
      the meta side is first-wins where the item side is last-wins);
    - ``rel=self`` -> ``xmlurl``, LAST wins (unconditional assignment);
    - ``rel=hub`` -> cloud {type: 'hub', href}, first hub wins, BLOCKED
      once the cloud state carries an href or domain;
    - the first `<cloud>` element REPLACES the cloud state with its
      attributes at its document position (later cloud elements are
      ignored — "there can be only one"); a hub link AFTER it merges
      type/href on top only if the element carried neither href nor
      domain.  A feed with neither hubs nor cloud elements gets an
      all-null cloud (the reference's ``{}``).

    Spark-first plan: ONE hash aggregation on the feed key (partial/final,
    map-side combined) — first/last-wins scalars as conditional min/max
    over ``struct(order..., href)``, the first cloud element as a
    conditional min over ``struct(order..., attrs)``, and the hub
    candidates as a sorted ``collect_list`` (bounded: hubs per feed)
    resolved against the cloud position with JVM array ops in the
    post-aggregation projection.  No windows, no second shuffle; at scale
    the shuffle carries one partially-aggregated row per feed.
    """
    if "domain" not in attr_cols:
        raise ValueError("attr_cols must include 'domain' (the hub guard)")
    kind = F.col(kind_col)
    rel = F.col(rel_col)
    href = F.col(href_col)
    # rel dispatch requires an href: the reference enters the rel branch
    # only under `if (el['@']['href'])` (lib/feedparser.js:539,578) — a
    # link element without one must not occupy a first/last-wins slot or
    # block a later real hub (and the DuckDB oracle's arg_min/arg_max
    # skip NULLs, so this is also what the oracle computes).
    is_link = (kind == "link") & href.isNotNull()
    is_cloud = kind == "cloud"
    ordc = [F.col(c) for c in order_cols]
    attrs = F.struct(
        href.alias("href"), *[F.col(c).alias(c) for c in attr_cols]
    )

    agg = elements.groupBy(F.col(meta_col)).agg(
        F.min(F.when(is_link & (rel == "alternate"), _ordered(order_cols, href)))[
            "v"
        ].alias("link"),
        F.max(F.when(is_link & (rel == "self"), _ordered(order_cols, href)))[
            "v"
        ].alias("xmlurl"),
        F.min(F.when(is_cloud, F.struct(*ordc, attrs.alias("a")))).alias("c0"),
        F.sort_array(
            F.collect_list(
                F.when(is_link & (rel == "hub"), F.struct(*ordc, href.alias("href")))
            )
        ).alias("hubs"),
    )

    c0 = F.col("c0")
    base = c0["a"]
    c0_pos = F.struct(*[c0[c].alias(c) for c in order_cols])

    def _pos(h: Column) -> Column:
        return F.struct(*[h[c].alias(c) for c in order_cols])

    # try_element_at: ANSI mode (Spark 4 default) throws on index-past-end;
    # an empty hub list must read as NULL, not error
    first_hub = F.try_element_at(F.col("hubs"), F.lit(1))
    hub_after_cloud = F.try_element_at(
        F.filter(F.col("hubs"), lambda h: _pos(h) > c0_pos), F.lit(1)
    )
    # the reference's guard: a hub applies only while cloud has neither
    # href nor domain; with no cloud element the first hub wins outright
    hub = F.when(c0.isNull(), first_hub).when(
        base["href"].isNull() & base["domain"].isNull(), hub_after_cloud
    )
    hub_href = hub["href"]

    return agg.select(
        F.col(meta_col),
        F.col("link"),
        F.col("xmlurl"),
        F.when(hub_href.isNotNull(), F.lit("hub")).alias("cloud_type"),
        F.coalesce(base["href"], hub_href).alias("cloud_href"),
        *[base[c].alias(f"cloud_{c}") for c in attr_cols],
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
