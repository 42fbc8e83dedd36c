"""F17 link `rel` reassembly semantics, mirroring the reference's document-
order assignment rules (/root/reference/lib/feedparser.js:891-940;
test/link.js): last-canonical, last-alternate beats any self, first-self
fallback, last-replies, enclosures document-ordered + (url,type)-deduped
keep-first."""

import datetime as dt

from node_feedparser_spark.operators.links import reassemble_links

T0 = dt.datetime(2025, 1, 6, 9, 0, 0)


def _links(spark, rows):
    """rows: (item_id, link_id, rel, href, type) — ts derived from link_id so
    document order == link_id order."""
    data = [
        (item, T0 + dt.timedelta(seconds=lid), lid, rel, href, typ)
        for (item, lid, rel, href, typ) in rows
    ]
    return spark.createDataFrame(
        data, "item_id long, ts timestamp, link_id long, rel string, href string, type string"
    )


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_last_alternate_wins_and_overrides_earlier_self(spark):
    # self arrives first and fills link; a later alternate overwrites it;
    # a still-later self is skipped because link is set (ref :897-898).
    r = _one(
        reassemble_links(
            _links(
                spark,
                [
                    (1, 0, "self", "https://a/self1", None),
                    (1, 1, "alternate", "https://a/alt1", None),
                    (1, 2, "alternate", "https://a/alt2", None),
                    (1, 3, "self", "https://a/self2", None),
                ],
            )
        )
    )
    assert r.link == "https://a/alt2"


def test_first_self_fallback_when_no_alternate(spark):
    r = _one(
        reassemble_links(
            _links(
                spark,
                [
                    (1, 0, "self", "https://a/self1", None),
                    (1, 1, "self", "https://a/self2", None),
                ],
            )
        )
    )
    assert r.link == "https://a/self1"


def test_last_canonical_and_last_replies(spark):
    r = _one(
        reassemble_links(
            _links(
                spark,
                [
                    (1, 0, "canonical", "https://a/c1", None),
                    (1, 1, "replies", "https://a/r1", None),
                    (1, 2, "canonical", "https://a/c2", None),
                    (1, 3, "replies", "https://a/r2", None),
                ],
            )
        )
    )
    assert r.origlink == "https://a/c2"
    assert r.comments == "https://a/r2"
    assert r.link is None and r.enclosures is None


def test_enclosures_document_order_dedupe_keep_first(spark):
    # duplicate (url, type) dropped (ref indexOfObject :905-908); same url
    # with a DIFFERENT type is a distinct enclosure; order is document order.
    r = _one(
        reassemble_links(
            _links(
                spark,
                [
                    (1, 0, "enclosure", "https://cdn/a.mp3", "audio/mpeg"),
                    (1, 1, "enclosure", "https://cdn/b.mp4", "video/mp4"),
                    (1, 2, "enclosure", "https://cdn/a.mp3", "audio/mpeg"),
                    (1, 3, "enclosure", "https://cdn/a.mp3", "video/mp4"),
                ],
            )
        )
    )
    assert r.enclosures == (
        "https://cdn/a.mp3|audio/mpeg,https://cdn/b.mp4|video/mp4,"
        "https://cdn/a.mp3|video/mp4"
    )


def test_items_are_independent(spark):
    df = reassemble_links(
        _links(
            spark,
            [
                (1, 0, "alternate", "https://a/alt", None),
                (2, 1, "self", "https://b/self", None),
            ],
        )
    )
    got = {r.item_id: r.link for r in df.collect()}
    assert got == {1: "https://a/alt", 2: "https://b/self"}


def test_single_aggregation_no_window_exchange(spark):
    # The plan should be one partial/final hash agg: exactly one Exchange,
    # no Window/Sort-based pass over the links.
    df = reassemble_links(
        _links(spark, [(1, 0, "alternate", "https://a", None)])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan


def test_guidlink_toggle(spark):
    """Mirror of test/link.js:80 — guidlink=False must not infer a link
    from a URL-shaped guid; guidlink=True infers only when link is null."""
    import pyspark.sql.functions as F
    from node_feedparser_spark.operators.links import infer_link_from_guid

    df = spark.createDataFrame(
        [
            (1, None, "https://x.example/a"),   # infer when on
            (2, None, "urn:item:2"),            # never: not a URL
            (3, "https://x.example/keep", "https://x.example/other"),  # link wins
        ],
        "id long, link string, guid string",
    )
    on = {
        r.id: r.out
        for r in df.select(
            "id", infer_link_from_guid(F.col("link"), F.col("guid")).alias("out")
        ).collect()
    }
    off = {
        r.id: r.out
        for r in df.select(
            "id",
            infer_link_from_guid(F.col("link"), F.col("guid"), guidlink=False).alias(
                "out"
            ),
        ).collect()
    }
    assert on == {1: "https://x.example/a", 2: None, 3: "https://x.example/keep"}
    assert off == {1: None, 2: None, 3: "https://x.example/keep"}


def _meta_els(spark, rows):
    """rows: (meta_id, el_id, kind, rel, href, domain, port, path,
    register_procedure, protocol) — ts derived from el_id so document
    order == el_id order."""
    data = [
        (m, T0 + dt.timedelta(seconds=e), e, k, r, h, do, po, pa, rp, pr)
        for (m, e, k, r, h, do, po, pa, rp, pr) in rows
    ]
    return spark.createDataFrame(
        data,
        "meta_id long, ts timestamp, el_id long, kind string, rel string,"
        " href string, domain string, port string, path string,"
        " register_procedure string, protocol string",
    )


def _link_el(meta, eid, rel, href):
    return (meta, eid, "link", rel, href, None, None, None, None, None)


def _cloud_el(meta, eid, domain=None, href=None, port="80", path="/rpc",
              reg="cloud.notify", proto="xml-rpc"):
    return (meta, eid, "cloud", None, href, domain, port, path, reg, proto)


def test_meta_hub_link_becomes_cloud(spark):
    """The reference's intertwingly.atom shape: a single feed-level
    <link rel='hub'> yields meta.cloud = {type:'hub', href}
    (lib/feedparser.js:550-552)."""
    from node_feedparser_spark.operators.links import reassemble_meta_links

    r = _one(
        reassemble_meta_links(
            _meta_els(
                spark,
                [
                    _link_el(1, 0, "hub", "http://pubsubhubbub.appspot.com/"),
                    _link_el(1, 1, "alternate", "https://a/"),
                    _link_el(1, 2, "self", "https://a/feed.atom"),
                ],
            )
        )
    )
    assert r.cloud_type == "hub"
    assert r.cloud_href == "http://pubsubhubbub.appspot.com/"
    assert r.cloud_domain is None
    assert r.link == "https://a/"
    assert r.xmlurl == "https://a/feed.atom"


def test_meta_first_hub_wins_and_meta_link_is_first_wins(spark):
    """Two hubs: the guard `!(meta.cloud.href || meta.cloud.domain)` blocks
    the second (:550).  Meta link is FIRST-alternate-wins (`if (!meta.link)`,
    :545) — opposite of the item side; self is last-wins (:546)."""
    from node_feedparser_spark.operators.links import reassemble_meta_links

    r = _one(
        reassemble_meta_links(
            _meta_els(
                spark,
                [
                    _link_el(1, 0, "alternate", "https://a/first"),
                    _link_el(1, 1, "hub", "https://hub.one/"),
                    _link_el(1, 2, "hub", "https://hub.two/"),
                    _link_el(1, 3, "alternate", "https://a/second"),
                    _link_el(1, 4, "self", "https://a/self1"),
                    _link_el(1, 5, "self", "https://a/self2"),
                ],
            )
        )
    )
    assert r.cloud_href == "https://hub.one/"
    assert r.link == "https://a/first"
    assert r.xmlurl == "https://a/self2"


def test_meta_cloud_element_replaces_hub_rsscloud_wins(spark):
    """'This will ensure that rssCloud wins here' (:617-626): the <cloud>
    element resets meta.cloud and copies its attributes over an
    earlier-established hub; the hub stays available via link elements
    only.  A later hub is blocked by the element's domain."""
    from node_feedparser_spark.operators.links import reassemble_meta_links

    r = _one(
        reassemble_meta_links(
            _meta_els(
                spark,
                [
                    _link_el(1, 0, "hub", "https://hub.one/"),
                    _cloud_el(1, 1, domain="rpc.example.com"),
                    _link_el(1, 2, "hub", "https://hub.two/"),
                ],
            )
        )
    )
    assert r.cloud_type is None
    assert r.cloud_href is None
    assert r.cloud_domain == "rpc.example.com"
    assert r.cloud_port == "80"
    assert r.cloud_path == "/rpc"
    assert r.cloud_register_procedure == "cloud.notify"
    assert r.cloud_protocol == "xml-rpc"


def test_meta_domainless_cloud_element_merges_later_hub(spark):
    """A <cloud> element carrying neither href nor domain does not trip the
    hub guard, so a hub AFTER it merges type/href on top of its attributes
    (the :550 guard evaluates falsy on the copied state)."""
    from node_feedparser_spark.operators.links import reassemble_meta_links

    r = _one(
        reassemble_meta_links(
            _meta_els(
                spark,
                [
                    _cloud_el(1, 0, domain=None, port="8080"),
                    _link_el(1, 1, "hub", "https://hub.one/"),
                ],
            )
        )
    )
    assert r.cloud_type == "hub"
    assert r.cloud_href == "https://hub.one/"
    assert r.cloud_port == "8080"
    assert r.cloud_domain is None


def test_meta_first_cloud_element_wins(spark):
    """'there can be only one' (:619-621, el[0]): the FIRST <cloud> element
    in document order is copied; later ones are ignored."""
    from node_feedparser_spark.operators.links import reassemble_meta_links

    r = _one(
        reassemble_meta_links(
            _meta_els(
                spark,
                [
                    _cloud_el(1, 0, domain="first.example.com", port="80"),
                    _cloud_el(1, 1, domain="second.example.com", port="99"),
                ],
            )
        )
    )
    assert r.cloud_domain == "first.example.com"
    assert r.cloud_port == "80"


def test_meta_null_href_links_do_not_dispatch(spark):
    """The reference enters the rel branch only under `if (el['@']['href'])`
    (lib/feedparser.js:539,578): a hub or alternate link WITHOUT an href
    must not occupy a first-wins slot or block a later real hub (round-5
    review finding: a null-href hub used to shadow the real one)."""
    from node_feedparser_spark.operators.links import reassemble_meta_links

    r = _one(
        reassemble_meta_links(
            _meta_els(
                spark,
                [
                    _link_el(1, 0, "hub", None),          # no href: inert
                    _link_el(1, 1, "alternate", None),    # no href: inert
                    _link_el(1, 2, "hub", "https://hub.real/"),
                    _link_el(1, 3, "alternate", "https://a/real"),
                ],
            )
        )
    )
    assert r.cloud_type == "hub"
    assert r.cloud_href == "https://hub.real/"
    assert r.link == "https://a/real"


def test_meta_no_cloud_sources_gives_all_null_cloud(spark):
    from node_feedparser_spark.operators.links import reassemble_meta_links

    r = _one(
        reassemble_meta_links(
            _meta_els(spark, [_link_el(1, 0, "alternate", "https://a/")])
        )
    )
    assert r.cloud_type is None and r.cloud_href is None
    assert r.cloud_domain is None and r.cloud_protocol is None


def test_meta_links_single_aggregation_no_window(spark):
    from node_feedparser_spark.operators.links import reassemble_meta_links

    df = reassemble_meta_links(
        _meta_els(spark, [_link_el(1, 0, "alternate", "https://a/")])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan


def test_enclosure_dedup_keys_field_tuple_not_serialization(spark):
    """Round-3 regression (ADVICE r2): dedupe must key the (url, type)
    FIELD TUPLE — an href containing '|' must not alias a different pair,
    and a NULL type must not collide with a same-href non-null type."""
    r = _one(
        reassemble_links(
            _links(
                spark,
                [
                    # 'a|b' + NULL type vs 'a' + 'b': distinct pairs, both kept
                    (1, 0, "enclosure", "a|b", None),
                    (1, 1, "enclosure", "a", "b"),
                    # NULL type vs non-null type on the same href: distinct
                    (1, 2, "enclosure", "https://a/e.mp3", None),
                    (1, 3, "enclosure", "https://a/e.mp3", "audio/mpeg"),
                    # true duplicate (same href, same type): dropped
                    (1, 4, "enclosure", "https://a/e.mp3", "audio/mpeg"),
                    # duplicate with NULL type: dropped (null matches null)
                    (1, 5, "enclosure", "https://a/e.mp3", None),
                ],
            )
        )
    )
    assert r.enclosures == "a|b,a|b,https://a/e.mp3,https://a/e.mp3|audio/mpeg"
