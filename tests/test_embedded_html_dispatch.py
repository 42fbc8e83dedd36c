"""F10 — exact mayHaveEmbeddedHtml dispatch, table-driven mirror of the
reference (lib/utils.js:342-355) and its caller-side qualified/local OR
(lib/feedparser.js:289), plus the gated Spark application
(resolve_field_html_uris_col) checked row-for-row against the Python spec.
"""

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.functions.normalize import (
    may_have_embedded_html,
    may_have_embedded_html_qualified,
    resolve_field_html_uris,
)
from node_feedparser_spark.functions.urls import (
    may_have_embedded_html_col,
    resolve_field_html_uris_col,
)

TEXT = '<a href="/x">link</a>'

# (name, type_attr, expected) — the reference's dispatch table:
# always-routed fields, type-gated fields under each type value, and
# never-routed fields.
DISPATCH_TABLE = [
    # always: content:encoded, description, summary, tagline
    ("content:encoded", None, True),
    ("content:encoded", "text", True),
    ("description", None, True),
    ("description", "html", True),
    ("summary", "xhtml", True),
    ("summary", None, True),
    ("tagline", None, True),
    # type-gated: content, title, subtitle, rights — only html/xhtml
    ("content", "html", True),
    ("content", "xhtml", True),
    ("content", "text", False),
    ("content", None, False),
    ("title", "html", True),
    ("title", "text", False),
    ("title", None, False),
    ("subtitle", "xhtml", True),
    ("subtitle", None, False),
    ("rights", "html", True),
    ("rights", "", False),
    # never routed
    ("link", "html", False),
    ("guid", None, False),
    ("author", "xhtml", False),
    ("pubdate", "html", False),
    # NULL field name must yield False, not a leaked NULL boolean
    (None, None, False),
    (None, "html", False),
]


@pytest.mark.parametrize("name,type_attr,want", DISPATCH_TABLE)
def test_dispatch_table(name, type_attr, want):
    assert may_have_embedded_html(name, TEXT, type_attr) is want


def test_non_string_text_never_routes():
    # the reference's `typeof el['#'] !== 'string'` guard
    for text in (None, 3, [], {}):
        assert may_have_embedded_html("description", text) is False
        assert may_have_embedded_html("content", text, "html") is False


def test_qualified_or_local_routing():
    # lib/feedparser.js:289 checks #name OR #local: 'content:encoded'
    # routes by qualified name even though local 'encoded' does not...
    assert may_have_embedded_html_qualified("content:encoded", "encoded", TEXT)
    # ...and atom 'content' (name == local) routes only via type
    assert not may_have_embedded_html_qualified("content", "content", TEXT)
    assert may_have_embedded_html_qualified("content", "content", TEXT, "html")
    # a namespaced 'media:description' routes via its LOCAL name
    assert may_have_embedded_html_qualified("media:description", "description", TEXT)


def test_resolve_field_html_uris_gating():
    base = "http://example.com/feed/"
    routed = resolve_field_html_uris("description", TEXT, base)
    assert 'href="http://example.com/x"' in routed
    # unrouted field: byte-identical passthrough
    assert resolve_field_html_uris("title", TEXT, base) == TEXT
    # routed with matching type attr
    assert "example.com/x" in resolve_field_html_uris("title", TEXT, base, "html")
    # no base -> passthrough even when routed
    assert resolve_field_html_uris("description", TEXT, None) == TEXT


def test_spark_column_twin_matches_python(spark):
    rows = [
        (i, name, type_attr, text, "http://example.com/feed/")
        for i, (name, type_attr, _) in enumerate(DISPATCH_TABLE)
        for text in (TEXT, None, "plain words")
    ]
    df = spark.createDataFrame(
        rows, "row_id long, name string, type_attr string, text string, base string"
    )
    got = (
        df.select(
            "row_id", "name", "type_attr", "text",
            may_have_embedded_html_col("name", "type_attr", "text").alias("routed"),
            resolve_field_html_uris_col("name", "type_attr", "text", "base").alias(
                "resolved"
            ),
        )
        .collect()
    )
    for r in got:
        want_routed = may_have_embedded_html(r["name"], r["text"], r["type_attr"])
        assert r["routed"] == want_routed, (r["name"], r["type_attr"], r["text"])
        want_resolved = resolve_field_html_uris(
            r["name"], r["text"], "http://example.com/feed/", r["type_attr"]
        )
        assert r["resolved"] == want_resolved
