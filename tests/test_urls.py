"""URL resolution family — table-driven mirror of the reference's
test/utils.js resolve/isAbsoluteUrl suites (75-178), the reresolve srcset
case (305-309), plus the Spark-level retro-resolution operator (the
xml:base late-base scenario, test/xmlbase.js:47-68)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.functions.urls import (
    is_absolute_url,
    resolve,
    resolve_html_attribute_value,
    resolve_html_uris,
    resolve_srcset,
    _resolve_series,
)
from node_feedparser_spark.operators.urlresolve import (
    derive_conv_base,
    retro_resolve_urls,
)


# --- resolve: mirror of test/utils.js:75-138 ------------------------------
RESOLVE_CASES = [
    ("http://example.com/foo/bar", "../baz", "http://example.com/baz"),
    ("http://example.com/foo/bar", "./baz", "http://example.com/foo/baz"),
    ("http://example.com/foo/bar", "baz", "http://example.com/foo/baz"),
    ("http://example.com/foo/", "/images/pic.png", "http://example.com/images/pic.png"),
    ("http://example.com/", "http://other.com/img.png", "http://other.com/img.png"),
    (None, "/path", "/path"),
    ("", "/path", "/path"),
    ("http://example.com/", None, None),
    ("http://example.com/", "", ""),
    ("http://example.com/", 42, 42),
    ("http://example.com/", "tag:example.com,2003:posts/1", "tag:example.com,2003:posts/1"),
    ("http://example.com/", "urn:isbn:0451450523", "urn:isbn:0451450523"),
    # extra coverage beyond the reference table
    ("http://example.com/a/b/", "../../up", "http://example.com/up"),
    ("https://example.com/dir/", "q?x=1#f", "https://example.com/dir/q?x=1#f"),
    ("http://example.com/", "//cdn.example/x.js", "http://cdn.example/x.js"),
]


@pytest.mark.parametrize("base,url,want", RESOLVE_CASES)
def test_resolve_table(base, url, want):
    assert resolve(base, url) == want


# --- isAbsoluteUrl: mirror of test/utils.js:140-178 -----------------------
ABS_CASES = [
    ("http://example.com/", True),
    ("https://example.com/path", True),
    ("/relative/path", False),
    ("relative/path", False),
    ("tag:example.com,2003:posts/1", False),
    ("", False),
    (None, False),
    (42, False),
    ({}, False),
    ("ftp://files.example.com/a", True),
    ("file:///no/host", False),
]


@pytest.mark.parametrize("uri,want", ABS_CASES)
def test_is_absolute_url_table(uri, want):
    assert is_absolute_url(uri) is want


# --- srcset: mirror of the reresolve srcset case + paren commas -----------
def test_resolve_srcset_reference_case():
    assert (
        resolve_srcset("http://example.com/path/", "small.png 480w, /large.png 2x")
        == "http://example.com/path/small.png 480w, http://example.com/large.png 2x"
    )


def test_resolve_srcset_paren_commas_not_split():
    s = "image.png 1x, image2.png calc(1,2)"
    got = resolve_srcset("http://e.com/d/", s)
    assert got == "http://e.com/d/image.png 1x, http://e.com/d/image2.png calc(1,2)"


def test_resolve_srcset_passthrough():
    assert resolve_srcset(None, "a.png 1x") == "a.png 1x"
    assert resolve_srcset("http://e.com/", None) is None


# --- attribute dispatch ----------------------------------------------------
def test_attribute_dispatch():
    b = "http://example.com/"
    assert resolve_html_attribute_value(b, "HREF", "/page") == "http://example.com/page"
    assert resolve_html_attribute_value(b, "poster", "/p.png") == "http://example.com/p.png"
    assert (
        resolve_html_attribute_value(b, "srcset", "a.png 1x")
        == "http://example.com/a.png 1x"
    )
    assert resolve_html_attribute_value(b, "type", "text/html") == "text/html"


# --- resolve_html_uris -----------------------------------------------------
def test_resolve_html_uris_rewrites_known_open_tags():
    html = '<a href="/x">t</a> and <img src=\'rel.png\' alt="a>b">'
    got = resolve_html_uris(html, "http://example.com/d/")
    assert got == (
        '<a href="http://example.com/x">t</a> and '
        '<img src=\'http://example.com/d/rel.png\' alt="a>b">'
    )


def test_resolve_html_uris_leaves_unknown_and_literals():
    html = '1 < 2 <foo href="/x"> </a> <<<Tutorial>>>'
    assert resolve_html_uris(html, "http://example.com/") == html


def test_resolve_html_uris_unquoted_and_srcset():
    html = "<img src=rel.png srcset=\"s.png 1x, /t.png 2x\">"
    got = resolve_html_uris(html, "http://e.com/d/")
    assert got == (
        '<img src=http://e.com/d/rel.png '
        'srcset="http://e.com/d/s.png 1x, http://e.com/t.png 2x"'
        ">"
    )


def test_resolve_html_uris_passthrough():
    assert resolve_html_uris(None, "http://e.com/") is None
    assert resolve_html_uris("<a href='/x'>", None) == "<a href='/x'>"
    assert resolve_html_uris("<a href='/x'>", "") == "<a href='/x'>"


# --- vectorized series face ------------------------------------------------
def test_resolve_series_matches_scalar():
    bases = pd.Series(
        ["http://e.com/a/", None, "http://e.com/", "http://e.com/", ""]
    )
    urls = pd.Series(
        ["../x", "/y", "https://other.com/z", "urn:isbn:1", "rel"]
    )
    got = _resolve_series(bases, urls).tolist()
    want = [resolve(b, u) for b, u in zip(bases, urls)]
    assert got == want


# --- retro-resolution operator (Spark) -------------------------------------
@pytest.fixture(scope="module")
def turns_with_urls(spark):
    rows = [
        # conv A: base discovered LATE (turn 2); earlier turns re-resolve
        ("A", 0, "../early"),
        ("A", 1, "mid/page"),
        ("A", 2, "https://a.example/docs/ref/"),
        ("A", 3, "/root"),
        ("A", 4, "urn:isbn:42"),
        # conv B: two absolute URLs -> FIRST in turn order is the base
        ("B", 0, "https://b1.example/x/"),
        ("B", 1, "https://b2.example/y/"),
        ("B", 2, "rel"),
        # conv C: no absolute URL -> everything passes through
        ("C", 0, "nothing/here"),
        ("C", 1, "/abs/path"),
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, url string")


def test_derive_conv_base(spark, turns_with_urls):
    got = {r["conv_id"]: r["base_url"] for r in derive_conv_base(turns_with_urls).collect()}
    assert got == {
        "A": "https://a.example/docs/ref/",
        "B": "https://b1.example/x/",
    }


def test_retro_resolve_rewrites_earlier_turns(spark, turns_with_urls):
    got = {
        (r["conv_id"], r["turn_idx"]): r["resolved_url"]
        for r in retro_resolve_urls(turns_with_urls).collect()
    }
    assert got[("A", 0)] == "https://a.example/docs/early"     # BEFORE the base turn
    assert got[("A", 1)] == "https://a.example/docs/ref/mid/page"
    assert got[("A", 2)] == "https://a.example/docs/ref/"      # absolute: unchanged
    assert got[("A", 3)] == "https://a.example/root"
    assert got[("A", 4)] == "urn:isbn:42"                      # non-resolvable scheme
    assert got[("B", 1)] == "https://b2.example/y/"            # absolute: unchanged
    assert got[("B", 2)] == "https://b1.example/x/rel"         # first-wins base
    assert got[("C", 0)] == "nothing/here"                     # no base: pass-through
    assert got[("C", 1)] == "/abs/path"
