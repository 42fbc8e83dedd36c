"""Table-driven unit tests for the normalization functions — mirrors the
reference's test/utils.js style (exhaustive per-case tables, including a
generated loop over the whole HTML tag whitelist, test/utils.js:463-467)."""

import pytest

from node_feedparser_spark.constants import HTML_TAGS
from node_feedparser_spark.functions.normalize import (
    canonical_alias,
    char_shingles,
    entity_hash,
    jaccard,
    normalize_entity_key,
    normalize_text,
    repair_encoding,
    safe_trim,
    strip_html,
)

STRIP_CASES = [
    # (input, expected) — whitelist semantics: only known HTML is removed
    ("plain text", "plain text"),
    ("<p>hello</p>", "hello"),
    ("<P>HELLO</P>", "HELLO"),  # case-insensitive tag names
    ('<div class="x">y</div>', "y"),
    ('<p title="1 > 0">note</p>', "note"),  # quote-aware: > inside attr
    ("<p title='a > b'>q</p>", "q"),
    ("<!-- comment -->kept", "kept"),
    ("<!DOCTYPE html>kept", "kept"),
    ("<?php echo ?>kept", "kept"),
    ("1 < 2 and 3 > 2", "1 < 2 and 3 > 2"),  # bare angle brackets survive
    ("<<<Tutorial>>>", "<<<Tutorial>>>"),  # reference test/angle-brackets.js
    ("<foo>not html</foo>", "<foo>not html</foo>"),  # unknown tag preserved
    ("x < y && y > z", "x < y && y > z"),
    ("<a href='u'>link</a> tail", "link tail"),
    ("<img src='u.gif'>", ""),
    ("<p unterminated", "<p unterminated"),  # unterminated -> literal
    ("<!-- unterminated", "<!-- unterminated"),
    ("a<br>b<br/>c", "abc"),
    ("<script>var x=1;</script>after", "var x=1;after"),
]


@pytest.mark.parametrize("raw,expected", STRIP_CASES)
def test_strip_html(raw, expected):
    assert strip_html(raw) == expected


@pytest.mark.parametrize("tag", sorted(HTML_TAGS))
def test_strip_every_whitelisted_tag(tag):
    # generated per-tag loop, same idea as reference test/utils.js:463-467
    assert strip_html(f"<{tag} a='1'>x</{tag}>") == "x"


def test_repair_encoding_roundtrip():
    good = "café résumé naïve"
    mojibake = good.encode("utf-8").decode("latin-1")
    assert repair_encoding(mojibake) == good
    assert repair_encoding(good) == good  # no markers -> untouched
    assert repair_encoding("plain ascii") == "plain ascii"


def test_normalize_text_rules():
    assert normalize_text(None) == ""
    assert normalize_text("   \t ") == ""  # whitespace-only -> empty (P4)
    assert normalize_text(" x ") == "x"
    assert normalize_text("a\x00b\x07c") == "abc"  # control chars dropped
    assert normalize_text("<p>hi</p>") == "hi"


def test_safe_trim():
    assert safe_trim("  a ") == "a"
    assert safe_trim(None) is None
    assert safe_trim(3) == 3


def test_entity_key_and_alias():
    assert normalize_entity_key("K8s") == "k8s"
    assert canonical_alias("k8s") == "kubernetes"
    assert normalize_entity_key("Apache  Spark!") == "apache spark"
    assert canonical_alias("unknown thing") == "unknown thing"
    assert normalize_entity_key("ＫＵＢＥ") == "kube"  # NFKC fold


def test_entity_hash_stable():
    assert entity_hash("kubernetes") == entity_hash("kubernetes")
    assert entity_hash("a") != entity_hash("b")
    assert -(2**63) <= entity_hash("x") < 2**63


def test_jaccard_shingles():
    assert jaccard(char_shingles("kubernetes"), char_shingles("kubernetes")) == 1.0
    assert jaccard(char_shingles("kubernetes"), char_shingles("kuberrnetes")) >= 0.55
    assert jaccard(char_shingles("javascript"), char_shingles("typescript")) < 0.55
    assert jaccard(set(), set()) == 1.0
