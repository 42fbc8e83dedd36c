"""Text normalization — fresh implementations of the reference's
parse-and-normalize scalar semantics (lib/utils.js), applied to turn text.

These are pure-Python, deterministic, and shared verbatim by BOTH the
pure-Python spec extractor (reference_extract.py) and the Spark vectorized
UDF path (operators/extract.py), so the per-turn text-equality invariant
(BASELINE.json input_hint) holds exactly by construction.

Semantics ported (re-specified, not translated) from the reference:

- strip_html:   whitelist-based tag removal, quote-aware scanning —
                reference stripHtml (lib/utils.js:367-382) built on
                readMarkupAt (lib/utils.js:227-274): removes comments,
                doctypes, processing instructions, and open/close tags whose
                name is in the known-HTML whitelist; preserves everything
                else ("1 < 2", "<<<Tutorial>>>", "<foo>") verbatim
                (test/angle-brackets.js, test/utils.js:325-468).
- repair_encoding: tolerant recovery of mojibake (UTF-8 read as latin-1) —
                the analog of the reference delegating charset repair to an
                iconv stage (examples/complete.js:37-52) while never
                crashing on bad bytes (test/bad.js).
- normalize_text: trim + whitespace-only -> empty, mirroring the
                whitespace-drop-and-hoist rule (lib/feedparser.js:322-333).
- safe_trim:    trim iff string (lib/utils.js:46-51).
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

from ..constants import ALIAS_TABLE, HTML_TAGS, MOJIBAKE_MARKERS

_TAG_NAME_RE = re.compile(r"[A-Za-z][A-Za-z0-9]*")
# C0 control characters except tab/newline/carriage-return: always noise in
# turn text; removing them is the analog of sax-js surviving invalid
# characters (test/feeds/invalid-characters-gzipped.xml).
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def safe_trim(value):
    """Trim iff string, else passthrough (reference lib/utils.js:46-51)."""
    return value.strip() if isinstance(value, str) else value


def repair_encoding(text: str) -> str:
    """Recover UTF-8 text that was mistakenly decoded as latin-1.

    Deterministic: only attempts the round-trip when a mojibake marker
    character is present AND the round-trip succeeds strictly; otherwise the
    input is returned unchanged (the reference's never-throw discipline,
    lib/utils.js:62-70 resolve() pass-through-on-failure).
    """
    if any(m in text for m in MOJIBAKE_MARKERS):
        try:
            repaired = text.encode("latin-1", errors="strict").decode(
                "utf-8", errors="strict"
            )
            # Only accept a repair that strictly reduces mojibake markers.
            if sum(repaired.count(m) for m in MOJIBAKE_MARKERS) < sum(
                text.count(m) for m in MOJIBAKE_MARKERS
            ):
                return repaired
        except (UnicodeEncodeError, UnicodeDecodeError):
            pass
    return text


def _scan_markup(text: str, i: int) -> int:
    """Return the end index (exclusive) of the markup starting at text[i]=='<',
    or -1 if it is not removable markup.

    Re-specification of readMarkupAt (reference lib/utils.js:227-274):
    recognizes comments, doctypes, processing instructions, and known-HTML
    open/close tags; attribute scanning is quote-aware so 'title="1 > 0"'
    does not terminate the tag early (test/utils.js:455-461).  Unterminated
    or unknown markup returns -1 -> the '<' is literal text.
    """
    n = len(text)
    if i + 1 >= n:
        return -1
    c = text[i + 1]
    if text.startswith("<!--", i):
        end = text.find("-->", i + 4)
        return -1 if end < 0 else end + 3
    if c == "!":  # doctype / CDATA-ish declaration
        end = text.find(">", i + 2)
        return -1 if end < 0 else end + 1
    if c == "?":  # processing instruction
        end = text.find("?>", i + 2)
        if end >= 0:
            return end + 2
        end = text.find(">", i + 2)
        return -1 if end < 0 else end + 1
    j = i + 1
    if c == "/":
        j += 1
    m = _TAG_NAME_RE.match(text, j)
    if not m:
        return -1
    if m.group(0).lower() not in HTML_TAGS:
        return -1
    # Quote-aware scan for the closing '>'.
    k = m.end()
    quote = ""
    while k < n:
        ch = text[k]
        if quote:
            if ch == quote:
                quote = ""
        elif ch in ('"', "'"):
            quote = ch
        elif ch == ">":
            return k + 1
        k += 1
    return -1  # unterminated tag -> literal


def strip_html(text: str) -> str:
    """Remove only *known* HTML markup; preserve all other angle brackets.

    Whitelist semantics per the reference stripHtml (lib/utils.js:367-382):
    '1 < 2', '<<<Tutorial>>>' and unknown tags like '<foo>' survive
    byte-identically (test/angle-brackets.js).
    """
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        lt = text.find("<", i)
        if lt < 0:
            out.append(text[i:])
            break
        out.append(text[i:lt])
        end = _scan_markup(text, lt)
        if end < 0:
            out.append("<")
            i = lt + 1
        else:
            i = end
    return "".join(out)


def normalize_text(text) -> str:
    """The canonical per-turn normalization: the single function whose output
    must be byte-identical between the pure-Python spec extractor and the
    Spark vectorized path (BASELINE.json input_hint 'per-turn text equality
    under stable turn ordering').

    Order: null->'' prefill (reference pre-initializes every normalized field
    so consumers never see undefined, lib/feedparser.js:494-501) ->
    control-char drop -> encoding repair -> whitelist HTML strip ->
    trim (whitespace-only becomes '', lib/feedparser.js:322-333).
    """
    if text is None:
        return ""
    text = _CTRL_RE.sub("", text)
    text = repair_encoding(text)
    text = strip_html(text)
    return text.strip()


# F10 — exact mayHaveEmbeddedHtml dispatch (reference lib/utils.js:342-355).
# Routing is FIELD/TYPE-wise, not content-wise: these fields always may
# carry embedded HTML; the type-gated set only when the element's `type`
# attribute is 'html' or 'xhtml'.  The character-class dirty screen
# (operators/extract._DIRTY_RE) remains the row-wise performance pre-filter
# layered UNDER this dispatch.
ALWAYS_EMBEDDED_HTML_FIELDS = frozenset(
    {"content:encoded", "description", "summary", "tagline"}
)
TYPE_GATED_EMBEDDED_HTML_FIELDS = frozenset(
    {"content", "title", "subtitle", "rights"}
)
_EMBEDDED_HTML_TYPES = frozenset({"html", "xhtml"})


def may_have_embedded_html(name, text, type_attr=None) -> bool:
    """True iff a field named `name` with string value `text` may carry
    embedded HTML — the reference's per-field/type-attr dispatch
    (lib/utils.js:342-355): content:encoded / description / summary /
    tagline always; content / title / subtitle / rights only when the
    element's type attribute is 'html' or 'xhtml'; everything else never.
    Non-string values are never HTML (the `typeof el['#'] !== 'string'`
    guard)."""
    if not isinstance(text, str):
        return False
    if name in ALWAYS_EMBEDDED_HTML_FIELDS:
        return True
    if name in TYPE_GATED_EMBEDDED_HTML_FIELDS:
        return type_attr in _EMBEDDED_HTML_TYPES
    return False


def may_have_embedded_html_qualified(name, local, text, type_attr=None) -> bool:
    """The caller-side OR the reference applies at lib/feedparser.js:289:
    a namespaced element matches if either its qualified `#name`
    ('content:encoded') or its `#local` ('encoded') is routed."""
    return may_have_embedded_html(name, text, type_attr) or may_have_embedded_html(
        local, text, type_attr
    )


def resolve_field_html_uris(name, text, base_url, type_attr=None):
    """The reference's normalize-time application of the dispatch
    (lib/feedparser.js:294-298 and lib/utils.js:200-202): rewrite URI
    attributes inside embedded HTML only for fields the dispatch routes;
    all other fields pass through untouched."""
    if not base_url or not may_have_embedded_html(name, text, type_attr):
        return text
    from .urls import resolve_html_uris

    return resolve_html_uris(text, base_url)


_NONWORD_RE = re.compile(r"[^a-z0-9]+")


def normalize_entity_key(surface: str) -> str:
    """Surface form -> normalized blocking key: NFKC casefold, non-alnum runs
    collapse to single spaces.  The analog of the reference lowercasing and
    prefix-normalizing element/attribute names (lib/feedparser.js:440-476)."""
    s = unicodedata.normalize("NFKC", surface).casefold()
    return _NONWORD_RE.sub(" ", s).strip()


def canonical_alias(key: str) -> str:
    """Static alias lookup (reference ns canonicalization, lib/utils.js:137-150
    over lib/constants.js:7-38): known short forms collapse; unknown keys
    pass through unchanged."""
    return ALIAS_TABLE.get(key, key)


def entity_hash(key: str) -> int:
    """Deterministic signed-64-bit ID for an entity key.

    sha1-based (not Python hash() — must be stable across processes and
    identical between the pure-Python oracle and Spark workers).
    """
    digest = hashlib.sha1(key.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def char_shingles(key: str, k: int = 3) -> set[str]:
    """Character k-gram shingle set over the normalized key (padded), used by
    both the exact Jaccard in the oracle and the MinHash-LSH blocking stage
    (SURVEY.md A7)."""
    padded = f" {key} "
    if len(padded) <= k:
        return {padded}
    return {padded[i : i + k] for i in range(len(padded) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
