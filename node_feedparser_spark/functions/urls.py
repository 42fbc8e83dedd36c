"""URL resolution family — fresh implementations of the reference's
resolve / isAbsoluteUrl / resolveSrcset / resolveHtmlAttributeValue /
resolveHtmlUris semantics, applied to turn text and URL mention columns.

Reference parity (re-specified, never translated):

- resolve:        /root/reference/lib/utils.js:62-70 — resolve a URL
                  against a base, returning the input unchanged when either
                  side is missing, the URL is not a string, or resolution
                  fails (never-throw pass-through, test/utils.js:75-138).
- is_absolute_url: lib/utils.js:120-127 — true iff the parsed URL has a
                  host (so tag:/urn: URIs and relative paths are false,
                  test/utils.js:140-178).
- resolve_srcset: lib/utils.js:79-105 — resolve each candidate's URL in a
                  srcset value, preserving descriptors and whitespace and
                  not splitting on commas inside parentheses.
- resolve_html_attribute_value: lib/utils.js:107-112 — dispatch: srcset
                  gets resolve_srcset, known URI attributes get resolve,
                  everything else passes through.
- resolve_html_uris: lib/utils.js:276-340 — rewrite URI attributes inside
                  known HTML open tags embedded in a text value, quote-
                  aware, leaving closing tags / unknown tags / literal '<'
                  untouched.

One documented divergence from the reference's WHATWG engine: an input
URL that is already absolute (scheme followed by '://') passes through
BYTE-IDENTICALLY instead of being re-normalized (WHATWG would lowercase
the host and add a trailing '/').  For the KG target, preserving the
original mention text of an already-absolute URL is the right contract —
downstream entity keys normalize separately.

Spark faces are Arrow-batched pandas UDFs with a vectorized pre-screen:
null/empty bases and already-absolute URLs (the overwhelming majority in
real text) are resolved by pure pandas masks; only genuinely relative
URLs reach the per-string urljoin.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, uses_netloc, uses_relative

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Standard HTML attributes that carry URIs (public HTML knowledge; same
# role as the reference's HTML_URI_ATTRS, lib/constants.js:41-52).
HTML_URI_ATTRS = frozenset(
    "href src uri srcset cite longdesc action background data poster".split()
)

_SCHEME_AUTHORITY_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")
# JVM-safe twin of the absolute screen for use in rlike() pushdown: scheme,
# '://', then at least one non-'/' char (so 'file:///x', which has no host,
# stays relative-ish — mirroring isAbsoluteUrl's host requirement).
ABSOLUTE_URL_RLIKE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]"

_RESOLVABLE_SCHEMES = set(uses_relative) & set(uses_netloc)


def resolve(base_url, path_url):
    """Resolve path_url against base_url; on any failure return path_url
    unchanged (the reference's never-throw discipline)."""
    if not base_url or not path_url:
        return path_url
    if not isinstance(path_url, str):
        return path_url
    if _SCHEME_AUTHORITY_RE.match(path_url):
        return path_url  # already absolute: byte-identical pass-through
    m = _SCHEME_RE.match(path_url)
    if m and m.group(1).lower() not in _RESOLVABLE_SCHEMES:
        return path_url  # tag:, urn:, mailto:, ... — not resolvable
    try:
        return urljoin(base_url, path_url)
    except ValueError:
        return path_url


def is_absolute_url(uri) -> bool:
    """True iff uri parses and has a host (reference: Boolean(new URL(uri).host))."""
    if not uri or not isinstance(uri, str):
        return False
    try:
        parts = urlsplit(uri)
    except ValueError:
        return False
    return bool(parts.scheme) and bool(parts.netloc)


_CANDIDATE_RE = re.compile(r"^(\s*)(\S+)([\s\S]*)$")


def _resolve_srcset_candidate(base_url: str, candidate: str) -> str:
    m = _CANDIDATE_RE.match(candidate)
    if not m:
        return candidate
    return m.group(1) + resolve(base_url, m.group(2)) + m.group(3)


def resolve_srcset(base_url, srcset):
    """Resolve every candidate URL in a srcset value; commas inside
    parentheses (functional URL notation) do not split candidates."""
    if not base_url or not srcset or not isinstance(srcset, str):
        return srcset
    out: list[str] = []
    start = 0
    depth = 0
    for i, ch in enumerate(srcset):
        if ch == "(":
            depth += 1
        elif ch == ")" and depth:
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(_resolve_srcset_candidate(base_url, srcset[start:i]))
            start = i + 1
    out.append(_resolve_srcset_candidate(base_url, srcset[start:]))
    return ",".join(out)


def resolve_html_attribute_value(base_url, name: str, value):
    attr = name.lower()
    if attr == "srcset":
        return resolve_srcset(base_url, value)
    if attr in HTML_URI_ATTRS:
        return resolve(base_url, value)
    return value


_TAG_NAME_RE = re.compile(r"[A-Za-z][A-Za-z0-9]*")
_ATTR_STOP = frozenset(" \t\n\r\f\v=/>")
_WS = frozenset(" \t\n\r\f\v")


def _rewrite_tag_uris(tag: str, base_url: str) -> str:
    """Rewrite URI attribute values inside one open tag string ('<' .. '>'),
    quote-aware; non-URI attributes and spacing survive byte-identically."""
    n = len(tag)
    i = 1
    while i < n and tag[i] not in _ATTR_STOP and tag[i] != " ":
        i += 1  # skip the tag name
    out: list[str] = []
    last = 0
    while i < n:
        while i < n and tag[i] in _WS:
            i += 1
        if i >= n or tag[i] in (">", "/"):
            break
        name_start = i
        while i < n and tag[i] not in _ATTR_STOP:
            i += 1
        name = tag[name_start:i]
        while i < n and tag[i] in _WS:
            i += 1
        if i >= n or tag[i] != "=":
            continue
        i += 1
        while i < n and tag[i] in _WS:
            i += 1
        quote = ""
        if i < n and tag[i] in ('"', "'"):
            quote = tag[i]
            i += 1
        value_start = i
        if quote:
            while i < n and tag[i] != quote:
                i += 1
        else:
            while i < n and tag[i] not in _WS and tag[i] not in (">", "/"):
                i += 1
        value = tag[value_start:i]
        resolved = resolve_html_attribute_value(base_url, name, value)
        if resolved != value:
            out.append(tag[last:value_start])
            out.append(resolved)
            last = i
        if quote and i < n and tag[i] == quote:
            i += 1
    if not out:
        return tag
    out.append(tag[last:])
    return "".join(out)


def resolve_html_uris(html, base_url):
    """Rewrite URI attributes inside known HTML open tags embedded in a
    text value.  Closing tags, unknown tags, comments, and literal angle
    brackets are copied through untouched (whitelist discipline shared
    with strip_html)."""
    from ..constants import HTML_TAGS

    if not base_url or not html or not isinstance(html, str):
        return html
    out: list[str] = []
    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            out.append(html[i:])
            break
        out.append(html[i:lt])
        end = _open_tag_end(html, lt)
        if end < 0:
            out.append("<")
            i = lt + 1
            continue
        m = _TAG_NAME_RE.match(html, lt + 1)
        if m and m.group(0).lower() in HTML_TAGS:
            out.append(_rewrite_tag_uris(html[lt:end], base_url))
        else:
            out.append(html[lt:end])
        i = end
    return "".join(out)


def _open_tag_end(text: str, i: int) -> int:
    """End index (exclusive) of an OPEN tag starting at text[i]=='<', or -1
    when it is not one (closing tag, comment, PI, no name, unterminated).
    Quote-aware scan for '>' so attribute values may contain it."""
    n = len(text)
    if i + 1 >= n or text[i + 1] in ("/", "!", "?"):
        return -1
    m = _TAG_NAME_RE.match(text, i + 1)
    if not m:
        return -1
    j = m.end()
    quote = ""
    while j < n:
        ch = text[j]
        if quote:
            if ch == quote:
                quote = ""
        elif ch in ('"', "'"):
            quote = ch
        elif ch == ">":
            return j + 1
        j += 1
    return -1


# ---------------------------------------------------------------------------
# Spark faces: Arrow-batched, with vectorized pre-screens so the
# per-string urljoin runs only on genuinely relative URLs.
# ---------------------------------------------------------------------------


def _resolve_series(base: pd.Series, url: pd.Series) -> pd.Series:
    out = url.copy()
    need = (
        base.notna()
        & (base != "")
        & url.notna()
        & (url != "")
        & ~url.str.match(_SCHEME_AUTHORITY_RE, na=False)
    )
    if need.any():
        out.loc[need] = [
            resolve(b, u) for b, u in zip(base[need], url[need])
        ]
    return out


@pandas_udf(T.StringType())
def resolve_udf(base: pd.Series, url: pd.Series) -> pd.Series:
    return _resolve_series(base, url)


@pandas_udf(T.BooleanType())
def is_absolute_url_udf(url: pd.Series) -> pd.Series:
    return url.map(is_absolute_url).astype(bool)


@pandas_udf(T.StringType())
def resolve_html_uris_udf(html: pd.Series, base: pd.Series) -> pd.Series:
    # fast screen: values without '<' cannot contain a tag — pass through
    need = html.notna() & base.notna() & html.str.contains("<", regex=False)
    out = html.copy()
    if need.any():
        out.loc[need] = [
            resolve_html_uris(h, b) for h, b in zip(html[need], base[need])
        ]
    return out


def may_have_embedded_html_col(name_col, type_col, text_col):
    """JVM twin of functions.normalize.may_have_embedded_html — a pure
    whole-stage-codegen CASE expression (no Python), so the F10 dispatch
    can gate the expensive HTML-rewrite UDF at scan speed."""
    from pyspark.sql import functions as F

    from .normalize import (
        ALWAYS_EMBEDDED_HTML_FIELDS,
        TYPE_GATED_EMBEDDED_HTML_FIELDS,
    )

    name = F.col(name_col) if isinstance(name_col, str) else name_col
    typ = F.col(type_col) if isinstance(type_col, str) else type_col
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    # coalesce BOTH NULL cases: a NULL field name (isin → NULL) and a
    # gated-field & NULL-type must each be False, not NULL — three-valued
    # logic would otherwise leak a NULL boolean out of the whole OR
    return F.when(text.isNull(), F.lit(False)).otherwise(
        F.coalesce(
            name.isin(*sorted(ALWAYS_EMBEDDED_HTML_FIELDS)), F.lit(False)
        )
        | F.coalesce(
            name.isin(*sorted(TYPE_GATED_EMBEDDED_HTML_FIELDS))
            & typ.isin("html", "xhtml"),
            F.lit(False),
        )
    )


def resolve_field_html_uris_col(name_col, type_col, text_col, base_col):
    """Gated F9 application (reference lib/feedparser.js:294-298): the
    HTML-URI rewrite UDF runs ONLY where the F10 dispatch routes the field
    AND the cheap '<'-screen fires; everything else passes through in
    codegen without touching Python."""
    from pyspark.sql import functions as F

    text = F.col(text_col) if isinstance(text_col, str) else text_col
    base = F.col(base_col) if isinstance(base_col, str) else base_col
    gate = (
        may_have_embedded_html_col(name_col, type_col, text)
        & base.isNotNull()
        & text.contains("<")
    )
    return F.when(gate, resolve_html_uris_udf(text, base)).otherwise(text)


@pandas_udf(T.StringType())
def resolve_srcset_udf(base: pd.Series, srcset: pd.Series) -> pd.Series:
    need = base.notna() & srcset.notna() & (srcset != "")
    out = srcset.copy()
    if need.any():
        out.loc[need] = [
            resolve_srcset(b, s) for b, s in zip(base[need], srcset[need])
        ]
    return out
