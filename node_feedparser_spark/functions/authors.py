"""J4 — author address parsing, the reference's `addressparser` long tail.

The reference feeds author/managingEditor/webMaster values through the
`addressparser` dependency and keeps the FIRST parsed address, then prefers
`author.name || author.address || raw` for the display value
(/root/reference/lib/feedparser.js:606-619, 1006-1017).  This module
re-specifies the dominant address shapes as ONE regex-dispatch contract
implemented three ways that must agree exactly:

  - `parse_address`      — pure-Python spec (unit-tested truth table),
  - `author_fields_cols` — JVM `regexp_extract` column chain (pure codegen,
                           no Python in the hot path),
  - `author_fields_sql`  — the DuckDB twin used by the correctness oracle.

Shapes covered (the addressparser behaviors a feed actually exercises):

  | input                          | name         | address        |
  |--------------------------------|--------------|----------------|
  | ``Name <a@b>``                 | Name         | a@b            |
  | ``"Last, First" <a@b>``        | Last, First  | a@b (quotes and the
  |                                |              | comma inside them
  |                                |              | survive)        |
  | ``a@b (Comment Name)``         | Comment Name | a@b            |
  | ``a@b``                        | (empty)      | a@b            |
  | ``Name Only``                  | Name Only    | (empty)        |
  | ``a@b, c@d``                   | (empty)      | a@b (first-wins,
  |                                |              | addressparser[0]) |

Not covered (documented non-goals, beyond what feeds use): RFC-2822 group
syntax, nested comments, escaped quotes inside quoted strings.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# dispatch regexes — IDENTICAL patterns run in Python, Spark (Java regex),
# and DuckDB (RE2); all three engines agree on this subset of syntax.
_ANGLE_ADDR = r"<([^>]*)>"
_PRE_ANGLE = r"^([^<]*)<"
_QUOTED = r'^"(.*)"$'
_COMMENT = r"\(([^)]*)\)"
_PRE_PAREN = r"^([^(]*)\("
_FIRST_ITEM = r"^([^,]*)"

# ONE trim definition for all three faces.  Python str.strip(), Java
# F.trim() and DuckDB trim() each strip a DIFFERENT whitespace set (all
# unicode WS / ASCII space only / ASCII space only), so the contract pins
# an explicit ASCII class instead: \s and \v are avoided because their
# meaning differs across the three regex engines.
WS_TRIM_PATTERN = r"^[ \t\n\r\f\x0B]+|[ \t\n\r\f\x0B]+$"


def _strip(s: str) -> str:
    return re.sub(WS_TRIM_PATTERN, "", s)


def _trim_col(c: Column) -> Column:
    return F.regexp_replace(c, WS_TRIM_PATTERN, "")


def sql_trim(expr: str) -> str:
    """DuckDB twin of _strip/_trim_col ('g': replace both anchored ends —
    Java/Python regexp_replace are replace-all, DuckDB defaults to first)."""
    return f"regexp_replace({expr}, '{WS_TRIM_PATTERN}', '', 'g')"


def parse_address(value) -> tuple[str, str]:
    """(name, address) for the FIRST address in `value` — the pure-Python
    spec the Spark and DuckDB twins must match."""
    if not isinstance(value, str) or not _strip(value):
        return "", ""
    s = _strip(value)
    if "<" in s:
        addr = re.search(_ANGLE_ADDR, s)
        pre = re.search(_PRE_ANGLE, s)
        name = _strip(pre.group(1)) if pre else ""
        q = re.match(_QUOTED, name)
        if q:
            name = q.group(1)
        return name, (_strip(addr.group(1)) if addr else "")
    if "(" in s:
        comment = re.search(_COMMENT, s)
        pre = re.search(_PRE_PAREN, s)
        return (
            _strip(comment.group(1)) if comment else "",
            _strip(pre.group(1)) if pre else "",
        )
    first = _strip(re.match(_FIRST_ITEM, s).group(1))
    if "@" in first:
        return "", first
    return s, ""


def display_author(name: str, address: str, raw) -> str:
    """The reference's preference rule: name || address || raw
    (lib/feedparser.js:616-618)."""
    raw_s = _strip(raw) if isinstance(raw, str) else ""
    return name or address or raw_s


def author_fields_cols(col) -> tuple[Column, Column, Column]:
    """(author_name, author_address, author) as pure-JVM regexp columns —
    byte-identical to parse_address/display_author (pinned by
    tests/test_authors.py on the truth table)."""
    raw = F.col(col) if isinstance(col, str) else col
    s = _trim_col(F.coalesce(raw, F.lit("")))

    has_angle = s.contains("<")
    has_paren = s.contains("(")

    pre_angle = _trim_col(F.regexp_extract(s, _PRE_ANGLE, 1))
    unquoted = F.when(
        pre_angle.rlike(_QUOTED), F.regexp_extract(pre_angle, _QUOTED, 1)
    ).otherwise(pre_angle)
    angle_addr = _trim_col(F.regexp_extract(s, _ANGLE_ADDR, 1))

    comment = _trim_col(F.regexp_extract(s, _COMMENT, 1))
    pre_paren = _trim_col(F.regexp_extract(s, _PRE_PAREN, 1))

    first = _trim_col(F.regexp_extract(s, _FIRST_ITEM, 1))
    first_is_addr = first.contains("@")

    name = (
        F.when(s == "", F.lit(""))
        .when(has_angle, unquoted)
        .when(has_paren, comment)
        .when(first_is_addr, F.lit(""))
        .otherwise(s)
    )
    address = (
        F.when(s == "", F.lit(""))
        .when(has_angle, angle_addr)
        .when(has_paren, pre_paren)
        .when(first_is_addr, first)
        .otherwise(F.lit(""))
    )
    author = F.when(name != "", name).when(address != "", address).otherwise(s)
    return name, address, author


def author_fields_sql(expr: str) -> dict[str, str]:
    """DuckDB SQL snippets computing exactly author_fields_cols(expr).
    Returns {'name': ..., 'address': ..., 'author': ...}; embed inside a
    CTE that binds `s` to sql_trim("coalesce(expr, '')")."""
    del expr  # callers bind s in their CTE; patterns below reference s
    pre_angle = sql_trim(f"regexp_extract(s, '{_PRE_ANGLE}', 1)")
    unquoted = (
        f"CASE WHEN regexp_matches({pre_angle}, '{_QUOTED}') "
        f"THEN regexp_extract({pre_angle}, '{_QUOTED}', 1) ELSE {pre_angle} END"
    )
    angle_addr = sql_trim(f"regexp_extract(s, '{_ANGLE_ADDR}', 1)")
    comment = sql_trim(f"regexp_extract(s, '{_COMMENT}', 1)")
    pre_paren = sql_trim(f"regexp_extract(s, '{_PRE_PAREN}', 1)")
    first = sql_trim(f"regexp_extract(s, '{_FIRST_ITEM}', 1)")
    name = f"""CASE WHEN s = '' THEN ''
          WHEN contains(s, '<') THEN {unquoted}
          WHEN contains(s, '(') THEN {comment}
          WHEN contains({first}, '@') THEN ''
          ELSE s END"""
    address = f"""CASE WHEN s = '' THEN ''
          WHEN contains(s, '<') THEN {angle_addr}
          WHEN contains(s, '(') THEN {pre_paren}
          WHEN contains({first}, '@') THEN {first}
          ELSE '' END"""
    return {"name": name, "address": address}
