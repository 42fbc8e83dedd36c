"""JS `new Date()` long-tail parsing (reference lib/feedparser.js:523,884):
the precedence_dates normalization chain must replicate the ECMA-262
Date.parse legacy rules — the 11 fixed-offset zone names, the 2-digit-year
pivot (yy >= 50 -> 19yy else 20yy), and weekday-token tolerance — as
table-driven rows checked against hand-computed UTC instants.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from __spark_entry__ import _JS_DATE_ZONES


def _parse(spark, strings):
    """Apply the exact normalization + parse chain q_precedence_dates uses
    to arbitrary date strings (session-tz independent)."""
    df = spark.createDataFrame([(s,) for s in strings], "date_str string")
    tz = spark.conf.get("spark.sql.session.timeZone")
    no_dow = F.regexp_replace("date_str", r"^[A-Za-z]{3}, ", "")
    named = no_dow
    for zone, off in _JS_DATE_ZONES:
        named = F.regexp_replace(named, f" {zone}$", f" {off}")
    named = F.regexp_replace(
        named, r"^(\d{1,2} [A-Za-z]{3} )([5-9][0-9])( )", r"$119$2$3"
    )
    named = F.regexp_replace(
        named, r"^(\d{1,2} [A-Za-z]{3} )([0-4][0-9])( )", r"$120$2$3"
    )
    parsed = F.to_utc_timestamp(
        F.try_to_timestamp(named, F.lit("dd MMM yyyy HH:mm:ss Z")), tz
    )
    out = df.select("date_str", parsed.alias("ts")).toPandas()
    return dict(zip(out["date_str"], out["ts"]))


# (input, expected UTC instant) — expectations hand-derived from the
# ECMA-262 Date.parse fixed-offset table; verified against node's
# new Date(...).toISOString() behavior for the reference's runtime
CASES = [
    # all 11 legacy zone names at the same wall time
    ("02 Mar 1998 12:00:00 GMT", "1998-03-02 12:00:00"),
    ("02 Mar 1998 12:00:00 UTC", "1998-03-02 12:00:00"),
    ("02 Mar 1998 12:00:00 UT", "1998-03-02 12:00:00"),
    ("02 Mar 1998 12:00:00 EST", "1998-03-02 17:00:00"),
    ("02 Mar 1998 12:00:00 EDT", "1998-03-02 16:00:00"),
    ("02 Mar 1998 12:00:00 CST", "1998-03-02 18:00:00"),
    ("02 Mar 1998 12:00:00 CDT", "1998-03-02 17:00:00"),
    ("02 Mar 1998 12:00:00 MST", "1998-03-02 19:00:00"),
    ("02 Mar 1998 12:00:00 MDT", "1998-03-02 18:00:00"),
    ("02 Mar 1998 12:00:00 PST", "1998-03-02 20:00:00"),
    ("02 Mar 1998 12:00:00 PDT", "1998-03-02 19:00:00"),
    # weekday token stripped, like the reference's tolerant parser
    ("Mon, 02 Mar 1998 12:00:00 PST", "1998-03-02 20:00:00"),
    # 2-digit-year pivot: 49 -> 2049, 50 -> 1950, 99 -> 1999, 00 -> 2000
    ("02 Mar 49 12:00:00 GMT", "2049-03-02 12:00:00"),
    ("02 Mar 50 12:00:00 GMT", "1950-03-02 12:00:00"),
    ("02 Mar 99 12:00:00 GMT", "1999-03-02 12:00:00"),
    ("02 Mar 00 12:00:00 GMT", "2000-03-02 12:00:00"),
    # 2-digit year combined with a named zone (the k=5 fixture shape)
    ("Thu, 02 Sep 99 15:04:05 PST", "1999-09-02 23:04:05"),
    # numeric offsets still parse unchanged through the same chain
    ("02 Mar 1998 15:04:05 +0530", "1998-03-02 09:34:05"),
]


def test_js_date_long_tail_table(spark):
    got = _parse(spark, [c[0] for c in CASES])
    for text, want in CASES:
        assert got[text] == pd.Timestamp(want), (
            f"{text!r}: got {got[text]}, want {want}"
        )


def test_unknown_zone_is_nan_like_js(spark):
    """JS Date.parse rejects zone names outside the spec list (e.g. IST,
    AEST) — the chain must yield NULL, never a silently-wrong offset."""
    got = _parse(
        spark,
        ["02 Mar 1998 12:00:00 IST", "02 Mar 1998 12:00:00 AEST"],
    )
    assert all(pd.isna(v) for v in got.values())


def test_four_digit_years_unaffected_by_pivot(spark):
    """The 2-digit pivot regex must not fire on 4-digit years whose first
    two digits fall in [50, 99] or [00, 49]."""
    got = _parse(
        spark,
        ["02 Mar 2150 12:00:00 GMT", "02 Mar 2049 12:00:00 GMT"],
    )
    assert got["02 Mar 2150 12:00:00 GMT"] == pd.Timestamp("2150-03-02 12:00:00")
    assert got["02 Mar 2049 12:00:00 GMT"] == pd.Timestamp("2049-03-02 12:00:00")
