"""J4 addressparser long tail: truth table for parse_address, and
three-face agreement (pure Python == Spark JVM regexp == DuckDB SQL)
on every shape (reference lib/feedparser.js:606-619 preference rules)."""

import duckdb
import pandas as pd
import pytest

from node_feedparser_spark.functions.authors import (
    author_fields_cols,
    author_fields_sql,
    display_author,
    parse_address,
    sql_trim,
)

# (input, name, address) — the addressparser shapes feeds actually use
TRUTH = [
    ("John Doe <john@example.com>", "John Doe", "john@example.com"),
    ('"Doe, John" <john@example.com>', "Doe, John", "john@example.com"),
    ('"Doe, John Jr." <j@e.com>, second@e.com', "Doe, John Jr.", "j@e.com"),
    ("john@example.com (John Doe)", "John Doe", "john@example.com"),
    ("john@example.com", "", "john@example.com"),
    ("John Doe", "John Doe", ""),
    ("john@example.com, jane@example.com", "", "john@example.com"),
    ("  padded <p@e.com>  ", "padded", "p@e.com"),
    # non-space whitespace: str.strip() vs trim() divergence regression
    ("\tTabbed Name\n", "Tabbed Name", ""),
    ("\t Mixed Pad <m@e.com> \r\n", "Mixed Pad", "m@e.com"),
    ("<bare@example.com>", "", "bare@example.com"),
    ("weird <>", "weird", ""),
    ("(Comment Only)", "Comment Only", ""),
    ("", "", ""),
    ("   ", "", ""),
    ("\t\n", "", ""),
    (None, "", ""),
]


@pytest.mark.parametrize("value,name,address", TRUTH)
def test_parse_address_truth_table(value, name, address):
    assert parse_address(value) == (name, address)


def test_display_author_preference():
    # name || address || raw (lib/feedparser.js:616-618)
    assert display_author("N", "a@b", "raw") == "N"
    assert display_author("", "a@b", "raw") == "a@b"
    assert display_author("", "", "raw") == "raw"
    assert display_author("", "", None) == ""


def test_spark_twin_matches_python(spark):
    rows = [(i, v) for i, (v, _, _) in enumerate(TRUTH)]
    df = spark.createDataFrame(rows, "row_id long, value string")
    n, a, d = author_fields_cols("value")
    got = {
        r["row_id"]: (r["n"], r["a"], r["d"])
        for r in df.select(
            "row_id", n.alias("n"), a.alias("a"), d.alias("d")
        ).collect()
    }
    for i, (value, name, address) in enumerate(TRUTH):
        assert got[i] == (name, address, display_author(name, address, value)), (
            i,
            value,
        )


def test_duckdb_twin_matches_python():
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"row_id": range(len(TRUTH)), "value": [v for v, _, _ in TRUTH]}
    )
    con.register("authors", pdf)
    parts = author_fields_sql("value")
    out = con.execute(
        f"""
        WITH b AS (SELECT row_id, value,
                          {sql_trim("coalesce(value, '')")} AS s
                   FROM authors)
        SELECT row_id, {parts['name']} AS n, {parts['address']} AS a
        FROM b ORDER BY row_id
        """
    ).df()
    for i, (value, name, address) in enumerate(TRUTH):
        assert (out["n"][i], out["a"][i]) == (name, address), (i, value)
