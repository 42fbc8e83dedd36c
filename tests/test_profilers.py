"""fk_orphans + column_profile (operators/profile.py)."""

from node_feedparser_spark.operators.profile import column_profile, fk_orphans


def test_fk_orphans_counts_missing_and_null_keys(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_orphans(child, parent, "k", "pk", "c->p").collect()[0]
    assert (r["relation"], r["n_child"], r["n_orphan"]) == ("c->p", 4, 2)
    assert r["orphan_rate"] == 0.5


def test_fk_orphans_healthy_relation_is_zero(spark):
    child = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    r = fk_orphans(child, parent, "k", "pk", "ok").collect()[0]
    assert r["n_orphan"] == 0 and r["orphan_rate"] == 0.0


def test_column_profile_counts_and_lexicographic_extremes(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 2), (None, 10), ("b", None)],
        "s string, n int",
    )
    got = {r["column"]: r for r in column_profile(df, ["s", "n"]).collect()}
    assert got["s"]["n_rows"] == 4 and got["s"]["n_null"] == 1
    assert got["s"]["n_distinct"] == 2
    assert (got["s"]["min_s"], got["s"]["max_s"]) == ("a", "b")
    # lexicographic BY CONTRACT: "10" < "2"
    assert (got["n"]["min_s"], got["n"]["max_s"]) == ("10", "2")
    assert got["n"]["n_null"] == 1 and got["n"]["n_distinct"] == 2


def test_l_diversity_flags_homogeneous_groups_only(spark):
    from node_feedparser_spark.operators.profile import (
        l_diversity_violations,
    )

    rows = [
        # group (en, a): 3 rows, all sensitive=x -> violates l=2
        ("en", "a", "x"), ("en", "a", "x"), ("en", "a", "x"),
        # group (en, b): 2 distinct -> passes l=2, violates l=3
        ("en", "b", "x"), ("en", "b", "y"),
        # group (fr, a): NULL is its own disclosure value: {NULL, x} = 2
        ("fr", "a", None), ("fr", "a", "x"),
    ]
    df = spark.createDataFrame(rows, "lang string, src string, s string")
    got2 = {
        (r["lang"], r["src"]): (r["n"], r["n_distinct_sensitive"])
        for r in l_diversity_violations(
            df, ["lang", "src"], "s", l=2
        ).collect()
    }
    assert got2 == {("en", "a"): (3, 1)}
    got3 = {
        (r["lang"], r["src"]): (r["n"], r["n_distinct_sensitive"])
        for r in l_diversity_violations(
            df, ["lang", "src"], "s", l=3
        ).collect()
    }
    assert got3 == {
        ("en", "a"): (3, 1),
        ("en", "b"): (2, 2),
        ("fr", "a"): (2, 2),
    }


def test_l_diversity_argument_guards(spark):
    import pytest as _pytest

    from node_feedparser_spark.operators.profile import (
        l_diversity_violations,
    )

    df = spark.createDataFrame([("a", "b")], "q string, s string")
    with _pytest.raises(ValueError):
        l_diversity_violations(df, [], "s", l=3)
    with _pytest.raises(ValueError):
        l_diversity_violations(df, ["q"], "s", l=1)
    with _pytest.raises(ValueError):
        l_diversity_violations(df, ["q"], "q", l=2)
