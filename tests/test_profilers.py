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
