"""A-ES weighted sampling: proportionality, determinism, edge cases."""

import pytest

from node_feedparser_spark.operators.curation import weighted_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "grp", "w"])


def test_k1_selection_frequency_tracks_weights(spark):
    # k=1 in each of 300 independent groups (distinct ids -> independent
    # hash draws), light item weight 1 vs heavy weight 9: the heavy item
    # must win ~90% of groups (binomial(300, 0.9): 6 sigma ~ [0.85, 0.95])
    trials = 300
    rows = []
    for g in range(trials):
        rows.append((f"light_{g}", f"g{g}", 1))
        rows.append((f"heavy_{g}", f"g{g}", 9))
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    out = weighted_sample(df, k=1, weight_col="w", group_cols=["grp"], seed=0)
    wins = out.filter("doc_id LIKE 'heavy%'").count()
    assert 0.85 <= wins / trials <= 0.95


def test_without_replacement_and_rank_shape(spark):
    rows = [(i, "g", 10) for i in range(1, 11)]
    out = weighted_sample(
        _docs(spark, rows), k=4, weight_col="w", group_cols=["grp"], seed=3
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) == 4
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4]


def test_groups_sampled_independently(spark):
    rows = [(i, "a", 5) for i in range(1, 4)] + [
        (i, "b", 5) for i in range(10, 13)
    ]
    out = weighted_sample(
        _docs(spark, rows), k=2, weight_col="w", group_cols=["grp"], seed=1
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["doc_id"])
    assert len(by_grp["a"]) == 2 and len(by_grp["b"]) == 2
    assert all(i < 10 for i in by_grp["a"])
    assert all(i >= 10 for i in by_grp["b"])


def test_nonpositive_weights_never_sampled(spark):
    rows = [(1, "g", 0), (2, "g", -3), (3, "g", 1)]
    out = weighted_sample(
        _docs(spark, rows), k=3, weight_col="w", group_cols=["grp"]
    ).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_deterministic_same_seed_differs_across_seeds(spark):
    rows = [(i, "g", i) for i in range(1, 30)]
    df = _docs(spark, rows)
    a = sorted(
        r["doc_id"]
        for r in weighted_sample(df, 5, "w", ["grp"], seed=7).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(df, 5, "w", ["grp"], seed=7).collect()
    )
    assert a == b
    seen = {
        tuple(
            sorted(
                r["doc_id"]
                for r in weighted_sample(df, 5, "w", ["grp"], seed=s).collect()
            )
        )
        for s in range(6)
    }
    assert len(seen) > 1


def test_validation(spark):
    df = _docs(spark, [(1, "g", 1)])
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "w", ["grp"])
    with pytest.raises(ValueError):
        weighted_sample(df, 1, "w", [])
