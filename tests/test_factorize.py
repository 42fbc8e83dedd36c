"""Rank-2 ALS (operators/factorize.py): numpy closed-form replication,
reconstruction-quality property, determinism, oracle-emitter sanity."""

import numpy as np
import pytest

from node_feedparser_spark.operators.factorize import (
    LAM,
    als_factorize,
    als_sql,
    init_item_factors,
    interaction_counts,
)

ROWS = [
    # (user_id, event_type) multiplicities -> a small implicit matrix
    *([(1, "a")] * 5), *([(1, "b")] * 1),
    *([(2, "a")] * 4), *([(2, "b")] * 2), *([(2, "c")] * 1),
    *([(3, "b")] * 6), *([(3, "c")] * 3),
    *([(4, "c")] * 7),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(ROWS, "user_id long, event_type string")


def _np_als(ratings, items0, n_alt, lam):
    """Independent numpy replication of the rounded alternations."""
    users = {}
    items = dict(items0)

    def solve(keys, rated, other):
        out = {}
        for k in keys:
            A = np.zeros((2, 2))
            b = np.zeros(2)
            for o, r in rated[k]:
                v = np.array(other[o])
                A += np.outer(v, v)
                b += r * v
            A = np.round(A, 6)
            b = np.round(b, 6)
            A += lam * np.eye(2)
            det = A[0, 0] * A[1, 1] - A[0, 1] * A[0, 1]
            out[k] = (
                round((A[1, 1] * b[0] - A[0, 1] * b[1]) / det, 6),
                round((A[0, 0] * b[1] - A[0, 1] * b[0]) / det, 6),
            )
        return out

    by_user, by_item = {}, {}
    for (u, i), r in ratings.items():
        by_user.setdefault(u, []).append((i, r))
        by_item.setdefault(i, []).append((u, r))
    for _ in range(n_alt):
        users = solve(by_user, by_user, items)
        items = solve(by_item, by_item, users)
    users = solve(by_user, by_user, items)
    return users, items


def _ratings_dict():
    from collections import Counter

    return {k: float(v) for k, v in Counter(ROWS).items()}


def test_matches_numpy_replication(spark, events):
    ratings = _ratings_dict()
    items0 = {
        r.event_type: (r.v1, r.v2)
        for r in init_item_factors(
            interaction_counts(events)
        ).withColumnRenamed("item", "event_type").collect()
    }
    want_u, want_i = _np_als(ratings, items0, n_alt=2, lam=LAM)
    got_u, got_i = als_factorize(events, n_alt=2)
    gu = {r.user_id: (r.v1, r.v2) for r in got_u.collect()}
    gi = {r.event_type: (r.v1, r.v2) for r in got_i.collect()}
    for u in want_u:
        assert gu[u] == pytest.approx(want_u[u], abs=1e-9), u
    for i in want_i:
        assert gi[i] == pytest.approx(want_i[i], abs=1e-9), i


def test_reconstruction_improves_over_init(spark, events):
    # u.v should approximate the rating matrix better than the raw init
    ratings = _ratings_dict()
    items0 = {
        r.event_type: np.array([r.v1, r.v2])
        for r in init_item_factors(
            interaction_counts(events)
        ).withColumnRenamed("item", "event_type").collect()
    }
    got_u, got_i = als_factorize(events, n_alt=2)
    gu = {r.user_id: np.array([r.v1, r.v2]) for r in got_u.collect()}
    gi = {r.event_type: np.array([r.v1, r.v2]) for r in got_i.collect()}
    sse = sum(
        (float(gu[u] @ gi[i]) - r) ** 2 for (u, i), r in ratings.items()
    )
    sse0 = sum(
        (1.0 * (items0[i] @ items0[i]) - r) ** 2
        for (u, i), r in ratings.items()
    )
    n = len(ratings)
    assert (sse / n) ** 0.5 < 1.5  # tight fit on a rank-friendly matrix
    assert sse < sse0


def test_deterministic(spark, events):
    a = sorted(map(tuple, als_factorize(events, n_alt=2)[0].collect()))
    b = sorted(map(tuple, als_factorize(events, n_alt=2)[0].collect()))
    assert a == b


def test_sql_emitter_runs_in_duckdb(spark, events):
    import duckdb

    pdf = events.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    got = {
        int(u): (v1, v2)
        for u, v1, v2 in con.execute(als_sql(n_alt=2)).fetchall()
    }
    want = {
        r.user_id: (r.v1, r.v2)
        for r in als_factorize(events, n_alt=2)[0].collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-9), u


def test_validation(spark, events):
    with pytest.raises(ValueError):
        als_factorize(events, n_alt=0)
