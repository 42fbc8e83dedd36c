"""Markov chain (operators/markov.py): hand transition matrix, power-step
arithmetic, cross-user boundary isolation, emitter equality."""

import datetime as dt

import pytest

from node_feedparser_spark.operators.markov import markov_chain, markov_sql


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


ROWS = [
    # user 1: a -> b -> a -> b      user 2: b -> c      user 3: a (no pair)
    (1, 1, "a", 0), (2, 1, "b", 10), (3, 1, "a", 20), (4, 1, "b", 30),
    (5, 2, "b", 0), (6, 2, "c", 5),
    (7, 3, "a", 0),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [(e, u, t, _ts(s)) for e, u, t, s in ROWS],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


def test_hand_transition_matrix(events):
    got = {
        (r.cur, r.nxt): (r.n, r.p)
        for r in markov_chain(events, n_steps=2).collect()
    }
    # counts: a->b x2 (user1), b->a x1 (user1), b->c x1 (user2)
    assert got[("a", "b")][:1] == (2,)
    assert got[("a", "b")][1] == 1.0       # a always -> b
    assert got[("b", "a")] == (1, 0.5)
    assert got[("b", "c")] == (1, 0.5)
    assert len(got) == 3                    # no cross-user (c -> a etc.)


def test_power_steps_by_hand(events):
    # states {a,b,c}, uniform start m0 = 0.333333 each (rounded 6dp)
    # step1: a: from b 0.5*m0 ; b: from a 1.0*m0 ; c: from b 0.5*m0
    # NB: 0.5 * 0.333333 lands EXACTLY on the 6dp half boundary — Spark and
    # DuckDB both round HALF_UP while Python's round() is banker's, so the
    # hand replication must use HALF_UP too
    import decimal

    def round(x, dp):  # noqa: A001 - deliberate HALF_UP shadow
        q = decimal.Decimal(10) ** -dp
        return float(
            decimal.Decimal(repr(x)).quantize(
                q, rounding=decimal.ROUND_HALF_UP
            )
        )

    m0 = round(1 / 3, 6)
    s1 = {
        "a": round(0.5 * m0, 6),
        "b": round(1.0 * m0, 6),
        "c": round(0.5 * m0, 6),
    }
    s2 = {
        "a": round(0.5 * s1["b"], 6),
        "b": round(1.0 * s1["a"], 6),
        "c": round(0.5 * s1["b"], 6),
    }
    got = {
        r.nxt: r.p_step_k for r in markov_chain(events, n_steps=2).collect()
    }
    assert got["a"] == pytest.approx(s2["a"], abs=1e-9)
    assert got["b"] == pytest.approx(s2["b"], abs=1e-9)
    assert got["c"] == pytest.approx(s2["c"], abs=1e-9)


def test_row_probabilities_sum_to_one(events):
    rows = markov_chain(events, n_steps=1).collect()
    by_cur = {}
    for r in rows:
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p
    for c, s in by_cur.items():
        assert s == pytest.approx(1.0, abs=1e-5), c


def test_matches_duckdb_emitter(events):
    import duckdb

    got = sorted(
        map(tuple, markov_chain(events, n_steps=2).collect())
    )
    con = duckdb.connect()
    con.register("events", events.toPandas())
    want = sorted(map(tuple, con.execute(markov_sql(n_steps=2)).fetchall()))
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert g[2] == w[2]
        assert g[3] == pytest.approx(w[3], abs=1e-9)
        assert g[4] == pytest.approx(w[4], abs=1e-9)


def test_validation(events):
    with pytest.raises(ValueError):
        markov_chain(events, n_steps=0)
