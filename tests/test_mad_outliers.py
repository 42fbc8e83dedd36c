"""MAD outliers (curation.mad_outliers): hand stats, masking resistance,
zero-MAD guard, DuckDB quantile_cont agreement."""

import pytest

from node_feedparser_spark.operators.curation import mad_outliers

ROWS = [
    # group 'a': tight cluster around 10 plus one wild point
    (1, "a", 10.0), (2, "a", 10.5), (3, "a", 9.5), (4, "a", 10.2),
    (5, "a", 9.8), (6, "a", 100.0),
    # group 'b': constant -> MAD 0 -> no outliers ever
    (7, "b", 5.0), (8, "b", 5.0), (9, "b", 5.0),
    # group 'c': symmetric spread, no outliers at k=3.5
    (10, "c", 1.0), (11, "c", 2.0), (12, "c", 3.0), (13, "c", 4.0),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        ROWS, "event_id long, event_type string, value double"
    )


def test_flags_only_the_wild_point(events):
    got = mad_outliers(events).collect()
    assert [(r.event_id, r.event_type) for r in got] == [(6, "a")]


def test_hand_stats(events):
    r = mad_outliers(events).collect()[0]
    # group a sorted: 9.5 9.8 10.0 10.2 10.5 100.0 -> med = (10.0+10.2)/2
    assert r.med == pytest.approx(10.1)
    # |x - 10.1|: 0.6 0.3 0.1 0.1 0.4 89.9 -> med = (0.3+0.4)/2 = 0.35
    assert r.mad == pytest.approx(0.35)
    assert r.rz == pytest.approx(round(0.6745 * 89.9 / 0.35, 4))


def test_masking_resistance(spark):
    # mean/std would let two huge points inflate sigma; MAD does not
    rows = [(i, "g", 1.0 + i * 0.01) for i in range(20)] + [
        (100, "g", 1000.0),
        (101, "g", 2000.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = {r.event_id for r in mad_outliers(df).collect()}
    assert got == {100, 101}


def test_zero_mad_group_is_silent(events):
    assert not [
        r for r in mad_outliers(events).collect() if r.event_type == "b"
    ]


def test_matches_duckdb_quantile_cont(events):
    import duckdb

    con = duckdb.connect()
    con.register("ev", events.toPandas())
    want = con.execute("""
        WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                     FROM ev GROUP BY 1),
        mad AS (SELECT e.event_type,
                       quantile_cont(abs(e.value - m.med), 0.5) AS mad
                FROM ev e JOIN med m USING (event_type) GROUP BY 1)
        SELECT e.event_id,
               ROUND(0.6745 * (e.value - m.med) / d.mad, 4) AS rz
        FROM ev e JOIN med m USING (event_type)
                  JOIN mad d USING (event_type)
        WHERE d.mad > 0 AND abs(ROUND(0.6745 * (e.value - m.med) / d.mad, 4)) > 3.5
    """).fetchall()
    got = [(r.event_id, r.rz) for r in mad_outliers(events).collect()]
    assert sorted(got) == sorted([(int(i), z) for i, z in want])
