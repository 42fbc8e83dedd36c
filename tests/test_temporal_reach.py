"""temporal_reachability: time-respecting BFS — the backward-in-time
path that transmits nothing, equal-timestamp hand-off, a longer path
delivering an EARLIER arrival than the one that first reached the node,
and seed release times gating their own out-edges."""

import datetime

from node_feedparser_spark.operators.graph_algo import temporal_reachability


def _ts(day):
    return datetime.datetime(2024, 1, day)


def _edges(spark, rows):
    return spark.createDataFrame(
        [(u, v, _ts(d)) for u, v, d in rows],
        "src_id string, dst_id string, ts timestamp",
    )


def _seeds(spark, rows):
    return spark.createDataFrame(
        [(n, _ts(d)) for n, d in rows], "node string, arrival timestamp"
    )


def _by_node(df):
    return {r.node: (r.arrival, r.first_hop) for r in df.collect()}


def test_backward_in_time_path_transmits_nothing(spark):
    # a -> b at day 5, b -> c at day 3: topologically a reaches c, but
    # the information arrives at b AFTER the b->c contact happened
    got = _by_node(
        temporal_reachability(
            _edges(spark, [("a", "b", 5), ("b", "c", 3)]),
            _seeds(spark, [("a", 1)]),
            rounds=3,
        )
    )
    assert got["a"] == (_ts(1), 0)
    assert got["b"] == (_ts(5), 1)
    assert "c" not in got


def test_forward_path_and_equal_timestamp_handoff(spark):
    # a->b day 2, b->c day 4 reaches c; b->d at EXACTLY day 2 also
    # forwards (t >= arrival is inclusive)
    got = _by_node(
        temporal_reachability(
            _edges(spark, [("a", "b", 2), ("b", "c", 4), ("b", "d", 2)]),
            _seeds(spark, [("a", 1)]),
            rounds=3,
        )
    )
    assert got["c"] == (_ts(4), 2)
    assert got["d"] == (_ts(2), 2)


def test_longer_path_delivers_earlier_arrival(spark):
    # direct a->b day 10 (first_hop 1), but a->x day 1, x->b day 2
    # lowers b's arrival to day 2 in round 2 — first_hop stays 1
    got = _by_node(
        temporal_reachability(
            _edges(spark, [("a", "b", 10), ("a", "x", 1), ("x", "b", 2)]),
            _seeds(spark, [("a", 1)]),
            rounds=2,
        )
    )
    assert got["b"] == (_ts(2), 1)
    assert got["x"] == (_ts(1), 1)


def test_seed_release_time_gates_first_contact(spark):
    # seed released day 10: its day-5 contact already happened
    got = _by_node(
        temporal_reachability(
            _edges(spark, [("a", "b", 5), ("a", "c", 12)]),
            _seeds(spark, [("a", 10)]),
            rounds=2,
        )
    )
    assert "b" not in got
    assert got["c"] == (_ts(12), 1)


def test_horizon_bounds_hops_not_time(spark):
    # chain of 4 temporal edges, rounds=2: only 2 hops materialize
    rows = [("a", "b", 2), ("b", "c", 3), ("c", "d", 4), ("d", "e", 5)]
    got = _by_node(
        temporal_reachability(
            _edges(spark, rows), _seeds(spark, [("a", 1)]), rounds=2
        )
    )
    assert set(got) == {"a", "b", "c"}
    got4 = _by_node(
        temporal_reachability(
            _edges(spark, rows), _seeds(spark, [("a", 1)]), rounds=4
        )
    )
    assert got4["e"] == (_ts(5), 4)
