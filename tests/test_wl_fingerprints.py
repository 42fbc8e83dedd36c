"""wl_fingerprints: 1-WL color refinement — hand-computed md5 chains on
tiny graphs (the hash recurrence is the contract), structural-equivalence
classes a reader can verify by symmetry (path mirror, star leaves,
disjoint isomorphic triangles), and directed-sink refinement."""

import hashlib

from node_feedparser_spark.operators.graph_algo import wl_fingerprints


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_id string, dst_id string")


def _und(pairs):
    return pairs + [(b, a) for a, b in pairs]


def _h(own, nbrs):
    # the operator's refinement step: md5(own || '|' || ','.join(sorted))
    s = own + "|" + ",".join(sorted(nbrs))
    return hashlib.md5(s.encode()).hexdigest()[:16]


def test_path3_matches_hand_md5_chain(spark):
    # a - b - c undirected: degrees 1,2,1; ends are structurally
    # equivalent at every round, the middle never joins them
    got = (
        wl_fingerprints(_edges(spark, _und([("a", "b"), ("b", "c")])), rounds=2)
        .toPandas()
        .set_index("node")
    )
    a1, b1 = _h("1", ["2"]), _h("2", ["1", "1"])
    a2, b2 = _h(a1, [b1]), _h(b1, [a1, a1])
    assert got.loc["a", "wl0"] == "1" and got.loc["b", "wl0"] == "2"
    assert got.loc["a", "wl"] == a2 == got.loc["c", "wl"]
    assert got.loc["b", "wl"] == b2
    assert int(got.loc["a", "class_size"]) == 2
    assert int(got.loc["b", "class_size"]) == 1


def test_star_leaves_share_one_class(spark):
    pairs = [("hub", f"l{i}") for i in range(5)]
    got = (
        wl_fingerprints(_edges(spark, _und(pairs)), rounds=2)
        .toPandas()
        .set_index("node")
    )
    leaf_labels = {got.loc[f"l{i}", "wl"] for i in range(5)}
    assert len(leaf_labels) == 1
    assert got.loc["hub", "wl"] not in leaf_labels
    assert int(got.loc["l0", "class_size"]) == 5
    assert int(got.loc["hub", "class_size"]) == 1


def test_disjoint_isomorphic_triangles_collapse(spark):
    t1 = [("a", "b"), ("b", "c"), ("c", "a")]
    t2 = [("x", "y"), ("y", "z"), ("z", "x")]
    got = wl_fingerprints(_edges(spark, _und(t1 + t2)), rounds=3).toPandas()
    assert got["wl"].nunique() == 1
    assert set(got["class_size"]) == {6}


def test_path6_mirror_symmetry(spark):
    # P6: WL classes must respect the mirror automorphism n_i <-> n_{5-i}
    # and (at 2 rounds) fully separate the three orbit pairs
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(5)]
    got = (
        wl_fingerprints(_edges(spark, _und(pairs)), rounds=2)
        .toPandas()
        .set_index("node")
    )
    for i in range(3):
        assert got.loc[f"n{i}", "wl"] == got.loc[f"n{5 - i}", "wl"]
    assert got["wl"].nunique() == 3
    assert set(got["class_size"]) == {2}


def test_directed_sink_hashes_empty_multiset(spark):
    # a -> b only: b has no out-neighbors, so it refines from the empty
    # multiset ('0|' then chained), not a dropped row
    got = (
        wl_fingerprints(_edges(spark, [("a", "b")]), rounds=2)
        .toPandas()
        .set_index("node")
    )
    b1 = _h("0", [])
    a1 = _h("1", ["0"])
    assert got.loc["b", "wl0"] == "0"
    assert got.loc["b", "wl"] == _h(b1, [])
    assert got.loc["a", "wl"] == _h(a1, [b1])
    assert set(got["class_size"]) == {1}
