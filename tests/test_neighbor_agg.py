"""neighbor_agg: hand-computed mixing, hash-sample verification, 2-hop
propagation, determinism."""

import hashlib

from node_feedparser_spark.operators.graph_algo import neighbor_agg


def _h60(seed, src, dst):
    s = f"{seed}\x1f{src}\x1f{dst}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src_id", "dst_id"])


def _feats(spark, d):
    return spark.createDataFrame(list(d.items()), ["node", "feat"])


def _out(df):
    return {r["node"]: (r["feat0"], r["feat"]) for r in df.collect()}


def test_one_hop_mean_mixing(spark):
    e = _edges(spark, [("a", "b"), ("a", "c")])
    f = {"a": 1.0, "b": 3.0, "c": 5.0}
    out = _out(neighbor_agg(e, _feats(spark, f), n_hops=1))
    # a mixes with mean(3, 5) = 4 -> 0.5*1 + 0.5*4 = 2.5
    assert out["a"] == (1.0, 2.5)
    # b and c have no out-edges -> unchanged
    assert out["b"] == (3.0, 3.0)
    assert out["c"] == (5.0, 5.0)


def test_isolated_node_keeps_feature(spark):
    e = _edges(spark, [("a", "b")])
    f = {"a": 1.0, "b": 2.0, "z": 9.0}
    out = _out(neighbor_agg(e, _feats(spark, f), n_hops=2))
    assert out["z"] == (9.0, 9.0)


def test_two_hops_propagate_two_steps(spark):
    # a -> b -> c: after 2 hops, c's feature reaches a (via b's hop-1 mix)
    e = _edges(spark, [("a", "b"), ("b", "c")])
    f = {"a": 0.0, "b": 0.0, "c": 8.0}
    out = _out(neighbor_agg(e, _feats(spark, f), n_hops=2))
    # hop1: b = 0.5*0 + 0.5*8 = 4; a = 0.5*0 + 0.5*0 = 0
    # hop2: a = 0.5*0 + 0.5*4 = 2
    assert out["a"] == (0.0, 2.0)
    assert out["b"] == (0.0, 6.0)  # 0.5*4 + 0.5*8
    assert out["c"] == (8.0, 8.0)


def test_fanout_sample_matches_hash_rank(spark):
    # hub with 5 neighbors, fanout 2: the sampled pair is the 2 smallest
    # (hash, dst) — recompute the rank independently with hashlib
    nbrs = [f"n{i}" for i in range(5)]
    feats = {"hub": 0.0}
    feats.update({n: float(10 * (i + 1)) for i, n in enumerate(nbrs)})
    picked = sorted(nbrs, key=lambda d: (_h60(23, "hub", d), d))[:2]
    want = 0.5 * (feats[picked[0]] + feats[picked[1]]) / 2
    e = _edges(spark, [("hub", n) for n in nbrs])
    out = _out(neighbor_agg(e, _feats(spark, feats), n_hops=1, fanout=2, seed=23))
    assert out["hub"][1] == round(want, 6)


def test_seed_changes_sample(spark):
    nbrs = [f"n{i}" for i in range(8)]
    feats = {"hub": 0.0}
    feats.update({n: float(2 ** i) for i, n in enumerate(nbrs)})
    e = _edges(spark, [("hub", n) for n in nbrs])
    vals = {
        s: _out(neighbor_agg(e, _feats(spark, feats), n_hops=1, fanout=3, seed=s))[
            "hub"
        ][1]
        for s in (1, 2, 3, 4)
    }
    assert len(set(vals.values())) > 1


def test_deterministic_across_runs(spark):
    pairs = [(f"u{i % 7}", f"u{(i * 3) % 7}") for i in range(30) if i % 7 != (i * 3) % 7]
    feats = {f"u{i}": float(i * i) for i in range(7)}
    e = _edges(spark, pairs)
    a = sorted(_out(neighbor_agg(e, _feats(spark, feats), n_hops=2, fanout=2)).items())
    b = sorted(_out(neighbor_agg(e, _feats(spark, feats), n_hops=2, fanout=2)).items())
    assert a == b


def test_parallel_edges_collapse(spark):
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "b"), ("a", "c")])
    f = {"a": 0.0, "b": 4.0, "c": 8.0}
    out = _out(neighbor_agg(e, _feats(spark, f), n_hops=1))
    # mean over DISTINCT neighbors {b, c} = 6 -> 3.0 (not biased toward b)
    assert out["a"][1] == 3.0
