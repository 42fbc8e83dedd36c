"""semantic_dedupe (SemDeDup shape): within-cluster cosine pairs are
transitively closed and first-wins keepered; cross-cluster pairs are the
documented recall trade.  Geometry is hand-built 2-D so every pair's cosine
is a known angle."""

import math

from pyspark.sql import functions as F

from node_feedparser_spark.operators.similarity import (
    cosine_threshold_pairs,
    semantic_dedupe,
)


def _vec(deg: float):
    r = math.radians(deg)
    return [float(math.cos(r)), float(math.sin(r))]


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_transitive_chain_collapses_and_keeper_is_min_id(spark):
    # cell 0 centroid at 0 deg, cell 1 centroid at 90 deg (vec_id < n_cells)
    docs = _emb(
        spark,
        [
            (0, _vec(0)),    # centroid A, also a corpus member
            (1, _vec(90)),   # centroid B
            (2, _vec(-5)),   # ~A: pairs with 0 (5d) and 3 (25d)
            (3, _vec(20)),   # pairs with 2 and 4 (25d each), NOT 0 (20d ok!)
            (4, _vec(40)),   # pairs with 3 only among A (45d to 2)
            (5, _vec(85)),   # ~B: pairs with 1 (5d)
            (6, _vec(60)),   # cell B (30d to B < 60d to A); pairs with 5 (25d)
        ],
    )
    # threshold 0.9 ~= cos(25.8 deg): 20d/25d pairs qualify, 45d+ do not
    got = {r.vec_id: r for r in semantic_dedupe(docs, 0.9, n_cells=2).collect()}
    assert {v: got[v].cell for v in got} == {
        0: 0, 1: 1, 2: 0, 3: 0, 4: 0, 5: 1, 6: 1,
    }
    # A-chain 0-2-3-4 is one group even though cos(0,4)=cos(40d) < 0.9
    assert [got[v].group_id for v in (0, 2, 3, 4)] == [0, 0, 0, 0]
    assert [got[v].group_id for v in (1, 5, 6)] == [1, 1, 1]
    assert got[0].is_keeper and got[1].is_keeper
    assert not any(got[v].is_keeper for v in (2, 3, 4, 5, 6))


def test_cross_cell_pair_is_the_documented_recall_trade(spark):
    """A qualifying pair straddling the 45-deg cell boundary is missed by
    the blocked plan (each side is a singleton) while the exact pair join
    finds it — the SemDeDup recall<1 contract, pinned."""
    docs = _emb(
        spark,
        [(0, _vec(0)), (1, _vec(90)), (7, _vec(44)), (8, _vec(46))],
    )
    got = {r.vec_id: r for r in semantic_dedupe(docs, 0.9, n_cells=2).collect()}
    assert got[7].cell == 0 and got[8].cell == 1
    assert all(r.is_keeper and r.group_id == v for v, r in got.items())
    exact = cosine_threshold_pairs(docs, 0.9).collect()
    assert {(r.doc_a, r.doc_b) for r in exact} == {(7, 8)}


def test_single_cell_equals_exact_pair_closure(spark):
    """With n_cells=1 every vector shares the cell, so the blocked pair set
    IS the exact pair set and the grouping equals the exact-twin closure."""
    from node_feedparser_spark.operators.components import (
        connected_components,
    )

    docs = _emb(spark, [(i, _vec(7.0 * i)) for i in range(12)])
    got = {
        (r.vec_id, r.group_id, r.is_keeper)
        for r in semantic_dedupe(docs, 0.9, n_cells=1).collect()
    }
    pairs = cosine_threshold_pairs(docs, 0.9)
    labels = {
        r.node: r.component
        for r in connected_components(
            pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        ).collect()
    }
    want = {
        (i, labels.get(i, i), labels.get(i, i) == i) for i in range(12)
    }
    assert got == want


def test_every_corpus_vector_is_labeled_exactly_once(spark):
    docs = _emb(spark, [(i, _vec(13.0 * i)) for i in range(9)])
    out = semantic_dedupe(docs, 0.95, n_cells=3).collect()
    assert sorted(r.vec_id for r in out) == list(range(9))
    # one keeper per group
    groups = {}
    for r in out:
        groups.setdefault(r.group_id, []).append(r)
    for g, members in groups.items():
        assert sum(r.is_keeper for r in members) == 1
        assert min(r.vec_id for r in members) == g
