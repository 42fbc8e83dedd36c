"""Round-3 scale-safety of the NAMED embedding near-dup query:
cosine_threshold_pairs_auto dispatches brute force only below the cutoff;
above it the blocked IVF plan runs and the corpus is NEVER collected to the
driver (the 100k ValueError guard is unreachable from the named path)."""

import pytest

import node_feedparser_spark.operators.similarity as sim

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"], r["score"]) for r in df.collect()
    }


def test_small_corpus_dispatches_exact(spark, monkeypatch):
    """Below the cutoff the auto path IS the brute-force plan."""
    called = {}
    orig = sim.cosine_threshold_pairs_blocked

    def spy_blocked(*a, **k):
        called["blocked"] = True
        return orig(*a, **k)

    monkeypatch.setattr(sim, "cosine_threshold_pairs_blocked", spy_blocked)
    emb = _emb(spark)
    got = _pairs(sim.cosine_threshold_pairs_auto(emb, threshold=0.4))
    want = _pairs(sim.cosine_threshold_pairs(emb, threshold=0.4))
    assert got == want
    assert "blocked" not in called


def test_large_corpus_never_collects_or_brute_forces(spark, monkeypatch):
    """Above the cutoff: brute force must NOT run, and no driver collect may
    exceed the centroid count — the blocked plan is the only path."""
    emb = _emb(spark)
    n = emb.count()
    cutoff = max(1, n // 2)  # force the 'large' branch on the small fixture
    exact = _pairs(sim.cosine_threshold_pairs(emb, threshold=0.4))

    def forbidden(*a, **k):
        raise AssertionError(
            "brute-force cosine_threshold_pairs invoked above the cutoff"
        )

    max_collected = {"rows": 0}
    orig_collect = sim._collect_matrix

    def counting_collect(df, id_col, vec_col):
        ids, mat = orig_collect(df, id_col, vec_col)
        max_collected["rows"] = max(max_collected["rows"], len(ids))
        return ids, mat

    monkeypatch.setattr(sim, "cosine_threshold_pairs", forbidden)
    monkeypatch.setattr(sim, "_collect_matrix", counting_collect)

    got = sim.cosine_threshold_pairs_auto(
        emb, threshold=0.4, small_n_cutoff=cutoff, n_cells=16, n_probe=4,
        target_cell_rows=10_000,
    )
    got_pairs = _pairs(got)
    # equals the blocked plan at the same parameters
    want = _pairs(sim.cosine_threshold_pairs_blocked(emb, 0.4, 16, 4))
    assert got_pairs == want
    # the only driver collect was the centroid seed, never the corpus
    assert 0 < max_collected["rows"] <= 16
    # recall floor vs brute force (the pinned contract of the blocked plan)
    assert got_pairs <= exact  # zero false positives, identical scores
    assert len(got_pairs) >= 0.9 * len(exact)


def test_cells_scale_with_corpus(spark, monkeypatch):
    """n_cells grows ~n/target_cell_rows so per-block matmuls stay bounded."""
    emb = _emb(spark)
    n = emb.count()
    seen = {}
    orig = sim.cosine_threshold_pairs_blocked

    def spy_blocked(corpus, threshold, n_cells, n_probe, **k):
        seen["n_cells"] = n_cells
        return orig(corpus, threshold, n_cells, n_probe, **k)

    monkeypatch.setattr(sim, "cosine_threshold_pairs_blocked", spy_blocked)
    sim.cosine_threshold_pairs_auto(
        emb, 0.4, small_n_cutoff=1, n_cells=4, target_cell_rows=25
    ).write.format("noop").mode("overwrite").save()
    assert seen["n_cells"] == max(4, n // 25)


def test_guard_unreachable_from_named_query(spark):
    """The brute-force ValueError guard cannot fire via the auto path: the
    brute branch only runs when n <= cutoff == max_side."""
    emb = _emb(spark)
    # direct brute force with a tiny max_side raises...
    with pytest.raises(ValueError, match="pre-block"):
        sim.cosine_threshold_pairs(emb, 0.4, max_side=3).collect()
    # ...but the auto path with the same tiny bound dispatches to blocked
    out = sim.cosine_threshold_pairs_auto(emb, 0.4, small_n_cutoff=3)
    assert out.count() >= 0


def test_ann_recall_eval_semantics(spark):
    """In-plan ANN eval: per-query recall/MRR consistent and in range,
    and perfect whenever the ANN list equals ground truth."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["ann_recall_eval"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "no queries evaluated"
    assert {r.query_id for r in rows} == set(range(8))
    for r in rows:
        assert 0 <= r.n_hit <= 5
        assert r.recall_at_5 == round(r.n_hit / 5.0, 6)
        assert 0.0 <= r.reciprocal_rank <= 1.0
    # IVF with n_probe=4/16 on this tiny corpus recovers most of top-5
    mean_recall = sum(r.recall_at_5 for r in rows) / len(rows)
    assert mean_recall >= 0.6
