"""Unit tests for the training-data pipeline operators (dedupe, similarity,
text analysis, multimodal) — semantics the DuckDB oracle harness does not
cover: LSH == brute force, pigeonhole completeness, keeper selection, decode
plumbing/error paths, language ID on real multilingual text."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators import dedupe as dd
from node_feedparser_spark.operators import multimodal as mm
from node_feedparser_spark.operators import similarity as sim
from node_feedparser_spark.operators import text_analysis as ta


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base),
        (1, base + " today"),                      # near-dup of 0
        (2, base.replace("quick", "slow")),        # near-dup of 0
        (3, "completely different text about spark shuffles and joins here"),
        (4, base),                                 # exact dup of 0
        (5, "tiny"),                               # < k tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def brute_force_jaccard_pairs(rows, threshold, k=3):
    def sh(t):
        toks = t.split(" ")
        if len(toks) < k:
            return {t}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    out = []
    for i, (ida, ta_) in enumerate(rows):
        for idb, tb in rows[i + 1 :]:
            a, b = sh(ta_), sh(tb)
            j = len(a & b) / len(a | b)
            if round(j, 6) >= threshold:
                out.append((ida, idb, round(j, 6)))
    return sorted(out)


def test_lsh_equals_brute_force(spark, docs):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dd.lsh_near_dup_pairs(docs, threshold=0.5).collect()
    )
    assert got == brute_force_jaccard_pairs(rows, 0.5)
    assert (0, 4, 1.0) in got  # the exact dup pair


def test_exact_dedupe_first_wins(spark, docs):
    res = {r["keeper_doc_id"]: r["n_copies"] for r in dd.exact_dedupe(docs).collect()}
    assert res[0] == 2  # docs 0 and 4 identical, keeper = min id
    assert sum(res.values()) == 6


def test_near_dup_keepers(spark, docs):
    pairs = dd.lsh_near_dup_pairs(docs, threshold=0.5)
    kept = dd.near_dup_keepers(pairs, docs)
    keep_map = {r["doc_id"]: r["keep"] for r in kept.collect()}
    assert keep_map[0] is True
    assert keep_map[4] is False  # dup of 0 dropped (min-id-wins)
    assert keep_map[3] is True and keep_map[5] is True


def test_simhash_blockjoin_complete(spark, docs):
    """The 4-block pigeonhole join must find EXACTLY the brute-force pairs
    with hamming <= 3 (it is exact, not probabilistic)."""
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs).collect()}
    want = sorted(
        (a, b)
        for a in sh
        for b in sh
        if a < b and bin(sh[a] ^ sh[b]).count("1") <= 3
    )
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in dd.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    )
    assert got == want


def test_simhash_near_dups_are_close(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs).collect()}
    # near-dups differ in few bits; unrelated docs differ in many
    assert bin(sh[0] ^ sh[4]).count("1") == 0
    assert bin(sh[0] ^ sh[1]).count("1") <= 8
    assert bin(sh[0] ^ sh[3]).count("1") > 10


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    mat = rng.randn(40, 8)
    mat[13] = mat[3] + 0.01 * rng.randn(8)  # planted near-dup of 3
    rows = [(i, [float(x) for x in mat[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), mat


def test_cosine_topk_matches_numpy(spark, vectors):
    df, mat = vectors
    got = sim.cosine_topk(df, df.filter(F.col("vec_id") < 5), k=3).collect()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(5):
        order = sorted(
            ((round(sims[q, v], 6), -v) for v in range(40) if v != q), reverse=True
        )[:3]
        want = [(-v, s) for s, v in order]
        rows = sorted(
            (r["rank"], r["vec_id"], r["score"])
            for r in got
            if r["query_id"] == q
        )
        assert [(v, s) for _, v, s in rows] == want


def test_cosine_threshold_pairs_finds_planted(spark, vectors):
    df, _ = vectors
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in sim.cosine_threshold_pairs(df, 0.99).collect()
    }
    assert pairs == {(3, 13)}


def test_kmeans_ivf_recall_vs_brute_force(spark):
    """k-means-refined IVF (2 Lloyd iterations, 4dp-rounded centroids) at
    the query defaults (16 cells, 5 probes) must keep recall >= 0.9 vs the
    exact brute-force top-k on the driver testdata."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["vec_id"]) for r in sim.cosine_topk(emb, q, k=5).collect()
    }
    km = sim.kmeans_centroids(emb, n_cells=16, n_iters=2)
    got = {
        (r["query_id"], r["vec_id"])
        for r in sim.ivf_topk(
            emb, q, k=5, n_cells=16, n_probe=5, centroids=km
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.9


def test_kmeans_centroids_deterministic(spark):
    """Two independent computations produce identical centroids (the 4dp
    rounding collapses float summation-order noise)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r["cell"]: r["cvec"] for r in sim.kmeans_centroids(emb, 16, 2).collect()}
    b = {
        r["cell"]: r["cvec"]
        for r in sim.kmeans_centroids(emb.repartition(7), 16, 2).collect()
    }
    assert a == b


def test_blocked_pairs_recall_and_exactness(spark):
    """cosine_threshold_pairs_blocked on the driver testdata: subset of the
    brute-force result (no false positives), identical scores on found
    pairs, recall >= 0.9 at the default (16 cells, 4 probes), and NO
    driver-side collect of the corpus in the plan (the scale-killer the
    brute-force twin has by design)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bf = {
        (r["doc_a"], r["doc_b"]): r["score"]
        for r in sim.cosine_threshold_pairs(emb, 0.4).collect()
    }
    bl = {
        (r["doc_a"], r["doc_b"]): r["score"]
        for r in sim.cosine_threshold_pairs_blocked(emb, 0.4).collect()
    }
    assert set(bl) <= set(bf), "blocked found a pair brute force did not"
    assert all(bl[k] == bf[k] for k in bl), "score mismatch on shared pairs"
    assert len(bl) / len(bf) >= 0.9, f"recall {len(bl)/len(bf):.3f}"


def test_blocked_pairs_plan_has_no_corpus_collect(spark):
    """The blocked plan must be a pure dataflow: mapInPandas assign ->
    one hash exchange on cell -> applyInPandas -> distinct.  Building it
    must not trigger a corpus toPandas (only the n_cells centroid rows are
    collected for the broadcast)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = sim.cosine_threshold_pairs_blocked(emb, 0.4)._jdf.queryExecution().toString()
    assert "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan


def test_ivf_recall_vs_brute_force(spark, vectors):
    df, _ = vectors
    exact = {
        (r["query_id"], r["vec_id"])
        for r in sim.cosine_topk(df, df.filter(F.col("vec_id") < 5), k=3).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in sim.ivf_topk(
            df, df.filter(F.col("vec_id") < 5), k=3, n_cells=8, n_probe=4
        ).collect()
    }
    # cell-probe ANN: recall below 1 is expected, but probing half the cells
    # on 40 vectors should recover most of the exact top-3
    assert len(exact & approx) / len(exact) >= 0.5


def test_language_id_real_text(spark):
    rows = [
        (0, "the cat sat on the mat and it was happy for a while"),
        (1, "el perro corre por la calle y los gatos del barrio"),
        (2, "le chat est sur le toit et les oiseaux du jardin"),
        (3, "der hund und die katze sind mit den kindern"),
        (4, "xyzzy plugh qwerty"),  # no stopword hits anywhere
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in ta.language_id(df).collect()}
    assert got == {0: "en", 1: "es", 2: "fr", 3: "de", 4: "und"}


def test_quality_score_orders_sensibly(spark):
    rows = [
        (0, "the cat sat on the mat and the dog was in the house for a while"),
        (1, "!!! ??? ,,, ;;; :: !!!! ???? .... ,,,, ;;;;"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["quality_score"] for r in ta.quality_features(df).collect()}
    assert got[0] > got[1]
    assert 0.0 <= got[1] <= 1.0


def test_multimodal_plumbing(spark):
    rows = [
        (0, "some png bytes here", "en", "src0", 19),
        (1, "a video payload!", "en", "src3", 16),
        (2, "audio-ish", "de", "src2", 9),
        (3, "unknown source", "fr", "src9", 14),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    media = mm.attach_payload(docs)
    meta = {r["doc_id"]: r for r in mm.media_meta(media).collect()}
    assert meta[0]["modality"] == "image" and meta[0]["media_type"] == "image/png"
    assert meta[3]["modality"] == "other"
    assert meta[1]["byte_len"] == 16

    decoded = mm.decode_media(media)
    rows_d = {r["doc_id"]: r for r in decoded.collect()}
    assert all(r["decoder"] == "fake-md5" for r in rows_d.values())
    assert rows_d[1]["n_frames"] >= 1
    # deterministic: same payload -> same fake dims
    again = {r["doc_id"]: r for r in mm.decode_media(media).collect()}
    assert rows_d[1]["width"] == again[1]["width"]

    frames = mm.frame_sample(decoded, every_n=4).collect()
    assert all(r["frame_idx"] % 4 == 0 for r in frames)
    assert {r["doc_id"] for r in frames} == {1}  # only the video row
    n1 = rows_d[1]["n_frames"]
    assert len(frames) == (n1 + 3) // 4


def test_payload_dedupe_keeps_first(spark):
    rows = [
        (0, "same bytes", "en", "src0", 10),
        (5, "same bytes", "en", "src0", 10),
        (2, "same bytes", "en", "src3", 10),  # same content, different type
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    res = {
        (r["media_type"], r["keeper_doc_id"]): r["n_copies"]
        for r in mm.exact_payload_dedupe(mm.attach_payload(docs)).collect()
    }
    assert res[("image/png", 0)] == 2
    assert res[("video/mp4", 2)] == 1


def test_near_dup_groups_transitive_closure(spark):
    """A~B and B~C but A!~C must still collapse into ONE group with the
    lowest id as keeper; unrelated and singleton docs label themselves."""
    w = [f"w{i}" for i in range(1, 19)]
    rows = [
        (10, " ".join(w[0:12])),   # A: j(A,B)=0.625
        (11, " ".join(w[0:18])),   # B bridges: j(B,C)=0.625
        (12, " ".join(w[6:18])),   # C: j(A,C)=0.25 < threshold
        (30, "totally unrelated text about parquet row groups and pages"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.group_id, r.is_keeper)
           for r in dd.near_dup_groups(docs, threshold=0.5).collect()}
    # sanity: the chain actually is a chain at this threshold
    pairs = {(r.doc_a, r.doc_b)
             for r in dd.lsh_near_dup_pairs(docs, threshold=0.5).collect()}
    assert (10, 11) in pairs and (11, 12) in pairs and (10, 12) not in pairs
    assert got[10] == (10, True)
    assert got[11] == (10, False)
    assert got[12] == (10, False)
    assert got[30] == (30, True)


# --- jaccard_prefix_pairs (exact, no hashing) -----------------------------


def test_prefix_jaccard_equals_brute_force(spark, docs):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    for t in (0.3, 0.5, 0.8, 1.0):
        got = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dd.jaccard_prefix_pairs(docs, threshold=t).collect()
        )
        assert got == brute_force_jaccard_pairs(rows, t), t


def test_prefix_jaccard_equals_lsh_on_corpus(spark):
    """On a generated corpus both exact-join plans agree (LSH misses are
    ~3e-7 at 0.8; prefix filtering is lossless — equality pins both)."""
    from node_feedparser_spark.datagen import generate_transcripts

    pdf = generate_transcripts(seed=7, scale=0.5)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pdf["text"].head(300))],
        "doc_id long, text string",
    )
    exact = sorted(
        map(tuple, dd.jaccard_prefix_pairs(docs, threshold=0.8).collect())
    )
    lsh = sorted(map(tuple, dd.lsh_near_dup_pairs(docs, threshold=0.8).collect()))
    assert exact == lsh
    assert len(exact) > 0  # the corpus plants near-dups; the test must bite


def test_prefix_jaccard_at_threshold_boundary(spark):
    # 3 shared of 4 union = 0.75: present at t=0.75, absent at t=0.750001
    a = "w1 w2 w3 w4 w5 w6"       # grams: 4
    b = "w1 w2 w3 w4 w5 zz"       # grams: 4, shares 3 with a
    docs = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    hit = dd.jaccard_prefix_pairs(docs, threshold=0.6).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in hit] == [(0, 1, 0.6)]
    assert dd.jaccard_prefix_pairs(docs, threshold=0.600001).count() == 0


def test_prefix_filter_prunes_stopword_gram_candidates(spark):
    """A hot shingle shared by every doc must not force O(n^2) candidates:
    rarest-first ordering keeps it out of prefixes whenever a doc has any
    rarer gram to offer."""
    hot = "the common header line all docs share"
    rows = [(i, f"{hot} unique tail {i} marker{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd.shingled(docs).cache()
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    dfq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # naive inverted index: every shared gram contributes C(40,2) pairs
    naive = (
        ex.alias("a")
        .join(ex.alias("b"),
              (F.col("a.shingle") == F.col("b.shingle"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    assert naive == 40 * 39 // 2  # hot grams connect everything
    assert dd.jaccard_prefix_pairs(docs, threshold=0.8).count() == 0
    # and the result is still exact: lower the threshold until pairs appear
    rows_py = [(i, t) for i, t in rows]
    got = sorted(
        map(tuple, dd.jaccard_prefix_pairs(docs, threshold=0.4).collect())
    )
    assert got == brute_force_jaccard_pairs(rows_py, 0.4)


def test_tfidf_topk_hand_computed(spark):
    """3-doc corpus with hand-derivable scores: 'rare' appears only in doc 1
    (idf ln(3)), 'the' in all three (idf 0 -> never a top term unless the
    doc has nothing else)."""
    import math

    from node_feedparser_spark.operators.text_analysis import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "the rare rare word"),
            (2, "the word word common"),
            (3, "the common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, k=2)
    got = {(r.doc_id, r.rank): (r.token, r.tfidf) for r in out.collect()}
    ln3 = math.log(3.0)
    ln15 = math.log(3.0 / 2.0)
    # doc 1: rare tf=2 df=1 -> 2*ln3; word tf=1 df=2 -> ln(1.5)
    assert got[(1, 1)] == ("rare", round(2 * ln3, 6))
    assert got[(1, 2)] == ("word", round(ln15, 6))
    # doc 2: word tf=2 -> 2*ln1.5 ; common tf=1 -> ln1.5
    assert got[(2, 1)] == ("word", round(2 * ln15, 6))
    assert got[(2, 2)] == ("common", round(ln15, 6))
    # doc 3: common ln1.5 beats the (idf 0); 'the' still ranks 2nd of 2
    assert got[(3, 1)] == ("common", round(ln15, 6))
    assert got[(3, 2)] == ("the", 0.0)
    # ranks stop at k
    assert all(rank <= 2 for (_, rank) in got)


def test_tfidf_topk_tie_break_and_case_fold(spark):
    """Equal scores cut by token ASC; tokens are case-folded before tf."""
    from node_feedparser_spark.operators.text_analysis import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "Beta alpha BETA Alpha"), (2, "gamma delta")],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rank): r.token for r in tfidf_topk(docs, k=2).collect()
    }
    # doc 1: alpha tf=2, beta tf=2, both df=1 -> tie, alpha first
    assert out[(1, 1)] == "alpha"
    assert out[(1, 2)] == "beta"
