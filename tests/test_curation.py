"""Curation operator semantics: repetition metrics, token-budget sampling
(bucketed cumsum == naive global cumsum), PII scrub, mixture weights."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from node_feedparser_spark.functions.hashing import portable_hash60
from node_feedparser_spark.operators.curation import (
    mixture_weights,
    pii_scrub,
    repetition_metrics,
    token_budget_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_repetition_metrics_values(spark):
    df = repetition_metrics(
        _docs(
            spark,
            [
                (1, "en", "a a a b"),        # 4 toks, 2 distinct, modal 3/4
                (2, "en", "a a a a"),        # grams: 'a a a' x2 -> dup 0.5
                (3, "en", "x y"),            # < k tokens -> dup 0.0
            ],
        )
    )
    got = {r.doc_id: r for r in df.collect()}
    assert got[1].n_tokens == 4
    assert got[1].distinct_token_frac == 0.5
    assert got[1].top_token_frac == 0.75
    assert got[1].dup_kgram_frac == 0.0  # 'a a a','a a b' distinct
    assert got[2].dup_kgram_frac == 0.5
    assert got[3].dup_kgram_frac == 0.0
    assert got[3].distinct_token_frac == 1.0


def test_token_budget_sample_equals_naive_global_cumsum(spark):
    docs = _docs(
        spark,
        [(i, "en" if i % 3 else "fr", "w " * (i % 17 + 1)) for i in range(200)],
    ).withColumn("text", F.trim("text"))
    budget = 150
    got = token_budget_sample(docs, budget=budget, n_buckets=8)

    # naive single-window plan under the same (bucket, h, id) total order
    h = portable_hash60(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        h.alias("h"), F.pmod(h, F.lit(8)).alias("bucket"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("bucket", "h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # budget respected per language
    per_lang = got.groupBy("lang").agg(F.max("cum_tokens").alias("m")).collect()
    assert all(r.m <= budget for r in per_lang)
    assert got.count() > 0


def test_token_budget_sample_deterministic(spark):
    docs = _docs(spark, [(i, "en", "w " * 5) for i in range(50)]).withColumn(
        "text", F.trim("text")
    )
    a = sorted(map(tuple, token_budget_sample(docs, budget=60).collect()))
    b = sorted(map(tuple, token_budget_sample(docs, budget=60).collect()))
    assert a == b


def test_pii_scrub_replaces_and_counts(spark):
    df = pii_scrub(
        _docs(
            spark,
            [
                (1, "en", "mail bob.smith+x@corp.example.org or +1-555-010-1234 now"),
                (2, "en", "no pii here"),
                (3, "en", "two a@b.io c@d.io emails"),
            ],
        )
    )
    got = {r.doc_id: r for r in df.collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 1
    assert got[1].clean_text == "mail <EMAIL> or <PHONE> now"
    assert got[2].n_emails == 0 and got[2].n_phones == 0
    assert got[2].clean_text == "no pii here"
    assert got[3].n_emails == 2
    assert got[3].clean_text == "two <EMAIL> <EMAIL> emails"


def test_mixture_weights_upweights_small_sources(spark):
    docs = _docs(
        spark,
        [(i, "en", "w " * 100) for i in range(90)]
        + [(1000 + i, "en", "w " * 100) for i in range(10)],
    ).select(
        "doc_id",
        F.when(F.col("doc_id") < 1000, "big").otherwise("small").alias("source"),
        F.trim("text").alias("text"),
    )
    got = {r.source: r for r in mixture_weights(docs).collect()}
    assert got["big"].token_share == pytest.approx(0.9)
    assert got["small"].token_share == pytest.approx(0.1)
    # alpha < 1 compresses: small source's weight > its share, big's < its
    assert got["small"].mix_weight > 0.1
    assert got["big"].mix_weight < 0.9
    assert got["big"].mix_weight + got["small"].mix_weight == pytest.approx(1.0, abs=2e-6)


def test_decontaminate_flags_overlap_and_only_overlap(spark):
    from node_feedparser_spark.operators.curation import decontaminate

    docs = _docs(
        spark,
        [
            (1, "en", "alpha beta gamma delta epsilon"),   # shares 3-grams w/ eval
            (2, "en", "one two three four five six"),      # disjoint
            (3, "en", "zeta eta theta alpha beta gamma"),  # tail overlaps eval
        ],
    )
    ev = _docs(spark, [(100, "en", "alpha beta gamma x y z")])
    got = {r.doc_id: (r.n_overlap, r.contaminated)
           for r in decontaminate(docs, ev).collect()}
    # eval grams: 'alpha beta gamma', 'beta gamma x', 'gamma x y', 'x y z'
    assert got[1] == (1, True)   # 'alpha beta gamma'
    assert got[2] == (0, False)
    assert got[3] == (1, True)
    # every doc labeled exactly once
    assert set(got) == {1, 2, 3}


# ---------------------------------------------------------------------------
# stratified_split
# ---------------------------------------------------------------------------


def test_stratified_split_exact_proportions_per_stratum(spark):
    from node_feedparser_spark.operators.curation import stratified_split

    docs = _docs(
        spark,
        [(i, ["en", "fr", "zh"][i % 3], f"text {i}") for i in range(300)],
    )
    out = stratified_split(docs).collect()
    assert len(out) == 300
    per = {}
    for r in out:
        per.setdefault(r.stratum, {}).setdefault(r.split, 0)
        per[r.stratum][r.split] += 1
    for lang, counts in per.items():
        n = sum(counts.values())
        # exact prefix boundaries: floor(0.8n) train, floor(0.9n)-floor(0.8n)
        # val, rest test
        import math

        b1 = math.floor(0.8 * n)
        b2 = math.floor((0.8 + 0.1) * n)
        assert counts.get("train", 0) == b1, (lang, counts)
        assert counts.get("val", 0) == b2 - b1, (lang, counts)
        assert counts.get("test", 0) == n - b2, (lang, counts)


def test_stratified_split_deterministic_and_membership_stable(spark):
    """A doc's split assignment never depends on partitioning, and adding
    docs to ANOTHER stratum never moves it (rank is per-stratum)."""
    from node_feedparser_spark.operators.curation import stratified_split

    base = [(i, "en" if i % 2 else "fr", f"t {i}") for i in range(100)]
    a = stratified_split(_docs(spark, base))
    b = stratified_split(_docs(spark, base).repartition(13))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    # append 50 docs to a NEW stratum: en/fr assignments unchanged
    more = base + [(1000 + i, "de", f"x {i}") for i in range(50)]
    c = {
        r.doc_id: r.split
        for r in stratified_split(_docs(spark, more)).collect()
        if r.stratum in ("en", "fr")
    }
    orig = {r.doc_id: r.split for r in a.collect()}
    assert c == orig


def test_stratified_split_equals_naive_single_window(spark):
    """The bucketed two-level rank must equal the naive ROW_NUMBER over one
    per-stratum partition under the same (bucket, h, id) total order."""
    from node_feedparser_spark.operators.curation import (
        SPLIT_SEED,
        stratified_split,
    )

    docs = _docs(
        spark, [(i, "en" if i % 4 else "fr", f"d {i}") for i in range(157)]
    )
    got = {(r.doc_id): (r.rank, r.split) for r in stratified_split(docs).collect()}
    h = portable_hash60(F.col("doc_id").cast("string"), seed=SPLIT_SEED)
    w = Window.partitionBy("lang").orderBy(
        F.pmod(h, F.lit(32)), h, "doc_id"
    )
    naive = (
        docs.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
        .withColumn(
            "split",
            F.when(F.col("rank") <= F.floor(F.lit(0.8) * F.col("n")), "train")
            .when(
                F.col("rank") <= F.floor(F.lit(0.8 + 0.1) * F.col("n")), "val"
            )
            .otherwise("test"),
        )
    )
    want = {r.doc_id: (r.rank, r.split) for r in naive.collect()}
    assert got == want


def test_stratified_split_rejects_bad_weights(spark):
    from node_feedparser_spark.operators.curation import stratified_split

    docs = _docs(spark, [(1, "en", "a")])
    with pytest.raises(ValueError):
        stratified_split(docs, weights=(0.5, 0.2), names=("a", "b", "c"))
    with pytest.raises(ValueError):
        stratified_split(docs, weights=(0.5, 0.2), names=("a", "b"))


# ---------------------------------------------------------------------------
# boilerplate_scrub — corpus-frequency line removal (CCNet/C4 rule)
# ---------------------------------------------------------------------------


def _line_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_scrub_values(spark):
    from node_feedparser_spark.operators.curation import boilerplate_scrub

    hot = "click to subscribe"
    warm = "almost frequent"
    docs = _line_docs(
        spark,
        # hot appears in docs 1-3 (>= min_docs=3) -> scrubbed everywhere;
        # warm appears in docs 1-2 (< 3) -> kept; bodies unique -> kept
        [
            (1, f"{hot}\nbody one\n{warm}"),
            (2, f"{warm}\n{hot}\nbody two"),
            (3, f"body three\n{hot}"),
            (4, "body four"),
        ],
    )
    got = {r.doc_id: r for r in boilerplate_scrub(docs, min_docs=3).collect()}
    assert got[1].n_lines == 3 and got[1].n_boilerplate == 1
    assert got[1].clean_text == f"body one\n{warm}"
    assert got[2].clean_text == f"{warm}\nbody two"  # order preserved
    assert got[3].clean_text == "body three"
    assert got[4].n_boilerplate == 0 and got[4].clean_text == "body four"


def test_boilerplate_scrub_counts_distinct_docs_not_occurrences(spark):
    """A line repeated 5x INSIDE one doc is not corpus boilerplate: document
    frequency counts distinct docs, so it survives."""
    from node_feedparser_spark.operators.curation import boilerplate_scrub

    docs = _line_docs(
        spark,
        [(1, "echo\necho\necho\necho\necho"), (2, "other")],
    )
    got = {r.doc_id: r for r in boilerplate_scrub(docs, min_docs=3).collect()}
    assert got[1].n_boilerplate == 0
    assert got[1].clean_text == "echo\necho\necho\necho\necho"


def test_boilerplate_scrub_all_boiler_doc_empties(spark):
    from node_feedparser_spark.operators.curation import boilerplate_scrub

    docs = _line_docs(
        spark, [(i, "banner") for i in range(1, 6)] + [(9, "banner\nreal")]
    )
    got = {r.doc_id: r for r in boilerplate_scrub(docs, min_docs=5).collect()}
    assert got[1].clean_text == "" and got[1].n_boilerplate == 1
    assert got[9].clean_text == "real"


def test_boilerplate_scrub_threshold_boundary(spark):
    """Exactly min_docs distinct docs IS boilerplate; min_docs-1 is not."""
    from node_feedparser_spark.operators.curation import boilerplate_scrub

    docs = _line_docs(
        spark,
        [(1, "at\nbelow"), (2, "at\nbelow"), (3, "at\nbody")],
    )
    got = {r.doc_id: r for r in boilerplate_scrub(docs, min_docs=3).collect()}
    assert got[3].clean_text == "body"        # 'at' in 3 docs -> scrubbed
    assert got[1].clean_text == "below"       # 'below' in 2 docs -> kept


def test_boilerplate_scrub_broadcasts_frequent_dim(spark):
    """The frequent-line dim must broadcast (the corpus never shuffles to
    learn what is frequent): the join against it is a BroadcastHashJoin."""
    from node_feedparser_spark.operators.curation import boilerplate_scrub

    docs = _line_docs(spark, [(1, "a\nb"), (2, "a")])
    plan = (
        boilerplate_scrub(docs, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_decontaminate_multi_per_suite_counts(spark):
    from node_feedparser_spark.operators.curation import decontaminate_multi

    docs = _line_docs(
        spark,
        [
            (1, "alpha beta gamma delta"),   # hits A (1 shared 3-gram x2 pos? distinct grams)
            (2, "epsilon zeta eta theta"),   # hits B
            (3, "alpha beta gamma epsilon zeta eta"),  # hits BOTH
            (4, "nothing shared here at all"),
        ],
    )
    ev = spark.createDataFrame(
        [("A", "alpha beta gamma"), ("B", "epsilon zeta eta")],
        "eval_set string, text string",
    )
    got = {(r.doc_id, r.eval_set): r.n_overlap
           for r in decontaminate_multi(docs, ev).collect()}
    assert got[(1, "A")] == 1 and (1, "B") not in got
    assert got[(2, "B")] == 1 and (2, "A") not in got
    assert got[(3, "A")] == 1 and got[(3, "B")] == 1
    assert not any(d == 4 for d, _ in got)
