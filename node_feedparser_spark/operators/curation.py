"""Training-corpus curation operators — repetition metrics, per-language
token-budget sampling, PII scrubbing, mixture weighting.

These are the operations a 100 TB training-data pipeline runs between raw
ingestion and tokenization.  Everything is JVM-side (split / transform /
regexp / partial-final aggregation / windows over pre-bucketed partitions):
no Python in any hot path, and every operator declares exactly the shuffles
it pays.

Reference analogs: the reference's quality discipline is per-item scalar
normalization plus dedupe-by-key (/root/reference/lib/feedparser.js:939,
1007-1011); at corpus scale the same discipline becomes per-document
repetition statistics (the Gopher-style "fraction of duplicate n-grams"
signals), deterministic budget sampling (keep-first under a priority
order — first-wins, the reference's guid rule, applied to a token budget),
and pattern scrubbing (stripHtml's whitelist-regex discipline,
lib/utils.js:367-382, pointed at PII-shaped substrings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60

# Java-regex AND RE2 compatible (no lookaround, no backrefs) so the DuckDB
# oracle runs the same pattern strings.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"


def _grams(toks, k: int):
    """All (non-distinct) token k-grams, in order; [] when len(toks) < k.

    Zip-of-k-slices construction (not transform+element_at, which re-splits
    the text per element access — see functions/hashing.token_shingles)."""
    n = F.size(toks) - (k - 1)
    grams = F.slice(toks, 1, F.greatest(n, F.lit(0)))
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(n, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= k, grams).otherwise(
        F.expr("cast(array() as array<string>)")
    )


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document repetition signals (the Gopher-rule family):

    - ``n_tokens`` — whitespace token count;
    - ``distinct_token_frac`` — distinct tokens / tokens (low = repetitive);
    - ``top_token_frac`` — occurrences of the modal token / tokens;
    - ``dup_kgram_frac`` — 1 - distinct k-grams / k-grams (0 when < k tokens).

    Plan: the array-local fractions (distinct tokens, k-grams) are computed
    entirely inside the row via transform/array_distinct — NO shuffle.  The
    modal-token fraction needs a (doc, token) count: explode -> partial/final
    count agg -> per-doc max, i.e. two map-side-combinable aggregations keyed
    by doc — the only shuffles, both on the document key, both linear in
    corpus token count.  At 100 TB the explode dominates; it carries (doc_id,
    token) pairs only, never the document text.
    """
    toks = F.split(F.col(text_col), " ")
    grams = _grams(toks, k)
    local = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias(
            "distinct_token_frac"
        ),
        F.when(F.size(grams) > 0, F.round(1 - F.size(F.array_distinct(grams)) / F.size(grams), 6))
        .otherwise(F.lit(0.0))
        .alias("dup_kgram_frac"),
    )
    modal = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg((F.max("n") / F.sum("n")).alias("_top_frac"))
        .select("doc_id", F.round("_top_frac", 6).alias("top_token_frac"))
    )
    return local.join(modal, "doc_id")


def token_budget_sample(
    docs: DataFrame,
    budget: int,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """Deterministic per-language sampling to a token budget: order documents
    by a content-independent pseudo-random priority (60-bit hash of the doc
    id), keep the prefix whose cumulative token count fits ``budget``.

    Scale-shaped cumulative sum: a naive ``SUM OVER (PARTITION BY lang ORDER
    BY h)`` funnels each language through ONE task — a straggler at 100 TB
    where a language can be most of the corpus.  Instead the global priority
    order is (bucket, h, id) with bucket = h mod ``n_buckets``:

    1. window cumsum within (lang, bucket) — n_buckets-times finer
       partitions, still one shuffle;
    2. per-(lang, bucket) totals -> prefix offsets via a window over the
       tiny (langs x buckets) table — broadcast back;
    3. global cumulative = offset + local cumsum; keep rows with
       cumulative <= budget.

    The result is identical to the single-partition plan under the same
    total order (the oracle computes it that way), but no task ever sees
    more than ~1/n_buckets of a language.
    """
    h = portable_hash60(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        h.alias("h"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    )
    w_local = (
        Window.partitionBy("lang", "bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    totals = base.groupBy("lang", "bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0))
    ).select("lang", "bucket", "offset")
    return (
        local.join(F.broadcast(offsets), ["lang", "bucket"])
        .withColumn("cum_tokens", F.col("offset") + F.col("local_cum"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Replace email / E.164-style phone substrings with typed placeholders
    and count what was removed.  Pure projection (regexp_extract_all +
    regexp_replace), whole-stage-codegen, zero shuffles; patterns are
    RE2-and-Java compatible so the oracle runs them verbatim."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("clean_text"),
    )


def mixture_weights(
    docs: DataFrame,
    alpha: float = 0.3,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus source: p_i =
    tokens_i / total, w_i = p_i^alpha / sum_j p_j^alpha — the standard
    recipe for up-weighting small sources in a training mixture.

    Plan: one partial/final agg to per-source totals (linear, map-side
    combined), then the normalization runs over the tiny per-source table
    with an unpartitioned window — fine because its input is ~#sources rows,
    not corpus rows.
    """
    per = docs.groupBy(F.col(group_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    with_p = per.withColumn(
        "_p", F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    ).withColumn("_s", F.pow("_p", F.lit(alpha)))
    return with_p.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("_p", 6).alias("token_share"),
        F.round(F.col("_s") / F.sum("_s").over(w_all), 6).alias("mix_weight"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares
    any token k-gram with an evaluation set, with the overlapping-gram
    count — the standard train/test-overlap scrub a pretraining pipeline
    runs before a corpus ships.

    Plan: the eval side collapses to DISTINCT k-grams (eval sets are tiny
    relative to the corpus) and BROADCASTS; the corpus explodes its
    per-document distinct k-grams once and semi-joins — no shuffle of the
    corpus, one map-side-combinable count agg on the doc key, then a left
    join back to label the non-contaminated majority with zero.  At 100 TB
    the explode is bounded by corpus token count and the broadcast by the
    eval set's vocabulary, which is what makes this shape viable where a
    corpus-vs-corpus join would not be (that case is near_dup_groups).
    """
    from ..functions.hashing import token_shingles

    ev = (
        eval_docs.select(F.explode(token_shingles(text_col, k)).alias("g"))
        .distinct()
    )
    hits = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(token_shingles(text_col, k)).alias("g"))
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_multi(
    docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    set_col: str = "eval_set",
) -> DataFrame:
    """Per-suite contamination matrix: for every (training doc, eval SET)
    pair sharing at least one token k-gram, the overlapping-gram count —
    the report a data team reads to decide WHICH benchmark forced a
    document out, where `decontaminate` only answers whether any did.

    Same shape and same scale argument as decontaminate: the eval side
    collapses to DISTINCT (set, gram) pairs and BROADCASTS (eval suites
    are tiny next to the corpus); the corpus explodes its per-doc distinct
    grams ONCE regardless of how many suites there are, the join fans each
    gram out only to the suites containing it, and one map-side-combinable
    count agg keys on (doc, set).  Output is hit-pairs only (no doc x set
    cross product materializes).
    """
    from ..functions.hashing import token_shingles

    ev = (
        eval_docs.select(
            F.col(set_col).alias("eval_set"),
            F.explode(token_shingles(text_col, k)).alias("g"),
        )
        .distinct()
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(token_shingles(text_col, k)).alias("g"),
        )
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id", "eval_set")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def boilerplate_scrub(
    docs: DataFrame,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-frequency line deduplication (the CCNet / C4 boilerplate rule):
    a line that appears in >= ``min_docs`` DISTINCT documents is boilerplate
    (nav bars, cookie banners, share buttons) and is removed from every
    document; per-document line order is preserved in ``clean_text``.

    Reference analog: stripHtml's whitelist discipline (lib/utils.js:367-382)
    lifted from tag-level to corpus-frequency line-level — the filter a web
    corpus runs before any quality scoring, because boilerplate dominates
    raw page text.

    Plan, and why it survives 100 TB:
    - document frequency per line: each doc contributes its DISTINCT lines
      (``array_distinct`` in-row — no pre-shuffle dedupe), explode, then ONE
      map-side-combinable count keyed by the line's portable 60-bit hash.
      Counting hashes, not strings, keeps the shuffle rows 8 bytes wide.
    - the frequent-line dim is output-bounded: <= total_line_instances /
      min_docs rows, and it carries ONLY the hash — so it broadcasts even
      when the corpus does not (same discipline as decontaminate's eval
      grams).  The corpus is never shuffled to learn what is frequent.
    - the scrub itself: posexplode lines, mark via the broadcast hash join,
      reassemble with one groupBy(doc) — the single corpus-linear shuffle,
      keyed by the document id (same key as every other per-doc agg here,
      so AQE can reuse the exchange).
    - 60-bit hash collisions: same portability argument as exact_dedupe —
      the oracle compares on the line string; a collision would surface as
      a hash mismatch there.
    """
    lines = F.split(F.col(text_col), sep)
    lh = portable_hash60(F.col("line"))
    freq = (
        docs.select(F.explode(F.array_distinct(lines)).alias("line"))
        .select(lh.alias("bh"))
        .groupBy("bh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("bh")
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(lines).alias("pos", "line"),
    ).withColumn("lh", lh)
    marked = exploded.join(
        F.broadcast(freq), exploded.lh == freq.bh, "left"
    ).withColumn("boiler", F.col("bh").isNotNull())
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("boiler").cast("int")).cast("long").alias("n_boilerplate"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("boiler"), F.struct("pos", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("clean_text"),
        )
    )


# hash-family seed for the split assignment: distinct from the (unseeded)
# token_budget_sample priority so "which split a doc lands in" and "whether
# the budget sampler keeps it" are independent draws, not the same number
SPLIT_SEED = 7


def stratified_split(
    docs: DataFrame,
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    strat_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Deterministic stratified train/val/test assignment: within each
    stratum, documents are ranked by a content-independent 60-bit hash of
    their id and the rank prefix is cut at EXACT per-stratum boundaries
    (floor(cum_weight * n)) — so every stratum's split proportions hold
    exactly, not just in hash expectation, and the assignment is stable
    under re-runs, repartitioning, and corpus append order (a doc's rank
    only moves if the stratum's membership changes).

    Reference analog: the reference's first-wins-under-a-stable-order
    discipline (guid dedupe, lib/feedparser.js:1007-1011) applied to split
    assignment instead of dedupe.

    Scale shape: the per-stratum rank is the same bucketed two-level
    cumulative pattern as token_budget_sample (local ROW_NUMBER within
    (stratum, hash-bucket) + tiny offset table broadcast back), so no task
    ever windows more than ~1/n_buckets of a stratum even when one language
    is most of a 100 TB corpus; the per-stratum totals are one map-side
    combinable count agg, broadcast.
    """
    if len(weights) != len(names) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must match names and sum to 1")
    h = portable_hash60(F.col(id_col).cast("string"), seed=SPLIT_SEED)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strat_col).alias("stratum"),
        h.alias("h"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    )
    w_local = Window.partitionBy("stratum", "bucket").orderBy("h", "doc_id")
    local = base.withColumn("local_rank", F.row_number().over(w_local))
    counts = base.groupBy("stratum", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    w_off = (
        Window.partitionBy("stratum")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("bucket_n").over(w_off), F.lit(0))
    ).select("stratum", "bucket", "offset")
    totals = base.groupBy("stratum").agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        local.join(F.broadcast(offsets), ["stratum", "bucket"])
        .join(F.broadcast(totals), "stratum")
        .withColumn("rank", (F.col("offset") + F.col("local_rank")).cast("long"))
    )
    # exact prefix boundaries: floor of the cumulative weight — identical
    # IEEE-double arithmetic in the DuckDB oracle, so the cut agrees bitwise
    split = None
    cum = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        cum += w
        cond = F.col("rank") <= F.floor(F.lit(cum) * F.col("n"))
        split = F.when(cond, name) if split is None else split.when(cond, name)
    split = (
        F.lit(names[0]) if split is None else split.otherwise(names[-1])
    )
    return ranked.select(
        "doc_id", F.col("stratum"), "rank", split.alias("split")
    )


def dsir_weights(
    docs: DataFrame,
    target_filter,
    n_buckets: int = 1024,
    k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling") with hashed n-gram
    features.

    Estimate how target-domain-like each document is: hash every token
    ``k``-gram into ``n_buckets`` buckets, fit bucket frequencies over the
    TARGET subset (``target_filter`` — a boolean Column over `docs`) and
    over the full corpus (the source/raw distribution), and weight each
    document by the mean log-likelihood ratio of its gram stream::

        w(doc) = mean over grams g of ln( (tgt[h(g)] + 1) / (src[h(g)] + 1) )

    (+1 Laplace smoothing on both sides; the bucket-count tables are
    n_buckets rows — broadcast).  Positive = looks like the target domain.
    DSIR proper samples ~ exp(w); the deterministic analog here ranks by
    (weight desc, id) — the sampling step is token_budget_sample /
    stratified_split territory.

    Returns (id_col, n_grams, weight 4dp, tgt_rank) — tgt_rank is the
    global selection order, computed with ONE unpartitioned window over
    the doc-count-sized weight table (same justification as
    mixture_weights: rows = documents, not tokens; at 10^12 docs swap the
    rank for the bucketed cumsum of token_budget_sample).

    Plan: one explode to (doc, bucket) pairs, two map-side-combinable
    groupBy(bucket) counts (target / all), a broadcast join of the two
    1024-row dims onto the pairs, one groupBy(doc).  The corpus shuffles
    once on bucket-pair and once on doc — no driver state, no Python.
    """
    toks = F.split(F.col(text_col), " ")
    pairs = docs.select(
        F.col(id_col),
        target_filter.alias("_is_tgt"),
        F.explode(_grams(toks, k)).alias("_gram"),
    ).withColumn(
        "_bucket", F.pmod(portable_hash60(F.col("_gram")), F.lit(n_buckets))
    )
    src_cnt = pairs.groupBy("_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_src")
    )
    tgt_cnt = (
        pairs.filter(F.col("_is_tgt"))
        .groupBy("_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("_tgt"))
    )
    dim = src_cnt.join(tgt_cnt, "_bucket", "left").select(
        "_bucket",
        F.round(
            F.log(
                (F.coalesce(F.col("_tgt"), F.lit(0)) + 1).cast("double")
                / (F.col("_src") + 1)
            ),
            9,
        ).alias("_llr"),
    )
    weights = (
        pairs.join(F.broadcast(dim), "_bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.round(F.avg("_llr"), 4).alias("weight"),
        )
    )
    w = Window.orderBy(F.col("weight").desc(), F.col(id_col).asc())
    return weights.withColumn(
        "tgt_rank", F.row_number().over(w).cast("long")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    group_cols: list[str],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weight-proportional sampling without replacement (Efraimidis &
    Spirakis 2006 A-ES), deterministic: per group, keep the k items with
    the largest key u^(1/weight), u drawn from the portable 60-bit hash of
    (seed, id) — mapped to (0, 1] as (h + 1) / 2^60.  Ordering by
    ln(u)/weight (monotone in the key) avoids pow(); for k = 1 the
    selection probability is exactly weight_i / sum(weights), and for
    k > 1 it is the standard successive weighted draw without replacement.

    This is the weighted companion to token_budget_sample's uniform
    hash-priority order: uniform priorities keep documents with equal
    chance; A-ES keeps high-weight documents (quality scores, DSIR
    importance weights) proportionally more often, while staying
    bit-deterministic across runs and engines — rand()-based weighted
    sampling breaks the resume/lineage story.

    Rows with weight <= 0 are excluded (zero weight = never sampled, and
    ln(u)/w flips sign for negative w).

    Cross-engine note: ln() is evaluated from identical double inputs in
    both engines; JVM-vs-libm drift is <= 1 ulp and affects only the
    ORDER of two keys within 1 ulp of each other — below hash-collision
    probability, and ties on the final key order are broken by id anyway.

    Scale shape: one window top-k per group (rank state only, no buffering)
    — the same plan as tfidf_topk.  For a GLOBAL weighted top-k, compose:
    add a salt group of ~num_partitions buckets, take per-salt top-k, then
    top-k the k*buckets survivors — both stages this same operator.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty; for a global sample use the "
            "salted two-phase composition in the docstring"
        )
    h = portable_hash60(F.col(id_col).cast("string"), seed=seed)
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_key").desc(), F.col(id_col).asc()
    )
    return (
        docs.filter(F.col(weight_col) > 0)
        .select(*group_cols, id_col, weight_col, key.alias("_key"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("_key")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
    k: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation —
    the Iglewicz-Hodges modified z-score |0.6745 * (x - med) / mad| > k,
    the standard telemetry/label-noise screen (median and MAD are
    50%-breakdown estimators, so unlike mean/stddev the outliers cannot
    mask themselves).

    Plan: two exact-percentile aggregations (group-keyed, map-side
    pre-grouped) with the tiny per-group stats broadcast back, then one
    codegen projection + filter.  Exact `percentile` keeps the DuckDB
    oracle bit-replayable (`quantile_cont` — same (n-1)*q linear
    interpolation); at true 100 TB swap in `approx_percentile` (one line,
    same plan shape) exactly like the portable-hash -> xxhash64 swap
    documented in functions/hashing.py.

    Groups whose MAD is 0 (constant-valued) emit no outliers by definition
    (guarded — ANSI mode would otherwise raise on the division).  Returns
    (id_col, group_col, value, med, mad, rz) for flagged rows, rz rounded
    to 4 dp and the flag decided on the ROUNDED score so engine float noise
    cannot flip borderline rows.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("mad")
    )
    scored = with_med.join(F.broadcast(mad), group_col).where(
        F.col("mad") > 0
    )
    rz = F.round(F.lit(0.6745) * (v - F.col("med")) / F.col("mad"), 4)
    return (
        scored.select(
            id_col,
            group_col,
            v.alias("value"),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            rz.alias("rz"),
        )
        .where(F.abs(F.col("rz")) > k)
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current slice
    of a numeric feature — the standard distribution-drift monitor a
    pipeline runs between ingestion batches (PSI < 0.1 stable, > 0.25
    action).  Bin edges are the REFERENCE deciles (exact percentiles, same
    interpolation both engines — see mad_outliers); each slice is binned
    with one broadcast of the n_bins-1 edges and counted; probabilities
    get a +0.5 Laplace floor so empty bins never produce ln(0).

    Plan: one percentile agg on ref (edge row broadcast), one count agg
    per slice (map-side combinable), a bin-keyed full outer join of two
    <= n_bins-row tables, windows only over those tiny tables.  Returns
    (bin, n_ref, n_cur, p_ref, p_cur, psi_term) with psi_term rounded
    6 dp; SUM(psi_term) is the PSI.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    v = F.col(value_col).cast("double")
    edges = ref.agg(
        *[
            F.percentile(v, F.lit(i / n_bins)).alias(f"_e{i}")
            for i in range(1, n_bins)
        ]
    )

    def _binned(df: DataFrame, out: str) -> DataFrame:
        b = F.lit(0)
        for i in range(1, n_bins):
            b = b + F.when(v > F.col(f"_e{i}"), 1).otherwise(0)
        return (
            df.crossJoin(F.broadcast(edges))
            .select(b.cast("long").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(f"n_{out}"))
        )

    # full outer on bin; each side's EXACT total is the sum of its bin
    # counts (every row lands in exactly one bin), recovered over the
    # tiny joined table so bins absent from one side still get that
    # side's Laplace-floor mass
    j = _binned(ref, "ref").join(_binned(cur, "cur"), "bin", "full")
    w = Window.partitionBy()
    n_ref = F.coalesce(F.col("n_ref"), F.lit(0))
    n_cur = F.coalesce(F.col("n_cur"), F.lit(0))
    ref_tot = F.sum(n_ref).over(w)
    cur_tot = F.sum(n_cur).over(w)
    p_ref = (n_ref + 0.5) / (ref_tot + 0.5 * n_bins)
    p_cur = (n_cur + 0.5) / (cur_tot + 0.5 * n_bins)
    return j.select(
        "bin",
        n_ref.cast("long").alias("n_ref"),
        n_cur.cast("long").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
            "psi_term"
        ),
    )
