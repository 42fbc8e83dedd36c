"""Text analysis for training-data pipelines — language ID, quality
scoring, token counting, document fingerprinting.

Everything here is JVM-side (split / explode / regexp / broadcast join /
window): no Python in the hot path, so each operator whole-stage-codegens
and its cost at 100 TB is the one aggregation shuffle it declares.

Reference analogs: stripHtml's whitelist discipline — classify by a known
dictionary, never a blanket regex (/root/reference/lib/utils.js:367-382,
lib/constants.js:54-78) — becomes the stopword-table language classifier;
the namespace dictionary broadcast (lib/constants.js:7-38) is literally the
same plan shape as `lang_stopword_dim`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60, token_shingles

# Tiny per-language function-word lists (public knowledge).  A dimension
# table, not a model: language = argmax over languages of stopword hits.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "du", "une", "que"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "ist", "für", "nicht"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "他"],
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def lang_stopword_dim(spark: SparkSession) -> DataFrame:
    rows = [
        (lang, w) for lang, words in sorted(LANG_STOPWORDS.items()) for w in words
    ]
    return spark.createDataFrame(rows, "lang string, word string")


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Predict language as argmax stopword hits via a broadcast dimension
    join (ties -> lexicographically first language; no hits -> 'und').

    Plan: explode tokens -> broadcast-hash join (no shuffle of the fact
    side) -> partial/final count agg on (doc, lang) -> row_number window.
    """
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    )
    hits = (
        toks.join(F.broadcast(lang_stopword_dim(spark)), "word")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_hits").desc(), F.col("lang").asc()
    )
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "n_hits")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
    )


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality features + composite score, all in one
    projection (no shuffle at all):

    n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio (en),
    upper_ratio, and quality_score = clamped linear blend.  Rounded to 6 dp
    for engine-portable comparison.
    """
    c = F.col(text_col)
    toks = F.split(c, r"\s+")
    n_chars = F.length(c)
    n_tokens = F.size(F.filter(toks, lambda t: t != ""))
    en_stop = [F.lit(wd) for wd in LANG_STOPWORDS["en"]]
    n_stop = F.size(
        F.filter(F.split(F.lower(c), r"\s+"), lambda t: t.isin(*en_stop))
    )
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()-]", ""))
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_toks = F.greatest(n_tokens, F.lit(1))
    mean_tok = F.round((n_chars - (n_tokens - 1)) / safe_toks.cast("double"), 6)
    punct_ratio = F.round(punct / safe_chars.cast("double"), 6)
    stop_ratio = F.round(n_stop / safe_toks.cast("double"), 6)
    upper_ratio = F.round(upper / safe_chars.cast("double"), 6)
    score = (
        F.lit(0.5)
        + F.lit(0.9) * stop_ratio
        - F.lit(0.8) * punct_ratio
        - F.lit(0.5) * upper_ratio
        + F.lit(0.1) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        upper_ratio.alias("upper_ratio"),
        F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 6).alias(
            "quality_score"
        ),
    )


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document (the two
    standard 'how big is this corpus in tokens' measures)."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(c, r"\s+"), lambda t: t != "")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)).alias("bpe_tokens"),
    )


def fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_keep: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprint: portable 60-bit hash of every
    token k-gram, keep the n_keep smallest (a bottom-k sketch — the same
    family as MinHash, usable for containment estimates), plus the single
    min hash as the scalar fingerprint.  One projection, no shuffle."""
    # NB: explicit 1-arg lambda — F.transform would otherwise feed the array
    # index into portable_hash60's `seed` parameter.  Two-step select so the
    # hash array is computed ONCE and the sorted copy reused (Catalyst does
    # not CSE across output aliases in a single project).
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(
            F.transform(token_shingles(text_col, k), lambda s: portable_hash60(s))
        ).alias("hs"),
    )
    return hashed.select(
        "doc_id",
        F.element_at("hs", 1).alias("fingerprint"),
        F.slice("hs", 1, n_keep).alias("bottom_k"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): from the
    positional token k-gram hash stream pick, for every window of ``w``
    consecutive hashes, the minimum — keeping its POSITION.  Unlike the
    bottom-k sketch above, winnowing is position-aware with a matching
    guarantee: any shared run of >= w+k-1 tokens between two documents
    yields at least one shared (hash) fingerprint, at ~2/(w+1) the gram
    density.  Tie-break: the LEFTMOST minimal hash in the window (the paper
    picks rightmost; leftmost is equally valid and is what a lexicographic
    min over (hash, pos) keys gives both engines deterministically).

    Docs shorter than k tokens fingerprint their whole text (same contract
    as token_shingles); every non-null doc emits >= 1 fingerprint.

    Returns (doc_id, fp_pos, fp_hash) distinct rows, fp_pos 1-based.

    Scale shape: one explode (grams are corpus-linear), one window
    partitioned by doc_id (bounded by doc length), one distinct keyed on the
    output — nothing corpus-squared, no Python.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = F.split(F.col(text_col), " ")
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    grams = F.slice(toks, 1, n)
    for j in range(1, k):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, n), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    grams = F.when(F.size(toks) >= k, grams).otherwise(
        F.array(F.col(text_col))
    )
    # NB: do NOT also project size(grams) next to the generator — a second
    # copy of the zip-of-slices tree beside posexplode defeated codegen and
    # cost ~30x at bench scale; n_grams is recovered for free as max(pos)
    # over the doc partition we window anyway
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams).alias("pos0", "gram"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        # sortable composite key: zero-padded 60-bit hash (always >= 0, max
        # 19 digits) then zero-padded position — string min == (hash, pos)
        # lexicographic min in both engines
        F.concat(
            F.lpad(portable_hash60("gram").cast("string"), 19, "0"),
            F.lit(":"),
            F.lpad((F.col("pos0") + 1).cast("string"), 10, "0"),
        ).alias("wkey"),
    )
    wspec = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    sel = g.withColumn("selkey", F.min("wkey").over(wspec)).withColumn(
        "n_grams", F.max("pos").over(Window.partitionBy("doc_id"))
    ).where(
        # valid window starts only (frame truncates at partition end); docs
        # with fewer than w grams keep the single all-gram window at pos 1
        F.col("pos") <= F.greatest(F.col("n_grams") - (w - 1), F.lit(1))
    )
    return sel.select(
        "doc_id",
        F.substring("selkey", 21, 10).cast("long").alias("fp_pos"),
        F.substring("selkey", 1, 19).cast("long").alias("fp_hash"),
    ).distinct()


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF: tf = occurrences
    of the (lowercased, whitespace-split) token within the document, idf =
    ln(N / df) over the corpus, score = tf * idf rounded to 6 dp; ties cut
    deterministically by (score DESC, token ASC).  The standard keyword /
    topic-signature extractor a training pipeline runs for corpus
    inspection and mixture diagnostics.

    Reference analog: the reference's per-item category accumulation — a
    per-document distinct term set with document-order determinism
    (lib/feedparser.js:730-760) — weighted by corpus rarity.

    Scale shape (all JVM, three declared shuffles, none corpus-squared):
    - tf: one partial/final count agg keyed (doc, token) — map-side
      combined, so the explode never shuffles raw token occurrences;
    - df: a second partial/final agg over tf keyed token (vocabulary-sized
      input, not corpus-sized);
    - tf ⋈ df on token: both sides are already token-keyed aggregates, and
      AQE broadcast-converts the vocabulary side when it fits;
    - N: one scalar agg, cross-joined as a broadcast literal — never a
      window over the corpus;
    - the top-k window partitions by doc_id, bounded by per-document
      vocabulary — no stratum-sized partition can exist by construction.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("n_tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("n_df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("n_tf")
                * F.log(F.col("n_docs").cast("double") / F.col("n_df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tfidf", "rank")
    )


def unigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained unigram language-model quality score per document.

    The CCNet/Gopher pipelines gate documents on LM perplexity; a full
    KenLM is out of scope for a pure-Spark stage, but the unigram LM the
    corpus itself induces is the same *shape* and already separates
    gibberish from prose: train token counts over the whole corpus, then
    score each document by its mean token log-probability under add-one
    smoothing::

        p(w) = (count(w) + 1) / (n_tokens_total + vocab_size)
        avg_logp(doc) = mean over doc tokens of ln p(w)

    Returns (id_col, n_tokens, avg_logp 4dp).  Higher = more typical of
    the corpus; a curation gate thresholds avg_logp exactly like
    quality_score's rule gates.

    Plan: one explode + one groupBy(token) count (map-side combinable),
    the two LM scalars via one tiny agg joined as literals is avoided —
    they come from a cross join of ONE row (broadcast), then a
    token-count join back onto the exploded corpus and one groupBy(doc).
    Token counts table is vocab-sized (sublinear in the corpus); the
    exploded corpus never holds more than (doc_id, token) pairs —
    the same two-shuffle shape as tfidf_topk.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    scored = (
        toks.join(counts, "token")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_logp",
            F.round(
                F.log(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("n_total") + F.col("vocab"))
                ),
                9,
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("_logp"), 4).alias("avg_logp"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranked retrieval: per query, the top-k documents by

        score(d, q) = sum over t in q of
            idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))

    with tf from lowercased whitespace tokens, dl the document token count,
    avgdl the corpus mean.  Completes the retrieval family: the lexical
    counterpart to embedding_topk / ivf_ann_topk, and a natural input list
    for rrf_fusion (hybrid lexical+dense retrieval).

    Scale shape: same three declared shuffles as tfidf_topk (tf agg keyed
    (doc, token), df agg keyed token, tf ⋈ df on token) — the query term
    table is literal-sized and BROADCAST onto the tf side FIRST, so only
    tf rows matching some query term ever reach the df join or the
    scoring; N/avgdl are one scalar agg cross-joined as a broadcast
    literal.  The per-query top-k window partitions by query over at most
    |matched docs| rows.

    Determinism: rank orders by the 6-dp ROUNDED score (then doc id), so
    the sub-ulp summation-order noise of float addition can never flip a
    rank across engines; ln() is evaluated from identical double inputs
    (the unigram_lm precedent).
    """
    spark = docs.sparkSession
    if not queries or k < 1:
        raise ValueError("need at least one query and k >= 1")
    qterms = (
        spark.createDataFrame(queries, ["query_id", "qtext"])
        .select(
            "query_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col("qtext")), r"\s+"),
                        lambda t: t != "",
                    )
                )
            ).alias("token"),
        )
    )
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    ).crossJoin(
        tok.select(
            (F.count(F.lit(1)).cast("double")).alias("_total_tokens")
        )
    ).select(
        "n_docs", (F.col("_total_tokens") / F.col("n_docs")).alias("avgdl")
    )
    matched = (
        tf.join(F.broadcast(qterms), "token")
        .join(df_, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scores = matched.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(contrib), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def term_salience(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    stopwords: tuple[str, ...] = tuple(LANG_STOPWORDS["en"]),
) -> DataFrame:
    """Per-document term salience — the entity-salience heuristic of
    Dunietz & Gillick (EACL 2014): a mention's importance rises with its
    frequency AND with how early it first appears (news/transcript leads
    name their subject first).  Deterministic integer-derived score,

        salience = cnt * (1 + 1 / (1 + first_idx))

    (first_idx = 0-based token position of the first occurrence), top_k
    terms per document by (salience DESC, token ASC).  This is the
    KG-construction prioritizer: which surface forms deserve an entity
    node when the budget is k per document.

    Plan: one posexplode + stopword filter (tiny NOT IN literal list, the
    lang-ID dim), one (doc, token) count/min agg — map-side combinable —
    and a per-document row_number window (partition size = doc vocab,
    never corpus-wide).  All arithmetic is row-local on integers.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    ).filter((F.col("token") != "") & (~F.col("token").isin(*stopwords)))
    agg = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min("pos").cast("long").alias("first_idx"),
    )
    sal = agg.withColumn(
        "salience",
        F.round(
            F.col("cnt") * (1.0 + 1.0 / (1.0 + F.col("first_idx"))), 6
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("salience").desc(), F.col("token").asc()
    )
    return (
        sal.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "doc_id", "token", "cnt", "first_idx", "salience",
            F.col("rank").cast("long").alias("rank"),
        )
    )
