"""Document deduplication — exact, MinHash-LSH, SimHash, n-gram Jaccard.

The training-data-pipeline face of the reference's dedupe discipline:
feedparser dedupes enclosures by key `(url, type)` with keep-first/merge
semantics (/root/reference/lib/feedparser.js:900-908, 1007-1011;
test/duplicate-enclosures.js) and guids first-wins
(/root/reference/lib/feedparser.js:939; test/bad.js:26-46).  At corpus scale
the same discipline becomes content-hash dedupe (exact) and
similarity-join dedupe (near-dup), built so that:

- every hash is the *portable* 60-bit md5 hash (functions/hashing.py), so
  the DuckDB oracle reproduces signatures bit-for-bit;
- LSH is an ACCELERATOR, not the definition: candidates are always verified
  with exact Jaccard, so the result set equals the brute-force similarity
  join (up to the analytically-bounded LSH miss probability, ~3e-7 at the
  default threshold — see lsh_near_dup_pairs docstring);
- everything before the candidate self-join is map-side (shingle explode +
  min-aggregation = partial/final hash agg); the only wide shuffle is the
  band-bucket join, which AQE skew-splits if a band hash is hot.

Scale notes (100 TB): the shingle explode is bounded by total text size; the
63 min-aggregations run as one partial-agg pass (map-side combine), so the
shuffle carries one 63-long row per document, not per shingle.  The band
self-join shuffles 21 rows/doc.  Pair verification rejoins each candidate to
its two shingle arrays — at 10^12 docs that join is the cost center, which
is exactly why bands*rows is tuned to keep candidate volume ~linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60, token_shingles

# 63 hashes = 21 bands x 3 rows.  P[miss a pair at Jaccard j] = (1-j^3)^21:
#   j=0.98 -> 1e-25   j=0.9 -> 2e-6   j=0.8 -> 2.9e-7? no: (1-0.512)^21=3e-7
#   j=0.7  -> 2e-4 (below default threshold; irrelevant)
# P[candidate at j=0.1] ~ 21*j^3 = 2% -> candidate volume stays near-linear.
N_MINHASH = 63
N_BANDS = 21
ROWS_PER_BAND = N_MINHASH // N_BANDS
DEFAULT_JACCARD = 0.8
SIMHASH_BITS = 60  # 60 (not 64) so 2^bit sums never overflow signed int64


def exact_dedupe(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedupe groups via content hash; keeper = lowest id (first-wins,
    the reference's guid rule).  One shuffle on the 60-bit hash."""
    return (
        docs.withColumn("text_hash", portable_hash60(text_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingled(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingles array<string>) with >= 1 shingle per non-null doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        token_shingles(text_col, k).alias("shingles"),
    )


def minhash_signatures(sh: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, h0..h{n-1}): minhash_i = min over shingles of hash(i, s).

    Explode + n simultaneous min-aggregations: Spark executes this as one
    partial/final hash agg (map-side combine), so the shuffle after the
    explode carries one row per doc_id.  Hashes are native `xxhash64(seed,
    shingle)` — fast and independent per seed; they never appear in the
    output (candidates are verified with exact Jaccard), so no DuckDB
    portability constraint applies, unlike simhash/fingerprints."""
    exploded = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )


def lsh_band_buckets(sigs: DataFrame, n_bands: int = N_BANDS, rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Signature -> (doc_id, band_idx, band_hash); docs sharing a bucket in
    any band become candidates."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            F.lit(b),
                            *[
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


def lsh_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = DEFAULT_JACCARD,
    k: int = 3,
) -> DataFrame:
    """Near-duplicate similarity join: pairs (doc_a < doc_b) whose distinct
    token-k-gram Jaccard >= threshold, found via MinHash banding and then
    verified EXACTLY (JVM array_intersect/array_union sizes).

    The output therefore equals the brute-force O(n^2) similarity join; LSH
    only prunes the candidate space (miss probability (1-t^3)^21 ~= 3e-7 at
    t=0.8, vanishing for the ~0.98-Jaccard duplicates real corpora plant).
    Never materializes the cross product: candidate volume is ~linear.
    """
    sh = shingled(docs, id_col, text_col, k).cache()
    bands = lsh_band_buckets(minhash_signatures(sh))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_prefix_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k: int = 3,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity join: pairs (doc_a < doc_b) with
    distinct token-k-gram Jaccard >= threshold — no hashing, no miss
    probability.  The deterministic sibling of lsh_near_dup_pairs.

    Candidate generation is AllPairs-style PREFIX FILTERING: shingles get a
    global total order (ascending document frequency, ties by string), each
    doc keeps only its first |s| - ceil(t*|s|) + 1 shingles in that order,
    and candidates are pairs sharing a PREFIX shingle.  Completeness: a pair
    at Jaccard >= t shares c >= ceil(t*|s|) shingles on each side, and its
    globally-minimal common shingle must sit inside both prefixes (if it
    didn't, the >= |s|-ceil(t*|s|)+1 shingles preceding it would leave room
    for at most ceil(t*|s|)-1 common ones — contradiction).  Every candidate
    is then verified with exact JVM array_intersect/array_union, so false
    positives cost time, never correctness; the epsilon inside ceil() only
    ever LENGTHENS prefixes (FP noise can't shorten them into missing pairs).

    Candidates surviving the prefix collision are thinned by two more
    LOSSLESS filters before the distinct + verify rejoin (PPJoin):
    - length filter: |a| >= t*|b| and |b| >= t*|a| (J >= t is impossible
      otherwise, since J <= min/max of the sizes);
    - positional filter: a shared shingle at 1-based prefix positions
      (pa, pb) can support at most min(|a|-pa, |b|-pb)+1 common shingles
      (both sorted by the SAME global order, so every common shingle sits
      at position >= pa in a and >= pb in b), which must reach the
      required overlap alpha = ceil(t/(1+t) * (|a|+|b|)).  The globally
      minimal common shingle of a qualifying pair always passes, so
      completeness is preserved.

    Scale shape: rarest-first ordering makes prefix shingles precisely the
    LOW-frequency ones, so the candidate self-join on `shingle` is
    skew-resistant by construction — the stop-word grams that would each
    produce O(n^2) candidate pairs in a naive inverted index are the LAST
    shingles in every doc's order and almost never inside a prefix.  Plan:
    one explode+agg for document frequencies, one fact-to-fact join to
    attach them (shuffle on shingle), one groupBy to rebuild sorted lists,
    the candidate self-join with the JVM-expression filters above, and the
    verify rejoin — all DataFrame ops, no Python in the hot path.
    """
    sh = shingled(docs, id_col, text_col, k).cache()
    # NULL-text docs shingle to [NULL]; Spark's array_intersect/union treat
    # NULL elements as equal (two NULL docs verify at Jaccard 1.0, matching
    # lsh_near_dup_pairs), but an equi-join key of NULL would silently drop
    # them from the candidate index — coalesce to a sentinel there only
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle")).withColumn(
        "shingle", F.coalesce("shingle", F.lit("\x00"))
    )
    df_freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = F.greatest(
        F.size("shingles")
        - F.ceil(F.lit(threshold) * F.size("shingles") - F.lit(1e-9)).cast("int")
        + 1,
        F.lit(1),
    )
    prefixes = (
        ex.join(df_freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("df"), F.col("shingle").alias("s"))
                )
            ).alias("ordered")
        )
        .join(sh.select("doc_id", "shingles"), "doc_id")
        .select(
            "doc_id",
            F.size("shingles").alias("sz"),
            F.posexplode(
                F.transform(
                    F.slice(F.col("ordered"), F.lit(1), prefix_len),
                    lambda x: x["s"],
                )
            ).alias("pos", "shingle"),
        )
        # pos: 1-based position in the doc's globally-ordered shingle list
        .withColumn("pos", F.col("pos") + 1)
    )
    a = prefixes.alias("a")
    b = prefixes.alias("b")
    t = F.lit(threshold)
    # required overlap if the pair is to reach Jaccard >= t
    alpha = F.ceil(
        t / (1.0 + threshold) * (F.col("a.sz") + F.col("b.sz")) - F.lit(1e-9)
    )
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter
            & (F.col("a.sz") >= t * F.col("b.sz"))
            & (F.col("b.sz") >= t * F.col("a.sz"))
            # positional filter
            & (
                F.least(
                    F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
                )
                + 1
                >= alpha
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over whitespace tokens.

    bit b of the fingerprint is the majority vote of bit b across the
    portable hashes of every token OCCURRENCE (multiplicity counts, like the
    classic Charikar construction).  Computed as 60 signed sums in ONE
    partial/final agg pass, then assembled with 2^b weights — all JVM, all
    map-side-combinable, and reproducible in DuckDB SQL.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).withColumn("th", portable_hash60("token"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
    min_tokens: int | None = None,
) -> DataFrame:
    """Pairs within `max_hamming` SimHash bits, via the pigeonhole block
    trick: split the 60-bit fingerprint into `n_blocks` 15-bit blocks; any
    pair within hamming distance n_blocks-1 must agree exactly on >= 1
    block, so an equi-join per block finds ALL such pairs (exact, not
    probabilistic), then bit_count(xor) verifies.  Requires
    max_hamming < n_blocks.

    min_tokens is the hot-block guard for degenerate corpora: millions of
    near-empty docs share the same few fingerprints, every one of their
    15-bit blocks collides, and the self-join (and the legitimate O(n^2)
    pair OUTPUT for identical docs) explodes quadratically.  Setting
    min_tokens >= 2 filters those docs out of the near-dup join entirely
    — near-empty docs belong to exact_dedupe, which handles them in one
    linear groupBy.  Default None preserves exact oracle parity."""
    assert max_hamming < n_blocks
    block_bits = SIMHASH_BITS // n_blocks
    mask = (1 << block_bits) - 1
    if min_tokens:
        docs = docs.filter(
            F.size(F.split(F.col(text_col), " ")) >= min_tokens
        )
    sh = simhash(docs, id_col, text_col)
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftright(F.col("simhash"), i * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "simhash", "blk.block_idx", "blk.block_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def near_dup_keepers(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Collapse near-dup pairs into keep/drop decisions: every doc that
    appears as the greater side of a pair with a smaller doc is dropped
    (min-id-wins, transitively applied via min over the pair group — the
    corpus analog of first-guid-wins)."""
    dropped = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return (
        docs.join(dropped.withColumn("_drop", F.lit(True)), id_col, "left")
        .withColumn("keep", F.coalesce(~F.col("_drop"), F.lit(True)))
        .drop("_drop")
    )


def near_dup_groups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = DEFAULT_JACCARD,
) -> DataFrame:
    """Near-duplicate GROUPS: transitively close the verified near-dup pair
    graph (lsh_near_dup_pairs) with connected components and label every
    document — group_id = min doc id of its component (singletons label
    themselves), is_keeper = the reference's first-wins keeper rule applied
    per group (lowest id survives, lib/feedparser.js:939 guid first-wins).

    This is the operator a dedup pass actually runs at 100 TB: pairs alone
    under-remove (A~B~C with A!~C must still collapse to one keeper).  Plan:
    LSH pair join (O(n) shuffle) -> components over the pair set (tiny:
    near-dup pairs ≪ corpus) -> one broadcast-ish left join back to doc ids.
    """
    from .components import connected_components

    pairs = lsh_near_dup_pairs(docs, id_col, text_col, threshold)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = connected_components(edges).withColumnRenamed("node", "doc_id")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("group_id"),
        )
        .withColumn("is_keeper", F.col("group_id") == F.col("doc_id"))
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicate-substring spans (the "Deduplicating Training Data
    Makes Language Models Better" operation, token-granular): for every
    document, the maximal token ranges covered by k-grams that also occur
    in at least ``min_docs - 1`` OTHER documents.  Output one row per
    maximal span: (doc_id, start_tok, end_tok, span_tokens), 1-based
    inclusive token positions; documents with no cross-document duplicate
    k-gram are absent.  WITHIN-document repetition alone does not qualify
    (that signal is repetition_metrics); this operator finds the text a
    cross-document exact-dedup pass would cut.

    Plan: positional k-grams via the zip-of-k-slices construction (array
    local, no per-element re-split), ONE posexplode carrying (doc, pos,
    gram-hash); the duplicated-gram dim is a distinct-project + count on
    the 8-byte hash (two map-side-combinable shuffles) and joins back as a
    plain shuffle hash join — it is corpus-vocabulary sized, NOT assumed
    broadcastable (unlike boilerplate lines, duplicated grams can be a
    large fraction of a crawl).  Hit positions then collapse per document:
    one collect_list of bigints per doc (bounded by doc length), interval
    merge as an in-row fold — [p, p+k-1] merges into the last interval
    when p <= last_e + 1, and positions arrive sorted so the running end
    only ever grows.  60-bit hash collisions: the oracle joins on the gram
    STRING, so a collision surfaces as a mismatch there (exact_dedupe's
    portability argument).
    """
    from ..functions.hashing import portable_hash60
    from .curation import _grams  # positional (non-distinct) k-gram builder

    toks = F.split(F.col(text_col), " ")
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(_grams(toks, k)).alias("pos0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            portable_hash60(F.col("gram")).alias("gh"),
        )
    )
    dup = (
        base.select("doc_id", "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gh")
    )
    hits = base.join(dup, "gh").select("doc_id", "pos")
    empty_ivs = F.expr("cast(array() as array<struct<s:bigint,e:bigint>>)")
    kk = F.lit(int(k))

    def _merge(acc, p):
        last = F.element_at(acc, -1)
        extend = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["s"].alias("s"), (p + kk - 1).alias("e")
                )
            ),
        )
        start = F.concat(
            acc,
            F.array(F.struct(p.alias("s"), (p + kk - 1).alias("e"))),
        )
        return F.when(
            (F.size(acc) > 0) & (p <= last["e"] + 1), extend
        ).otherwise(start)

    spans = (
        hits.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
        .select(
            "doc_id",
            F.explode(F.aggregate(F.col("ps"), empty_ivs, _merge)).alias("iv"),
        )
        .select(
            "doc_id",
            F.col("iv.s").alias("start_tok"),
            F.col("iv.e").alias("end_tok"),
            (F.col("iv.e") - F.col("iv.s") + 1).alias("span_tokens"),
        )
    )
    return spans


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernandez & Stolfo 1995, multi-pass)
# ---------------------------------------------------------------------------


def snm_candidate_pairs(
    keyed: DataFrame,
    window: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate (a, b) pairs from one sorted-neighborhood pass.

    ``keyed`` carries (id, blk, key); within each block, rows are sorted by
    (key, id) and every row pairs with its next ``window - 1`` neighbors
    (lead(j) for j in 1..window-1 — linear in corpus size, versus the
    quadratic blow-up of equality blocking on a hot key).  Pairs are
    canonicalized to (least, greatest).

    Scale shape: the sort is a window partitioned by ``blk`` — so ``blk``
    must have warehouse-scale cardinality.  Compose it as
    (coarse attribute, short sort-key prefix): partitions stay bounded, and
    the true duplicates that straddle a prefix boundary are the multi-pass
    story — a SECOND pass with an unrelated key family (see
    snm_near_dup_pairs) catches what the first pass's boundaries split,
    which is the original multi-pass SNM argument, applied to partition
    boundaries instead of window edges.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    from pyspark.sql import Window as W

    w = W.partitionBy("blk").orderBy("key", id_col)
    out = None
    for j in range(1, window):
        step = (
            keyed.select(
                F.col(id_col).alias("_x"),
                F.lead(id_col, j).over(w).alias("_y"),
            )
            .filter(F.col("_y").isNotNull())
        )
        out = step if out is None else out.unionAll(step)
    return out.select(
        F.least("_x", "_y").alias("a"), F.greatest("_x", "_y").alias("b")
    ).distinct()


def _snm_base(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shared projection for the two SNM key families + verify shingles."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("n_chars"),
        F.substring(F.col(text_col), 1, 12).alias("_p12"),
        F.reverse(F.substring(F.col(text_col), 1, 24)).alias("_r24"),
        token_shingles(text_col, k=3).alias("_sh"),
    )


def snm_all_candidates(
    docs: DataFrame,
    window: int = 4,
    prefix_block_chars: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The union of both SNM passes' candidate pairs, pre-verify — the
    blocking output itself, exposed so blocking quality (reduction ratio /
    pairs completeness) can be audited independently of the verify step."""
    base = _snm_base(docs, id_col, text_col)
    npad = F.lpad(F.col("n_chars").cast("string"), 6, "0")
    pass1 = base.select(
        "doc_id",
        F.substring(F.col("_p12"), 1, prefix_block_chars).alias("blk"),
        F.col("_p12").alias("key"),
    )
    pass2 = base.select(
        "doc_id",
        F.substring(npad, 1, 4).alias("blk"),
        F.concat(npad, F.col("_r24")).alias("key"),
    )
    return snm_candidate_pairs(pass1, window).unionAll(
        snm_candidate_pairs(pass2, window)
    ).distinct()


def snm_near_dup_pairs(
    docs: DataFrame,
    window: int = 4,
    threshold: float = 0.5,
    prefix_block_chars: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multi-pass sorted-neighborhood near-dup detection over documents.

    Two passes with independent CONTENT-derived key families (attribute
    blocks like lang/source are a recall trap: near-duplicate documents
    routinely differ in metadata — translations, re-crawls, mirrored
    sources — while sharing text):

      1. blk = first ``prefix_block_chars`` chars of the text, key =
         12-char text prefix — clusters shared openings;
      2. blk = first 4 digits of zero-padded n_chars (i.e. length // 100),
         key = zero-padded n_chars then reversed 24-char prefix — clusters
         by size, catching duplicates whose openings (and so pass-1
         blocks) differ; pairs that straddle a length-block boundary are
         exactly what pass 1 recovers, and vice versa.

    Candidates from both passes union, then exact token-3-shingle Jaccard
    verifies each pair (the same verify-after-block discipline as
    minhash-LSH: blocking only ACCELERATES; similarity defines the result).
    Returns (doc_a, doc_b, jaccard >= threshold).

    Versus minhash-LSH: SNM is cheaper (no signature computation — one sort
    per pass) and catches near-dups below the LSH design threshold, but its
    recall depends on the key families instead of a tunable collision
    probability; it is the right tool for clustered corpora (crawl snapshots
    sorted by URL, transcripts sorted by conv prefix).  Both compose with
    the same verify + components + keeper tail.
    """
    base = _snm_base(docs, id_col, text_col)
    cands = snm_all_candidates(
        docs, window, prefix_block_chars, id_col, text_col
    )
    sh = base.select("doc_id", "_sh")
    paired = (
        cands.join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("_sh", "_sa"), "a")
        .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("_sh", "_sb"), "b")
    )
    jac = F.size(F.array_intersect("_sa", "_sb")).cast("double") / F.size(
        F.array_distinct(F.concat("_sa", "_sb"))
    )
    return (
        paired.select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """EXACT shingle-containment join — quote / subset detection: ordered
    pairs (src, dst), src != dst, with

        C(src -> dst) = |S(src) ∩ S(dst)| / |S(src)| >= threshold

    over distinct token-k-gram sets.  The ASYMMETRIC near-dup relation
    jaccard_prefix_pairs cannot see: a short post quoted inside a long
    article has containment ~1 but Jaccard ~|post|/|article| — exactly
    the pairs a dedup pipeline must catch to avoid training on the same
    quote twice (the suffix-array substring analog is duplicate_spans;
    this is the set-level, order-insensitive form).

    ONE-SIDED prefix filtering (AllPairs argument, asymmetric): shingles
    get the same rarest-first global order as jaccard_prefix_pairs; the
    SRC side keeps its first |S| - ceil(t*|S|) + 1 shingles, the DST side
    is indexed on ALL its shingles (containment puts no lower bound on
    |dst| overlap fraction, so the dst side cannot be prefix-thinned).
    Completeness: C >= t forces |∩| >= ceil(t*|S_src|) common shingles,
    so the globally-minimal common shingle sits inside src's prefix.
    Skew: the full dst index does include stop-word grams, but the join
    key pairs dst postings with SRC PREFIX occurrences — prefixes are
    rare-first, so hot shingles meet ~no src prefixes and the candidate
    count stays near the qualifying-pair count.  Exact JVM verify, no
    Python anywhere.
    """
    sh = shingled(docs, id_col, text_col, k).cache()
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle")).withColumn(
        "shingle", F.coalesce("shingle", F.lit("\x00"))
    )
    df_freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = F.greatest(
        F.size("shingles")
        - F.ceil(F.lit(threshold) * F.size("shingles") - F.lit(1e-9)).cast("int")
        + 1,
        F.lit(1),
    )
    src_pref = (
        ex.join(df_freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("shingle").alias("s")))
            ).alias("ordered")
        )
        .join(sh, "doc_id")
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.transform(
                    F.slice(F.col("ordered"), F.lit(1), prefix_len),
                    lambda x: x["s"],
                )
            ).alias("shingle"),
        )
    )
    cand = (
        src_pref.join(ex.select(F.col("doc_id").alias("dst"), "shingle"), "shingle")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    ssrc = sh.select(F.col("doc_id").alias("src"), F.col("shingles").alias("sh_s"))
    sdst = sh.select(F.col("doc_id").alias("dst"), F.col("shingles").alias("sh_d"))
    return (
        cand.join(ssrc, "src")
        .join(sdst, "dst")
        .withColumn(
            "containment",
            F.round(
                F.size(F.array_intersect("sh_s", "sh_d")) / F.size("sh_s"), 6
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("src", "dst", "containment")
    )
