"""Training-sequence packing — GPT-style concat-and-chunk over a document
corpus.

LM training consumes fixed-length token sequences; feeding one (padded)
document per sequence wastes most of the context window on short docs.  The
standard remedy (GPT/T5 "pack then split") concatenates documents in a
deterministic order and slices the token stream at ``capacity`` boundaries,
letting documents span sequence boundaries.  The packing map — which
sequence each document starts in, at what offset, and how many sequences it
spans — is a pure function of the exclusive prefix sum of token counts in
corpus order.

Reference analog: the reference's ordered item emission (document-order
guarantee, /root/reference/lib/feedparser.js:576-580) is the same contract —
a deterministic global order over the corpus — that makes this packing
reproducible run-to-run.

Scale design: a naive ``SUM() OVER (ORDER BY doc_id)`` is a SINGLE-PARTITION
window — the whole corpus funnels through one task, the classic 100 TB
killer.  Instead the prefix sum runs in two phases, the textbook distributed
scan:

1. bucket every doc into one of ``n_buckets`` doc_id RANGES (order-preserving,
   so bucket order == global order); per-bucket token totals are one
   map-side-combinable agg producing ``n_buckets`` rows;
2. the exclusive cumsum over those tiny bucket totals is a window over
   ``n_buckets`` rows (driver-scale, broadcast back); within each bucket the
   window partitions by bucket — parallel across buckets, each partition
   bounded by corpus/n_buckets.

The DuckDB oracle replays the SAME map with the naive single window —
passing means the distributed scan equals the sequential definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_pack(
    df: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Per-document packing map for concat-and-chunk at ``capacity`` tokens.

    Returns (id_col, n_tokens, global_start, seq_id, offset_in_seq,
    n_seqs_spanned), all BIGINT: ``global_start`` is the exclusive prefix sum
    of whitespace token counts in ``id_col`` order, ``seq_id`` the sequence
    the doc starts in, ``offset_in_seq`` its offset there, and
    ``n_seqs_spanned`` how many capacity-sized sequences it touches.
    Integer arithmetic throughout (div/%) — no float rounding to disagree
    across engines.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    # Phase 0: id bounds (one tiny agg; table stats at real scale). Buckets
    # are doc_id RANGES so bucket index is monotonic in doc_id — bucket
    # order composes with in-bucket order into the global order.
    lo, hi = toks.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return toks.select(
            id_col,
            "n_tokens",
            F.lit(None).cast("long").alias("global_start"),
            F.lit(None).cast("long").alias("seq_id"),
            F.lit(None).cast("long").alias("offset_in_seq"),
            F.lit(None).cast("long").alias("n_seqs_spanned"),
        )
    span = int(hi) - int(lo) + 1
    if span > (1 << 63) - 1:
        # (id - lo) must fit a long; ids spanning the full signed 64-bit
        # space (e.g. raw xxhash64) would overflow under ANSI — fold such
        # ids into [0, 2^63) first (shiftrightunsigned(h, 1), see
        # plans/sft_export.py).
        raise ValueError(
            f"id range {lo}..{hi} spans {span} > 2^63-1; fold ids into "
            "[0, 2^63) before packing"
        )
    width = max(-(-span // n_buckets), 1)  # ceil
    bucketed = toks.withColumn(
        "_pk_bucket", ((F.col(id_col) - F.lit(int(lo))) / width).cast("long")
    )

    # Phase 1: per-bucket totals (map-side combine) -> exclusive bucket
    # offsets via a window over <= n_buckets rows (tiny, broadcast back).
    totals = bucketed.groupBy("_pk_bucket").agg(
        F.sum("n_tokens").alias("_pk_total")
    )
    w_b = (
        Window.orderBy("_pk_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_pk_bucket",
        (F.sum("_pk_total").over(w_b) - F.col("_pk_total")).alias("_pk_offset"),
    )

    # Phase 2: in-bucket exclusive cumsum, partitioned by bucket (parallel).
    w_in = (
        Window.partitionBy("_pk_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        bucketed.join(F.broadcast(offsets), "_pk_bucket")
        .withColumn(
            "global_start",
            F.col("_pk_offset")
            + F.sum("n_tokens").over(w_in)
            - F.col("n_tokens"),
        )
        .drop("_pk_bucket", "_pk_offset")
    )

    cap = F.lit(int(capacity))
    end = F.col("global_start") + F.col("n_tokens") - 1
    return packed.select(
        id_col,
        "n_tokens",
        "global_start",
        F.expr(f"global_start div {int(capacity)}").alias("seq_id"),
        F.pmod(F.col("global_start"), cap).cast("long").alias("offset_in_seq"),
        (
            (end - F.pmod(end, cap)) / cap
            - (F.col("global_start") - F.pmod(F.col("global_start"), cap)) / cap
            + 1
        )
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def sequence_pack_naive(
    df: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequential definition: ONE unpartitioned window (the plan the scale
    path must equal — tests only, this is the single-partition killer)."""
    w = Window.orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    ).withColumn(
        "global_start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    cap = F.lit(int(capacity))
    end = F.col("global_start") + F.col("n_tokens") - 1
    return toks.select(
        id_col,
        "n_tokens",
        "global_start",
        F.expr(f"global_start div {int(capacity)}").alias("seq_id"),
        F.pmod(F.col("global_start"), cap).cast("long").alias("offset_in_seq"),
        (
            (end - F.pmod(end, cap)) / cap
            - (F.col("global_start") - F.pmod(F.col("global_start"), cap)) / cap
            + 1
        )
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the RAG / embedding-pipeline
    sibling of sequence_pack: split each document into ``chunk_tokens``-token
    windows advancing by ``chunk_tokens - overlap`` so consecutive chunks
    share ``overlap`` tokens of context.  The final chunk is short rather
    than padded; every token lands in >= 1 chunk; a doc no longer than one
    window emits exactly 1 chunk.

    Returns (id_col, chunk_id 0-based, start_token 1-based, n_chunk_tokens,
    chunk_text, chunk_hash) — the hash (portable 60-bit) keys downstream
    chunk-level dedupe / embedding caches.

    Scale shape: one explode (output is corpus-linear in chunk count, each
    row built by array slice/join — pure codegen), no shuffle at all: the
    chunker is a projection, so it pipelines into whatever embed/write
    stage follows.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks).cast("long")
    n_chunks = F.greatest(
        F.expr(
            f"(GREATEST(CAST(size(split({text_col}, ' ')) AS BIGINT)"
            f" - {overlap}, 0) + {stride - 1}) div {stride}"
        ),
        F.lit(1).cast("long"),
    )
    e = df.select(
        F.col(id_col),
        toks.alias("_ck_toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    piece = F.slice(
        F.col("_ck_toks"),
        (F.col("chunk_id") * stride + 1).cast("int"),
        chunk_tokens,
    )
    text = F.array_join(piece, " ")
    from ..functions.hashing import portable_hash60

    return e.select(
        id_col,
        "chunk_id",
        (F.col("chunk_id") * stride + 1).alias("start_token"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        text.alias("chunk_text"),
        portable_hash60(text).alias("chunk_hash"),
    )


def sequence_fill_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-sequence occupancy from a packing map: how many docs start in /
    cover each sequence and how full it is.  Docs spanning k sequences
    explode to k coverage rows (k is tiny: ceil(doc_len/capacity)+1).
    Returns (seq_id, n_docs_starting, n_docs_covering, n_tokens_filled).
    """
    cap = F.lit(int(capacity))
    end = F.col("global_start") + F.col("n_tokens") - 1
    end_seq = ((end - F.pmod(end, cap)) / cap).cast("long")
    cover = packed.select(
        F.col("seq_id").alias("start_seq"),
        "global_start",
        "n_tokens",
        F.explode(F.sequence(F.col("seq_id"), end_seq)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * cap
    seq_hi = seq_lo + cap
    filled = F.least(F.col("global_start") + F.col("n_tokens"), seq_hi) - F.greatest(
        F.col("global_start"), seq_lo
    )
    return (
        cover.groupBy("seq_id")
        .agg(
            F.sum(
                F.when(F.col("start_seq") == F.col("seq_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_docs_starting"),
            F.count(F.lit(1)).cast("long").alias("n_docs_covering"),
            F.sum(filled).cast("long").alias("n_tokens_filled"),
        )
    )
