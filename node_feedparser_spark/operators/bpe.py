"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The tokenizer-induction step of a training-data pipeline: learn byte-pair
merges from corpus statistics, then encode the corpus with them.  The key
scale observation (same as the IVF k-means centroid design in
operators/similarity.py): BPE training does NOT iterate over the corpus —
it iterates over the WORD-FREQUENCY TABLE, which is vocabulary-sized.  So
the plan is

1. ``word_counts``: one corpus-scale explode + map-side-combinable count —
   the only pass that ever touches 100 TB;
2. ``bpe_train``: cap the vocab at ``top_words`` rows (orderBy count desc —
   a bounded top-k, deterministically tie-broken by word), pull ONLY that
   capped table to the driver, and run the exact Sennrich merge loop in
   pure Python (the loop is inherently sequential: merge i+1's pair counts
   depend on merge i).  Like the k-means centroids, the driver sees
   ``top_words`` rows, never the corpus;
3. ``bpe_encode``: broadcast the learned merge ranks, encode with an
   Arrow-batched mapInPandas whose unit of Python work is the UNIQUE WORD
   (memoized across batches), not the row — the reference-extractor
   discipline from operators/extract.py.

Semantics are standard Sennrich: symbols = characters + a separate '</w>'
end-of-word marker; pair counts weighted by word frequency with per-
occurrence multiplicity; greedy left-to-right non-overlapping merge
application; encode applies the lowest-rank applicable merge until none
applies.  Tie-break for equal pair counts: lexicographically smallest
(left, right) — deterministic where the original is dict-order dependent.

Reference analog: the reference's two-stage parse (corpus-order token
stream -> dictionary-driven normalization, /root/reference/lib/
feedparser.js:137-169) has the same shape — a corpus pass producing
statistics, a tiny learned table steering the per-token rewrite.

The merge LOOP is not SQL-expressible (each iteration's input is the
previous iteration's rewrite), so `bpe_merges`/`bpe_encode` ship without a
DuckDB oracle (rows-only driver check); correctness is pinned by pytest
against an independent pure-Python Sennrich implementation on real corpus
slices plus degenerate-run cases.  The distributed kernel — first-
iteration pair counting — IS oracled (`bpe_pair_counts`).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"


# ---------------------------------------------------------------- pure core


def merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Greedy left-to-right non-overlapping merge of one pair."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_merges(
    vocab: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Sennrich merge loop over a word->count table (vocabulary-sized)."""
    words: dict[tuple[str, ...], int] = {}
    for w, c in vocab.items():
        if w:
            key = tuple(w) + (END,)
            words[key] = words.get(key, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {
            tuple(merge_word(list(s), best)): c for s, c in words.items()
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first until none applies."""
    syms = list(word) + [END] if word else [END]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = merge_word(syms, best_pair)
    return syms


# ------------------------------------------------------------- Spark plans


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) over whitespace tokens, empty tokens dropped — the one
    corpus-scale pass (explode + map-side-combinable count)."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )


def bpe_pair_counts(wc: DataFrame) -> DataFrame:
    """First-iteration BPE pair statistics: adjacent symbol pairs (chars +
    '</w>') weighted by word count, per-occurrence multiplicity — the
    distributed kernel every merge iteration re-runs on the (tiny) evolving
    word table.  All JVM: char split, two aligned slices zipped to pairs,
    one explode over symbol pairs (word-length-linear), one count agg.
    Returns (l_sym, r_sym, pair_count)."""
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    n = F.size(syms) - 1
    pairs = F.zip_with(
        F.slice(syms, 1, n),
        F.slice(syms, 2, n),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        wc.select("wc", F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("l_sym"), F.col("p.r").alias("r_sym")
        )
        .agg(F.sum("wc").cast("long").alias("pair_count"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 64,
    text_col: str = "text",
    top_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn merges from a corpus: distributed word count, deterministic
    top-``top_words`` cap (count desc, word asc), then the sequential merge
    loop on the driver — only the capped vocab ever leaves the cluster."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    rows = (
        word_counts(docs, text_col)
        .orderBy(F.col("wc").desc(), F.col("word"))
        .limit(top_words)
        .collect()
    )
    return train_merges({r["word"]: r["wc"] for r in rows}, n_merges)


def merges_df(
    spark: SparkSession, merges: list[tuple[str, str]]
) -> DataFrame:
    """Materialize a learned merge list as (rank, l_sym, r_sym)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, l_sym string, r_sym string",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode the corpus with learned merges.  Arrow-batched mapInPandas;
    the Python unit of work is the unique word, memoized across batches in
    the worker (corpus word reuse makes the amortized per-row cost a dict
    lookup).  Returns (id_col, n_words, n_bpe_tokens, bpe_tokens)."""
    ranks = {p: i for i, p in enumerate(merges)}
    out_schema = (
        f"{id_col} long, n_words long, n_bpe_tokens long, "
        "bpe_tokens array<string>"
    )

    def encode_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids = pdf[id_col].tolist()
            n_words: list[int] = []
            n_toks: list[int] = []
            toks: list[list[str]] = []
            for text in pdf[text_col].tolist():
                words = [w for w in (text or "").split(" ") if w]
                enc: list[str] = []
                for w in words:
                    t = cache.get(w)
                    if t is None:
                        t = encode_word(w, ranks)
                        cache[w] = t
                    enc.extend(t)
                n_words.append(len(words))
                n_toks.append(len(enc))
                toks.append(enc)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_words,
                    "n_bpe_tokens": n_toks,
                    "bpe_tokens": toks,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        encode_batches, schema=out_schema
    )
