"""Character-level fuzzy matching — SymSpell deletion-blocked edit-distance
join.

The token-level near-dup family (minhash/simhash/ngram-jaccard) misses
TYPO-level variation: 'acount' vs 'account' share almost no shingles.
Entity-alias typos are exactly what a KG canonicalization stage must also
catch, and the scalable exact method for edit distance 1 is SymSpell's
deletion neighborhood: every word keys itself plus each single-character
deletion; two words within edit distance 1 ALWAYS share at least one key
(substitution: delete the differing position from both; insertion: the
deletion of the inserted char IS the other word), so the blocking is
COMPLETE — no recall loss — while candidate generation stays
O(word_len) keys per word.  False positives (e.g. transpositions like
'ab'/'ba', distance 2) are removed by one levenshtein verify on the
candidate pairs only — never all-pairs.

Plan: vocab count agg (the corpus-scale pass), explode to deletion keys
(vocab-linear), self-join on key with a < b ordering, distinct, verify.
Both engines ship the same levenshtein built-in, so the DuckDB oracle
replays the join end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_keys(col: str = "word") -> F.Column:
    """Array of the word itself plus every single-character deletion."""
    return F.expr(
        f"array_append(transform(sequence(1, length({col})), "
        f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))), "
        f"{col})"
    )


def edit_distance_join(
    docs: DataFrame, text_col: str = "text", max_count_ratio: float | None = None
) -> DataFrame:
    """Typo-variant pairs in the corpus vocabulary at edit distance <= 1.

    Returns (w1, w2, n1, n2, dist) with w1 < w2, dist in {1} (identical
    words are one vocab row, so 0 never appears), n* the corpus
    occurrence counts.  ``max_count_ratio`` optionally keeps only pairs
    where the rarer word is at most that fraction of the commoner one —
    the SymSpell heuristic that a typo is much rarer than its correction.
    """
    vocab = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    keyed = vocab.select(
        "word", "wc", F.explode(deletion_keys("word")).alias("key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .select(
            F.col("a.word").alias("w1"),
            F.col("b.word").alias("w2"),
            F.col("a.wc").alias("n1"),
            F.col("b.wc").alias("n2"),
        )
        .distinct()
    )
    out = pairs.select(
        "w1", "w2", "n1", "n2",
        F.levenshtein("w1", "w2").cast("long").alias("dist"),
    ).where(F.col("dist") <= 1)
    if max_count_ratio is not None:
        out = out.where(
            F.least("n1", "n2")
            <= F.lit(max_count_ratio) * F.greatest("n1", "n2")
        )
    return out
