"""Fellegi–Sunter probabilistic record linkage — pairwise match scoring.

The decision-theoretic core of entity resolution (Fellegi & Sunter 1969,
the model behind Splink / dedupe.py / every serious MDM stack): for each
candidate pair, compare a vector of fields; each field i carries an
agreement weight ln(m_i / u_i) and a disagreement weight
ln((1 - m_i) / (1 - u_i)), where m_i = P(agree | same entity) and
u_i = P(agree | different entities).  The pair's score is the sum — the
log-likelihood ratio of "match" over "non-match" — thresholded into
match / possible / non_match.

This is the probabilistic generalization of the pipeline's exact
canonicalization rule: where `operators/canonicalize.py` links surfaces by
normalized-key equality (the reference's all-or-nothing dedupe-merge keying,
/root/reference/lib/feedparser.js:1007-1011), Fellegi–Sunter grades the
evidence field by field, so near-miss records (typos, truncations,
reorderings) still link with calibrated confidence.

Engine-portability discipline: the m/u parameters are folded into the
agreement/disagreement weights in PYTHON (a single double literal each), so
neither engine evaluates ln() — cross-engine libm-vs-JVM 1-ulp drift never
enters the score; the per-pair sum is a fixed-order projection expression,
not an aggregation, so summation order cannot vary either.

Scale shape: candidate pairs come from BLOCKING, never a full cross join.
`fs_score_pairs` scores whatever pair frame it is given, so it composes
with any generator — the minhash-LSH bands of `operators/dedupe.py` at
warehouse scale, or the simple equality blocks of `fs_link_documents`
below (whose per-block pair count is the classic quadratic cost center:
cap block size or band-partition hot blocks, same mitigation as
link_predict pivots).  Scoring itself is a pure projection over the pair
frame — zero additional shuffles.

Parameter estimation: m/u are inputs here (domain priors or labeled-data
estimates).  The standard unsupervised EM refinement iterates exactly this
scoring plan (score -> posterior -> re-estimate m/u -> rescore), so it
composes as a driver-side loop over cheap aggregates; fixed parameters keep
every run deterministic and replayable, which the lineage/resume story
requires.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldParams:
    """One comparison field: its agreement column name and (m, u) rates."""

    name: str
    m: float
    u: float

    def __post_init__(self) -> None:
        if not (0 < self.u < self.m < 1):
            raise ValueError(
                f"{self.name}: need 0 < u < m < 1, got m={self.m} u={self.u}"
            )

    @property
    def agree_weight(self) -> float:
        return math.log(self.m / self.u)

    @property
    def disagree_weight(self) -> float:
        return math.log((1 - self.m) / (1 - self.u))


def fs_score_pairs(
    pairs: DataFrame,
    fields: list[FieldParams],
    upper: float = 2.0,
    lower: float = -2.0,
) -> DataFrame:
    """Add (score, decision) to a pair frame with boolean agreement columns.

    ``pairs`` must carry one boolean column per ``FieldParams.name``.
    Score = sum over fields of the pre-folded log-ratio weights, in fixed
    field order (pure projection); decision by the two FS thresholds.
    """
    if upper <= lower:
        raise ValueError("need upper > lower")
    score: Column = F.lit(0.0)
    for f in fields:
        score = score + F.when(
            F.col(f.name), F.lit(f.agree_weight)
        ).otherwise(F.lit(f.disagree_weight))
    score = F.round(score, 6)
    return pairs.withColumn("score", score).withColumn(
        "decision",
        F.when(F.col("score") >= upper, F.lit("match"))
        .when(F.col("score") <= lower, F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


#: documents-table field model used by fs_link_documents (and its oracle)
DOC_FIELDS = [
    FieldParams("agree_len", m=0.90, u=0.30),
    FieldParams("agree_prefix", m=0.80, u=0.05),
    FieldParams("agree_shingle", m=0.85, u=0.02),
]


def fs_link_documents(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    prefix_chars: int = 16,
    len_tolerance: float = 0.1,
    upper: float = 2.0,
    lower: float = -2.0,
) -> DataFrame:
    """FS linkage over the documents table, blocked on (lang, source).

    Agreement vector per blocked pair (id_a < id_b):
      - agree_len: |n_chars_a - n_chars_b| <= len_tolerance * max(len)
      - agree_prefix: first ``prefix_chars`` characters equal
      - agree_shingle: token-3-shingle Jaccard >= jaccard_threshold

    Returns (doc_a, doc_b, the three agreement booleans, score, decision).
    """
    from ..functions.hashing import token_shingles

    side = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.substring("text", 1, prefix_chars).alias("_pfx"),
        token_shingles("text", k=3).alias("_sh"),
    )
    a, b = side.alias("a"), side.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(
        F.array_distinct(F.concat(F.col("a._sh"), F.col("b._sh")))
    )
    jac = inter.cast("double") / union
    scored = pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        (
            F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
            <= F.lit(len_tolerance)
            * F.greatest(F.col("a.n_chars"), F.col("b.n_chars"))
        ).alias("agree_len"),
        (F.col("a._pfx") == F.col("b._pfx")).alias("agree_prefix"),
        (jac >= F.lit(jaccard_threshold)).alias("agree_shingle"),
    )
    return fs_score_pairs(scored, DOC_FIELDS, upper=upper, lower=lower)
