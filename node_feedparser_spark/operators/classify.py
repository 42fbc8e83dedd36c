"""Multinomial Naive Bayes text classification as DataFrame algebra.

The learned complement to the dictionary heuristic in
`text_analysis.language_id`: train per-class token log-likelihoods from the
corpus itself (labels = the `lang` column) and score every document,
entirely with built-in functions — the "train a quality/language classifier
over the whole corpus" step of a curation pipeline, with training and
inference each a constant number of corpus-linear aggregations.

Plan shape (nothing corpus-squared, no Python):
- token counts per (token, class): one explode + map-side-combinable agg —
  the vocabulary-classes table (small);
- class totals + vocab size: aggs over that table (tiny), broadcast back;
- scoring: each document's token occurrences cross the (tiny, broadcast)
  class list, left-join the vocabulary table for add-1-smoothed
  log-likelihoods, one (doc, class) sum agg, one per-doc top-1 window.

Determinism / engine portability: per-(doc,class) log-likelihood sums are
ROUNDED to 6 dp before the argmax (absorbing the <=1-ulp libm log
differences between the JVM and DuckDB — the unigram_lm precedent), and
argmax ties break by class name ascending.

Resubstitution scoring (train and score on the same corpus) is the honest
framing: the operator demonstrates the distributed train+infer plan, not a
generalization claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DP = 6


def naive_bayes_score(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train multinomial NB (add-1 smoothing) on (text, label) and score
    every document; returns (id_col, label_col, pred, score) where pred is
    the 6 dp-rounded-argmax class and score its rounded log-posterior
    (natural log, unnormalized)."""
    toks = docs.select(
        F.col(id_col),
        F.col(label_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")

    # vocabulary-classes table: occurrences of token within class
    tc = toks.groupBy("token", F.col(label_col).alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # class token totals + global vocab size + doc priors (all tiny)
    totals = tc.groupBy("cls").agg(F.sum("cnt").alias("tot"))
    vocab_n = tc.select("token").distinct().count()
    n_docs = docs.count()
    priors = (
        docs.groupBy(F.col(label_col).alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_cls"))
        .select(
            "cls",
            F.round(F.log(F.col("n_cls") / F.lit(float(n_docs))), _DP).alias(
                "log_prior"
            ),
        )
    )

    # per-(doc, token) multiplicities once, then cross the tiny class dim
    doc_tok = toks.groupBy(id_col, label_col, "token").agg(
        F.count(F.lit(1)).cast("long").alias("mult")
    )
    classes = F.broadcast(
        totals.join(priors, "cls").select("cls", "tot", "log_prior")
    )
    scored = (
        doc_tok.crossJoin(classes)
        .join(F.broadcast(tc), ["token", "cls"], "left")
        .select(
            id_col,
            label_col,
            "cls",
            "log_prior",
            (
                F.col("mult")
                * F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                    / (F.col("tot") + F.lit(float(vocab_n)))
                )
            ).alias("ll"),
        )
        .groupBy(id_col, label_col, "cls", "log_prior")
        .agg(F.round(F.sum("ll") + F.first("log_prior"), _DP).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("cls")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, label_col, F.col("cls").alias("pred"), "score")
    )


def naive_bayes_sql(
    table: str = "documents",
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of naive_bayes_score (same smoothing, same rounding
    points, same tie-break), emitted from code like factorize.als_sql."""
    return f"""
        WITH toks AS (
            SELECT {id_col}, {label_col},
                   unnest(string_split({text_col}, ' ')) AS token
            FROM {table}),
        tk AS (SELECT * FROM toks WHERE token <> ''),
        tc AS (SELECT token, {label_col} AS cls,
                      CAST(COUNT(*) AS BIGINT) AS cnt
               FROM tk GROUP BY 1, 2),
        totals AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS tot
                   FROM tc GROUP BY 1),
        vocab AS (SELECT COUNT(DISTINCT token) AS v FROM tc),
        nd AS (SELECT COUNT(*) AS n FROM {table}),
        priors AS (SELECT {label_col} AS cls,
                          ROUND(LN(COUNT(*) / (SELECT CAST(n AS DOUBLE)
                                               FROM nd)), {_DP})
                            AS log_prior
                   FROM {table} GROUP BY 1),
        doc_tok AS (SELECT {id_col}, {label_col}, token,
                           CAST(COUNT(*) AS BIGINT) AS mult
                    FROM tk GROUP BY 1, 2, 3),
        cl AS (SELECT t.cls, t.tot, p.log_prior
               FROM totals t JOIN priors p USING (cls)),
        scored AS (
            SELECT d.{id_col}, d.{label_col}, c.cls,
                   ROUND(SUM(d.mult * LN((COALESCE(tc.cnt, 0) + 1.0)
                             / (c.tot + (SELECT CAST(v AS DOUBLE)
                                         FROM vocab))))
                         + ANY_VALUE(c.log_prior), {_DP}) AS score
            FROM doc_tok d CROSS JOIN cl c
            LEFT JOIN tc ON tc.token = d.token AND tc.cls = c.cls
            GROUP BY 1, 2, 3),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY {id_col}
                        ORDER BY score DESC, cls) AS rn
            FROM scored)
        SELECT {id_col}, {label_col}, cls AS pred, score
        FROM ranked WHERE rn = 1
    """
