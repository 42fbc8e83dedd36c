"""End-to-end training-corpus curation plan — the composed pipeline a
pretraining data team runs between a raw document crawl and tokenization,
built entirely from this repo's first-class operators:

    exact dedupe -> near-dup grouping (MinHash-LSH + components)
    -> boilerplate line scrub -> quality / repetition / length gates
    -> PII scrub -> benchmark decontamination (optional)
    -> per-language token-budget sampling (optional)
    -> stratified train/val/test split -> partitioned parquet

Reference analog: the reference's per-item pipeline is normalize -> dedupe
by guid -> first-wins (lib/feedparser.js:939, 1007-1011); this is the same
discipline at corpus granularity (SURVEY.md §2's dedupe/normalize rows
composed, plus the LLM-pipeline operator family).

Design for 100 TB:
- every document carries a ``drop_stage`` label (the FIRST stage that
  rejected it, NULL = survived) so the whole funnel is ONE aggregation
  over one labeled frame — not one count() action per stage re-running
  the upstream DAG.
- stage order puts the cheap row-local gates after the joins that need
  the full corpus anyway (dedupe keeper sets), and the budget sampler
  only ever sees survivors, so its cumulative-sum work shrinks with every
  upstream rejection.
- the labeled frame is persisted once (funnel agg + final write read it);
  all component operators keep their own documented shuffle budgets.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60
from ..operators.curation import (
    boilerplate_scrub,
    decontaminate,
    pii_scrub,
    stratified_split,
    token_budget_sample,
)
from ..operators.dedupe import near_dup_groups
from ..operators.text_analysis import language_id, quality_features
from ..operators.curation import repetition_metrics

STAGES = (
    "exact_dup", "near_dup", "too_short", "repetitive", "low_quality",
    "contaminated", "over_budget",
)


def curate_corpus(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    *,
    eval_path: str | None = None,
    budget: int | None = None,
    min_tokens: int = 5,
    max_dup_kgram_frac: float = 0.5,
    min_quality: float = 0.0,
    near_dup_threshold: float = 0.8,
    boiler_min_docs: int = 5,
    split_weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    split_names: tuple[str, ...] = ("train", "val", "test"),
) -> dict:
    """Run the curation funnel over a documents-shaped parquet
    (doc_id, text[, lang, source, ...]); write survivors partitioned by
    split to ``output_dir`` and return the funnel summary."""
    t0 = time.monotonic()
    docs = spark.read.parquet(input_path)
    has_lang = "lang" in docs.columns
    base_cols = [c for c in ("lang", "source") if c in docs.columns]

    # --- dedupe keeper sets (full-corpus joins, so they run first).
    # Exact keeper: lowest doc_id per 60-bit content hash (first-wins).
    hashed = docs.select(
        "doc_id", portable_hash60(F.col("text")).alias("text_hash")
    )
    exact_keep = hashed.groupBy("text_hash").agg(
        F.min("doc_id").alias("_exact_keeper")
    )
    exact = hashed.join(exact_keep, "text_hash").select(
        "doc_id", (F.col("doc_id") != F.col("_exact_keeper")).alias("_exact_dup")
    )
    near = near_dup_groups(docs, threshold=near_dup_threshold).select(
        "doc_id", (~F.col("is_keeper")).alias("_near_dup")
    )

    # --- boilerplate scrub (transform, not a gate)
    scrubbed = boilerplate_scrub(docs, min_docs=boiler_min_docs).select(
        "doc_id", "n_boilerplate", F.col("clean_text").alias("_boiled")
    )

    work = (
        docs.select("doc_id", *base_cols)
        .join(exact, "doc_id")
        .join(near, "doc_id")
        .join(scrubbed, "doc_id")
    )

    # --- row-local gates over the scrubbed text
    rep = repetition_metrics(
        work.select("doc_id", F.col("_boiled").alias("text"))
    ).select("doc_id", "n_tokens", "dup_kgram_frac")
    qual = quality_features(
        work.select("doc_id", F.col("_boiled").alias("text"))
    ).select("doc_id", "quality_score")
    work = work.join(rep, "doc_id").join(qual, "doc_id")

    # --- PII scrub (transform) on what will ship
    pii = pii_scrub(
        work.select("doc_id", F.col("_boiled").alias("text"))
    ).select("doc_id", "n_emails", "n_phones", F.col("clean_text").alias("_clean"))
    work = work.join(pii, "doc_id")

    # --- decontamination (broadcast eval grams; corpus never shuffles)
    if eval_path is not None:
        ev = spark.read.parquet(eval_path)
        cont = decontaminate(
            work.select("doc_id", F.col("_clean").alias("text")), ev
        ).select("doc_id", "contaminated")
    else:
        cont = work.select("doc_id", F.lit(False).alias("contaminated"))
    work = work.join(cont, "doc_id")

    # --- language for stratification: the table's own label when present,
    # else the n-gram language_id prediction
    if has_lang:
        work = work.withColumn("_lang", F.col("lang"))
    else:
        pred = language_id(
            docs.select("doc_id", "text")
        ).select("doc_id", F.col("pred_lang").alias("_lang"))
        work = work.join(pred, "doc_id")

    drop = (
        F.when(F.col("_exact_dup"), "exact_dup")
        .when(F.col("_near_dup"), "near_dup")
        .when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("dup_kgram_frac") > max_dup_kgram_frac, "repetitive")
        .when(F.col("quality_score") < min_quality, "low_quality")
        .when(F.col("contaminated"), "contaminated")
    )
    labeled = work.withColumn("drop_stage", drop)

    # --- token budget over survivors only (the sampler's cumulative sum
    # shrinks with every upstream rejection)
    if budget is not None:
        surv = labeled.filter(F.col("drop_stage").isNull()).select(
            "doc_id", F.col("_lang").alias("lang"),
            F.col("_clean").alias("text"),
        )
        kept = token_budget_sample(surv, budget=budget).select(
            "doc_id", F.lit(True).alias("_in_budget")
        )
        labeled = labeled.join(kept, "doc_id", "left").withColumn(
            "drop_stage",
            F.coalesce(
                F.col("drop_stage"),
                F.when(F.col("_in_budget").isNull(), "over_budget"),
            ),
        )
    labeled = labeled.persist()
    try:
        funnel_rows = (
            labeled.groupBy("drop_stage").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_tokens").alias("toks"),
                F.sum("n_boilerplate").alias("boiler"),
                F.sum("n_emails").alias("emails"),
                F.sum("n_phones").alias("phones"),
            )
        ).collect()
        funnel = {r["drop_stage"] or "kept": r["n"] for r in funnel_rows}
        n_in = sum(funnel.values())
        kept_row = next(
            (r for r in funnel_rows if r["drop_stage"] is None), None
        )

        final = labeled.filter(F.col("drop_stage").isNull())
        split = stratified_split(
            final.select("doc_id", F.col("_lang").alias("lang")),
            weights=split_weights, names=split_names, strat_col="lang",
        ).select("doc_id", "split")
        out = final.join(split, "doc_id").select(
            "doc_id",
            *base_cols,
            F.col("_lang").alias("strat_lang"),
            F.col("_clean").alias("text"),
            "n_tokens",
            "quality_score",
            "split",
        )
        out.write.mode("overwrite").partitionBy("split").parquet(
            output_dir.rstrip("/") + "/curated"
        )
        curated = spark.read.parquet(output_dir.rstrip("/") + "/curated")
        splits = {
            r["split"]: r["n"]
            for r in curated.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        return {
            "input_docs": n_in,
            "funnel": {s: funnel.get(s, 0) for s in STAGES},
            "output_docs": funnel.get("kept", 0),
            "output_tokens": int(kept_row["toks"]) if kept_row else 0,
            "boilerplate_lines_removed": int(
                sum(r["boiler"] for r in funnel_rows)
            ),
            "pii_redactions": int(
                sum(r["emails"] + r["phones"] for r in funnel_rows)
            ),
            "splits": splits,
            "output_dir": output_dir,
            "wall_s": round(time.monotonic() - t0, 3),
        }
    finally:
        labeled.unpersist()
