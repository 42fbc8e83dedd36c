"""Fused-facts stage — truth discovery over the materialized triples table.

The triples table asserts the same ``(subj_id, pred)`` many times with
conflicting objects (different conversations disagree about an entity's
attributes — the transcript-corpus analog of feedparser seeing the same
field from several feed fetches and keeping first-wins,
/root/reference/lib/feedparser.js:440-458).  This plan resolves each
``(subj_id, pred)`` to ONE object with a confidence, treating every
conversation as a source whose reliability is learned jointly with the
claims (operators/fusion.truth_fusion).

Reads the (snap, bucket)-partitioned triples table — snapshot-pruned when
``snapshot`` is given (zero bytes of other snapshots touched, the
time-travel analog) — and writes a ``facts/`` parquet table::

    (subj_id, canonical_name, pred, obj, confidence, n_sources)

canonical_name rides in from the vertices table via a broadcast join
(vertices are entity-count-sized).  The fusion itself shuffles claims
twice per iteration and broadcasts the per-source trust vector — see the
operator docstring for the 100 TB story.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import ERROR_PRED
from ..operators.fusion import truth_fusion
from .pipeline import read_triples_snapshot


def fuse_facts(
    spark: SparkSession,
    kg_dir: str,
    output_dir: str | None = None,
    snapshot: str | None = None,
    n_iter: int = 2,
) -> dict:
    """Run truth fusion over a built KG's triples; write ``<out>/facts``.

    Returns a one-line-JSON-able summary dict.  ``output_dir`` defaults
    to the KG directory itself (facts sit next to triples/vertices/
    edges/metrics).
    """
    t0 = time.monotonic()
    out = output_dir or kg_dir
    facts_path = os.path.join(out, "facts")

    if snapshot is not None:
        triples = read_triples_snapshot(spark, kg_dir, snapshot)
    else:
        triples = spark.read.parquet(os.path.join(kg_dir, "triples"))

    claims = triples.filter(F.col("pred") != ERROR_PRED).select(
        F.col("subj_id").alias("subj"),
        "pred",
        "obj",
        F.col("conv_id").alias("source"),
    )
    fused = truth_fusion(claims, n_iter=n_iter)

    vertices = spark.read.parquet(os.path.join(kg_dir, "vertices")).select(
        F.col("entity_id").alias("subj"), "canonical_name"
    )
    facts = (
        fused.join(F.broadcast(vertices), "subj", "left")
        .select(
            F.col("subj").alias("subj_id"),
            "canonical_name",
            "pred",
            "obj",
            "confidence",
            "n_sources",
        )
    )
    facts.write.mode("overwrite").parquet(facts_path)

    written = spark.read.parquet(facts_path)
    n_facts = written.count()
    n_conflicted = (
        claims.select("subj", "pred", "obj")
        .distinct()
        .groupBy("subj", "pred")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    return {
        "kg_dir": kg_dir,
        "facts_path": facts_path,
        "snapshot": snapshot,
        "n_iter": n_iter,
        "n_facts": n_facts,
        "n_conflicted_keys": n_conflicted,
        "wall_s": round(time.monotonic() - t0, 3),
    }
