"""Rule-mining stage — schema induction over the materialized triples.

Once `build_kg` has materialized canonical (subj_id, pred, obj_id)
triples, this stage mines the 2-hop horn rules and the per-predicate
functionality profile (operators/rules.py) over the CANONICAL entity
ids — mining over surface forms would split every rule's support across
alias variants, which is exactly what the canonicalization stage exists
to prevent.  The reference hard-codes its one schema inference (guid
looks-like-a-link => link, /root/reference/lib/feedparser.js:485-492);
at corpus scale the analog is mining such implications with measured
confidence and letting the profile say which predicates are functional
enough for truth fusion.

Reads the (snap, bucket)-partitioned triples table — snapshot-pruned
when ``snapshot`` is given, same time-travel analog as fuse_facts — and
writes two parquet tables next to it::

    rules/        (p1, p2, p3, support, n_body, n_head,
                   conf_std, conf_pca, head_coverage)
    pred_profile/ (pred, n_triples, n_subj, n_obj, functionality,
                   inv_functionality, domain_prefix, domain_share,
                   range_prefix, range_share)

Both outputs are predicate-count-sized — the writes are trivial; the
cost lives in the mining operator's body join (capped per connecting
node, see mine_path_rules' docstring for the 100 TB story).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.extract import ERROR_PRED
from ..operators.rules import mine_path_rules, predicate_stats
from .pipeline import read_triples_snapshot


def mine_kg_rules(
    spark: SparkSession,
    kg_dir: str,
    output_dir: str | None = None,
    snapshot: str | None = None,
    min_support: int = 25,
    max_pairs: int = 100_000,
) -> dict:
    """Mine rules + predicate profile over a built KG; write
    ``<out>/rules`` and ``<out>/pred_profile``.  Returns a summary dict.
    """
    t0 = time.monotonic()
    out = output_dir or kg_dir

    if snapshot is not None:
        triples = read_triples_snapshot(spark, kg_dir, snapshot)
    else:
        triples = spark.read.parquet(os.path.join(kg_dir, "triples"))

    t = triples.filter(F.col("pred") != ERROR_PRED).select(
        F.col("subj_id").alias("subj"), "pred", F.col("obj_id").alias("obj")
    )

    rules = mine_path_rules(
        t, min_support=min_support, max_pairs=max_pairs
    ).cache()
    profile = predicate_stats(t)

    rules_path = os.path.join(out, "rules")
    profile_path = os.path.join(out, "pred_profile")
    # predicate-count-sized outputs: one file each is the right layout
    rules.coalesce(1).write.mode("overwrite").parquet(rules_path)
    profile.coalesce(1).write.mode("overwrite").parquet(profile_path)

    collected = rules.orderBy(
        F.col("conf_pca").desc(), F.col("support").desc(), "p1", "p2", "p3"
    ).collect()
    top = (
        {
            "p1": collected[0]["p1"],
            "p2": collected[0]["p2"],
            "p3": collected[0]["p3"],
            "support": collected[0]["support"],
            "conf_pca": collected[0]["conf_pca"],
        }
        if collected
        else None
    )
    n_preds = t.select("pred").distinct().count()
    rules.unpersist()
    return {
        "n_rules": len(collected),
        "n_preds": n_preds,
        "top_rule": top,
        "min_support": min_support,
        "rules_dir": rules_path,
        "profile_dir": profile_path,
        "wall_s": round(time.monotonic() - t0, 3),
    }
