#!/usr/bin/env python
"""bench.py — headline benchmark (driver contract).

Runs (a) the flagship KG pipeline (datagen -> dedupe -> mapInPandas extract
-> LSH + connected-components canonicalize -> materialize) on a
deterministic synthetic transcript corpus sized to the SF, and (b) every
`__spark_entry__.queries()` operator at `$SPARK_GRAFT_SF_DIR`, each forced
end-to-end with a noop write (computes everything, collects nothing).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}

Scaling evidence (BASELINE.md protocol) lives in jobs/bench_scaling.py; this
file is the single-process per-round feedback loop.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Headline tier (round 4): kg_pipeline + one representative query per
# operator family, so BENCH_r{N} stays comparable round-over-round even as
# the full registry grows (the 134 queries round 3 added put 75% of
# bench_total_wall into intentionally-iterative graph shapes).  Tier
# changes should be rare and disclosed; the full-registry total is still
# reported as bench_total_wall.
HEADLINE = [
    # §2 parse/normalize core
    "agg_pricing_summary", "link_reassembly", "author_parse",
    "precedence_dates", "embedded_html_dispatch", "xhtml_reserialize",
    "retro_resolve",
    # dedupe family
    "exact_dedupe", "minhash_near_dup", "simhash_near_dup",
    "duplicate_spans",
    # similarity / ANN
    "embedding_topk", "ivfpq_residual_topk", "ann_index_probe",
    # text analysis + curation
    "language_id", "tfidf_topk", "bm25_topk", "decontaminate",
    "stratified_split", "sequence_pack",
    # KG graph core
    "kg_components", "pagerank", "scc", "triangle_count",
    "label_propagation",
    # temporal + fusion
    "sessionize", "truth_fusion",
    # sketches + skew discipline
    "hll_distinct", "cms_heavy_hitters", "salted_group_stats",
    # round 5 additions: preference family rep, F17 meta side, the
    # streaming-face PSI twin (tier change disclosed in README/BASELINE)
    "dpo_pairs", "meta_cloud", "psi_window",
]


def main() -> None:
    # Tier selection (round 5, VERDICT r4 item 8): the full registry wall
    # crossed 8 minutes, so the default round-loop run times only
    # kg_pipeline + the representative HEADLINE tier (~90 s of queries);
    # pass --full (or SPARK_GRAFT_BENCH_TIER=full) for the whole registry.
    # headline_wall stays definitionally identical across tiers.
    full = "--full" in sys.argv[1:] or (
        os.environ.get("SPARK_GRAFT_BENCH_TIER", "headline") == "full"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    import __spark_entry__ as entrymod
    from node_feedparser_spark.datagen import write_transcripts
    from node_feedparser_spark.plans.pipeline import build_kg
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    timings: dict[str, float] = {}
    t_all = time.monotonic()

    # --- flagship KG pipeline on a corpus big enough that data, not stage
    # scheduling, dominates: seed-42 datagen base replicated Spark-side
    # (same construction as jobs/bench_scaling.py, deterministic)
    scale = max(2.0, sf * 100)
    replicas = max(1, int(sf * 1600))  # sf0.1 -> 160 replicas ≈ 1.1 M turns
    corpus = f"/tmp/bench_corpus_s{scale:g}_r{replicas}"
    out_dir = f"/tmp/bench_kg_{os.getpid()}"
    if not os.path.isdir(corpus):
        base = f"/tmp/bench_corpus_s{scale:g}/transcripts.parquet"
        if not os.path.exists(base):
            write_transcripts(base, seed=42, scale=scale)
        from pyspark.sql import functions as F

        df = spark.read.parquet(base)
        reps = spark.range(replicas).select(F.col("id").alias("rep"))
        (
            df.crossJoin(F.broadcast(reps))
            .select(
                F.concat_ws("#", "conv_id", "rep").alias("conv_id"),
                "turn_idx", "role", "text", "tool", "ts",
            )
            .repartition(max(64, replicas))
            .write.mode("overwrite")
            .parquet(corpus)
        )
    # Warm the page cache (corpus + testdata tables): this microVM shows
    # ~2x wall between cold-cache and warm runs of identical jobs, and the
    # engine, not the virtio disk, is what the bench measures.
    spark.read.parquet(corpus).write.format("noop").mode("overwrite").save()
    for name in ("documents", "embeddings", "events", "lineitem", "orders"):
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()

    # Untimed JIT warmup at 1/16 corpus scale BEFORE the timed trials: a
    # cold JVM spends trial 1 (and much of trial 2) compiling — measured
    # cold walls 38.6/23.7/19.6 s vs 18.6/16.9/16.6 s after one ~20 s
    # small-scale pass that compiles the same codepaths on 1/16 the data.
    # Cheaper than burning full-size trials on warmup AND the reported
    # minimum reflects the warm steady state the job reaches on a real
    # cluster within its first partitions.  Protocol change (late r3)
    # disclosed here and in README.
    from pyspark.sql import functions as F

    warm_sub = f"{corpus}_warm16"
    if not os.path.isdir(warm_sub):
        (
            spark.read.parquet(corpus)
            .filter(F.abs(F.hash("conv_id")) % 16 == 0)
            .write.mode("overwrite")
            .parquet(warm_sub)
        )
    build_kg(spark, warm_sub, f"{out_dir}_warm", n_buckets=cpus, resume=False)
    shutil.rmtree(f"{out_dir}_warm", ignore_errors=True)

    # Best-of-N for the headline (BASELINE.md protocol: minimum wall is the
    # faithful estimate under neighbor/steal noise).
    # default 3 since round 3 (was 2): trial 2 still carries measurable JVM
    # JIT warmup on this host (~10% on identical code), so best-of-2
    # under-reports the warm steady state best-of-3 reaches.  Protocol
    # change disclosed here and in README — round-over-round comparisons
    # should note it.
    trials = int(os.environ.get("SPARK_GRAFT_KG_TRIALS", "3"))
    kg_wall = float("inf")
    summary = None
    for trial in range(max(1, trials)):
        t0 = time.monotonic()
        trial_summary = build_kg(
            spark, corpus, f"{out_dir}_t{trial}", n_buckets=cpus, resume=False
        )
        wall = round(time.monotonic() - t0, 3)
        # determinism check BEFORE the min-reassignment: comparing after
        # would compare a newly-adopted faster trial against itself and
        # never fire
        if summary is not None and trial_summary["n_triples"] != summary["n_triples"]:
            raise AssertionError(
                f"non-deterministic n_triples across trials: "
                f"{trial_summary['n_triples']} != {summary['n_triples']}"
            )
        # derived throughput must come from the SAME trial as the reported
        # wall (the pipeline is deterministic, but never mix trials)
        if wall < kg_wall:
            kg_wall, summary = wall, trial_summary
        shutil.rmtree(f"{out_dir}_t{trial}", ignore_errors=True)
    timings["kg_pipeline"] = kg_wall
    kg_triples_per_sec = round(summary["n_triples"] / timings["kg_pipeline"], 1)

    # --- operator suite over the driver testdata
    registry = entrymod.queries()
    names = sorted(registry) if full else sorted(set(HEADLINE) & set(registry))
    for name in names:
        t0 = time.monotonic()
        _force(registry[name](spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(time.monotonic() - t_all, 3)
    missing = [q for q in HEADLINE if q not in timings]
    assert not missing, f"headline tier names unknown queries: {missing}"
    headline_wall = round(
        timings["kg_pipeline"] + sum(timings[q] for q in HEADLINE), 3
    )
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "tier": "full" if full else "headline",
                "n_registry_queries": len(registry),
                "kg_triples": summary["n_triples"],
                "kg_triples_per_sec": kg_triples_per_sec,
                "headline_wall": headline_wall,
                "headline_queries": ["kg_pipeline"] + HEADLINE,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
