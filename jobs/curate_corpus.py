"""spark-submit entry point for the training-corpus curation funnel
(plans/curate.py): dedupe -> boilerplate scrub -> quality gates -> PII
scrub -> optional decontamination -> optional token budget -> stratified
split -> partitioned parquet.

Usage:
    spark-submit jobs/curate_corpus.py \
        --input /path/documents.parquet --output /path/curated \
        [--eval-input /path/eval.parquet] [--budget 1000000] \
        [--min-tokens 5] [--max-dup-kgram-frac 0.5] [--min-quality 0.0]

Prints a single JSON summary line (funnel counts, splits, wall seconds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--eval-input", default=None)
    ap.add_argument("--budget", type=int, default=None)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-dup-kgram-frac", type=float, default=0.5)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--boiler-min-docs", type=int, default=5)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from node_feedparser_spark.plans.curate import curate_corpus
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="curate_corpus",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    summary = curate_corpus(
        spark,
        args.input,
        args.output,
        eval_path=args.eval_input,
        budget=args.budget,
        min_tokens=args.min_tokens,
        max_dup_kgram_frac=args.max_dup_kgram_frac,
        min_quality=args.min_quality,
        near_dup_threshold=args.near_dup_threshold,
        boiler_min_docs=args.boiler_min_docs,
    )
    summary["master"] = spark.sparkContext.master
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
