#!/usr/bin/env python
"""spark-submit entry point for the SFT export stage (plans/sft_export.py):
transcripts -> conversation-profile filter -> (prompt, response) pairs over
a bounded context window -> sequence-packing coordinates -> parquet.

Usage:
    spark-submit jobs/make_sft.py \
        --input /path/transcripts.parquet --output /path/sft \
        [--context-turns 4] [--capacity 2048] [--min-turns 2]

Prints a single JSON summary line (pair/conversation/token/sequence
counts, wall seconds).
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
    ap.add_argument("--context-turns", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--min-turns", type=int, default=2)
    ap.add_argument("--min-response-chars", type=int, default=1)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from node_feedparser_spark.plans.sft_export import build_sft
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="make_sft",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    summary = build_sft(
        spark,
        args.input,
        args.output,
        context_turns=args.context_turns,
        capacity=args.capacity,
        min_turns=args.min_turns,
        min_response_chars=args.min_response_chars,
    )
    summary["master"] = spark.sparkContext.master
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
