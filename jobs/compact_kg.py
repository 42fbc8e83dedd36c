"""spark-submit entry point for triples-table compaction (the Iceberg
rewrite_data_files maintenance action, local-FS analog — see
plans/compact.py for the protocol and crash-safety argument).

Usage:
    spark-submit jobs/compact_kg.py --output /path/kg \
        [--snapshot snap-...] [--max-files 4] [--target-mb 128]

Prints a single JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--snapshot", default=None,
                    help="compact only this snapshot's partitions")
    ap.add_argument("--max-files", type=int, default=4,
                    help="leave partitions at or below this file count")
    ap.add_argument("--target-mb", type=int, default=128,
                    help="target output file size per partition")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from node_feedparser_spark.plans.compact import compact_triples
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="compact_kg",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()
    summary = compact_triples(
        spark,
        args.output,
        snapshot=args.snapshot,
        max_files=args.max_files,
        target_bytes=args.target_mb * 1024 * 1024,
    )
    summary["wall_s"] = round(time.monotonic() - t0, 3)
    summary["master"] = spark.sparkContext.master
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
