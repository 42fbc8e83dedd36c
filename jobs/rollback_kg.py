"""spark-submit entry point for snapshot rollback (the Iceberg
rollback_to_snapshot maintenance action, local-FS analog): retire every
ingested snapshot NOT named by --keep in one three-table expiry
transaction — see plans/expire.py rollback_keep for the recompute
semantics and crash safety.

Usage:
    spark-submit jobs/rollback_kg.py --output /path/kg \
        --keep snap-... [--keep snap-...]

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
    ap.add_argument(
        "--keep",
        action="append",
        required=True,
        help="snapshot id to PRESERVE (repeatable); everything else is "
        "expired (as in triples/snap=<id>)",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from node_feedparser_spark.plans.expire import rollback_keep
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="rollback_kg",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()
    summary = rollback_keep(spark, args.output, args.keep)
    summary["wall_s"] = round(time.monotonic() - t0, 3)
    summary["master"] = spark.sparkContext.master
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
