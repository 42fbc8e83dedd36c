"""spark-submit integrity audit over a built KG output directory.

Usage:
    spark-submit --py-files pipeline.zip jobs/validate_kg.py \
        --output /path/kg [--master local[8]] [--strict]

Prints one JSON line with every check's status and exits nonzero when a
structural invariant fails (with --strict, warnings fail too).  See
node_feedparser_spark/plans/validate.py for the check catalog and why
each one stays corpus-scan-cheap at 100 TB.
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
    ap.add_argument("--output", required=True, help="KG output dir to audit")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--strict", action="store_true",
                    help="exit nonzero on warnings too")
    args = ap.parse_args()

    from node_feedparser_spark.plans.validate import validate_kg
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="validate_kg",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()
    report = validate_kg(spark, args.output)
    report["wall_s"] = round(time.monotonic() - t0, 3)
    report["master"] = spark.sparkContext.master
    print(json.dumps(report))
    spark.stop()
    bad = report["n_fail"] + (report["n_warn"] if args.strict else 0)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
