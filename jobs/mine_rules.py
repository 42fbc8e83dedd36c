"""spark-submit entry point for the rule-mining stage: AMIE-style 2-hop
horn rules + predicate functionality profile over a built KG's triples
table (plans/mine.py).

Usage:
    spark-submit jobs/mine_rules.py --kg /path/kg \
        [--snapshot snap-...] [--min-support 25] [--max-pairs 100000] \
        [--output /path/dir] [--master local[8]]

Reads <kg>/triples (snapshot-pruned when --snapshot is given); writes
<output or kg>/rules and <output or kg>/pred_profile.  Prints a single
JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg", required=True, help="build_kg output dir")
    ap.add_argument("--snapshot", default=None,
                    help="mine only this ingested snapshot's triples")
    ap.add_argument("--min-support", type=int, default=25)
    ap.add_argument("--max-pairs", type=int, default=100_000)
    ap.add_argument("--output", default=None,
                    help="directory for rules/ + pred_profile/ "
                         "(default: the KG dir)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from node_feedparser_spark.plans.mine import mine_kg_rules
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="mine_rules",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    summary = mine_kg_rules(
        spark,
        args.kg,
        output_dir=args.output,
        snapshot=args.snapshot,
        min_support=args.min_support,
        max_pairs=args.max_pairs,
    )
    summary["master"] = spark.sparkContext.master
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
