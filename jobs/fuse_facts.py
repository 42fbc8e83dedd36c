"""spark-submit entry point for the fused-facts stage: truth discovery
over a built KG's triples table (plans/fuse.py).

Usage:
    spark-submit jobs/fuse_facts.py --kg /path/kg \
        [--snapshot snap-...] [--n-iter 2] [--output /path/dir] \
        [--master local[8]]

Reads <kg>/triples (snapshot-pruned when --snapshot is given) and
<kg>/vertices; writes <output or kg>/facts with one resolved object per
(subj_id, pred) plus its confidence and supporting-source count.  Prints
a single JSON summary line.
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
                    help="fuse only this ingested snapshot's triples")
    ap.add_argument("--n-iter", type=int, default=2)
    ap.add_argument("--output", default=None,
                    help="directory for facts/ (default: the KG dir)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from node_feedparser_spark.plans.fuse import fuse_facts
    from node_feedparser_spark.session import get_spark

    spark = get_spark(
        app="fuse_facts",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    summary = fuse_facts(
        spark,
        args.kg,
        output_dir=args.output,
        snapshot=args.snapshot,
        n_iter=args.n_iter,
    )
    summary["master"] = spark.sparkContext.master
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
