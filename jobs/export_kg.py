"""Export a built KG to W3C N-Triples text (the standard-format exit
door every triple store ingests).

Usage:
    spark-submit --master local[8] jobs/export_kg.py \
        --kg /path/to/kg [--out /path/to/kg/export_nt]

Reads the KG's triples table, serializes each (subj, pred, obj) with
`operators/export.to_ntriples` (one codegen projection — the escaping is
a chain of JVM literal replaces), writes partitioned ``.nt`` text, and
prints ONE JSON summary line with the exported statement count.  The
write is a plain distributed text sink: no driver collect at any size.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg", required=True, help="KG output dir (build_kg)")
    ap.add_argument("--out", default=None, help="default: <kg>/export_nt")
    args = ap.parse_args()
    out = args.out or os.path.join(args.kg, "export_nt")

    from node_feedparser_spark.operators.export import to_ntriples
    from node_feedparser_spark.session import get_spark

    t0 = time.monotonic()
    spark = get_spark(app="export_kg")
    triples_dir = os.path.join(args.kg, "triples")
    if not glob.glob(os.path.join(triples_dir, "**", "*.parquet"),
                     recursive=True):
        raise SystemExit(f"no triples parquet under {triples_dir}")
    triples = spark.read.parquet(triples_dir)
    lines = to_ntriples(triples)
    lines.write.mode("overwrite").text(out)
    n = spark.read.text(out).count()
    print(
        json.dumps(
            {
                "out": out,
                "n_statements": n,
                "wall_s": round(time.monotonic() - t0, 3),
                "master": spark.sparkContext.master,
            }
        )
    )


if __name__ == "__main__":
    main()
