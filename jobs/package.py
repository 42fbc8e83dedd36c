"""Package the library for `spark-submit --py-files` (SURVEY.md §3.3: the
reference's CLI becomes `spark-submit --py-files dist/kgpipe.zip
jobs/build_kg.py ...`).

Usage: python jobs/package.py [--out dist/kgpipe.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "node_feedparser_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "kgpipe.zip"))
    args = ap.parse_args()
    print(build_zip(args.out))
