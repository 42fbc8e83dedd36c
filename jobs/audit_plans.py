#!/usr/bin/env python
"""Plan-hygiene audit across every `__spark_entry__.queries()` entry.

The scale contract of this repo is mostly PLAN-shaped: filters reach the
parquet scan, small sides broadcast, Python appears only where declared,
and shuffles are the ones each operator's docstring budgets.  This job
makes that auditable in one pass: it ANALYZES (never executes) each named
query at a small SF, counts the load-bearing physical operators, and
writes a per-query table to PLANS.md plus one JSON line to stdout.

Columns:
- exchanges: shuffle Exchange nodes (AQE may remove some at runtime;
  static count is the upper bound the plan declares);
- bhj / smj: broadcast-hash vs sort-merge join nodes;
- python: Arrow/Pandas/Python evaluation nodes (mapInPandas, pandas UDF,
  applyInPandas) — must be empty unless the query is in the declared
  Python allowlist below;
- pushed: parquet scans carrying a PushedFilters entry / total scans;
- codegen: WholeStageCodegen spans (wider = more of the plan fused).

Run: spark-submit --master 'local[8]' jobs/audit_plans.py
     [--sf-dir /root/testdata/sf0.001] [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose Python stage is the declared design (Arrow-batched, unit of
# work justified in the operator docstring) — anything else showing a
# Python node is a regression.
PYTHON_ALLOWED = {
    "kg_pipeline",  # not a queries() entry, kept for symmetry
    "bpe_encode",           # unique-word-memoized BPE application
    "media_decode",         # opaque binary decode
    "media_meta",
    "frame_sample",
    "payload_dedupe",
    "salted_group_stats",   # salted applyInPandas (north-rule demo)
    "embedding_near_dup_blocked",  # per-cell block matmul
    "embedding_near_dup",
    "semantic_dedupe",
    "ivf_ann_topk",
    "ivf_kmeans_topk",
    "quantized_topk",
    "pq_topk",              # int-ADC product quantization (encode+score pass)
    "ivfpq_topk",           # IVF cell-probe + int-ADC PQ scoring pass
    "ivfpq_residual_topk",  # residual-encoded IVF-PQ scoring pass
    "ann_lane_eval",        # composes the four Arrow ANN lanes + exact truth
    "ann_index_probe",      # index BUILD encode pass (probe itself is JVM)
    "embedding_topk",
    "ann_recall_eval",      # composes the two Arrow topk lanes above
    "retro_resolve",        # JVM-prescreened Arrow URL resolution
    "url_resolve",
    "html_uri_resolve",
    "embedded_html_dispatch",  # F10 dispatch gating the F9 Arrow resolver
    "author_parse",
    "rrf_fusion",           # fuses embedding_topk + bm25 lanes
    "judge_scores",         # batched LLM-judge client plumbing (offline fake)
}

PY_NODES = re.compile(
    r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas"
    r"|AggregateInPandas|WindowInPandas|PythonMapInArrow"
)


def audit_one(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    pushed = [
        s
        for s in scans
        if "PushedFilters: [" in s and "PushedFilters: []" not in s
    ]
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "python": len(PY_NODES.findall(plan)),
        "scans": len(scans),
        "pushed": len(pushed),
        "codegen": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    ))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from node_feedparser_spark.session import get_spark

    spark = get_spark(app="audit_plans", master="local[8]",
                      shuffle_partitions=8)
    t0 = time.monotonic()
    rows = []
    violations = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            stats = audit_one(fn(spark, args.sf_dir))
        except Exception as e:  # noqa: BLE001 - audit must report, not die
            rows.append((name, None, f"ERROR {type(e).__name__}: {e}"))
            violations.append(f"{name}: analysis error {e}")
            continue
        ok_python = stats["python"] == 0 or name in PYTHON_ALLOWED
        if not ok_python:
            violations.append(
                f"{name}: {stats['python']} undeclared Python node(s)"
            )
        rows.append((name, stats, "" if ok_python else "UNDECLARED PYTHON"))

    lines = [
        "# PLANS.md — static plan-hygiene audit",
        "",
        f"Analyzed (not executed) every `queries()` entry at `{args.sf_dir}`",
        "with `jobs/audit_plans.py`; regenerate with:",
        "`spark-submit --master 'local[8]' jobs/audit_plans.py`.",
        "",
        "Python nodes are only legitimate for the declared Arrow-batched",
        "operators (allowlist in the job); `pushed/scans` counts parquet",
        "scans carrying non-empty PushedFilters (scans of full tables that",
        "an operator aggregates wholesale legitimately push nothing).",
        "",
        "| query | exchanges | bhj | smj | python | pushed/scans | codegen | flag |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, stats, flag in rows:
        if stats is None:
            lines.append(f"| {name} | - | - | - | - | - | - | {flag} |")
        else:
            lines.append(
                f"| {name} | {stats['exchanges']} | {stats['bhj']} "
                f"| {stats['smj']} | {stats['python']} "
                f"| {stats['pushed']}/{stats['scans']} "
                f"| {stats['codegen']} | {flag} |"
            )
    n_py = sum(1 for _, s, _ in rows if s and s["python"] > 0)
    totals = {
        "n_queries": len(rows),
        "n_with_python": n_py,
        "n_violations": len(violations),
        "violations": violations,
        "wall_s": round(time.monotonic() - t0, 3),
    }
    lines += [
        "",
        f"**{len(rows)} queries audited; {n_py} use declared Python "
        f"stages; {len(violations)} violations.**",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
