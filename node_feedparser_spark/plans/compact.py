"""Small-file compaction for the materialized triples table.

Every resumed / crash-replayed `build_kg` run lands its buckets as fresh
parquet files under ``triples/snap=S/bucket=B/`` (dynamic partition
overwrite replaces whole partitions, but a LONG-LIVED graph built by many
incremental snapshot ingests accumulates partitions, and each partition
holds `sub` files by construction — see pipeline._write_triples).  At
10^12-turn scale that is millions of files: scan planning, footer reads
and object-store listings all degrade linearly with file count.  Real
warehouses run Iceberg's ``rewrite_data_files`` maintenance action; this
module is that action's local-FS analog (reference parallel: the
feedparser CLI re-emitting a normalized, compact stream of already-parsed
items — bin/feedparser.js — applied to the table layout instead of a
byte stream).

Design points:

- **Row-identical**: compaction rewrites bytes, never rows.  The content
  of every (snap, bucket) partition is exactly preserved (pinned by
  set-equality test), so lineage/metrics/graph_state all stay valid and
  `validate_kg` passes unchanged after compaction.
- **No shuffle**: each partition is read and `coalesce()`d — a partition
  -local merge of input splits with NO exchange; the job's cost is one
  read + one write of the partitions it touches, nothing else.
- **Partition-parallel**: independent partitions compact as concurrent
  Spark jobs (thread pool); within a partition the write parallelism is
  the coalesce target, so the cluster stays busy even when single
  partitions are small.
- **Crash-safe swap, per partition**: the rewrite lands in
  ``<partition>.compact-stage-<run>`` and is installed by atomic renames
  (retire live -> install stage -> drop retired).  Because old and new
  bytes encode the SAME rows, either copy is a valid state; recovery
  (`_recover_partition`) therefore only needs Spark's ``_SUCCESS`` marker
  to distinguish a complete stage from a torn one, and every crash point
  replays to a partition holding exactly its original rows.  On an
  Iceberg warehouse this whole dance is one rewrite-files commit.
- **Driver listing is bounded and intentional**: compaction IS the
  maintenance job that exists to fix file-count pathology, so it lists
  the partition directories it maintains (what Iceberg reads from
  manifests).  The hot pipeline itself never lists (pipeline.py uses
  write-side Observations).
"""

from __future__ import annotations

import concurrent.futures as cf
import glob
import os
import shutil
import uuid

from pyspark.sql import SparkSession

_STAGE_MARK = ".compact-stage-"


def _data_files(part_dir: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(glob.escape(part_dir), "*"))
        if os.path.isfile(p)
        and not os.path.basename(p).startswith(("_", "."))
    ]


def _partition_dirs(triples_path: str, snapshot: str | None) -> list[str]:
    """LIVE partition paths, including ones currently represented only by
    crash remnants: a crash inside _swap can leave `bucket=B.retired` and/or
    `bucket=B.compact-stage-*` with the live dir missing, and recovery must
    still be invoked for bucket=B — deriving the live path from the remnant
    names is what makes every crash point reachable by _recover_partition."""
    snap_glob = f"snap={snapshot}" if snapshot else "snap=*"
    seen = set()
    for d in glob.glob(
        os.path.join(glob.escape(triples_path), snap_glob, "bucket=*")
    ):
        if not os.path.isdir(d):
            continue
        if _STAGE_MARK in d:
            d = d.split(_STAGE_MARK, 1)[0]
        elif d.endswith(".retired"):
            d = d[: -len(".retired")]
        seen.add(d)
    return sorted(seen)


def recover_compaction(output_dir: str, snapshot: str | None = None) -> None:
    """Finish or discard any half-done compaction swaps.  Run by
    compact_triples itself, and by build_kg / expire_snapshot before they
    read the triples table raw: a crash leftover (`bucket=B.retired`, or a
    torn stage) would otherwise be parsed by Spark's partition discovery
    as an extra partition value — duplicate rows and a string-typed bucket
    column."""
    for live in _partition_dirs(os.path.join(output_dir, "triples"), snapshot):
        _recover_partition(live)


def _recover_partition(live: str) -> None:
    """Finish or discard a half-done swap for one partition dir.

    States (old bytes and new bytes encode identical rows, so any rule
    that ends with exactly one live copy is correct):
    - stage without _SUCCESS: torn write -> drop stage; restore retired
      if the live dir is missing.
    - stage with _SUCCESS and live present: crash before the retire
      rename -> drop the stage (re-running compaction will redo it).
    - stage with _SUCCESS and live missing: crash between retire and
      install -> install the stage, drop the retired copy.
    - retired with live present: post-install garbage -> drop retired.
    """
    retired = live + ".retired"
    for stage in sorted(glob.glob(glob.escape(live) + _STAGE_MARK + "*")):
        complete = os.path.isfile(os.path.join(stage, "_SUCCESS"))
        if complete and not os.path.isdir(live):
            os.replace(stage, live)
        else:
            shutil.rmtree(stage, ignore_errors=True)
    if os.path.isdir(retired):
        if os.path.isdir(live):
            shutil.rmtree(retired, ignore_errors=True)
        else:
            os.replace(retired, live)


def _swap(stage: str, live: str) -> None:
    retired = live + ".retired"
    if os.path.isdir(retired):  # garbage from an older, finished swap
        shutil.rmtree(retired)
    os.replace(live, retired)
    os.replace(stage, live)
    shutil.rmtree(retired, ignore_errors=True)


def compact_triples(
    spark: SparkSession,
    output_dir: str,
    snapshot: str | None = None,
    max_files: int = 4,
    target_bytes: int = 128 * 1024 * 1024,
    max_concurrency: int = 4,
) -> dict:
    """Compact every (snap, bucket) triples partition holding more than
    `max_files` data files down to ceil(bytes / target_bytes) files.

    Returns a summary dict: partitions examined / rewritten, file and
    byte counts before/after.  Idempotent: a second invocation finds
    nothing above the threshold and rewrites nothing.
    """
    triples_path = os.path.join(output_dir, "triples")
    recover_compaction(output_dir, snapshot)
    # recovery restores any remnant-only partitions, so re-list and keep
    # only dirs that actually exist now
    parts = [
        d for d in _partition_dirs(triples_path, snapshot) if os.path.isdir(d)
    ]

    run = uuid.uuid4().hex[:12]
    todo: list[tuple[str, list[str], int]] = []
    files_before = files_after = 0
    for live in parts:
        files = _data_files(live)
        files_before += len(files)
        if len(files) <= max_files:
            files_after += len(files)
            continue
        size = sum(os.path.getsize(f) for f in files)
        n_out = max(1, -(-size // target_bytes))
        if n_out >= len(files):  # already at/below the achievable count
            files_after += len(files)
            continue
        todo.append((live, files, n_out))

    def _rewrite(live: str, files: list[str], n_out: int) -> int:
        stage = f"{live}{_STAGE_MARK}{run}"
        # read the explicit FILE list, not the directory: a directory
        # read would also match a concurrent writer's temporaries, and
        # the file list is what was size-planned above.  coalesce = no
        # exchange; parent partitions merge in place.
        (
            spark.read.parquet(*files)
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(stage)
        )
        _swap(stage, live)
        return len(_data_files(live))

    rewritten = 0
    with cf.ThreadPoolExecutor(max_workers=max(1, max_concurrency)) as pool:
        futures = [pool.submit(_rewrite, *t) for t in todo]
        for fut in futures:
            files_after += fut.result()
            rewritten += 1

    return {
        "triples_path": triples_path,
        "snapshot": snapshot,
        "partitions_examined": len(parts),
        "partitions_rewritten": rewritten,
        "files_before": files_before,
        "files_after": files_after,
    }
