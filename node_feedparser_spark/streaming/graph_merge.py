"""Streaming incremental graph maintenance: continuously-arriving triple
files fold into the persistent edge aggregate via an idempotent
foreachBatch MERGE.

This closes the loop between the streaming face (stream_extract.py) and
the batch pipeline's graph materialization (plans/pipeline.py
merge_edges): a drop of new triple files becomes

    readStream(triples dir)
      -> per-batch groupBy (src, pred, dst) sum(score)   [micro-batch agg]
      -> foreachBatch: MERGE into the edges parquet       [read prior ->
         union -> re-agg -> staging write -> atomic swap]

Exactly-once despite foreachBatch's at-least-once contract: Structured
Streaming can REPLAY a batch after a crash between the sink write and the
checkpoint commit, so the merge records the last applied batch_id in a
state file that lives INSIDE the edges directory and is written into the
staging dir BEFORE the install — data and state land in the same rename,
so there is no window where the merge landed but the batch looks
unapplied.  The install itself is retire-rename -> install-rename ->
delete-retired (never rmtree of the only live copy): the commit point is
the retire rename, after which the staged dir IS the table and _recover
finishes the install on replay; before it, the stage is uncommitted
garbage and the replay re-merges against the intact live table.  Replays
of an applied batch are no-ops.  This is the same local-FS emulation of
an Iceberg RTAS commit that plans/pipeline.py's _commit_graph uses.

The merge is one map-side-combinable groupBy over prior + delta — the
batch MERGE's plan shape and single-shuffle cost at any scale; the only
driver-side steps are the batch_id check and the rename.

Correctness invariant (pinned by tests/test_stream_graph_merge.py): after
draining any sequence of file drops in any batch partitioning, the edges
table equals the batch one-shot aggregate over the union of all drops —
sum is associative over the disjoint batch slices (exactly the
merge_edges argument; the 6-dp rounding of intermediate weights can
differ from the one-shot rounding only when an unrounded sum sits within
float noise of a 0.5e-6 boundary, which the equality test over the
deterministic corpus pins as not occurring).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import merge_edges

_STATE_NAME = "_stream_state.json"


def _last_batch(edges_path: str) -> int:
    try:
        with open(os.path.join(edges_path, _STATE_NAME)) as f:
            return int(json.load(f)["last_batch_id"])
    except (FileNotFoundError, NotADirectoryError, ValueError, KeyError):
        return -1


def _write_state(
    dir_path: str, batch_id: int, extra: dict | None = None
) -> None:
    state = {"last_batch_id": batch_id}
    if extra:
        state.update(extra)
    with open(os.path.join(dir_path, _STATE_NAME), "w") as f:
        json.dump(state, f)


def _read_state(table_path: str) -> dict:
    try:
        with open(os.path.join(table_path, _STATE_NAME)) as f:
            return json.load(f)
    except (FileNotFoundError, NotADirectoryError, ValueError):
        return {}


def _recover(edges_path: str) -> None:
    """Finish or discard a half-done install before touching the table.

    Commit point of a merge is the instant the OLD live dir is retired
    (renamed to .retired) — from then on the staged dir, which already
    carries its state file, IS the table.  A crash between the retire
    rename and the install rename therefore leaves edges_path missing and
    a complete stage present: finish the install here.  A stage present
    WHILE edges_path still exists was never committed (crash before the
    retire rename) and is deleted; the replay rebuilds it from the intact
    live table.  Leftover .retired dirs are post-commit garbage.
    """
    import glob
    import shutil

    stages = []
    for s in glob.glob(glob.escape(edges_path) + ".stage-b*"):
        try:
            stages.append((int(s.rsplit(".stage-b", 1)[1]), s))
        except ValueError:
            continue
    complete = [
        (bid, s)
        for bid, s in sorted(stages)
        if os.path.isfile(os.path.join(s, _STATE_NAME))
    ]
    if not os.path.isdir(edges_path) and complete:
        os.replace(complete[-1][1], edges_path)
    for _bid, s in stages:
        if os.path.isdir(s):
            shutil.rmtree(s, ignore_errors=True)
    shutil.rmtree(edges_path + ".retired", ignore_errors=True)


def merge_batch_into_edges(
    spark: SparkSession, batch: DataFrame, batch_id: int, edges_path: str
) -> bool:
    """Idempotent MERGE of one micro-batch of triples into the edge table.
    Returns False (no-op) when batch_id was already applied — the crash-
    replay guard.  The batch may be any slice of triples; prior weights
    sum with the delta exactly (disjoint slices)."""
    import shutil

    _recover(edges_path)
    if batch_id <= _last_batch(edges_path):
        return False
    delta = (
        batch.groupBy("src_id", "pred", "dst_id")
        .agg(F.round(F.sum("score"), 6).alias("weight"))
    )
    stage = f"{edges_path}.stage-b{batch_id}"
    if os.path.isdir(edges_path):
        merged = merge_edges(spark.read.parquet(edges_path), delta)
        merged.write.mode("overwrite").parquet(stage)
    else:
        delta.write.mode("overwrite").parquet(stage)
    # state INSIDE the staged dir: once the live dir is retired below, the
    # stage (data + applied batch id together) is the committed table, so a
    # crash-replay can never double-merge OR lose the merged aggregate
    _write_state(stage, batch_id)
    retired = edges_path + ".retired"
    if os.path.isdir(edges_path):
        os.replace(edges_path, retired)  # COMMIT: single atomic rename
    os.replace(stage, edges_path)
    shutil.rmtree(retired, ignore_errors=True)
    return True


def stream_edge_merge(
    spark: SparkSession,
    triples_dir: str,
    edges_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """availableNow drain: fold all not-yet-committed triple files into the
    edge aggregate.  Each invocation is the streaming twin of a build_kg
    resume — the checkpoint tracks consumed files, the in-table state file
    tracks applied batches, and either crash point replays as a no-op."""
    from ..schemas import TRIPLES as TRIPLE_SCHEMA

    reader = spark.readStream.schema(TRIPLE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(triples_dir).select(
        F.col("subj_id").alias("src_id"), "pred",
        F.col("obj_id").alias("dst_id"), "score",
    )
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: merge_batch_into_edges(spark, b, bid, edges_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
