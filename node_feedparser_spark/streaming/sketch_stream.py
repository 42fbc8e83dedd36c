"""Streaming distinct-count monitoring: continuously-arriving files fold
into a persistent HLL register table via an idempotent foreachBatch MERGE
— the sketch-maintenance twin of graph_merge.py's edge MERGE, for the
"how many distinct entities/users/documents so far" dashboard that would
otherwise need a full COUNT(DISTINCT) rescan per refresh.

    readStream(dir) -> per-batch hll_registers (map-side-combinable max)
                    -> foreachBatch: MERGE into the registers parquet
                       [read prior -> union -> elementwise max -> staging
                        write -> atomic swap]

The merge math is STRONGER than the edge-sum case: register max is
associative, commutative, AND idempotent, so the drained register table
equals the one-shot batch sketch over the union of all drops EXACTLY —
bit-for-bit, no float-boundary caveat — regardless of batch partitioning
(pinned by tests/test_sketch_stream.py), and even a hypothetically
double-applied batch could not corrupt it.  The batch-id guard from
graph_merge (state file INSIDE the staged dir, retire-rename commit
point) is still used, for scan economy and protocol uniformity.

At scale: the register table is group_count * 2^p small integers — the
whole point of maintaining the sketch instead of the distinct set.
Estimates read off the table at any time with
hll_estimate_from_registers; no raw data is ever re-scanned.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import (
    hll_estimate_from_registers,
    hll_merge,
    hll_registers,
)
from .graph_merge import _last_batch, _read_state, _recover, _write_state


def _check_sketch_config(
    sketch_path: str, group_cols: list[str], value_col: str, p: int
) -> dict:
    """The register table's bucket space is defined by (p, group_cols,
    value_col); registers merged across different configs are a valid
    sketch for NEITHER config and produce silently-wrong estimates.  The
    config is therefore pinned in the table's state file at first write
    and every later merge must match it exactly.  A state file written
    before the pin existed carries no config; the first post-upgrade
    merge ADOPTS its own config (nothing to verify against) and pins it
    — callers resuming a legacy table are responsible for passing the
    parameters it was built with, exactly as they already were before
    the guard existed."""
    config = {"p": p, "group_cols": list(group_cols), "value_col": value_col}
    state = _read_state(sketch_path)
    if "p" in state:
        prior = {
            "p": state["p"],
            "group_cols": state.get("group_cols"),
            "value_col": state.get("value_col"),
        }
        if prior != config:
            raise ValueError(
                f"HLL sketch at {sketch_path} was built with {prior}; "
                f"refusing to merge a batch sketched with {config} — "
                "registers from different bucket spaces are not mergeable"
            )
    return config


def merge_batch_into_registers(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    sketch_path: str,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> bool:
    """Idempotent MERGE of one micro-batch's registers into the sketch
    table.  Returns False (no-op) when batch_id was already applied.
    Raises when the table was built with a different (p, group_cols,
    value_col) than this merge's — see _check_sketch_config."""
    _recover(sketch_path)
    config = _check_sketch_config(sketch_path, group_cols, value_col, p)
    if batch_id <= _last_batch(sketch_path):
        return False
    delta = hll_registers(batch, group_cols, value_col, p)
    stage = f"{sketch_path}.stage-b{batch_id}"
    if os.path.isdir(sketch_path):
        merged = hll_merge(
            spark.read.parquet(sketch_path).unionByName(delta), group_cols
        )
        merged.write.mode("overwrite").parquet(stage)
    else:
        delta.write.mode("overwrite").parquet(stage)
    _write_state(stage, batch_id, extra=config)
    retired = sketch_path + ".retired"
    if os.path.isdir(sketch_path):
        os.replace(sketch_path, retired)  # COMMIT: single atomic rename
    os.replace(stage, sketch_path)
    shutil.rmtree(retired, ignore_errors=True)
    return True


def stream_hll_distinct(
    spark: SparkSession,
    input_dir: str,
    schema,
    sketch_path: str,
    checkpoint_dir: str,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    max_files_per_trigger: int | None = None,
):
    """availableNow drain: fold all not-yet-consumed files' values into
    the persistent register sketch.  Each invocation is incremental; the
    checkpoint tracks consumed files, the in-table state file tracks
    applied batches."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: merge_batch_into_registers(
                spark, b, bid, sketch_path, group_cols, value_col, p
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_estimates(
    spark: SparkSession, sketch_path: str, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Current distinct-count estimates off the maintained sketch — a
    register-table-sized read, never a raw-data scan."""
    reg = spark.read.parquet(sketch_path).select(
        *group_cols, "bucket", "register"
    )
    return hll_estimate_from_registers(reg, group_cols, p)
