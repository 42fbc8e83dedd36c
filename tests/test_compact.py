"""Triples-table compaction: row-identical rewrite, idempotence, crash
recovery of the per-partition swap, snapshot scoping, audit-clean output.

Reference parallel: feedparser re-emits a normalized compact stream of
already-parsed items (bin/feedparser.js); here the 'stream' is the table
layout — compaction rewrites bytes, never rows (plans/compact.py)."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.plans.compact import (
    _data_files,
    _recover_partition,
    compact_triples,
)
from node_feedparser_spark.plans.pipeline import build_kg
from node_feedparser_spark.plans.validate import validate_kg


def _triple_set(spark, out):
    rows = (
        spark.read.parquet(os.path.join(out, "triples"))
        .select("conv_id", "turn_idx", "subj", "pred", "obj", "score",
                "subj_id", "obj_id", "lineage.partition_hash", "snap", "bucket")
        .collect()
    )
    return {tuple(r) for r in rows}


@pytest.fixture()
def kg_many_files(spark, corpus_path, tmp_path):
    """A built KG whose triples partitions hold several small files each
    (high sub-split via many buckets is not enough on 4 local cores, so
    force it by building with default sub on a small corpus)."""
    out = str(tmp_path / "kg")
    build_kg(spark, corpus_path, out, n_buckets=4)
    return out


def _first_partition(out):
    return sorted(
        d
        for d in glob.glob(os.path.join(out, "triples", "snap=*", "bucket=*"))
        if os.path.isdir(d)
    )[0]


def test_compaction_is_row_identical_and_idempotent(spark, kg_many_files):
    out = kg_many_files
    before = _triple_set(spark, out)
    n_files_before = len(
        glob.glob(os.path.join(out, "triples", "snap=*", "bucket=*", "*.parquet"))
    )
    summary = compact_triples(spark, out, max_files=1)
    assert summary["partitions_rewritten"] > 0
    assert summary["files_after"] < summary["files_before"] == n_files_before
    # every partition now holds exactly one file (tiny corpus, one target)
    for d in glob.glob(os.path.join(out, "triples", "snap=*", "bucket=*")):
        assert len(_data_files(d)) == 1
    assert _triple_set(spark, out) == before  # bytes moved, rows did not

    # audit-clean: lineage/metrics/graph_state all still reconcile
    report = validate_kg(spark, out)
    assert report["ok"] and report["n_fail"] == 0

    # idempotent: nothing left above the threshold
    again = compact_triples(spark, out, max_files=1)
    assert again["partitions_rewritten"] == 0
    assert again["files_after"] == again["files_before"]


def test_compaction_respects_max_files_threshold(spark, kg_many_files):
    out = kg_many_files
    counts = {
        d: len(_data_files(d))
        for d in glob.glob(os.path.join(out, "triples", "snap=*", "bucket=*"))
    }
    threshold = max(counts.values())  # nothing exceeds it
    summary = compact_triples(spark, out, max_files=threshold)
    assert summary["partitions_rewritten"] == 0
    assert {
        d: len(_data_files(d))
        for d in glob.glob(os.path.join(out, "triples", "snap=*", "bucket=*"))
    } == counts


def test_recover_torn_stage_is_dropped(spark, kg_many_files):
    out = kg_many_files
    before = _triple_set(spark, out)
    live = _first_partition(out)
    stage = live + ".compact-stage-deadbeef"
    os.makedirs(stage)  # no _SUCCESS: torn write
    with open(os.path.join(stage, "part-woops.parquet"), "wb") as f:
        f.write(b"not parquet")
    compact_triples(spark, out, max_files=10_000)  # recovery only
    assert not os.path.isdir(stage)
    assert _triple_set(spark, out) == before


def test_recover_complete_stage_with_live_missing_installs(spark, kg_many_files):
    """Crash between the retire and install renames leaves ONLY remnant
    dirs (live missing) — recovery must still reach that partition when
    invoked through compact_triples, which derives the live path from the
    remnant names."""
    out = kg_many_files
    before = _triple_set(spark, out)
    live = _first_partition(out)
    stage = live + ".compact-stage-cafef00d"
    shutil.copytree(live, stage)
    open(os.path.join(stage, "_SUCCESS"), "w").close()
    os.replace(live, live + ".retired")
    compact_triples(spark, out, max_files=10_000)  # recovery only
    assert os.path.isdir(live)
    assert not os.path.isdir(stage)
    assert not os.path.isdir(live + ".retired")
    assert _triple_set(spark, out) == before


def test_build_kg_recovers_compaction_leftovers(spark, corpus_path, kg_many_files):
    """A crash after the install rename but before the retired delete
    leaves bucket=B.retired next to the live dir; Spark partition
    discovery would read it as an extra partition value.  build_kg runs
    compaction recovery before any raw triples read, so a resume neither
    double-reads nor degrades the bucket column."""
    out = kg_many_files
    before = _triple_set(spark, out)
    live = _first_partition(out)
    shutil.copytree(live, live + ".retired")
    summary = build_kg(spark, corpus_path, out, n_buckets=4)
    assert summary["skipped_buckets"] == [0, 1, 2, 3]  # clean resume
    assert not os.path.isdir(live + ".retired")
    assert _triple_set(spark, out) == before
    report = validate_kg(spark, out)
    assert report["ok"] and report["n_fail"] == 0


def test_recover_complete_stage_with_live_present_discards(spark, kg_many_files):
    out = kg_many_files
    before = _triple_set(spark, out)
    live = _first_partition(out)
    stage = live + ".compact-stage-0badf00d"
    shutil.copytree(live, stage)
    open(os.path.join(stage, "_SUCCESS"), "w").close()
    _recover_partition(live)
    assert not os.path.isdir(stage)
    assert _triple_set(spark, out) == before


def test_snapshot_scope_leaves_other_snapshots_untouched(
    spark, corpus_pdf, tmp_path
):
    """Split ingest -> two snapshots; compacting one must not rewrite the
    other (file mtimes and counts unchanged)."""
    out = str(tmp_path / "kg_split")
    convs = sorted(corpus_pdf["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    for i, part in enumerate(
        (corpus_pdf[corpus_pdf["conv_id"].isin(half)],
         corpus_pdf[~corpus_pdf["conv_id"].isin(half)])
    ):
        p = str(tmp_path / f"in_{i}.parquet")
        part = part.copy()
        part["ts"] = part["ts"].astype("datetime64[us]")  # Spark rejects ns
        part.to_parquet(p, index=False)
        build_kg(spark, p, out, n_buckets=4)
    snaps = sorted(
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(os.path.join(out, "triples", "snap=*"))
    )
    assert len(snaps) == 2
    target, other = snaps
    other_state = {
        f: os.path.getmtime(f)
        for f in glob.glob(
            os.path.join(out, "triples", f"snap={other}", "bucket=*", "*")
        )
    }
    before = _triple_set(spark, out)
    summary = compact_triples(spark, out, snapshot=target, max_files=1)
    assert summary["partitions_rewritten"] > 0
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(
            os.path.join(out, "triples", f"snap={other}", "bucket=*", "*")
        )
    } == other_state
    assert _triple_set(spark, out) == before
    report = validate_kg(spark, out)
    assert report["ok"] and report["n_fail"] == 0
