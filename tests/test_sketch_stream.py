"""Streaming HLL sketch maintenance (streaming/sketch_stream.py): drained
file drops MERGE into the persistent register table; the maintained
registers equal the batch one-shot sketch over the union of all drops
BIT-FOR-BIT (max is associative + commutative + idempotent — no float
caveat), resume drains only new files, and replays of an applied batch
are no-ops."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from node_feedparser_spark.operators.sketch import (
    hll_distinct,
    hll_registers,
)
from node_feedparser_spark.streaming.sketch_stream import (
    merge_batch_into_registers,
    read_estimates,
    stream_hll_distinct,
)

SCHEMA = StructType(
    [
        StructField("grp", StringType()),
        StructField("val", LongType()),
    ]
)

DROP1 = [("a", v) for v in range(0, 300)] + [("b", v) for v in range(0, 50)]
DROP2 = [("a", v) for v in range(200, 500)] + [("b", v) for v in range(25, 75)]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _registers_map(spark, path):
    return {
        (r["grp"], r["bucket"]): r["register"]
        for r in spark.read.parquet(path).collect()
    }


def test_drained_registers_equal_batch_sketch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    sketch = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    _df(spark, DROP1).write.mode("append").parquet(in_dir)
    q = stream_hll_distinct(spark, in_dir, SCHEMA, sketch, ckpt, ["grp"], "val")
    q.awaitTermination()
    want1 = {
        (r["grp"], r["bucket"]): r["register"]
        for r in hll_registers(_df(spark, DROP1), ["grp"], "val").collect()
    }
    assert _registers_map(spark, sketch) == want1

    _df(spark, DROP2).write.mode("append").parquet(in_dir)
    q = stream_hll_distinct(spark, in_dir, SCHEMA, sketch, ckpt, ["grp"], "val")
    q.awaitTermination()
    # bit-for-bit equal to the one-shot sketch over the union — max is
    # idempotent, so overlapping drops (200-299 for grp a) change nothing
    want2 = {
        (r["grp"], r["bucket"]): r["register"]
        for r in hll_registers(
            _df(spark, DROP1 + DROP2), ["grp"], "val"
        ).collect()
    }
    assert _registers_map(spark, sketch) == want2

    # estimates off the maintained sketch == batch hll_distinct estimates
    got_est = {
        r["grp"]: r["hll_estimate"]
        for r in read_estimates(spark, sketch, ["grp"]).collect()
    }
    want_est = {
        r["grp"]: r["hll_estimate"]
        for r in hll_distinct(_df(spark, DROP1 + DROP2), ["grp"], "val").collect()
    }
    assert got_est == want_est
    # sanity: estimates in the ~6.5% HLL band of the true distinct counts
    assert got_est["a"] == pytest.approx(500, rel=0.2)
    assert got_est["b"] == pytest.approx(75, rel=0.2)

    # drain with nothing new: unchanged
    q = stream_hll_distinct(spark, in_dir, SCHEMA, sketch, ckpt, ["grp"], "val")
    q.awaitTermination()
    assert _registers_map(spark, sketch) == want2


def test_batch_replay_is_noop(spark, tmp_path):
    sketch = str(tmp_path / "sketch")
    b0 = _df(spark, DROP1)
    assert merge_batch_into_registers(spark, b0, 0, sketch, ["grp"], "val")
    before = _registers_map(spark, sketch)
    # crash-replay of the same batch id: refused, table unchanged
    assert not merge_batch_into_registers(spark, b0, 0, sketch, ["grp"], "val")
    assert _registers_map(spark, sketch) == before
    # next batch applies
    assert merge_batch_into_registers(
        spark, _df(spark, DROP2), 1, sketch, ["grp"], "val"
    )
    assert len(_registers_map(spark, sketch)) >= len(before)


def test_sketch_config_pinned_in_state(spark, tmp_path):
    """The register table's bucket space is defined by (p, group_cols,
    value_col); a later merge with a different config would silently
    union incompatible register spaces, so the config is pinned at first
    write and mismatching merges raise."""
    sketch = str(tmp_path / "sketch")
    assert merge_batch_into_registers(
        spark, _df(spark, DROP1), 0, sketch, ["grp"], "val", p=8
    )
    with pytest.raises(ValueError, match="not mergeable"):
        merge_batch_into_registers(
            spark, _df(spark, DROP2), 1, sketch, ["grp"], "val", p=9
        )
    with pytest.raises(ValueError, match="not mergeable"):
        merge_batch_into_registers(
            spark, _df(spark, DROP2), 1, sketch, ["val"], "grp", p=8
        )
    # matching config still merges, and replay idempotence still holds
    assert merge_batch_into_registers(
        spark, _df(spark, DROP2), 1, sketch, ["grp"], "val", p=8
    )
    assert not merge_batch_into_registers(
        spark, _df(spark, DROP2), 1, sketch, ["grp"], "val", p=8
    )
