"""Persisted IVF-PQ index (operators/ann_index.py): build once, probe
with partition pruning, bit-identical to the in-memory ivfpq_topk lane."""

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.ann_index import (
    build_ann_index,
    probe_ann_index,
)
from node_feedparser_spark.operators.similarity import ivfpq_topk

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "index")
    meta = build_ann_index(emb, path, n_cells=16, n_codes=16, m_sub=8)
    assert len(meta["coarse"]) == 16 and len(meta["cent3"]) == 16
    return path


def test_probe_equals_in_memory_ivfpq(spark, emb, index_path):
    """The index is a LAYOUT change, not a semantics change: probing the
    persisted cells returns exactly what ivfpq_topk computes in one
    pass with the same parameters."""
    q = emb.filter(F.col("vec_id") < 8)
    want = (
        ivfpq_topk(emb, q, k=5, n_cells=16, n_probe=4, n_codes=16, m_sub=8)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    got = (
        probe_ann_index(spark, index_path, q, k=5, n_probe=4)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_probe_plan_prunes_partitions_and_is_jvm(spark, emb, index_path):
    """The scale claim, pinned on the actual plan: `cell IN (...)` lands
    in the scan's PartitionFilters (only probed directories are read)
    and the probe contains no Python node."""
    import contextlib
    import io

    q = emb.filter(F.col("vec_id") < 2)
    df = probe_ann_index(spark, index_path, q, k=3, n_probe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters" in p
    assert "cell" in p.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "MapInPandas" not in p and "BatchEvalPython" not in p


def test_index_stores_codes_not_vectors(spark, index_path):
    """8 B/vector on disk: the index carries codes, never the embedding."""
    idx = spark.read.parquet(index_path)
    assert set(idx.columns) == {"vec_id", "codes", "cell"}
    row = idx.limit(1).collect()[0]
    assert len(row["codes"]) == 8


def test_probe_refuses_empty_query_frame(spark, emb, index_path):
    with pytest.raises(ValueError, match="empty query frame"):
        probe_ann_index(spark, index_path, emb.filter(F.col("vec_id") < 0))
