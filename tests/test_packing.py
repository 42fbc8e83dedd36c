"""Sequence packing (operators/packing.py): distributed two-phase prefix
sum == sequential definition, packing invariants, fill stats."""

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.packing import (
    sequence_fill_stats,
    sequence_pack,
    sequence_pack_naive,
)

CAP = 32


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, text) — lengths chosen to hit: exact-capacity fit,
        # multi-sequence span, 1-token doc, empty text, boundary straddle
        (1, " ".join(f"t{i}" for i in range(10))),
        (3, " ".join(f"u{i}" for i in range(22))),     # ends seq 0 exactly
        (7, " ".join(f"v{i}" for i in range(80))),     # spans 3+ sequences
        (8, "solo"),
        (12, ""),                                      # 1 token ('' split)
        (20, " ".join(f"w{i}" for i in range(31))),
        (21, " ".join(f"x{i}" for i in range(5))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_naive_single_window(docs):
    got = sequence_pack(docs, CAP, n_buckets=4).orderBy("doc_id").collect()
    want = sequence_pack_naive(docs, CAP).orderBy("doc_id").collect()
    assert got == want


def test_bucket_count_invariance(docs):
    a = sequence_pack(docs, CAP, n_buckets=1).orderBy("doc_id").collect()
    b = sequence_pack(docs, CAP, n_buckets=3).orderBy("doc_id").collect()
    c = sequence_pack(docs, CAP, n_buckets=1000).orderBy("doc_id").collect()
    assert a == b == c


def test_packing_invariants(docs):
    rows = sequence_pack(docs, CAP, n_buckets=4).orderBy("doc_id").collect()
    # contiguity: each doc starts where the previous one ended
    pos = 0
    for r in rows:
        assert r.global_start == pos
        pos += r.n_tokens
        assert 0 <= r.offset_in_seq < CAP
        assert r.seq_id == r.global_start // CAP
        end = r.global_start + r.n_tokens - 1
        assert r.n_seqs_spanned == end // CAP - r.seq_id + 1
    # total stream length = sum of token counts
    assert pos == sum(r.n_tokens for r in rows)


def test_known_values(docs):
    by_id = {
        r.doc_id: r
        for r in sequence_pack(docs, CAP, n_buckets=4).collect()
    }
    # doc 1: 10 tokens at offset 0
    assert (by_id[1].seq_id, by_id[1].offset_in_seq, by_id[1].n_seqs_spanned) == (0, 0, 1)
    # doc 3: starts at 10, 22 tokens -> fills seq 0 exactly to 31
    assert (by_id[3].seq_id, by_id[3].offset_in_seq, by_id[3].n_seqs_spanned) == (0, 10, 1)
    # doc 7: starts at 32 == seq 1 offset 0, 80 tokens -> spans seqs 1..3
    assert (by_id[7].seq_id, by_id[7].offset_in_seq, by_id[7].n_seqs_spanned) == (1, 0, 3)
    # doc 12 (empty text): exactly 1 token
    assert by_id[12].n_tokens == 1


def test_fill_stats(docs):
    packed = sequence_pack(docs, CAP, n_buckets=4)
    stats = {r.seq_id: r for r in sequence_fill_stats(packed, CAP).collect()}
    total = sum(r.n_tokens for r in packed.collect())
    # every sequence except the last is exactly full
    last = max(stats)
    for sid, r in stats.items():
        if sid != last:
            assert r.n_tokens_filled == CAP, (sid, r)
    assert stats[last].n_tokens_filled == total - CAP * last
    # doc 7 covers seqs 1..3 -> each of those has >=1 covering doc
    assert all(stats[s].n_docs_covering >= 1 for s in (1, 2, 3))
    # seq 0 has docs 1 and 3 starting in it
    assert stats[0].n_docs_starting == 2
    # conservation: filled tokens across sequences == token stream length
    assert sum(r.n_tokens_filled for r in stats.values()) == total


def test_scale_path_partitions_by_bucket(docs):
    plan = sequence_pack(docs, CAP, n_buckets=4)._jdf.queryExecution().toString()
    assert "_pk_bucket" in plan  # in-bucket window is partitioned


def test_validation(docs):
    with pytest.raises(ValueError):
        sequence_pack(docs, 0)
    with pytest.raises(ValueError):
        sequence_pack(docs, CAP, n_buckets=0)


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert sequence_pack(empty, CAP).count() == 0
