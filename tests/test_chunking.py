"""Sliding-window chunking (packing.chunk_documents): hand semantics,
coverage/overlap/reconstruction invariants, edge docs."""

import pytest

from node_feedparser_spark.operators.packing import chunk_documents

C, O = 8, 3  # chunk_tokens, overlap -> stride 5


def _toks(n, p="t"):
    return " ".join(f"{p}{i}" for i in range(n))


DOCS = [
    (1, _toks(8)),    # exact single window
    (2, _toks(7)),    # shorter than a window
    (3, _toks(9)),    # one token past -> 2 chunks
    (4, _toks(23)),   # several chunks, short tail
    (5, ""),          # 1 token ('' split)
    (6, "solo"),
]


@pytest.fixture(scope="module")
def chunks(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=C, overlap=O).collect()
    out = {}
    for r in rows:
        out.setdefault(r.doc_id, []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r.chunk_id)
    return out


def test_chunk_counts(chunks):
    # n_chunks = ceil(max(n - overlap, 0) / stride) clamped to >= 1
    want = {1: 1, 2: 1, 3: 2, 4: 4, 5: 1, 6: 1}
    assert {d: len(v) for d, v in chunks.items()} == want


def test_hand_chunk_text(chunks):
    assert chunks[1][0].chunk_text == _toks(8)
    assert chunks[3][0].chunk_text == " ".join(f"t{i}" for i in range(8))
    assert chunks[3][1].chunk_text == " ".join(f"t{i}" for i in range(5, 9))
    assert chunks[5][0].chunk_text == ""
    assert chunks[6][0].chunk_text == "solo"


def test_coverage_and_overlap(chunks):
    for doc_id, text in DOCS:
        toks = text.split(" ")
        got = chunks[doc_id]
        # every chunk is the exact slice it claims
        for r in got:
            s = r.start_token - 1
            assert r.chunk_text.split(" ") == toks[s : s + C]
            assert r.n_chunk_tokens == len(toks[s : s + C])
        # consecutive full chunks share exactly `overlap` tokens
        for a, b in zip(got, got[1:]):
            assert b.start_token - a.start_token == C - O
        # coverage: last chunk reaches the final token
        last = got[-1]
        assert last.start_token - 1 + last.n_chunk_tokens == len(toks)


def test_reconstruction(chunks):
    # dropping each non-first chunk's first `overlap` tokens rebuilds the doc
    for doc_id, text in DOCS:
        got = chunks[doc_id]
        parts = [got[0].chunk_text.split(" ")] + [
            r.chunk_text.split(" ")[O:] for r in got[1:]
        ]
        assert [t for p in parts for t in p] == text.split(" ")


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=-1)
