"""duplicate_spans: exact cross-document duplicate-substring ranges — the
token-granular Lee-et-al. dedup operation.  Hand corpora make every span
boundary checkable by eye."""

from node_feedparser_spark.operators.dedupe import duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return {
        (r.doc_id, r.start_tok, r.end_tok, r.span_tokens) for r in df.collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_run_yields_exact_span_in_both_docs(spark):
    shared = _words("s", 6)  # a 6-token run = two overlapping 5-grams
    docs = _docs(
        spark,
        [
            (1, f"{_words('a', 3)} {shared} {_words('b', 2)}"),
            (2, f"{shared} {_words('c', 4)}"),
        ],
    )
    got = _spans(duplicate_spans(docs, k=5, min_docs=2))
    # doc 1: tokens 4..9; doc 2: tokens 1..6
    assert got == {(1, 4, 9, 6), (2, 1, 6, 6)}


def test_two_disjoint_shared_runs_stay_two_spans(spark):
    r1, r2 = _words("x", 5), _words("y", 5)
    docs = _docs(
        spark,
        [
            (1, f"{r1} {_words('m', 3)} {r2}"),
            (2, f"{r1} {_words('n', 7)} {r2}"),
        ],
    )
    got = _spans(duplicate_spans(docs, k=5, min_docs=2))
    assert got == {
        (1, 1, 5, 5), (1, 9, 13, 5),
        (2, 1, 5, 5), (2, 13, 17, 5),
    }


def test_adjacent_hits_merge_gap_of_one_does_not(spark):
    """Hits at pos p and p+k cover [p, p+2k-1] contiguously -> one span;
    a one-token gap between covered ranges keeps two spans."""
    r = _words("z", 10)  # grams at pos 1..6 all duplicated -> one span 1..10
    docs = _docs(spark, [(1, r), (2, r)])
    got = _spans(duplicate_spans(docs, k=5, min_docs=2))
    assert got == {(1, 1, 10, 10), (2, 1, 10, 10)}

    a, b = _words("p", 5), _words("q", 5)
    # doc 3/4 share a and b separated by one unshared token u0:
    # covered [1,5] and [7,11] -> gap at token 6 -> two spans
    docs2 = _docs(spark, [(3, f"{a} u0 {b}"), (4, f"{a} v0 {b}")])
    got2 = _spans(duplicate_spans(docs2, k=5, min_docs=2))
    assert got2 == {
        (3, 1, 5, 5), (3, 7, 11, 5),
        (4, 1, 5, 5), (4, 7, 11, 5),
    }


def test_within_doc_repetition_alone_does_not_qualify(spark):
    rep = _words("w", 5)
    docs = _docs(
        spark,
        [(1, f"{rep} {rep}"), (2, _words("other", 8))],
    )
    assert _spans(duplicate_spans(docs, k=5, min_docs=2)) == set()


def test_min_docs_threshold(spark):
    r = _words("t", 5)
    docs = _docs(
        spark,
        [(1, r), (2, r), (3, r), (4, _words("u", 6))],
    )
    assert _spans(duplicate_spans(docs, k=5, min_docs=4)) == set()
    got = _spans(duplicate_spans(docs, k=5, min_docs=3))
    assert got == {(1, 1, 5, 5), (2, 1, 5, 5), (3, 1, 5, 5)}


def test_short_docs_are_ignored(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
    assert _spans(duplicate_spans(docs, k=5, min_docs=2)) == set()
