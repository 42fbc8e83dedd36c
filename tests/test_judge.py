"""Batched LLM-judge plumbing (operators/judge.py): fake determinism,
pluggable clients, batching shape, and A6 error containment."""

import pytest

from node_feedparser_spark.operators.judge import fake_judge, judge_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect(df):
    return {
        (r["doc_id"], r["criterion"]): (r["score"], r["error"])
        for r in df.collect()
    }


def test_fake_judge_is_deterministic_and_criterion_sensitive():
    a = fake_judge(["hello", "world"], "helpfulness")
    b = fake_judge(["hello", "world"], "helpfulness")
    c = fake_judge(["hello", "world"], "safety")
    assert a == b
    assert a != c
    assert all(0.0 <= s < 1.0 for s in a + c)


def test_scores_one_row_per_doc_criterion(spark):
    got = _collect(
        judge_scores(
            _docs(spark, [(1, "x"), (2, "y")]),
            criteria=("h", "s"),
        )
    )
    assert set(got) == {(1, "h"), (1, "s"), (2, "h"), (2, "s")}
    assert got[(1, "h")] == (fake_judge(["x"], "h")[0], None)
    assert got[(2, "s")] == (fake_judge(["y"], "s")[0], None)


def test_null_text_becomes_error_row(spark):
    got = _collect(judge_scores(_docs(spark, [(1, None), (2, "ok")])))
    assert got[(1, "helpfulness")] == (None, "null text")
    assert got[(2, "helpfulness")][1] is None


def test_failing_client_contained_not_raised(spark):
    def boom(texts, criterion):
        raise RuntimeError("endpoint down")

    got = _collect(
        judge_scores(_docs(spark, [(1, "x"), (2, "y")]), judge_fn=boom)
    )
    assert got[(1, "helpfulness")][0] is None
    assert "endpoint down" in got[(1, "helpfulness")][1]
    assert "endpoint down" in got[(2, "helpfulness")][1]


def test_wrong_length_client_contained(spark):
    def short(texts, criterion):
        return [0.5]  # always one score, regardless of batch size

    got = _collect(
        judge_scores(
            _docs(spark, [(1, "x"), (2, "y")]).coalesce(1), judge_fn=short
        )
    )
    # a 2-text batch gets 1 score -> contained as an error for the batch
    errs = [v[1] for v in got.values()]
    assert any(e and "scores" in e for e in errs)


def test_real_client_scores_pass_through_rounded(spark):
    def client(texts, criterion):
        return [0.123456789 for _ in texts]

    got = _collect(judge_scores(_docs(spark, [(1, "x")]), judge_fn=client))
    assert got[(1, "helpfulness")] == (0.123457, None)


def test_client_called_batched_not_per_row(spark):
    # single partition -> one Arrow batch -> exactly one call per criterion
    calls = spark.sparkContext.accumulator(0)

    def counting(texts, criterion):
        calls.add(1)
        return fake_judge(texts, criterion)

    df = _docs(spark, [(i, f"t{i}") for i in range(100)]).coalesce(1)
    judge_scores(df, criteria=("a", "b"), judge_fn=counting).count()
    assert calls.value == 2


def test_empty_criteria_rejected(spark):
    with pytest.raises(ValueError):
        judge_scores(_docs(spark, [(1, "x")]), criteria=())
