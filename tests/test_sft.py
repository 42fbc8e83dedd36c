"""SFT pair extraction (operators/sft.py) — context rendering, windowing
and the drop rules, against explicit expected strings."""

import pytest

from node_feedparser_spark.operators.sft import sft_pairs


def _rows(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = sft_pairs(df, **kw).collect()
    return {(r["conv_id"], r["turn_idx"]): r for r in out}


def test_prompt_renders_previous_turns_in_order(spark):
    got = _rows(
        spark,
        [
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello"),
            ("c1", 2, "user", "do x"),
            ("c1", 3, "assistant", "done"),
        ],
        context_turns=4,
    )
    assert got[("c1", 1)]["prompt"] == "user: hi"
    assert got[("c1", 1)]["n_context_turns"] == 1
    assert (
        got[("c1", 3)]["prompt"]
        == "user: hi\nassistant: hello\nuser: do x"
    )
    assert got[("c1", 3)]["response"] == "done"
    assert got[("c1", 3)]["n_context_turns"] == 3


def test_context_window_is_bounded(spark):
    rows = [("c1", i, "user", f"t{i}") for i in range(5)] + [
        ("c1", 5, "assistant", "resp")
    ]
    got = _rows(spark, rows, context_turns=2)
    assert got[("c1", 5)]["prompt"] == "user: t3\nuser: t4"
    assert got[("c1", 5)]["n_context_turns"] == 2


def test_opening_assistant_turn_dropped(spark):
    got = _rows(
        spark,
        [("c1", 0, "assistant", "unprompted"), ("c1", 1, "user", "hi")],
    )
    assert got == {}


def test_empty_response_dropped_and_null_context_renders_bare(spark):
    got = _rows(
        spark,
        [
            ("c1", 0, "tool", None),
            ("c1", 1, "assistant", ""),
            ("c1", 2, "assistant", "ok"),
        ],
    )
    assert ("c1", 1) not in got  # empty response
    # NULL tool text renders as 'tool: ' and the empty assistant response
    # renders as 'assistant: ' inside the next row's context
    assert got[("c1", 2)]["prompt"] == "tool: \nassistant: "


def test_window_follows_turn_idx_not_input_order(spark):
    got = _rows(
        spark,
        [
            ("c1", 2, "assistant", "late"),
            ("c1", 0, "user", "first"),
            ("c1", 1, "user", "second"),
        ],
        context_turns=4,
    )
    assert got[("c1", 2)]["prompt"] == "user: first\nuser: second"


def test_conversations_isolated(spark):
    got = _rows(
        spark,
        [
            ("c1", 0, "user", "a"),
            ("c2", 0, "user", "b"),
            ("c2", 1, "assistant", "r"),
        ],
    )
    assert got[("c2", 1)]["prompt"] == "user: b"  # never sees c1


def test_context_turns_validated(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    with pytest.raises(ValueError):
        sft_pairs(df, context_turns=0)
