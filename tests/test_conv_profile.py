"""Per-conversation structural profile (operators/profile.py
conversation_profile) over the north-rule transcript shape."""

from datetime import datetime

from node_feedparser_spark.operators.profile import conversation_profile


def _profile(spark, rows):
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    return {r["conv_id"]: r for r in conversation_profile(df).collect()}


def _ts(minute):
    return datetime(2025, 1, 6, 9, minute, 0)


def test_hand_computed_profile(spark):
    rows = [
        ("c1", 0, "user", "hello", None, _ts(0)),
        ("c1", 1, "assistant", "hi!", None, _ts(1)),
        ("c1", 2, "tool", "{}", "search", _ts(2)),
        ("c1", 3, "assistant", "done", None, _ts(5)),
    ]
    r = _profile(spark, rows)["c1"]
    assert r["n_turns"] == 4
    assert (r["n_user"], r["n_assistant"], r["n_tool_role"]) == (1, 2, 1)
    assert r["n_tool_calls"] == 1
    assert r["total_chars"] == 5 + 3 + 2 + 4
    # user->assistant->tool->assistant: every adjacent pair switches
    assert r["role_switches"] == 3
    assert r["span_seconds"] == 300


def test_no_switches_and_null_text(spark):
    rows = [
        ("c1", 0, "assistant", None, None, _ts(0)),
        ("c1", 1, "assistant", "x", None, _ts(0)),
    ]
    r = _profile(spark, rows)["c1"]
    assert r["role_switches"] == 0
    assert r["total_chars"] == 1  # NULL text counts 0
    assert r["span_seconds"] == 0


def test_switches_follow_turn_idx_order_not_input_order(spark):
    # rows arrive shuffled; alternation must be computed in turn order
    rows = [
        ("c1", 2, "user", "c", None, _ts(2)),
        ("c1", 0, "user", "a", None, _ts(0)),
        ("c1", 1, "assistant", "b", None, _ts(1)),
    ]
    r = _profile(spark, rows)["c1"]
    # user -> assistant -> user in turn order: 2 switches
    assert r["role_switches"] == 2


def test_conversations_are_independent(spark):
    rows = [
        ("c1", 0, "user", "a", None, _ts(0)),
        ("c2", 0, "assistant", "bb", "bash", _ts(10)),
    ]
    got = _profile(spark, rows)
    assert got["c1"]["n_turns"] == 1 and got["c2"]["n_turns"] == 1
    # the first turn of each conversation never counts as a switch
    assert got["c1"]["role_switches"] == 0
    assert got["c2"]["role_switches"] == 0
    assert got["c2"]["n_tool_calls"] == 1
