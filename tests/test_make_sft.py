"""SFT export stage (plans/sft_export.py) against the real synthetic
corpus: pair semantics replayed in pure pandas, packing invariants, and
deterministic reruns."""

import pandas as pd
import pytest

from node_feedparser_spark.plans.sft_export import build_sft


@pytest.fixture(scope="module")
def sft_out(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sft"))
    summary = build_sft(
        spark, corpus_path, out, context_turns=3, capacity=256, min_turns=2
    )
    pairs = spark.read.parquet(f"{out}/pairs").toPandas()
    return summary, pairs, out


def _pandas_pairs(corpus: pd.DataFrame, context_turns: int) -> pd.DataFrame:
    """Independent pure-pandas replay of first-wins dedupe +
    profile-filter + sft_pairs."""
    corpus = corpus.sort_values(
        ["conv_id", "turn_idx", "ts", "text"],
        na_position="first",
        kind="mergesort",
    ).drop_duplicates(["conv_id", "turn_idx"], keep="first")
    keep = corpus.groupby("conv_id").size()
    keep = set(keep[keep >= 2].index)
    rows = []
    for conv, g in corpus[corpus.conv_id.isin(keep)].groupby("conv_id"):
        g = g.sort_values("turn_idx")
        lines = [
            f"{r.role}: {r.text if pd.notna(r.text) else ''}"
            for r in g.itertuples()
        ]
        for i, r in enumerate(g.itertuples()):
            if r.role != "assistant" or not (r.text or ""):
                continue
            lo = max(0, i - context_turns)
            if lo == i:
                continue
            rows.append(
                (conv, r.turn_idx, "\n".join(lines[lo:i]), r.text, i - lo)
            )
    return pd.DataFrame(
        rows,
        columns=[
            "conv_id", "turn_idx", "prompt", "response", "n_context_turns"
        ],
    )


def test_pairs_match_pandas_replay(spark, corpus_path, sft_out, corpus_pdf):
    _, pairs, _ = sft_out
    want = _pandas_pairs(corpus_pdf, context_turns=3)
    got = pairs[
        ["conv_id", "turn_idx", "prompt", "response", "n_context_turns"]
    ]
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_like=True
    )


def test_packing_invariants(sft_out):
    summary, pairs, _ = sft_out
    cap = summary["capacity"]
    # n_tokens is the whitespace token count of "prompt response"
    toks = (
        (pairs["prompt"] + " " + pairs["response"]).str.split(" ").str.len()
    )
    assert (pairs["n_tokens"] == toks).all()
    # offsets sit inside a sequence; spans cover the token run exactly
    assert ((pairs["offset_in_seq"] >= 0) & (pairs["offset_in_seq"] < cap)).all()
    end_seq = (pairs["global_start"] + pairs["n_tokens"] - 1) // cap
    assert (
        pairs["n_seqs_spanned"] == end_seq - pairs["seq_id"] + 1
    ).all()
    # the packing map is a permutation stream: starts are the exclusive
    # prefix sum of token counts in pair_id order
    p = pairs.sort_values("pair_id", ignore_index=True)
    assert (
        p["global_start"] == p["n_tokens"].cumsum().shift(fill_value=0)
    ).all()
    assert summary["total_tokens"] == int(pairs["n_tokens"].sum())
    assert summary["n_sequences"] == (summary["total_tokens"] + cap - 1) // cap


def test_summary_counts_match_table(sft_out):
    summary, pairs, _ = sft_out
    assert summary["n_pairs"] == len(pairs)
    assert summary["n_conversations"] == pairs["conv_id"].nunique()
    assert summary["n_pairs"] > 0


def test_rerun_is_deterministic(spark, corpus_path, sft_out, tmp_path):
    summary, pairs, _ = sft_out
    out2 = str(tmp_path / "sft2")
    s2 = build_sft(
        spark, corpus_path, out2, context_turns=3, capacity=256, min_turns=2
    )
    p2 = spark.read.parquet(f"{out2}/pairs").toPandas()
    for k in ("n_pairs", "n_conversations", "total_tokens", "n_sequences"):
        assert s2[k] == summary[k]
    a = pairs.sort_values("pair_id", ignore_index=True)
    b = p2.sort_values("pair_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
