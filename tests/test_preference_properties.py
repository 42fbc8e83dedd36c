"""Property-based invariants for the preference family: hypothesis over the
pure-Python elo_fold (no Spark needed), and seeded randomized cross-checks
of dpo_pairs / reward_whiten / pass_at_k against independent pure-Python
references (one Spark roundtrip per seed, not per example)."""

import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from node_feedparser_spark.operators.preference import (
    ELO_BASE,
    dpo_pairs,
    elo_fold,
    pass_at_k,
    reward_whiten,
)

# ---------------------------------------------------------------------------
# elo_fold invariants (pure Python — cheap to fuzz hard)
# ---------------------------------------------------------------------------

players_st = st.sampled_from(["a", "b", "c", "d", "e"])
rows_st = st.lists(
    st.tuples(st.integers(0, 10_000), players_st, players_st), max_size=60
)


@given(rows_st)
@settings(max_examples=200, deadline=None)
def test_elo_is_zero_sum_within_rounding(rows):
    st_ = elo_fold(rows)
    n = len(st_["ratings"])
    if n == 0:
        return
    # each update moves winner and loser by the same amount pre-rounding;
    # 6 dp HALF_UP rounding drifts the sum by <= 1e-6 per side per game
    drift = 2e-6 * sum(st_["games"].values())
    assert abs(sum(st_["ratings"].values()) - ELO_BASE * n) <= drift + 1e-9


@given(rows_st)
@settings(max_examples=200, deadline=None)
def test_elo_games_and_wins_conserve(rows):
    st_ = elo_fold(rows)
    applied = {
        (s, w, l)
        for s, w, l in rows
        if w != l
    }
    # distinct seqs actually applied (duplicates at one seq both apply if
    # they differ — sorted() order guarantees which comes first)
    n_applied = sum(
        1 for s, w, l in sorted(rows) if w != l
    ) - _n_skipped_replays(rows)
    assert sum(st_["games"].values()) == 2 * n_applied
    assert sum(st_["wins"].values()) == n_applied
    assert applied or st_["ratings"] == {}


def _n_skipped_replays(rows):
    # elo_fold skips a row whose seq <= last_seq AT THE TIME it is seen;
    # within one call rows are pre-sorted so every row's seq >= previous
    # seqs — nothing is skipped except self-comparisons (counted out
    # already by the caller).  Kept as a function for documentation.
    return 0


@given(rows_st)
@settings(max_examples=100, deadline=None)
def test_elo_refold_of_same_rows_is_idempotent(rows):
    once = elo_fold(rows)
    twice = elo_fold(rows, state=elo_fold(rows))
    assert once["ratings"] == twice["ratings"]
    assert once["games"] == twice["games"]


@given(rows_st, rows_st)
@settings(max_examples=100, deadline=None)
def test_elo_split_fold_equals_single_fold_on_ordered_halves(r1, r2):
    # shift the second half's seqs past the first's so the stream is
    # in-order across the split (the streaming face's contract)
    hi = max((s for s, _, _ in r1), default=-1)
    r2s = [(s + hi + 1, w, l) for s, w, l in r2]
    joint = elo_fold(r1 + r2s)
    split = elo_fold(r2s, state=elo_fold(r1))
    assert joint["ratings"] == split["ratings"]
    assert joint["games"] == split["games"]
    assert joint["last_seq"] == split["last_seq"]


# ---------------------------------------------------------------------------
# seeded randomized Spark-vs-pure-Python cross-checks
# ---------------------------------------------------------------------------


def _random_cands(seed):
    rng = random.Random(seed)
    rows = []
    for p in range(40):
        for c in range(rng.randint(1, 6)):
            rows.append((p, c, rng.choice([100, 250, 250, 900, 900, 1300])))
    # plant exact duplicate rows too
    rows += rows[:5]
    return rows


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_dpo_pairs_matches_reference(spark, seed):
    rows = _random_cands(seed)
    df = spark.createDataFrame(rows, "prompt_id long, cand_id int, score long")
    got = {
        r["prompt_id"]: (
            r["chosen"], r["rejected"], r["margin"], r["n_cands"]
        )
        for r in dpo_pairs(df, min_margin=100).collect()
    }
    want = {}
    by_p = {}
    for p, c, s in set(rows):
        by_p.setdefault(p, []).append((c, s))
    for p, cands in by_p.items():
        ch = max(cands, key=lambda cs: (cs[1], -cs[0]))
        rj = min(cands, key=lambda cs: (cs[1], -cs[0]))
        if ch[0] != rj[0] and ch[1] - rj[1] >= 100:
            want[p] = (ch[0], rj[0], ch[1] - rj[1], len(cands))
    assert got == want


@pytest.mark.parametrize("seed", [5, 17])
def test_reward_whiten_matches_reference(spark, seed):
    rows = _random_cands(seed)
    df = spark.createDataFrame(rows, "prompt_id long, cand_id int, score long")
    got = {
        (r["prompt_id"], r["cand_id"]): r["z_score"]
        for r in reward_whiten(df).collect()
    }
    by_p = {}
    for p, c, s in set(rows):
        by_p.setdefault(p, []).append((c, s))
    for p, cands in by_p.items():
        xs = [s for _, s in cands]
        mu = sum(xs) / len(xs)
        var = sum((x - mu) ** 2 for x in xs) / len(xs)
        for c, s in cands:
            want = 0.0 if var == 0 else (s - mu) / math.sqrt(var)
            assert got[(p, c)] == pytest.approx(want, abs=1e-6), (p, c)


@pytest.mark.parametrize("seed", [3, 29])
def test_pass_at_k_matches_comb_reference(spark, seed):
    from math import comb

    rng = random.Random(seed)
    rows = [
        (p, i, rng.random() < 0.4)
        for p in range(50)
        for i in range(rng.randint(1, 8))
    ]
    df = spark.createDataFrame(
        [(p, ok) for p, _, ok in rows], "prompt_id long, passed boolean"
    )
    got = {
        r["prompt_id"]: r["pass_at_k"]
        for r in pass_at_k(df, k=3).collect()
    }
    by_p = {}
    for p, _, ok in rows:
        n, c = by_p.get(p, (0, 0))
        by_p[p] = (n + 1, c + bool(ok))
    for p, (n, c) in by_p.items():
        if n < 3:
            assert got[p] is None
        else:
            want = 1.0 - comb(n - c, 3) / comb(n, 3)
            assert got[p] == pytest.approx(want, abs=1e-6), p
