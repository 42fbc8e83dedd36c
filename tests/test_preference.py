"""Preference-data prep (operators/preference.py): DPO pair mining and
Bradley-Terry MM ability estimation, pinned against hand cases and an
independent pure-Python MM replica with the operator's exact rounding."""

import random

import pytest

from node_feedparser_spark.operators.preference import (
    bradley_terry,
    dpo_pairs,
    pairwise_counts,
)


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "prompt_id long, cand_id int, score long")
    out = dpo_pairs(df, **kw).collect()
    return {r["prompt_id"]: r for r in out}


# ---------------------------------------------------------------------------
# dpo_pairs
# ---------------------------------------------------------------------------


def test_dpo_basic_best_vs_worst(spark):
    got = _pairs(
        spark,
        [(1, 1, 500), (1, 2, 900), (1, 3, 100)],
    )
    r = got[1]
    assert (r["chosen"], r["rejected"]) == (2, 3)
    assert (r["chosen_score"], r["rejected_score"]) == (900, 100)
    assert (r["margin"], r["n_cands"]) == (800, 3)


def test_dpo_tie_breaks_are_deterministic(spark):
    # top tie at 900 -> smallest cand id; bottom tie at 100 -> largest.
    got = _pairs(
        spark,
        [(1, 5, 900), (1, 2, 900), (1, 7, 100), (1, 9, 100)],
    )
    r = got[1]
    assert (r["chosen"], r["rejected"]) == (2, 9)
    assert r["margin"] == 800


def test_dpo_single_candidate_prompt_dropped(spark):
    got = _pairs(spark, [(1, 1, 500), (2, 1, 300), (2, 2, 600)])
    assert 1 not in got and 2 in got


def test_dpo_margin_screen(spark):
    got = _pairs(
        spark,
        [(1, 1, 100), (1, 2, 105), (2, 1, 100), (2, 2, 200)],
        min_margin=50,
    )
    assert 1 not in got  # margin 5 < 50
    assert got[2]["margin"] == 100


def test_dpo_duplicate_rows_are_one_candidate(spark):
    # the same (prompt, cand, score) row twice must not fabricate a pair
    got = _pairs(spark, [(1, 1, 500), (1, 1, 500)])
    assert got == {}


def test_dpo_all_equal_scores_drop_via_margin(spark):
    # distinct candidates, identical scores: chosen=min id, rejected=max id,
    # margin 0 -> dropped at the default min_margin=1
    got = _pairs(spark, [(1, 1, 500), (1, 2, 500)])
    assert got == {}
    got = _pairs(spark, [(1, 1, 500), (1, 2, 500)], min_margin=0)
    assert (got[1]["chosen"], got[1]["rejected"]) == (1, 2)


# ---------------------------------------------------------------------------
# pairwise_counts / bradley_terry
# ---------------------------------------------------------------------------


def _comps(spark, rows):
    return spark.createDataFrame(rows, "winner string, loser string")


def test_pairwise_counts_symmetrize(spark):
    pc = pairwise_counts(
        _comps(spark, [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c")])
    ).collect()
    d = {(r["player"], r["opponent"]): (r["wins"], r["n"]) for r in pc}
    assert d[("a", "b")] == (2, 3)
    assert d[("b", "a")] == (1, 3)
    assert d[("a", "c")] == (1, 1)
    assert d[("c", "a")] == (0, 1)
    assert len(d) == 4


def test_pairwise_counts_drops_self_comparisons(spark):
    pc = pairwise_counts(_comps(spark, [("a", "a"), ("a", "b")])).collect()
    assert {(r["player"], r["opponent"]) for r in pc} == {
        ("a", "b"),
        ("b", "a"),
    }


def _bt_replica(comparisons, n_iter=2):
    """Independent pure-Python MM replay with the operator's rounding."""
    wins = {}
    for w, l in comparisons:
        if w == l:
            continue
        wins[(w, l)] = wins.get((w, l), 0) + 1
        wins.setdefault((l, w), 0)
    players = sorted({p for pair in wins for p in pair})
    n = {
        (i, j): wins[(i, j)] + wins[(j, i)]
        for (i, j) in wins
    }
    w_tot = {p: sum(w for (i, _), w in wins.items() if i == p) for p in players}
    n_tot = {p: sum(v for (i, _), v in n.items() if i == p) for p in players}
    a = {p: 1.0 for p in players}
    for _ in range(n_iter):
        denom = {
            p: round(
                sum(
                    round(n[(p, q)] / (a[p] + a[q]), 9)
                    for q in players
                    if (p, q) in n
                ),
                9,
            )
            for p in players
        }
        a = {p: round(w_tot[p] / denom[p], 9) for p in players}
    z = round(sum(a.values()), 9)
    return {
        p: (w_tot[p], n_tot[p], round(a[p] / z, 6)) for p in players
    }


def test_bt_dominant_player_ranks_highest(spark):
    comps = [("a", "b")] * 5 + [("a", "c")] * 5 + [("b", "c")] * 3 + [
        ("c", "b")
    ] * 1
    out = bradley_terry(_comps(spark, comps)).collect()
    ab = {r["player"]: r["ability"] for r in out}
    assert ab["a"] > ab["b"] > ab["c"]
    assert out[0]["n_comparisons"] is not None


def test_bt_matches_pure_python_replica_exactly(spark):
    rng = random.Random(7)
    players = ["p%d" % i for i in range(6)]
    comps = []
    for _ in range(300):
        i, j = rng.sample(range(6), 2)
        # lower index wins 70% of the time -> graded abilities
        if rng.random() < 0.7:
            i, j = min(i, j), max(i, j)
        else:
            i, j = max(i, j), min(i, j)
        comps.append((players[i], players[j]))
    out = bradley_terry(_comps(spark, comps)).collect()
    want = _bt_replica(comps)
    got = {
        r["player"]: (r["wins"], r["n_comparisons"], r["ability"])
        for r in out
    }
    assert got == want


def test_bt_symmetric_record_gives_equal_abilities(spark):
    comps = [("a", "b")] * 4 + [("b", "a")] * 4
    out = {r["player"]: r["ability"] for r in
           bradley_terry(_comps(spark, comps)).collect()}
    assert out["a"] == pytest.approx(0.5, abs=1e-6)
    assert out["a"] == out["b"]


def test_bt_zero_win_player_gets_zero_ability(spark):
    out = {r["player"]: r for r in
           bradley_terry(_comps(spark, [("a", "b")] * 3)).collect()}
    assert out["b"]["ability"] == 0.0
    assert out["a"]["ability"] == 1.0
    assert out["b"]["wins"] == 0 and out["b"]["n_comparisons"] == 3


def test_bt_abilities_sum_to_one(spark):
    comps = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    out = bradley_terry(_comps(spark, comps)).collect()
    assert sum(r["ability"] for r in out) == pytest.approx(1.0, abs=5e-6)


# ---------------------------------------------------------------------------
# reward_whiten
# ---------------------------------------------------------------------------


def _whiten(spark, rows):
    from node_feedparser_spark.operators.preference import reward_whiten

    df = spark.createDataFrame(rows, "prompt_id long, cand_id int, score long")
    return {
        (r["prompt_id"], r["cand_id"]): (r["z_score"], r["n_cands"])
        for r in reward_whiten(df).collect()
    }


def test_whiten_hand_computed_symmetric_pair(spark):
    got = _whiten(spark, [(1, 1, 100), (1, 2, 300)])
    # mean 200, pop std 100: z = ±1 exactly
    assert got[(1, 1)] == (-1.0, 2)
    assert got[(1, 2)] == (1.0, 2)


def test_whiten_matches_population_formula(spark):
    import math

    rows = [(1, i, s) for i, s in enumerate([120, 450, 450, 900])]
    got = _whiten(spark, rows)
    xs = [120, 450, 450, 900]
    mu = sum(xs) / 4
    sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / 4)
    for i, x in enumerate(xs):
        assert got[(1, i)][0] == pytest.approx((x - mu) / sd, abs=1e-6)


def test_whiten_zero_variance_and_singleton_are_zero(spark):
    got = _whiten(spark, [(1, 1, 500), (1, 2, 500), (2, 1, 777)])
    assert got[(1, 1)] == (0.0, 2)
    assert got[(1, 2)] == (0.0, 2)
    assert got[(2, 1)] == (0.0, 1)


def test_whiten_groups_are_independent(spark):
    got = _whiten(
        spark, [(1, 1, 0), (1, 2, 200), (2, 1, 1000), (2, 2, 3000)]
    )
    # both groups are symmetric pairs: z = ±1 regardless of scale/offset
    assert got[(1, 1)][0] == got[(2, 1)][0] == -1.0
    assert got[(1, 2)][0] == got[(2, 2)][0] == 1.0


# ---------------------------------------------------------------------------
# pass_at_k
# ---------------------------------------------------------------------------


def _pak(spark, rows, k):
    from node_feedparser_spark.operators.preference import pass_at_k

    df = spark.createDataFrame(rows, "prompt_id long, passed boolean")
    return {
        r["prompt_id"]: (r["n_candidates"], r["n_passed"], r["pass_at_k"])
        for r in pass_at_k(df, k=k).collect()
    }


def test_pak_hand_computed(spark):
    # n=4, c=1, k=2: 1 - C(3,2)/C(4,2) = 1 - 3/6 = 0.5
    rows = [(1, True), (1, False), (1, False), (1, False)]
    assert _pak(spark, rows, 2)[1] == (4, 1, 0.5)


def test_pak_all_pass_and_none_pass(spark):
    rows = [(1, True), (1, True), (2, False), (2, False)]
    got = _pak(spark, rows, 2)
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)


def test_pak_k1_is_pass_rate(spark):
    rows = [(1, True), (1, False), (1, False), (1, False)]
    assert _pak(spark, rows, 1)[1][2] == pytest.approx(0.25, abs=1e-6)


def test_pak_undefined_below_k_candidates(spark):
    got = _pak(spark, [(1, True), (2, True), (2, False)], 2)
    assert got[1] == (1, 1, None)
    assert got[2][2] == 1.0


def test_pak_matches_closed_form(spark):
    from math import comb

    rows = []
    for p, (n, c) in enumerate([(7, 3), (5, 5), (6, 0), (4, 2)]):
        rows += [(p, i < c) for i in range(n)]
    got = _pak(spark, rows, 3)
    for p, (n, c) in enumerate([(7, 3), (5, 5), (6, 0), (4, 2)]):
        want = 1.0 - comb(n - c, 3) / comb(n, 3)
        assert got[p][2] == pytest.approx(want, abs=1e-6)


def test_pak_validates_k(spark):
    from node_feedparser_spark.operators.preference import pass_at_k

    df = spark.createDataFrame([(1, True)], "prompt_id long, passed boolean")
    with pytest.raises(ValueError):
        pass_at_k(df, k=0)
