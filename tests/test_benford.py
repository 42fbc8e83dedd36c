"""Benford first-digit profile (operators/profile.py benford_digits)."""

import math

import pytest

from node_feedparser_spark.operators.profile import BENFORD_P, benford_digits


def test_digit_extraction_and_chi_square_terms(spark):
    # leading digits: 1.00->1, 19.99->1, 0.05->5, 987.0->9
    df = spark.createDataFrame(
        [(1.00,), (19.99,), (0.05,), (987.0,)], "x double"
    )
    got = {r["digit"]: r for r in benford_digits(df, "x").collect()}
    assert set(got) == set(range(1, 10))
    obs = {d: got[d]["n_obs"] for d in got}
    assert obs[1] == 2 and obs[5] == 1 and obs[9] == 1
    assert sum(obs.values()) == 4
    for d in (1, 5, 9, 2):
        e = 4 * BENFORD_P[d]
        want = (obs[d] - e) ** 2 / e
        assert got[d]["contrib"] == pytest.approx(want, abs=1e-6)
        assert got[d]["exp_p"] == pytest.approx(
            math.log10(1 + 1 / d), abs=1e-6
        )


def test_benford_conformant_sample_has_small_contribs(spark):
    # counts proportional to Benford: contribs ~ 0
    rows = []
    for d in range(1, 10):
        rows += [(float(d),)] * round(BENFORD_P[d] * 1000)
    df = spark.createDataFrame(rows, "x double")
    out = benford_digits(df, "x").collect()
    assert all(r["contrib"] < 0.5 for r in out)
