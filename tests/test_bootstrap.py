"""Poisson bootstrap (sketch.poisson_bootstrap): deterministic weights,
SE sanity vs analytic, DuckDB replay."""

import hashlib
import math

import pytest

from node_feedparser_spark.operators.sketch import (
    POISSON1_CDF,
    poisson_bootstrap,
)


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _w(eid, rep):
    u = (_h60(f"{eid}:{rep}") % 1_000_000) / 1_000_000
    return sum(u >= t for t in POISSON1_CDF)


ROWS = [(i, "g", float(10 + (i % 7))) for i in range(200)] + [
    (1000 + i, "h", float(i % 3)) for i in range(90)
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        ROWS, "event_id long, event_type string, value double"
    )


def test_matches_pure_python_replication(events):
    got = {
        r.event_type: r for r in poisson_bootstrap(events, n_replicates=20).collect()
    }
    for grp in ("g", "h"):
        vals = [(i, v) for i, g, v in ROWS if g == grp]
        means = []
        for rep in range(1, 21):
            ws = [( _w(i, rep), v) for i, v in vals]
            tot = sum(w for w, _ in ws)
            if tot > 0:
                means.append(sum(w * v for w, v in ws) / tot)
        mean = sum(means) / len(means)
        var = sum((m - mean) ** 2 for m in means) / (len(means) - 1)
        assert got[grp].boot_mean == pytest.approx(round(mean, 6), abs=2e-6)
        assert got[grp].boot_se == pytest.approx(
            round(math.sqrt(var), 6), abs=2e-6
        )
        assert got[grp].n_reps == len(means)


def test_se_magnitude_sane(events):
    got = {
        r.event_type: r for r in poisson_bootstrap(events, n_replicates=40).collect()
    }
    # analytic SE of the mean for group g: sd/sqrt(200)
    vals = [v for i, g, v in ROWS if g == "g"]
    mu = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (len(vals) - 1))
    se = sd / math.sqrt(len(vals))
    assert 0.3 * se < got["g"].boot_se < 3.0 * se
    assert got["g"].mean == pytest.approx(round(mu, 6))


def test_deterministic(events):
    a = sorted(map(tuple, poisson_bootstrap(events, n_replicates=10).collect()))
    b = sorted(map(tuple, poisson_bootstrap(events, n_replicates=10).collect()))
    assert a == b


def test_validation(events):
    with pytest.raises(ValueError):
        poisson_bootstrap(events, n_replicates=1)
