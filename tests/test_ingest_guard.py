"""Round-5 ingest-time PK guard: re-ingesting the same conversations
under a different snapshot (a changed-datagen corpus landing in an old
output dir) is caught AT INGEST — warning + summary key by default,
refusal under strict_ingest — instead of only post-hoc by validate_kg's
triples_pk_unique audit.  Disjoint merge ingests and pure resumes stay
silent."""

import pandas as pd
import pytest

from node_feedparser_spark.datagen import generate_transcripts
from node_feedparser_spark.plans.pipeline import build_kg


def _write(pdf: pd.DataFrame, path: str) -> str:
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path, index=False)
    return path


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    base = tmp_path_factory.mktemp("ingest_guard")
    a = generate_transcripts(seed=42, scale=0.5)
    b = generate_transcripts(seed=7, scale=0.5)  # same conv_ids, new text
    assert set(a["conv_id"]) == set(b["conv_id"])
    mask = a["conv_id"].map(lambda c: (sum(c.encode()) % 2) == 0)
    return {
        "a": _write(a, str(base / "a.parquet")),
        "b": _write(b, str(base / "b.parquet")),
        "a_even": _write(a[mask], str(base / "a_even.parquet")),
        "a_odd": _write(a[~mask], str(base / "a_odd.parquet")),
        "base": base,
    }


def test_overlapping_reingest_warns_and_strict_refuses(spark, corpora, capsys):
    out = str(corpora["base"] / "kg_overlap")
    s1 = build_kg(spark, corpora["a"], out, n_buckets=4)
    assert "ingest_warning" not in s1  # first ingest into a fresh dir

    s2 = build_kg(spark, corpora["b"], out, n_buckets=4)
    assert "ingest_warning" in s2
    assert "shares conv_ids" in s2["ingest_warning"]
    assert "WARNING" in capsys.readouterr().err

    # strict mode refuses BEFORE writing anything for a third snapshot
    c = generate_transcripts(seed=9, scale=0.5)
    p3 = _write(c, str(corpora["base"] / "c.parquet"))
    with pytest.raises(ValueError, match="shares conv_ids"):
        build_kg(spark, p3, out, n_buckets=4, strict_ingest=True)


def test_resumed_overlapping_ingest_still_guarded(spark, corpora):
    """Round-5 review finding: the guard must probe the UNPRUNED input
    scan.  After an overlapping ingest commits (crash-then-rerun model:
    every committed bucket is resume-skipped), a strict rerun must still
    refuse — the colliding conv_ids live exactly in the skipped buckets."""
    out = str(corpora["base"] / "kg_resumed_overlap")
    build_kg(spark, corpora["a"], out, n_buckets=4)
    s2 = build_kg(spark, corpora["b"], out, n_buckets=4)
    assert "ingest_warning" in s2

    # rerun of b: pure resume (all buckets committed), still overlapping a
    s3 = build_kg(spark, corpora["b"], out, n_buckets=4)
    assert s3["n_triples"] == 0 and "ingest_warning" in s3
    with pytest.raises(ValueError, match="shares conv_ids"):
        build_kg(spark, corpora["b"], out, n_buckets=4, strict_ingest=True)


def test_disjoint_merge_and_pure_resume_stay_silent(spark, corpora):
    out = str(corpora["base"] / "kg_disjoint")
    s1 = build_kg(spark, corpora["a_even"], out, n_buckets=4)
    s2 = build_kg(spark, corpora["a_odd"], out, n_buckets=4)
    assert "ingest_warning" not in s1
    assert "ingest_warning" not in s2  # legit split ingest: disjoint convs

    s3 = build_kg(spark, corpora["a_odd"], out, n_buckets=4)
    assert s3["n_triples"] == 0 and "ingest_warning" not in s3  # pure resume
