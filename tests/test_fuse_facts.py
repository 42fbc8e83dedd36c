"""Fused-facts stage (plans/fuse.py) against a real build_kg output,
with a pure-pandas recomputation of the trust fixed point as the oracle."""

import os

import pandas as pd
import pytest

from node_feedparser_spark.plans.fuse import fuse_facts
from node_feedparser_spark.plans.pipeline import build_kg
from node_feedparser_spark.operators.extract import ERROR_PRED


@pytest.fixture(scope="module")
def kg(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg"))
    summary = build_kg(spark, corpus_path, out, n_buckets=4)
    return out, summary


def _pandas_fusion(claims: pd.DataFrame, n_iter: int = 2) -> pd.DataFrame:
    """Independent driver-side replay of operators/fusion.truth_fusion."""
    c = claims.drop_duplicates(["subj", "pred", "obj", "source"]).copy()
    trust = {s: 1.0 for s in c["source"].unique()}
    conf = None
    for _ in range(n_iter):
        c["_t"] = c["source"].map(trust)
        num = (
            c.groupby(["subj", "pred", "obj"])
            .agg(num=("_t", "sum"), n_sources=("_t", "size"))
            .reset_index()
        )
        num["num"] = num["num"].round(9)
        den = (
            c.groupby(["subj", "pred"]).agg(den=("_t", "sum")).reset_index()
        )
        den["den"] = den["den"].round(9)
        conf = num.merge(den, on=["subj", "pred"])
        conf["conf"] = (conf["num"] / conf["den"]).round(9)
        t = (
            c.merge(conf, on=["subj", "pred", "obj"])
            .groupby("source")["conf"]
            .mean()
            .round(9)
        )
        trust = t.to_dict()
    conf = conf.sort_values(
        ["subj", "pred", "conf", "obj"],
        ascending=[True, True, False, True],
    )
    best = conf.groupby(["subj", "pred"], as_index=False).first()
    best["confidence"] = best["conf"].round(6)
    return best[["subj", "pred", "obj", "confidence", "n_sources"]]


def test_facts_match_pandas_fixed_point(spark, kg):
    out, _ = kg
    fuse_facts(spark, out, n_iter=2)
    facts = pd.read_parquet(os.path.join(out, "facts"))
    triples = pd.read_parquet(os.path.join(out, "triples"))
    claims = triples[triples["pred"] != ERROR_PRED][
        ["subj_id", "pred", "obj", "conv_id"]
    ].rename(columns={"subj_id": "subj", "conv_id": "source"})
    want = _pandas_fusion(claims, n_iter=2)

    got = facts[["subj_id", "pred", "obj", "confidence", "n_sources"]].rename(
        columns={"subj_id": "subj"}
    )
    got = got.sort_values(["subj", "pred"], ignore_index=True)
    want = want.sort_values(["subj", "pred"], ignore_index=True)
    assert len(got) == len(want)
    assert (got["obj"].values == want["obj"].values).all()
    assert (got["n_sources"].values == want["n_sources"].values).all()
    assert (got["confidence"] - want["confidence"]).abs().max() <= 1e-9


def test_one_fact_per_subject_pred(spark, kg):
    out, _ = kg
    fuse_facts(spark, out)
    facts = pd.read_parquet(os.path.join(out, "facts"))
    assert not facts.duplicated(["subj_id", "pred"]).any()
    triples = pd.read_parquet(os.path.join(out, "triples"))
    keys = triples[triples["pred"] != ERROR_PRED][["subj_id", "pred"]]
    assert len(facts) == len(keys.drop_duplicates())
    assert ((facts["confidence"] > 0) & (facts["confidence"] <= 1.0)).all()
    # canonical_name resolves for every subject (vertices cover all ids)
    assert facts["canonical_name"].notna().all()


def test_single_valued_facts_have_confidence_one(spark, kg):
    out, _ = kg
    facts = pd.read_parquet(os.path.join(out, "facts"))
    triples = pd.read_parquet(os.path.join(out, "triples"))
    t = triples[triples["pred"] != ERROR_PRED]
    nvals = t.groupby(["subj_id", "pred"])["obj"].nunique()
    single = nvals[nvals == 1].index
    f = facts.set_index(["subj_id", "pred"])
    assert (f.loc[single, "confidence"] == 1.0).all()


def test_snapshot_scoped_fusion_equals_full_on_single_snapshot(spark, kg):
    out, summary = kg
    s_all = fuse_facts(spark, out, n_iter=2)
    full = pd.read_parquet(os.path.join(out, "facts")).sort_values(
        ["subj_id", "pred"], ignore_index=True
    )
    s_one = fuse_facts(spark, out, snapshot=summary["snapshot_id"], n_iter=2)
    one = pd.read_parquet(os.path.join(out, "facts")).sort_values(
        ["subj_id", "pred"], ignore_index=True
    )
    assert s_all["n_facts"] == s_one["n_facts"]
    pd.testing.assert_frame_equal(full, one)
