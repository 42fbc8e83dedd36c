"""Rule-mining stage (plans/mine.py) against a real build_kg output, with
an independent pure-pandas replay of the AMIE statistics as the oracle."""

import os

import pandas as pd
import pytest

from node_feedparser_spark.operators.extract import ERROR_PRED
from node_feedparser_spark.plans.mine import mine_kg_rules
from node_feedparser_spark.plans.pipeline import build_kg


@pytest.fixture(scope="module")
def kg(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg"))
    summary = build_kg(spark, corpus_path, out, n_buckets=4)
    return out, summary


def _pandas_rules(
    t: pd.DataFrame, min_support: int, max_pairs: int
) -> pd.DataFrame:
    """Independent driver-side replay of operators/rules.mine_path_rules."""
    t = t[["subj", "pred", "obj"]].drop_duplicates()
    ind = (
        t.groupby(["obj", "pred"]).size().rename("ind").reset_index()
        .rename(columns={"obj": "z", "pred": "p1"})
    )
    outd = (
        t.groupby(["subj", "pred"]).size().rename("outd").reset_index()
        .rename(columns={"subj": "z", "pred": "p2"})
    )
    allowed = ind.merge(outd, on="z")
    allowed = allowed[allowed["ind"] * allowed["outd"] <= max_pairs][
        ["z", "p1", "p2"]
    ]
    b1 = t.rename(columns={"subj": "x", "pred": "p1", "obj": "z"})
    b2 = t.rename(columns={"subj": "z", "pred": "p2", "obj": "y"})
    body = (
        b1.merge(allowed, on=["z", "p1"])
        .merge(b2, on=["z", "p2"])[["p1", "p2", "x", "y"]]
        .drop_duplicates()
    )
    n_body = body.groupby(["p1", "p2"]).size().rename("n_body").reset_index()
    heads = t.rename(columns={"pred": "p3", "subj": "x", "obj": "y"})
    sup = (
        body.merge(heads, on=["x", "y"])
        .groupby(["p1", "p2", "p3"])
        .size()
        .rename("support")
        .reset_index()
    )
    sup = sup[sup["support"] >= min_support]
    n_head = heads.groupby("p3").size().rename("n_head").reset_index()
    pdom = heads[["p3", "x"]].drop_duplicates()
    npca = (
        body.merge(pdom, on="x")
        .groupby(["p1", "p2", "p3"])
        .size()
        .rename("n_pca")
        .reset_index()
    )
    out = (
        sup.merge(n_body, on=["p1", "p2"])
        .merge(n_head, on="p3")
        .merge(npca, on=["p1", "p2", "p3"])
    )
    out["conf_std"] = (out["support"] / out["n_body"]).round(6)
    out["conf_pca"] = (out["support"] / out["n_pca"]).round(6)
    out["head_coverage"] = (out["support"] / out["n_head"]).round(6)
    return out[
        [
            "p1", "p2", "p3", "support", "n_body", "n_head",
            "conf_std", "conf_pca", "head_coverage",
        ]
    ]


def test_rules_match_pandas_replay(spark, kg):
    out, _ = kg
    summary = mine_kg_rules(spark, out, min_support=5)
    assert summary["n_rules"] > 0, "scale-1 KG should yield rules at support 5"
    got = (
        pd.read_parquet(os.path.join(out, "rules"))
        .sort_values(["p1", "p2", "p3"])
        .reset_index(drop=True)
    )
    triples = pd.read_parquet(os.path.join(out, "triples"))
    t = triples[triples["pred"] != ERROR_PRED][
        ["subj_id", "pred", "obj_id"]
    ].rename(columns={"subj_id": "subj", "obj_id": "obj"})
    want = (
        _pandas_rules(t, min_support=5, max_pairs=100_000)
        .sort_values(["p1", "p2", "p3"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == summary["n_rules"]
    for col in want.columns:
        pd.testing.assert_series_equal(
            got[col], want[col], check_names=False, check_dtype=False
        )


def test_profile_written_and_consistent(spark, kg):
    out, _ = kg
    mine_kg_rules(spark, out, min_support=5)
    prof = pd.read_parquet(os.path.join(out, "pred_profile"))
    triples = pd.read_parquet(os.path.join(out, "triples"))
    t = triples[triples["pred"] != ERROR_PRED][
        ["subj_id", "pred", "obj_id"]
    ].drop_duplicates()
    base = t.groupby("pred").agg(
        n_triples=("pred", "size"),
        n_subj=("subj_id", "nunique"),
        n_obj=("obj_id", "nunique"),
    )
    assert set(prof["pred"]) == set(base.index)
    m = prof.set_index("pred")
    for p, row in base.iterrows():
        assert m.loc[p, "n_triples"] == row["n_triples"]
        assert m.loc[p, "n_subj"] == row["n_subj"]
        assert m.loc[p, "n_obj"] == row["n_obj"]
        assert m.loc[p, "functionality"] == pytest.approx(
            round(row["n_subj"] / row["n_triples"], 6), abs=1e-6
        )


def test_determinism(spark, kg):
    out, _ = kg
    a = mine_kg_rules(spark, out, min_support=5)
    ra = pd.read_parquet(os.path.join(out, "rules")).sort_values(
        ["p1", "p2", "p3"]
    ).reset_index(drop=True)
    b = mine_kg_rules(spark, out, min_support=5)
    rb = pd.read_parquet(os.path.join(out, "rules")).sort_values(
        ["p1", "p2", "p3"]
    ).reset_index(drop=True)
    assert a["n_rules"] == b["n_rules"] and a["top_rule"] == b["top_rule"]
    pd.testing.assert_frame_equal(ra, rb)
