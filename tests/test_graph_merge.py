"""Round-3 incremental graph MERGE: vertices/edges compose across a
two-run split ingest (read-prior -> union -> re-agg) instead of being
clobbered by the last run, and a pure resume leaves them untouched."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.plans.pipeline import build_kg


def _halves(corpus_pdf):
    mask = corpus_pdf["conv_id"].map(
        lambda c: (sum(c.encode()) % 2) == 0
    )
    return corpus_pdf[mask], corpus_pdf[~mask]


def _write(pdf: pd.DataFrame, path: str) -> str:
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path, index=False)
    return path


def _vertex_map(spark, out):
    return {
        r["entity_id"]: (r["canonical_name"], tuple(r["aliases"]), r["n_mentions"])
        for r in spark.read.parquet(os.path.join(out, "vertices")).collect()
    }


def _edge_map(spark, out):
    return {
        (r["src_id"], r["pred"], r["dst_id"]): r["weight"]
        for r in spark.read.parquet(os.path.join(out, "edges")).collect()
    }


@pytest.fixture(scope="module")
def split_ingest(spark, corpus_pdf, tmp_path_factory):
    base = tmp_path_factory.mktemp("graph_merge")
    h1, h2 = _halves(corpus_pdf)
    assert len(h1) > 0 and len(h2) > 0
    p1 = _write(h1, str(base / "half1.parquet"))
    p2 = _write(h2, str(base / "half2.parquet"))
    pf = _write(corpus_pdf, str(base / "full.parquet"))

    out_split = str(base / "kg_split")
    out_full = str(base / "kg_full")
    s1 = build_kg(spark, p1, out_split, n_buckets=4)
    s2 = build_kg(spark, p2, out_split, n_buckets=4)
    sf = build_kg(spark, pf, out_full, n_buckets=4)
    return {
        "out_split": out_split, "out_full": out_full,
        "s1": s1, "s2": s2, "sf": sf, "p1": p1,
    }


def test_split_ingest_edges_compose(spark, split_ingest):
    """Conserved edge invariants: entity COMPONENTS may legitimately differ
    between a split and a full run (a cross-half surface pair that only the
    full corpus bridges — standard incremental-ER divergence; a periodic
    full re-run re-bases the graph), but total weight mass and the
    per-predicate weight distribution ride the triples, not the
    components, so they must match exactly."""
    merged = _edge_map(spark, split_ingest["out_split"])
    full = _edge_map(spark, split_ingest["out_full"])
    assert abs(sum(merged.values()) - sum(full.values())) < 1e-4
    by_pred_m: dict = {}
    by_pred_f: dict = {}
    for (s, p, d), w in merged.items():
        by_pred_m[p] = by_pred_m.get(p, 0.0) + w
    for (s, p, d), w in full.items():
        by_pred_f[p] = by_pred_f.get(p, 0.0) + w
    assert set(by_pred_m) == set(by_pred_f)
    for p in by_pred_f:
        assert abs(by_pred_m[p] - by_pred_f[p]) < 1e-4, p


def test_split_ingest_vertices_compose(spark, split_ingest):
    """Conserved vertex invariants: total mentions and the global surface
    (alias) universe are component-independent and must match the full
    run exactly; no surface may be lost by the merge."""
    merged = _vertex_map(spark, split_ingest["out_split"])
    full = _vertex_map(spark, split_ingest["out_full"])
    assert sum(n for _, _, n in merged.values()) == sum(
        n for _, _, n in full.values()
    )
    m_surfaces = {a for _, al, _ in merged.values() for a in al}
    f_surfaces = {a for _, al, _ in full.values() for a in al}
    assert m_surfaces == f_surfaces
    # every canonical name is one of its own aliases — except round-4
    # redirect vertices (empty alias set), whose canonical must resolve
    # to a surface owned by some live vertex
    owned_surfaces = {a for _, al, _ in merged.values() for a in al}
    for eid, (name, aliases, _) in merged.items():
        if aliases:
            assert name in aliases, eid
        else:
            assert name in owned_surfaces, (eid, name)


def test_merge_math_exact(spark):
    """Direct exactness of merge_vertices/merge_edges on disjoint inputs —
    no ER noise: sums, set unions, and majority-name selection."""
    from node_feedparser_spark.plans.pipeline import merge_edges, merge_vertices

    v1 = spark.createDataFrame(
        [(1, "Spark", ["Spark", "spark"], 5), (2, "Py", ["Py"], 2)],
        "entity_id long, canonical_name string, aliases array<string>, n_mentions long",
    )
    v2 = spark.createDataFrame(
        [(1, "Apache Spark", ["Apache Spark", "spark"], 7), (3, "New", ["New"], 1)],
        "entity_id long, canonical_name string, aliases array<string>, n_mentions long",
    )
    got = {
        r["entity_id"]: (r["canonical_name"], tuple(r["aliases"]), r["n_mentions"])
        for r in merge_vertices(v1, v2).collect()
    }
    assert got[1] == ("Apache Spark", ("Apache Spark", "Spark", "spark"), 12)
    assert got[2] == ("Py", ("Py",), 2)
    assert got[3] == ("New", ("New",), 1)

    e1 = spark.createDataFrame(
        [(1, "uses", 2, 1.5), (1, "is_a", 3, 0.5)],
        "src_id long, pred string, dst_id long, weight double",
    )
    e2 = spark.createDataFrame(
        [(1, "uses", 2, 2.25), (4, "uses", 2, 1.0)],
        "src_id long, pred string, dst_id long, weight double",
    )
    got_e = {
        (r["src_id"], r["pred"], r["dst_id"]): r["weight"]
        for r in merge_edges(e1, e2).collect()
    }
    assert got_e == {(1, "uses", 2, ): 3.75, (1, "is_a", 3): 0.5, (4, "uses", 2): 1.0}


def test_second_run_reports_merged_counts(spark, split_ingest):
    s2 = split_ingest["s2"]
    assert s2["n_vertices"] == len(_vertex_map(spark, split_ingest["out_split"]))
    assert s2["n_edges"] == len(_edge_map(spark, split_ingest["out_split"]))
    assert s2["n_vertices"] > split_ingest["s1"]["n_vertices"]


def test_pure_resume_leaves_graph_untouched(spark, split_ingest):
    """Re-running an already-committed input must keep the merged
    aggregates (the round-2 regression: a no-op resume overwrote
    vertices/edges with 0 rows)."""
    before_v = _vertex_map(spark, split_ingest["out_split"])
    before_e = _edge_map(spark, split_ingest["out_split"])
    s3 = build_kg(spark, split_ingest["p1"], split_ingest["out_split"], n_buckets=4)
    assert s3["n_triples"] == 0
    assert s3["skipped_buckets"] == [0, 1, 2, 3]
    assert _vertex_map(spark, split_ingest["out_split"]) == before_v
    assert _edge_map(spark, split_ingest["out_split"]) == before_e
    assert s3["n_vertices"] == len(before_v)


def test_triples_not_duplicated_across_split(spark, split_ingest, corpus_pdf):
    from node_feedparser_spark.reference_extract import extract_corpus

    triples = spark.read.parquet(os.path.join(split_ingest["out_split"], "triples"))
    ref = extract_corpus(corpus_pdf.to_dict("records"))
    assert triples.count() == len(ref.triples)
    dup = (
        triples.groupBy("conv_id", "turn_idx", "subj", "pred", "obj")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0


def test_split_ingest_alias_ownership_audits_green(spark, split_ingest):
    """Round 4: merge_vertices re-emits alias sets with deterministic
    single-owner resolution, so the audit's alias_single_owner check —
    now at FAIL severity — passes on a two-run split ingest, and every
    canonical name still sits in its own alias set."""
    from node_feedparser_spark.plans.validate import validate_kg

    report = validate_kg(spark, split_ingest["out_split"])
    by_name = {c["name"]: c for c in report["checks"]}
    assert by_name["alias_single_owner"]["status"] == "pass", by_name
    assert by_name["canonical_name_is_own_alias"]["status"] == "pass"
    assert by_name["redirect_targets_resolve"]["status"] == "pass"
    assert report["ok"] and report["n_fail"] == 0
    # the check would now fail (not warn) on a violation
    merged = _vertex_map(spark, split_ingest["out_split"])
    owners: dict = {}
    for eid, (_, aliases, _) in merged.items():
        for a in aliases:
            assert a not in owners, f"alias {a!r} owned by {owners[a]} and {eid}"
            owners[a] = eid


def test_merge_vertices_contested_alias_resolution(spark):
    """Direct exercise of the round-4 single-owner rules on a contested
    surface: (1) a singleton entity always keeps its only surface, even
    against a higher-mention canonical claim; the loser re-points its
    canonical name to its first surviving alias; (2) without a singleton,
    mention majority wins; (3) mention ties break to the smaller id."""
    from node_feedparser_spark.plans.pipeline import merge_vertices

    schema = (
        "entity_id long, canonical_name string, aliases array<string>, "
        "n_mentions long"
    )
    # run 1 grouped {S, X} under id 10 with S canonical (9 mentions);
    # run 2 saw S alone as singleton id 20 (2 mentions)
    v1 = spark.createDataFrame(
        [(10, "S", ["S", "X"], 9), (30, "A", ["A", "B"], 5)], schema
    )
    v2 = spark.createDataFrame(
        [(20, "S", ["S"], 2), (40, "C", ["B", "C"], 7)], schema
    )
    got = {
        r["entity_id"]: (r["canonical_name"], tuple(r["aliases"]))
        for r in merge_vertices(v1, v2).collect()
    }
    # singleton 20 keeps S; 10 loses S and re-points canonical to X
    assert got[20] == ("S", ("S",))
    assert got[10] == ("X", ("X",))
    # contested B (no singleton, neither's canonical): mentions 7 > 5
    assert got[40] == ("C", ("B", "C"))
    assert got[30] == ("A", ("A",))
    # surface universe conserved: every input alias still owned somewhere
    owned = {a for _, al in got.values() for a in al}
    assert owned == {"S", "X", "A", "B", "C"}



def test_merge_vertices_subset_component_becomes_redirect(spark):
    """The nested-component divergence shape (the one the fixture corpus
    actually produces): run 1 groups {S, S.} while run 2 groups
    {S, S., S.G}.  The smaller entity loses every surface to the
    higher-mention winner and becomes a redirect vertex — empty alias
    set, canonical_name still naming the surface its winner now owns —
    instead of re-sharing the alias."""
    from node_feedparser_spark.plans.pipeline import merge_vertices

    schema = (
        "entity_id long, canonical_name string, aliases array<string>, "
        "n_mentions long"
    )
    v1 = spark.createDataFrame([(100, "S", ["S", "S."], 21)], schema)
    v2 = spark.createDataFrame([(200, "S", ["S", "S.", "S.G"], 112)], schema)
    got = {
        r["entity_id"]: (r["canonical_name"], tuple(r["aliases"]), r["n_mentions"])
        for r in merge_vertices(v1, v2).collect()
    }
    assert got[200] == ("S", ("S", "S.", "S.G"), 112)
    assert got[100] == ("S", (), 21)  # redirect: empty aliases, pointer kept


def test_redirect_pointer_repoints_to_owned_surface(spark):
    """Chained-reconciliation corner (round-4 review finding): an entity
    whose canonical pointer no longer appears in its own pre-resolution
    surface set (possible after expire re-derived surfaces from surviving
    triples) must re-point its redirect at one of the surfaces it DID
    bring to this resolution — each of those has a winner — instead of
    keeping a pointer nobody owns."""
    from node_feedparser_spark.plans.pipeline import resolve_alias_ownership

    schema = (
        "entity_id long, canonical_name string, aliases array<string>, "
        "n_mentions long"
    )
    # R's canonical pointer 'S' is NOT in its re-derived surface set; its
    # only surface 'S.' is contested and lost to singleton Y
    v = spark.createDataFrame(
        [(1, "S", ["S."], 3), (2, "S.", ["S."], 9)], schema
    )
    got = {
        r["entity_id"]: (r["canonical_name"], tuple(r["aliases"]))
        for r in resolve_alias_ownership(v).collect()
    }
    assert got[2] == ("S.", ("S.",))
    # R redirects to 'S.' (owned by 2), NOT the dangling 'S'
    assert got[1] == ("S.", ())
