"""Distributed canonicalization (LSH + CC) vs the exact pure-Python oracle."""

from pyspark.sql import functions as F

from node_feedparser_spark.operators.canonicalize import (
    canonicalize,
    lsh_candidate_pairs,
)
from node_feedparser_spark.operators.components import connected_components
from node_feedparser_spark.reference_extract import canonicalize_entities, extract_corpus


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    labels = {r.node: r.component for r in connected_components(edges).collect()}
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10
    assert 20 not in labels  # self-loop dropped; singleton handled by caller


def test_connected_components_chain(spark):
    # path graph 0-1-2-...-9: worst case for naive propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    labels = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(labels.values()) == {0}
    assert set(labels.keys()) == set(range(10))


def test_lsh_finds_fuzzy_pairs(spark):
    keys = spark.createDataFrame(
        [("kubernetes",), ("kuberrnetes",), ("javascript",), ("typescript",)],
        "key string",
    )
    pairs = {
        (r.key_a, r.key_b) for r in lsh_candidate_pairs(keys).collect()
    }
    assert ("kubernetes", "kuberrnetes") in pairs


def test_canonicalize_matches_oracle(spark, corpus_pdf):
    """The distributed grouping must equal the exact O(n^2) oracle grouping
    on the fixture corpus (same partition of surface forms, same entity IDs,
    same canonical names)."""
    ref = extract_corpus(corpus_pdf.to_dict("records"))
    oracle_ids, oracle_vertices = canonicalize_entities(ref.triples)

    counts: dict[str, int] = {}
    for t in ref.triples:
        for s in (t["subj"], t["obj"]):
            counts[s] = counts.get(s, 0) + 1
    surfaces = spark.createDataFrame(
        sorted(counts.items()), "surface string, n_mentions long"
    )
    mapping, vertices = canonicalize(spark, surfaces)
    got_ids = {r.surface: r.entity_id for r in mapping.collect()}
    assert got_ids == oracle_ids

    got_v = {
        r.entity_id: (r.canonical_name, tuple(r.aliases), r.n_mentions)
        for r in vertices.collect()
    }
    want_v = {
        v["entity_id"]: (v["canonical_name"], tuple(v["aliases"]), v["n_mentions"])
        for v in oracle_vertices
    }
    assert got_v == want_v
