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


def test_cc_local_and_distributed_agree(spark):
    """The driver-side union-find fast path and the large-star/small-star
    loop must assign identical labels on a random-ish graph."""
    import random

    rng = random.Random(1234)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {
        r.node: r.component
        for r in connected_components(df, local_threshold=10**6).collect()
    }
    dist = {
        r.node: r.component
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert local == dist and local


def test_jvm_columns_match_python_spec(spark):
    """entity_hash_col / char_shingles_col / jaccard_col are JVM-side
    re-expressions of the pure-Python spec functions — parity must be exact
    (the oracle is defined by the Python versions)."""
    from node_feedparser_spark.functions.normalize import (
        char_shingles,
        entity_hash,
        jaccard,
    )
    from node_feedparser_spark.operators.canonicalize import (
        char_shingles_col,
        entity_hash_col,
        jaccard_col,
    )

    keys = [
        "kubernetes", "a", "ab", "abc", "postgres 12", "café über",
        "кубернетес", "x" * 50, "with  double  spaces",
    ]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    rows = df.select(
        "key",
        entity_hash_col("key").alias("h"),
        char_shingles_col("key").alias("sh"),
    ).collect()
    for r in rows:
        assert r["h"] == entity_hash(r["key"]), r["key"]
        assert set(r["sh"]) == char_shingles(r["key"]), r["key"]

    pairs = [(a, b) for a in keys[:5] for b in keys[:5]]
    pdf = spark.createDataFrame(pairs, "a string, b string")
    for r in pdf.select("a", "b", jaccard_col("a", "b").alias("j")).collect():
        want = jaccard(char_shingles(r["a"]), char_shingles(r["b"]))
        assert abs(r["j"] - want) < 1e-12, (r["a"], r["b"])


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
