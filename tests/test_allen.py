"""Allen interval-algebra classification (operators/timeline.py)."""

from node_feedparser_spark.operators.timeline import (
    ALLEN_RELATIONS,
    allen_relations,
)

# one key per expected relation; A is id 1, B is id 2, rel is A-relative-to-B
CASES = {
    "equals": ((0, 10), (0, 10)),
    "before": ((0, 5), (10, 20)),
    "after": ((30, 40), (10, 20)),
    "meets": ((0, 10), (10, 20)),
    "met_by": ((20, 30), (10, 20)),
    "starts": ((10, 15), (10, 20)),
    "started_by": ((10, 25), (10, 20)),
    "finishes": ((15, 20), (10, 20)),
    "finished_by": ((5, 20), (10, 20)),
    "during": ((12, 18), (10, 20)),
    "contains": ((5, 25), (10, 20)),
    "overlaps": ((5, 15), (10, 20)),
    "overlapped_by": ((15, 25), (10, 20)),
}


def test_all_thirteen_relations(spark):
    rows = []
    for rel, (a, b) in CASES.items():
        rows.append((rel, 1, a[0], a[1]))
        rows.append((rel, 2, b[0], b[1]))
    df = spark.createDataFrame(rows, "key string, iid long, s long, e long")
    out = allen_relations(df)
    got = {r["key"]: (r["a"], r["b"], r["rel"]) for r in out.collect()}
    assert set(CASES) == set(ALLEN_RELATIONS)
    assert got == {rel: (1, 2, rel) for rel in CASES}


def test_pairs_only_within_key_and_ordered(spark):
    df = spark.createDataFrame(
        [("k1", 1, 0, 10), ("k1", 2, 5, 15), ("k1", 3, 20, 30), ("k2", 9, 0, 10)],
        "key string, iid long, s long, e long",
    )
    out = allen_relations(df).collect()
    pairs = {(r["key"], r["a"], r["b"]): r["rel"] for r in out}
    assert pairs == {
        ("k1", 1, 2): "overlaps",
        ("k1", 1, 3): "before",
        ("k1", 2, 3): "before",
    }
