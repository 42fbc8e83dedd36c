"""RDFS entailment: the one-pass saturated-schema plan must equal a naive
pure-Python fixpoint evaluation of the rule set on every graph tested."""

import random

import pytest

from node_feedparser_spark.operators.rdfs import rdfs_closure, rdfs_inferred

SCHEMA = [
    ("dog", "subclass_of", "mammal"),
    ("mammal", "subclass_of", "animal"),
    ("cat", "subclass_of", "mammal"),
    ("has_pet", "subprop_of", "knows"),
    ("knows", "subprop_of", "related_to"),
    ("has_pet", "domain", "person"),
    ("has_pet", "range", "animal"),
    ("person", "subclass_of", "agent"),
]

TRIPLES = [
    ("alice", "has_pet", "rex"),
    ("rex", "type", "dog"),
    ("bob", "knows", "alice"),
    ("carol", "likes", "bob"),  # no schema for likes: inert
]


def _python_fixpoint(triples, schema, type_pred="type"):
    """Naive rule application to fixpoint — the independent spec."""
    sp = {(s, o) for s, p, o in schema if p == "subprop_of"}
    sc = {(s, o) for s, p, o in schema if p == "subclass_of"}
    dom = {(s, o) for s, p, o in schema if p == "domain"}
    rng = {(s, o) for s, p, o in schema if p == "range"}
    facts = set(triples)
    while True:
        new = set()
        for x, p, y in facts:
            for a, b in sp:
                if p == a:
                    new.add((x, b, y))
            for a, c in dom:
                if p == a:
                    new.add((x, type_pred, c))
            for a, c in rng:
                if p == a:
                    new.add((y, type_pred, c))
            if p == type_pred:
                for a, b in sc:
                    if y == a:
                        new.add((x, type_pred, b))
        if new <= facts:
            return facts
        facts |= new


def _spark_set(df):
    return set(map(tuple, df.collect()))


def _tri(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_closure_equals_fixpoint(spark):
    got = _spark_set(rdfs_closure(_tri(spark, TRIPLES), SCHEMA))
    assert got == _python_fixpoint(TRIPLES, SCHEMA)


def test_inferred_excludes_asserted(spark):
    got = _spark_set(rdfs_inferred(_tri(spark, TRIPLES), SCHEMA))
    want = _python_fixpoint(TRIPLES, SCHEMA) - set(TRIPLES)
    assert got == want
    # spot-pin the interesting entailments
    assert ("alice", "type", "person") in got        # rdfs2
    assert ("alice", "type", "agent") in got         # rdfs2 + rdfs9
    assert ("rex", "type", "animal") in got          # rdfs3 and rdfs9 path
    assert ("alice", "related_to", "rex") in got     # rdfs7 + rdfs5
    assert ("bob", "related_to", "alice") in got     # rdfs7
    assert not any(p == "likes" and s != "carol" for s, p, _ in got)


def test_subclass_cycle_terminates(spark):
    schema = [("a", "subclass_of", "b"), ("b", "subclass_of", "a")]
    rows = [("x", "type", "a")]
    got = _spark_set(rdfs_closure(_tri(spark, rows), schema))
    assert got == {("x", "type", "a"), ("x", "type", "b")}


def test_unknown_schema_pred_rejected(spark):
    with pytest.raises(ValueError, match="unknown schema"):
        rdfs_closure(_tri(spark, TRIPLES), [("a", "bogus", "b")])


def test_random_graph_parity(spark):
    rng_ = random.Random(11)
    classes = [f"C{i}" for i in range(6)]
    props = [f"p{i}" for i in range(5)]
    nodes = [f"e{i}" for i in range(10)]
    schema = []
    for _ in range(4):
        a, b = rng_.sample(classes, 2)
        schema.append((a, "subclass_of", b))
    for _ in range(3):
        a, b = rng_.sample(props, 2)
        schema.append((a, "subprop_of", b))
    schema.append((rng_.choice(props), "domain", rng_.choice(classes)))
    schema.append((rng_.choice(props), "range", rng_.choice(classes)))
    rows = sorted(
        {
            (rng_.choice(nodes), rng_.choice(props + ["type"]),
             rng_.choice(nodes + classes))
            for _ in range(60)
        }
    )
    got = _spark_set(rdfs_closure(_tri(spark, rows), schema))
    assert got == _python_fixpoint(rows, schema)
