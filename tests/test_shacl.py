"""shacl_validate: SHACL-lite cardinality / range / pattern constraint
checking over the triple shape, pinned on a toy graph where every
violation is hand-computable."""

import pytest

from node_feedparser_spark.operators.shacl import shacl_validate

TOY = [
    ("c1", "in_nation", "n1"),
    ("c1", "placed", "o1"),
    ("c1", "placed", "o2"),
    ("c1", "placed", "o3"),
    ("c2", "in_nation", "n2"),
    # c2 placed nothing; c3 appears only as an object
    ("x1", "mentions", "c3"),
    ("n1", "in_region", "r1"),
    ("n2", "in_region", "BAD"),  # range violation (prefix B, not r)
    ("c1", "code", "AB-12"),
    # pattern violation; prefix 'x' so it doesn't land in the 'n' namespace
    # (namespace membership is BY PREFIX — an object 'n...' would become a
    # focus node of every n-targeted cardinality shape, by design)
    ("c2", "code", "xbad"),
]


def _v(spark, constraints, rows=TOY):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = shacl_validate(df, constraints)
    assert out.columns == ["focus", "pred", "code", "detail"]
    return set(map(tuple, out.collect()))


def test_min_count_includes_object_only_entities(spark):
    got = _v(spark, [{"target_prefix": "c", "pred": "placed", "min_count": 1}])
    # c2 has no placed; c3 is only ever an object but is still a focus node
    assert got == {
        ("c2", "placed", "min_count", "0"),
        ("c3", "placed", "min_count", "0"),
    }


def test_max_count(spark):
    got = _v(spark, [{"target_prefix": "c", "pred": "placed", "max_count": 2}])
    assert got == {("c1", "placed", "max_count", "3")}


def test_min_and_max_in_one_constraint(spark):
    got = _v(
        spark,
        [{"target_prefix": "c", "pred": "placed", "min_count": 1, "max_count": 2}],
    )
    assert got == {
        ("c1", "placed", "max_count", "3"),
        ("c2", "placed", "min_count", "0"),
        ("c3", "placed", "min_count", "0"),
    }


def test_range_prefix(spark):
    got = _v(
        spark, [{"target_prefix": "n", "pred": "in_region", "range_prefix": "r"}]
    )
    assert got == {("n2", "in_region", "range", "BAD")}


def test_obj_pattern_is_fully_anchored(spark):
    got = _v(
        spark,
        [{"target_prefix": "c", "pred": "code", "obj_pattern": "[A-Z]{2}-[0-9]+"}],
    )
    # 'xbad' fails; 'AB-12' passes only because the regex is anchored both
    # ends (an unanchored match would also pass 'xxAB-12xx'-style objects)
    assert got == {("c2", "code", "pattern", "xbad")}


def test_satisfied_constraints_emit_nothing(spark):
    got = _v(
        spark,
        [
            {"target_prefix": "n", "pred": "in_region", "min_count": 1},
            {"target_prefix": "c", "pred": "in_nation", "range_prefix": "n"},
        ],
    )
    # c3 (object-only) has no in_region but prefix 'n' constraint doesn't
    # target it; n1/n2 both have exactly one in_region
    assert got == set()


def test_distinct_input_flag_equivalence(spark):
    cons = [
        {"target_prefix": "c", "pred": "placed", "min_count": 1, "max_count": 2},
        {"target_prefix": "n", "pred": "in_region", "range_prefix": "r"},
    ]
    df = spark.createDataFrame(TOY, "subj string, pred string, obj string")
    fast = shacl_validate(df, cons, distinct_input=True)
    slow = shacl_validate(df, cons)
    assert set(map(tuple, fast.collect())) == set(map(tuple, slow.collect()))
    # duplicated input without the flag still dedupes value violations
    dup = shacl_validate(
        spark.createDataFrame(TOY + TOY, "subj string, pred string, obj string"),
        [{"target_prefix": "n", "pred": "in_region", "range_prefix": "r"}],
    )
    assert dup.count() == 1


def test_empty_constraints_rejected(spark):
    with pytest.raises(ValueError, match="empty"):
        shacl_validate(None, [])
