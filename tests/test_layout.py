"""Z-order keys: interleave math, locality property, validation."""

import pytest

from pyspark.sql import functions as F

from node_feedparser_spark.operators.layout import (
    zorder_key,
    zorder_locality_stats,
)


def _df(spark, rows, cols=("x", "y")):
    return spark.createDataFrame(rows, list(cols))


def _interleave(xc, yc, bits):
    z = 0
    for i in range(bits):
        z |= ((xc >> i) & 1) << (2 * i)
        z |= ((yc >> i) & 1) << (2 * i + 1)
    return z


def test_hand_interleave_on_unit_grid(spark):
    # x, y in 0..3 with bits=2: cells equal raw values (min 0, max 3 maps
    # v -> min(floor(v/3*4), 3) = v for v in {0,..,3}? floor(1/3*4)=1,
    # floor(2/3*4)=2, floor(3/3*4)->4 capped 3) — verify against a pure
    # Python morton code
    rows = [(x, y) for x in range(4) for y in range(4)]
    out = {
        (r["x"], r["y"]): r["zkey"]
        for r in zorder_key(_df(spark, rows), ["x", "y"], bits=2).collect()
    }
    for (x, y), z in out.items():
        cx = min(int((x - 0) / 3 * 4), 3)
        cy = min(int((y - 0) / 3 * 4), 3)
        assert z == _interleave(cx, cy, 2), (x, y)


def test_z_range_preserves_2d_locality(spark):
    # points on a 64x64 grid; pack into 64 z-files: every file's x-range
    # AND y-range must span <= a quarter of the domain (a lexicographic
    # sort would give full-domain y-ranges for most x-slices)
    rows = [(x, y) for x in range(64) for y in range(64)]
    z = zorder_key(_df(spark, rows), ["x", "y"], bits=6)
    stats = zorder_locality_stats(
        z, ["x", "y"], n_files=64, bits=6
    ).collect()
    assert sum(r["n_rows"] for r in stats) == 64 * 64
    for r in stats:
        assert r["x_max"] - r["x_min"] <= 16
        assert r["y_max"] - r["y_min"] <= 16


def test_lexicographic_sort_fails_the_same_locality_bar(spark):
    # the contrast that justifies z-order: same grid, files = equal ranges
    # of the lexicographic key x*64+y -> y spans the whole domain
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = _df(spark, rows).withColumn(
        "lex", (F.col("x") * 64 + F.col("y")).cast("long")
    )
    stats = (
        df.select((F.col("lex") / 64).cast("long").alias("file_id"), "x", "y")
        .groupBy("file_id")
        .agg(F.min("y").alias("y_min"), F.max("y").alias("y_max"))
        .collect()
    )
    assert all(r["y_max"] - r["y_min"] == 63 for r in stats)


def test_degenerate_column_collapses_to_zero_bits(spark):
    rows = [(1, y) for y in range(8)]
    out = zorder_key(_df(spark, rows), ["x", "y"], bits=3).collect()
    # x constant -> x-cells all 0 -> zkey even-bit-free: z = interleave(0, cy)
    for r in out:
        assert r["zkey"] == _interleave(0, min(int(r["y"] / 7 * 8), 7), 3)


def test_validation(spark):
    df = _df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        zorder_key(df, ["x"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=0)
    # 2 cols x 16 bits = 32 <= 60: fine
    zorder_key(df, ["x", "y"], bits=16)
    with pytest.raises(ValueError):
        zorder_key(
            _df(spark, [(1, 2, 3, 4, 5)], cols=list("abcde")),
            list("abcde"),
            bits=16,  # 80 bits > 60
        )
