"""Sequential Elo: shared-fold hand cases, batch operator, and the
streaming state-store face (streaming/elo_stream.py) — snapshot parity
with batch and state carry across checkpointed availableNow drains."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from node_feedparser_spark.operators.preference import (
    _r6,
    elo_fold,
    elo_ratings,
)
from node_feedparser_spark.streaming.elo_stream import stream_elo


# ---------------------------------------------------------------------------
# elo_fold (the shared semantics)
# ---------------------------------------------------------------------------


def test_fold_hand_computed_first_game():
    st = elo_fold([(0, "a", "b")])
    # equal ratings -> E = 0.5 -> winner +16, loser -16
    assert st["ratings"] == {"a": 1516.0, "b": 1484.0}
    assert st["games"] == {"a": 1, "b": 1}
    assert st["wins"] == {"a": 1, "b": 0}


def test_fold_is_order_dependent():
    up = elo_fold([(0, "a", "b"), (1, "a", "c")])["ratings"]["a"]
    down = elo_fold([(0, "a", "c"), (1, "a", "b")])["ratings"]["a"]
    # b and c start equal so the end rating matches either way round…
    assert up == down
    st1 = elo_fold([(0, "a", "b"), (1, "b", "a"), (2, "a", "b")])
    st2 = elo_fold([(0, "b", "a"), (1, "a", "b"), (2, "a", "b")])
    # …but a genuine reordering of who-beat-whom history diverges
    assert st1["ratings"] != st2["ratings"]


def test_fold_matches_manual_second_game():
    st = elo_fold([(0, "a", "b"), (1, "a", "b")])
    e = 1.0 / (1.0 + 10.0 ** ((1484.0 - 1516.0) / 400.0))
    assert st["ratings"]["a"] == _r6(1516.0 + 32.0 * (1.0 - e))


def test_fold_skips_replayed_and_self_rows():
    st = elo_fold([(0, "a", "b")])
    st = elo_fold([(0, "a", "b"), (1, "c", "c")], state=st)  # replay + self
    assert st["games"] == {"a": 1, "b": 1}
    assert st["last_seq"] == 1


def test_fold_duplicate_seq_tie_break_deterministic():
    # same seq twice: sorted() falls back to (winner, loser) order
    st1 = elo_fold([(5, "b", "a"), (5, "a", "c")])
    st2 = elo_fold([(5, "a", "c"), (5, "b", "a")])
    assert st1["ratings"] == st2["ratings"]


# ---------------------------------------------------------------------------
# batch operator
# ---------------------------------------------------------------------------


def _comps_pdf(rows):
    return pd.DataFrame(rows, columns=["pool", "seq", "winner", "loser"])


def test_batch_matches_fold_per_pool(spark):
    rows = [
        ("x", 0, "a", "b"),
        ("x", 1, "b", "c"),
        ("x", 2, "a", "c"),
        ("y", 0, "p", "q"),
    ]
    out = elo_ratings(spark.createDataFrame(_comps_pdf(rows))).collect()
    got = {(r["pool"], r["player"]): (r["rating"], r["n_games"], r["wins"])
           for r in out}
    for p in ("x", "y"):
        st = elo_fold([(s, w, l) for pp, s, w, l in rows if pp == p])
        for pl in st["ratings"]:
            assert got[(p, pl)] == (
                st["ratings"][pl], st["games"][pl], st["wins"][pl]
            )
    assert len(got) == 5


# ---------------------------------------------------------------------------
# streaming face
# ---------------------------------------------------------------------------


def _write_part(pdf, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def _drain(spark, in_dir, ckpt, out_dir):
    src = spark.readStream.schema(
        "pool string, seq long, winner string, loser string"
    ).parquet(in_dir)
    q = (
        stream_elo(src)
        .writeStream.foreachBatch(
            lambda b, i: b.withColumn("batch", F.lit(int(i)))
            .write.mode("append")
            .parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()
    # final snapshot per pool = rows from that pool's highest batch id
    keep = got.groupby("pool")["batch"].transform("max") == got["batch"]
    return got[keep].drop(columns=["batch"])


def test_stream_snapshot_matches_batch(spark, tmp_path):
    rows = [
        ("x", 0, "a", "b"),
        ("x", 1, "b", "c"),
        ("x", 2, "a", "c"),
        ("y", 0, "p", "q"),
    ]
    _write_part(_comps_pdf(rows), str(tmp_path / "in" / "p1.parquet"))
    got = _drain(
        spark, str(tmp_path / "in"), str(tmp_path / "ck"),
        str(tmp_path / "out"),
    )
    want = elo_ratings(spark.createDataFrame(_comps_pdf(rows))).toPandas()
    g = got.sort_values(["pool", "player"], ignore_index=True)
    w = want.sort_values(["pool", "player"], ignore_index=True)
    pd.testing.assert_frame_equal(g[w.columns], w)


def test_stream_state_carries_and_never_double_applies(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    first = [("x", 0, "a", "b"), ("x", 1, "a", "b")]
    second = [("x", 2, "b", "a"), ("x", 3, "a", "c")]
    _write_part(_comps_pdf(first), os.path.join(in_dir, "p1.parquet"))
    out1 = _drain(spark, in_dir, ck, out)
    assert set(out1["player"]) == {"a", "b"}
    _write_part(_comps_pdf(second), os.path.join(in_dir, "p2.parquet"))
    out2 = _drain(spark, in_dir, ck, out)
    # the second drain's snapshot equals one continuous fold of all four
    st = elo_fold([(s, w, l) for _, s, w, l in first + second])
    got = {r.player: (r.rating, r.n_games, r.wins) for r in out2.itertuples()}
    assert got == {
        p: (st["ratings"][p], st["games"][p], st["wins"][p])
        for p in st["ratings"]
    }
    # games total 8 (2 per comparison over 4 comparisons): nothing from
    # drain 1 was re-applied in drain 2
    assert sum(r[1] for r in got.values()) == 8
