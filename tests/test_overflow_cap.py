"""MAX_BUFFER_LENGTH analog (reference lib/feedparser.js:82-90): turn
text over the byte cap is clamped before extraction — triples still come
from the surviving prefix, one 'overflow:<bytes>' ERROR_PRED row flows to
the metrics side channel, rows below the cap are byte-identical to an
uncapped run, and strict mode aborts like sax's unrecovered buffer error.
"""

import glob

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.extract import (
    ERROR_PRED,
    MAX_TEXT_BYTES,
    ExtractionError,
    _clamp_overflow,
    extract_triples,
)
from node_feedparser_spark.plans.pipeline import build_kg
from node_feedparser_spark.sources.transcripts import read_transcripts


def _turns(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool"]
        ).assign(ts=pd.Timestamp("2026-01-01").as_unit("us")),
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_default_cap_is_reference_16mb():
    assert MAX_TEXT_BYTES == 16 * 1024 * 1024


def test_overflow_clamps_and_emits_error_row(spark):
    big = "Spark uses Arrow. " + "x" * 200 + " Kafka is a Broker."
    turns = _turns(
        spark,
        [
            ("c1", 0, "user", big, None),
            ("c1", 1, "user", "Flink uses Arrow", None),
        ],
    )
    # cap cuts the mega-turn right after the first sentence
    out = extract_triples(turns, max_text_bytes=64).toPandas()
    errs = out[out["pred"] == ERROR_PRED]
    assert len(errs) == 1
    assert errs.iloc[0]["conv_id"] == "c1" and errs.iloc[0]["turn_idx"] == 0
    assert errs.iloc[0]["obj"] == f"overflow:{len(big.encode('utf-8'))}"
    ok = out[out["pred"] != ERROR_PRED]
    # the clamped prefix still extracts (sax resumes after the error)
    t0 = ok[ok["turn_idx"] == 0]
    assert ("Spark", "uses") in set(map(tuple, t0[["subj", "pred"]].values))
    # the post-cap tail is gone
    assert "Broker" not in set(ok["obj"])
    # rows below the cap are untouched vs an uncapped run
    uncapped = extract_triples(turns).toPandas()
    below = ok[ok["turn_idx"] == 1].reset_index(drop=True)
    below_unc = uncapped[uncapped["turn_idx"] == 1].reset_index(drop=True)
    pd.testing.assert_frame_equal(below, below_unc)


def test_overflow_cap_none_is_unlimited(spark):
    big = "Spark uses Arrow. " + "x" * 5000
    turns = _turns(spark, [("c1", 0, "user", big, None)])
    out = extract_triples(turns, max_text_bytes=None).toPandas()
    assert (out["pred"] != ERROR_PRED).all()


def test_overflow_fail_fast_raises(spark):
    turns = _turns(spark, [("c1", 0, "user", "y" * 100, None)])
    with pytest.raises(Exception, match="overflow"):
        extract_triples(turns, fail_fast=True, max_text_bytes=64).collect()
    assert ExtractionError  # the raised class, re-wrapped by Spark


def test_clamp_cuts_on_codepoint_boundary():
    # 3-byte codepoints straddling the cap: the split trailing char drops
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["€" * 40],  # 120 UTF-8 bytes
            "tool": [None],
        }
    )
    clamped, overflow = _clamp_overflow(pdf, 100, fail_fast=False)
    assert overflow is not None and overflow.iloc[0]["obj"] == "overflow:120"
    t = clamped.iloc[0]["text"]
    assert t == "€" * 33  # 99 bytes; the split 34th char dropped
    assert len(t.encode("utf-8")) <= 100


def test_pipeline_survives_mega_turn(spark, tmp_path):
    """End-to-end A6 discipline at the default 16 MB cap: a 100 MB turn
    flows through build_kg without failing any task, lands one overflow
    row in the metrics error channel, and every other turn's triples are
    exactly the no-mega-turn build's."""
    mega = "Spark uses Arrow. " + ("lorem ipsum " * (100 * 1024 * 1024 // 12))
    assert len(mega.encode()) > 100 * 1024 * 1024
    base_rows = [
        ("ok-1", 0, "user", "Spark uses Arrow", None),
        ("ok-1", 1, "assistant", "Kafka is a Broker", "search"),
        ("ok-2", 0, "user", "Flink resembles Spark", None),
    ]

    def write(path, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "conv_id": pa.array(cols[0], type=pa.string()),
                    "turn_idx": pa.array(cols[1], type=pa.int32()),
                    "role": pa.array(cols[2], type=pa.string()),
                    "text": pa.array(cols[3], type=pa.string()),
                    "tool": pa.array(cols[4], type=pa.string()),
                    "ts": pa.array(
                        list(range(len(rows))), type=pa.timestamp("us")
                    ),
                }
            ),
            path,
        )

    mega_in = str(tmp_path / "mega.parquet")
    plain_in = str(tmp_path / "plain.parquet")
    write(mega_in, base_rows + [("mega-1", 0, "user", mega, None)])
    write(plain_in, base_rows)

    summary = build_kg(
        spark, mega_in, str(tmp_path / "kg"), n_buckets=2, resume=False
    )
    assert summary["n_triples"] >= 1

    def triples(out_dir):
        files = glob.glob(f"{out_dir}/triples/**/*.parquet", recursive=True)
        df = pd.concat(pq.read_table(f).to_pandas() for f in files)
        return set(
            map(
                tuple,
                df[["conv_id", "turn_idx", "subj", "pred", "obj"]].values,
            )
        )

    got = triples(str(tmp_path / "kg"))
    # the mega turn's prefix still extracted before the cap
    assert any(t[0] == "mega-1" and t[3] == "uses" for t in got)
    # overflow error row landed in the metrics channel
    err_files = glob.glob(
        f"{tmp_path}/kg/metrics/**/*.parquet", recursive=True
    )
    errs = pd.concat(pq.read_table(f).to_pandas() for f in err_files)
    assert (errs.get("n_errors") is not None and errs["n_errors"].sum() >= 1)
    # every non-mega turn extracts identically to a build without the mega
    build_kg(spark, plain_in, str(tmp_path / "kg2"), n_buckets=2, resume=False)
    want_plain = triples(str(tmp_path / "kg2"))
    assert {t for t in got if t[0] != "mega-1"} == want_plain
