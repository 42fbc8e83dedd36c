"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, Arrow batch shape, partitioning, UDF
signatures) is REAL and tested.  The decode stage (round 3) is now real for
images: payloads whose magic bytes identify PNG / GIF / JPEG are decoded —
via PIL when importable (`decoder='pil'`), else a pure-Python container
header parse (`decoder='header'`: PNG IHDR, GIF logical screen, JPEG SOF
scan — all public file-format knowledge).  Payloads that are NOT
recognizable media (this sandbox's synthetic text bytes, or any undecodable
blob) fall back to the clearly-marked deterministic md5 fake
(`decoder='fake-md5'`), so downstream stages always see true shapes and the
DuckDB oracle can reproduce the fake lane exactly.

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
    """Deterministic fake decode for non-media payloads: dimensions derived
    from content md5 (oracle-reproducible: width = 16 + 4*byte0 of the
    digest, height = 16 + 4*byte1, frames = 1 + byte2 % 64)."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] * 4
    height = 16 + h[1] * 4
    n_frames = 1 + h[2] % 64
    return width, height, n_frames


def _png_dims(b: bytes) -> tuple[int, int] | None:
    """PNG: 8-byte signature, then the IHDR chunk — width/height are the
    two big-endian uint32s at byte offsets 16 and 20 (public PNG spec)."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    return (
        int.from_bytes(b[16:20], "big"),
        int.from_bytes(b[20:24], "big"),
    )


def _gif_dims(b: bytes) -> tuple[int, int] | None:
    """GIF87a/89a: logical-screen width/height are little-endian uint16s at
    offsets 6 and 8."""
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    return (
        int.from_bytes(b[6:8], "little"),
        int.from_bytes(b[8:10], "little"),
    )


# JPEG SOF markers that carry frame dimensions (all SOFn except DHT/DAC/RST)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """JPEG: walk the marker segments from SOI to the first SOFn; height and
    width are big-endian uint16s at payload offsets 3 and 5 of that segment."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length field
            continue
        if i + 4 > n:
            return None
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            return (
                int.from_bytes(b[i + 7 : i + 9], "big"),
                int.from_bytes(b[i + 5 : i + 7], "big"),
            )
        i += 2 + seg_len
    return None


def _try_real_decoder():
    """'pil' when PIL is importable (preferred — full decode), else 'header'
    (pure-Python container header parse, images only)."""
    try:
        from PIL import Image  # noqa: F401

        return "pil"
    except Exception:
        return "header"


def _decode_one(payload: bytes, mode: str) -> tuple[int, int, int, str]:
    """(width, height, n_frames, decoder) for ONE payload.  Real image
    bytes decode for real; anything else gets the deterministic fake."""
    if mode == "pil":
        import io

        from PIL import Image

        try:
            with Image.open(io.BytesIO(payload)) as img:
                return img.width, img.height, getattr(img, "n_frames", 1), "pil"
        except Exception:
            pass  # not an image PIL knows -> header sniff, then fake
    dims = _png_dims(payload) or _gif_dims(payload) or _jpeg_dims(payload)
    if dims is not None:
        return dims[0], dims[1], 1, "header"
    w, h, nf = _fake_dims(payload)
    return w, h, nf, "fake-md5"


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode stage.  Arrow-batched binary in, typed struct out.

    The per-row loop carries ONLY the decode call (intrinsic: each payload
    is one opaque blob); byte_len and the passthrough columns are vectorized
    pandas lanes.  A payload that raises out of every decode path yields
    decoder='error' instead of failing the task (the reference's
    error-resume, /root/reference/lib/feedparser.js:140-154).
    """
    mode = _try_real_decoder()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = []
            for payload in pdf["payload"]:
                try:
                    decoded.append(_decode_one(bytes(payload), mode))
                except Exception:
                    decoded.append((0, 0, 0, "error"))
            w, h, nf, dec = (
                zip(*decoded) if decoded else ((), (), (), ())
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len),
                    "width": pd.Series(w, dtype="int32", index=pdf.index),
                    "height": pd.Series(h, dtype="int32", index=pdf.index),
                    "n_frames": pd.Series(nf, dtype="int32", index=pdf.index),
                    "decoder": pd.Series(dec, dtype="object", index=pdf.index),
                }
            )

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
