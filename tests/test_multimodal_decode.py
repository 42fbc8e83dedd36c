"""Real media decode (round 3): payloads with genuine PNG/GIF/JPEG magic
bytes decode to their TRUE dimensions (decoder='pil' when PIL is installed,
else 'header'); everything else keeps the deterministic md5 fake — so the
synthetic-corpus oracle lane is unchanged while real images decode for real.
"""

import hashlib
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.multimodal import (
    _decode_one,
    _fake_dims,
    _gif_dims,
    _jpeg_dims,
    _png_dims,
    _try_real_decoder,
    decode_media,
)


def make_png(width: int, height: int) -> bytes:
    """Minimal valid PNG: signature + IHDR + one IDAT row-stream + IEND."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + b"\x7f" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor (enough for dimensions)."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def make_jpeg(width: int, height: int) -> bytes:
    """SOI + APP0 + SOF0 carrying the frame dimensions + EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


@pytest.mark.parametrize(
    "maker,parser,w,h",
    [
        (make_png, _png_dims, 37, 21),
        (make_gif, _gif_dims, 640, 480),
        (make_jpeg, _jpeg_dims, 123, 77),
    ],
)
def test_header_parsers_true_dims(maker, parser, w, h):
    assert parser(maker(w, h)) == (w, h)


def test_header_parsers_reject_nonmedia():
    for blob in (b"", b"hello world", b"\x89PNGno", b"GIF89", b"\xff\xd8\x00"):
        assert _png_dims(blob) is None
        assert _gif_dims(blob) is None
        assert _jpeg_dims(blob) is None


def test_decode_one_real_image_and_fake_fallback():
    mode = _try_real_decoder()
    w, h, nf, dec = _decode_one(make_png(37, 21), mode)
    assert (w, h, nf) == (37, 21, 1)
    assert dec in ("pil", "header")
    # non-media bytes -> deterministic md5 fake
    blob = b"just a transcript turn"
    fw, fh, fnf = _fake_dims(blob)
    dig = hashlib.md5(blob).digest()
    assert (fw, fh, fnf) == (16 + dig[0] * 4, 16 + dig[1] * 4, 1 + dig[2] % 64)
    assert _decode_one(blob, mode) == (fw, fh, fnf, "fake-md5")


def test_decode_media_mixed_batch(spark):
    rows = [
        (1, "image/png", bytearray(make_png(37, 21))),
        (2, "image/gif", bytearray(make_gif(640, 480))),
        (3, "image/jpeg", bytearray(make_jpeg(123, 77))),
        (4, "image/png", bytearray(b"not actually a png")),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in decode_media(media).orderBy("doc_id").collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (37, 21)
    assert (got[2]["width"], got[2]["height"]) == (640, 480)
    assert (got[3]["width"], got[3]["height"]) == (123, 77)
    for d in (1, 2, 3):
        assert got[d]["decoder"] in ("pil", "header")
        assert got[d]["n_frames"] == 1
    # payload 4 is mislabeled non-media -> fake lane, never a crash
    assert got[4]["decoder"] == "fake-md5"
    fw, fh, _ = _fake_dims(b"not actually a png")
    assert (got[4]["width"], got[4]["height"]) == (fw, fh)
    # byte_len is the vectorized lane
    assert got[1]["byte_len"] == len(make_png(37, 21))


def test_decode_media_synthetic_corpus_stays_fake(spark, corpus_path):
    """The sandbox documents are text bytes: every row must take the fake
    lane (keeps the frame_sample/media_decode oracles deterministic)."""
    docs = spark.read.parquet(corpus_path).limit(50)
    media = docs.select(
        F.col("turn_idx").cast("long").alias("doc_id"),
        F.lit("image/png").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    decs = decode_media(media).select("decoder").distinct().collect()
    assert {r["decoder"] for r in decs} == {"fake-md5"}
