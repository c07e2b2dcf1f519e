"""Multimodal binary-column plumbing tests (schema, Arrow batch shape,
binary round trip, stubbed real codecs)."""

from __future__ import annotations

import hashlib

import pytest

from jaccard_mapreduce_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(20)], ["doc_id", "text"])
    return MM.attach_fake_media(docs)


def test_media_schema_and_determinism(spark, media):
    rows = {r["doc_id"]: r for r in media.collect()}
    assert media.schema["media"].dataType.simpleString() == "binary"
    assert rows[3]["media"] == MM.fake_media_bytes(3)
    assert rows[3]["media_type"] == "image/x-fake"


def test_decode_meta_roundtrip(spark, media):
    got = {r["doc_id"]: r for r in MM.decode_media_meta(media).collect()}
    for i in range(20):
        assert got[i]["width"] == (i % 48) * 16 + 64
        assert got[i]["height"] == (i % 27) * 16 + 64
        assert got[i]["n_bytes"] == 15 + 16 * (i % 4 + 1)


def test_real_codec_is_stubbed(spark, media):
    with pytest.raises(NotImplementedError, match="not installed"):
        MM.decode_media_meta(media, backend="pil")


def test_features_deterministic(spark, media):
    got = MM.extract_media_features(media, dim=16).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["feat_idx"]] = r["feat_val"]
    digest = hashlib.md5(b"media:7").digest()
    assert by_doc[7] == {j: digest[j] / 255.0 for j in range(16)}
    assert all(len(v) == 16 for v in by_doc.values())


def test_frame_sampling_fanout(spark, media):
    frames = MM.sample_frames(media, frame_size=16, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc_id % 4 + 1 payload repeats of 16 bytes -> that many frames; keep
    # every 2nd
    for i in range(20):
        n_frames = i % 4 + 1
        expect = len(range(0, n_frames, 2))
        assert len(by_doc[i]) == expect
        digest = hashlib.md5(f"media:{i}".encode()).digest()
        assert bytes(by_doc[i][0]["frame"]) == digest


def test_pil_backend_decodes_real_images_or_raises(spark):
    """backend='pil' is a try-import flip: with Pillow it must decode real
    image bytes; without, it must raise NotImplementedError at call time."""
    from pyspark.sql import types as T

    from jaccard_mapreduce_spark.operators.multimodal import (
        _pil_available,
        decode_media_meta,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
        ]
    )
    if not _pil_available():
        df = spark.createDataFrame([(1, bytearray(b"xx"), "image/png")], schema)
        with pytest.raises(NotImplementedError, match="pil"):
            decode_media_meta(df, backend="pil")
        return

    import io

    from PIL import Image

    def png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, bytearray(png(20, 10)), "image/png"),
        (2, bytearray(png(7, 42)), "image/png"),
        (3, bytearray(b"not an image"), "image/png"),  # -> NULL dims
    ]
    got = {
        r["doc_id"]: r
        for r in decode_media_meta(
            spark.createDataFrame(rows, schema), backend="pil"
        ).collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (20, 10)
    assert (got[2]["width"], got[2]["height"]) == (7, 42)
    assert got[3]["width"] is None and got[3]["height"] is None
    assert got[1]["n_bytes"] == len(rows[0][1])


def _png_bytes(width: int, height: int) -> bytes:
    """Minimal valid grayscale PNG built with stdlib only — a REAL image
    any conforming decoder (Pillow included) accepts."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.skipif(not MM._pil_available(), reason="Pillow not installed")
def test_pil_backend_decodes_real_png(spark):
    rows = [(i, _png_bytes(32 + i, 16 + 2 * i), "image/png") for i in range(6)]
    media = spark.createDataFrame(rows, ["doc_id", "media", "media_type"])
    got = {r["doc_id"]: r for r in MM.decode_media_meta(media, backend="pil").collect()}
    for i in range(6):
        assert got[i]["width"] == 32 + i
        assert got[i]["height"] == 16 + 2 * i
        assert got[i]["n_bytes"] == len(rows[i][1])


@pytest.mark.skipif(not MM._pil_available(), reason="Pillow not installed")
def test_pil_backend_nulls_undecodable(spark):
    media = spark.createDataFrame(
        [(0, _png_bytes(8, 8), "image/png"), (1, b"not an image", "image/png")],
        ["doc_id", "media", "media_type"],
    )
    got = {r["doc_id"]: r for r in MM.decode_media_meta(media, backend="pil").collect()}
    assert got[0]["width"] == 8
    assert got[1]["width"] is None and got[1]["height"] is None
