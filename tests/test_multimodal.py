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
