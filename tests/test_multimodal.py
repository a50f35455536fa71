"""Multimodal plumbing tests: binary schema, stubbed codec boundary,
deterministic fake decode, mapInPandas batch shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ut_data_engineering_group_project_2022_spark.operators import multimodal


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} " * (i + 1), "en", "web", 0) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return multimodal.attach_binary_payload(docs)


def test_payload_schema(media):
    fields = {f.name: f.dataType for f in media.schema.fields}
    assert isinstance(fields["content"], T.BinaryType)
    assert isinstance(fields["meta"], T.StructType)
    assert {r["media_type"] for r in media.collect()} == {"image", "audio", "video"}


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x00\x01", "image")


def test_fake_decode_deterministic():
    a = multimodal.fake_decode(b"payload", "image")
    b = multimodal.fake_decode(b"payload", "image")
    assert a == b
    assert a["pseudo_width"] == hashlib.md5(b"payload").digest()[0] + 1


def test_media_features_match_hashlib(media):
    rows = {r["doc_id"]: r for r in multimodal.media_features(media).collect()}
    src = {r["doc_id"]: bytes(r["content"]) for r in media.collect()}
    for doc_id, payload in src.items():
        assert rows[doc_id]["checksum"] == hashlib.md5(payload).hexdigest()
        assert rows[doc_id]["byte_len"] == len(payload)


def test_resize_only_touches_images(media):
    out = {r["doc_id"]: r for r in multimodal.resize_image(media, 64).collect()}
    src = {r["doc_id"]: (r["media_type"], bytes(r["content"])) for r in media.collect()}
    for doc_id, (mt, payload) in src.items():
        got = bytes(out[doc_id]["content"])
        if mt == "image":
            assert len(got) == 64
            assert got[: min(64, len(payload))] == payload[:64]
        else:
            assert got == payload


def test_frame_sampling(media):
    frames = multimodal.sample_frames(media, every=4).collect()
    src = {
        r["doc_id"]: bytes(r["content"])
        for r in media.collect()
        if r["media_type"] == "video"
    }
    assert {r["doc_id"] for r in frames} == set(src)
    for r in frames:
        payload = src[r["doc_id"]]
        i = r["frame_idx"]
        assert i % 4 == 0
        expected = payload[i * 16 : (i + 1) * 16].hex()
        assert r["frame_hex"] == expected
    # count: every 4th of len//16 frames per video doc
    for doc_id, payload in src.items():
        n = len([r for r in frames if r["doc_id"] == doc_id])
        assert n == len(range(0, len(payload) // 16, 4))


def test_batch_shape_survives_partitioning(media):
    """mapInPandas must produce the same result under any partitioning
    (no per-partition state leakage)."""
    one = multimodal.media_features(media.coalesce(1)).collect()
    many = multimodal.media_features(media.repartition(5)).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(one, key=key) == sorted(many, key=key)
