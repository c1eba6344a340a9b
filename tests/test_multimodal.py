"""Multimodal operator tests: media table schema, Arrow-batched feature
extraction against a hashlib golden model, and the decode stubs' contract."""

from __future__ import annotations

import hashlib

import pytest

from blockchain_etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    HAS_PIL,
    decode_audio,
    decode_image,
    decode_video,
    extract_media_features,
    media_from_documents,
)
from blockchain_etl_spark.sources.testdata import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return media_from_documents(load_table(spark, SF_DIR, "documents")).cache()


def test_media_schema_and_metadata(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "media_type",
        "content",
        "meta",
    ]
    rows = media.collect()
    assert rows
    for r in rows:
        assert r.media_type in ("image", "audio", "video")
        if r.media_type == "image":
            assert r.meta.width is not None and r.meta.height is not None
            assert r.meta.sample_rate is None and r.meta.n_frames is None
        elif r.media_type == "audio":
            assert r.meta.sample_rate == 16000
        else:
            assert r.meta.n_frames is not None


def test_feature_extract_matches_hashlib_golden(media):
    feats = {r.media_id: r for r in extract_media_features(media).collect()}
    assert extract_media_features(media).schema == FEATURE_SCHEMA
    for r in media.collect():
        content = bytes(r.content)
        h = hashlib.md5(content).hexdigest()
        f = feats[r.media_id]
        assert f.byte_len == len(content)
        assert f.fp == int(h[:8], 16)
        assert f.feature_sig == "-".join(
            str(int(h[8 * i : 8 * i + 8], 16) % 1000) for i in range(4)
        )


def test_decode_stubs_raise_without_libs():
    with pytest.raises(NotImplementedError):
        decode_audio(b"abc")
    with pytest.raises(NotImplementedError):
        decode_video(b"abc")
    if not HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"abc")


def test_fit_box_exact_integer_aspect_math():
    from blockchain_etl_spark.operators.multimodal import _fit_box

    assert _fit_box(32, 20, 64, 64) == (32, 20)  # no upscale
    assert _fit_box(640, 480, 64, 64) == (64, 48)  # width-bound
    assert _fit_box(480, 640, 64, 64) == (48, 64)  # height-bound
    assert _fit_box(10000, 3, 64, 64) == (64, 1)  # floor clamps to >= 1
    assert _fit_box(64, 64, 64, 64) == (64, 64)  # exact fit


def test_resize_images_schema_and_determinism(spark):
    from blockchain_etl_spark.operators.multimodal import (
        HAS_PIL,
        RESIZE_SCHEMA,
        media_from_documents,
        resize_images,
    )
    from blockchain_etl_spark.sources.testdata import load_table

    media = media_from_documents(load_table(spark, SF_DIR, "documents"))
    out = resize_images(media)
    assert out.schema == RESIZE_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    imgs = {r.media_id: r for r in media.collect() if r.media_type == "image"}
    assert set(rows) == set(imgs)
    for mid, r in rows.items():
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64
        if not HAS_PIL:
            assert bytes(r.thumb) == hashlib.md5(bytes(imgs[mid].content)).digest()
