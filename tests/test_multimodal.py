"""Multimodal-column plumbing (X4): binary payloads + typed metadata,
Arrow-batched feature extraction (stubbed decode), frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from streaming_data_spark.operators import multimodal as mm


@pytest.fixture()
def media_df(spark):
    rows = [
        Row(media_id=1, kind="image", content=b"\x89PNG fake bytes",
            meta=Row(mime="image/png", width=64, height=64, duration_ms=None, n_bytes=None)),
        Row(media_id=2, kind="video", content=b"\x00\x00ftyp fake",
            meta=Row(mime="video/mp4", width=320, height=240, duration_ms=3500, n_bytes=None)),
        Row(media_id=3, kind="audio", content=None,
            meta=Row(mime="audio/wav", width=None, height=None, duration_ms=2000, n_bytes=None)),
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)


def test_attach_media_meta(media_df):
    out = {r.media_id: r.meta.n_bytes for r in mm.attach_media_meta(media_df).collect()}
    assert out[1] == len(b"\x89PNG fake bytes")
    assert out[3] is None  # null payload stays null-sized


def test_extract_features_deterministic(media_df):
    a = {r.media_id: r.features for r in mm.extract_features(media_df).collect()}
    b = {r.media_id: r.features for r in mm.extract_features(media_df).collect()}
    assert a == b
    assert len(a[1]) == mm.FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in a[1])
    assert a[1] != a[2]  # different bytes, different features


def test_extract_features_real_decoder_stubbed(media_df):
    out = mm.extract_features(media_df, decoder="pil")
    with pytest.raises(Exception, match="Pillow"):
        out.collect()


def test_sample_frames(media_df):
    frames = mm.sample_frames(media_df, every_ms=1000).collect()
    # video is 3500ms → offsets 0,1000,2000,3000
    assert [r.frame_ms for r in frames] == [0, 1000, 2000, 3000]
    assert all(r.media_id == 2 for r in frames)


def test_resize_images_plumbing(media_df):
    """Resize: images only, deterministic payload scaled to the target
    dims, metadata columns populated; real kernel honestly stubbed."""
    out = {r.media_id: r for r in mm.resize_images(media_df, 32, 16).collect()}
    img_ids = {r.media_id for r in media_df.filter("kind = 'image'").collect()}
    assert set(out) == img_ids
    row = out[min(img_ids)]
    assert (row.width, row.height) == (32, 16)
    assert len(row.content) == 32 * 16 // 64
    again = {r.media_id: bytes(r.content) for r in mm.resize_images(media_df, 32, 16).collect()}
    assert {k: bytes(v.content) for k, v in out.items()} == again

    with pytest.raises(Exception, match="Pillow"):
        mm.resize_images(media_df, 8, 8, decoder="pil").collect()
