"""Multimodal plumbing: binary payloads through mapInPandas with a
deterministic stubbed decode (real codecs not in the container)."""

from __future__ import annotations

import hashlib

import pytest

from supplier_performance_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x00\x01\x02\x03" * 100, "image/png", 10, 10),
        (1, b"\xff\xfe" * 50, "image/jpeg", 8, 8),
        (2, None, "audio/wav", None, None),
        (10, b"abc", "video/mp4", 1, 1),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_deterministic(media):
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert out[0].n_bytes == 400
    assert out[0].checksum == hashlib.md5(b"\x00\x01\x02\x03" * 100).hexdigest()
    assert out[0].feat_mean == pytest.approx(1.5)
    assert out[0].feat_max == 3.0
    assert out[2].n_bytes == 0  # NULL payload handled
    assert out[2].checksum == hashlib.md5(b"").hexdigest()


def test_real_codec_path_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, decode_stub=False).collect()


def test_frame_sample(media):
    ids = sorted(r.media_id for r in frame_sample(media, 10).collect())
    assert ids == [0, 10]


def test_resize_scales_payload_and_metadata(media):
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        resize_media,
    )

    out = {r.media_id: r for r in resize_media(media, 5, 5).collect()}
    # Metadata updated on every row; payload shrinks proportionally to
    # the pixel ratio (10x10 -> 5x5 keeps 1/4 of 400 bytes).
    assert all(r.width == 5 and r.height == 5 for r in out.values())
    assert len(out[0].payload) == 100
    assert bytes(out[0].payload) == (b"\x00\x01\x02\x03" * 100)[:100]
    assert len(out[10].payload) == 3  # upscale never pads past source
    assert len(out[2].payload) == 0  # NULL payload stays empty
