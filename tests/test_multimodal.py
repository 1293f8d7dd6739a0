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
    # image/bmp, not image/png: PNG decodes for real since round 10,
    # and these opaque bytes are not a valid container of anything —
    # the stub path ignores mime; the real path must raise.
    rows = [
        (0, b"\x00\x01\x02\x03" * 100, "image/bmp", 10, 10),
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
    # image/jpeg decodes for REAL since round 12, so its garbage row
    # raises the decoder's own container validation ("not a JPEG
    # payload") rather than the plug-point NotImplementedError that
    # still covers bmp/mp4 — either way the real path must raise
    # loudly instead of fabricating features from opaque bytes.
    with pytest.raises(
        Exception,
        match="NotImplementedError|codec|not a JPEG payload|unsupported",
    ):
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


def test_real_codec_decodes_uncompressed_formats(spark):
    """decode_stub=False is REAL for uncompressed mimes: PPM P6 decodes
    via its own header (comments honored), raw RGB via metadata, and
    features come from PIXELS, not container bytes (the PPM header
    would skew byte statistics)."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PPM_MIME,
        RAW_RGB_MIME,
        extract_features,
    )

    # 2x2 PPM: pixels 10, 20, 30, 200 on every channel.
    px = np.array(
        [[[10] * 3, [20] * 3], [[30] * 3, [200] * 3]], dtype=np.uint8
    )
    ppm = b"P6\n# comment\n2 2\n255\n" + px.tobytes()
    raw = px.tobytes()
    rows = [(1, ppm, PPM_MIME, 2, 2), (2, raw, RAW_RGB_MIME, 2, 2)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in extract_features(media, decode_stub=False).collect()
    }
    for mid in (1, 2):
        assert out[mid].feat_mean == pytest.approx((10 + 20 + 30 + 200) / 4)
        assert out[mid].feat_max == 200.0


def test_real_codec_still_raises_for_compressed(spark):
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    # Baseline JPEG decodes for real since r12 and the progressive DC
    # band since r13 (operators/jpeg.py), so the honest-plug-point pin
    # moves WITH the boundary: a progressive frame whose scan carries
    # AC coefficients (Ss/Se 0..63 — what a real SOF2 encoder emits)
    # must raise through the real-decode path — and a truncated/
    # garbage JPEG must fail loudly too, never shear.
    import struct as st
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_gray_dc,
    )

    payload = bytearray(encode_jpeg_gray_dc(np.array([[1]])))
    i = bytes(payload).index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    media = spark.createDataFrame(
        [
            (1, bytes(payload), "image/jpeg", 8, 8),
            (2, b"\xff\xd8\xff\xe0....", "image/jpeg", 4, 4),
        ],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="AC scans|plug-point|truncated"):
        extract_features(
            media.filter("media_id = 1"), decode_stub=False
        ).collect()
    with pytest.raises(Exception, match="truncated|marker"):
        extract_features(
            media.filter("media_id = 2"), decode_stub=False
        ).collect()


def test_real_resize_roundtrip(spark):
    """Real nearest-neighbor resize: a 4x4 quadrant image downsized to
    2x2 keeps one exact source pixel per quadrant, and the output
    re-encodes in the source container (PPM header + pixels)."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PPM_MIME,
        decode_rgb,
        resize_media,
    )

    quad = np.zeros((4, 4, 3), dtype=np.uint8)
    quad[:2, :2] = 10
    quad[:2, 2:] = 20
    quad[2:, :2] = 30
    quad[2:, 2:] = 40
    ppm = b"P6\n4 4\n255\n" + quad.tobytes()
    media = spark.createDataFrame([(1, ppm, PPM_MIME, 4, 4)], MEDIA_SCHEMA)
    out = resize_media(media, 2, 2, decode_stub=False).collect()[0]
    assert (out.width, out.height) == (2, 2)
    arr = decode_rgb(bytes(out.payload), PPM_MIME)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0, 0] == 10 and arr[0, 1, 0] == 20
    assert arr[1, 0, 0] == 30 and arr[1, 1, 0] == 40


def test_wav_decode_walks_unknown_and_odd_chunks():
    """The RIFF parser must skip unknown chunks (LIST metadata is
    routine in real WAV files) and honor word alignment for odd-size
    chunks — a naive fmt-at-12/data-at-36 layout assumption shifts
    every sample."""
    import struct

    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        decode_pcm,
    )

    samples = np.array([1, -2, 3], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = b"\x07"  # 1-byte chunk -> needs a pad byte before the next
    body = (
        b"junk" + struct.pack("<I", len(odd)) + odd + b"\x00"  # pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    s, rate, channels = decode_pcm(payload)
    assert (s == samples).all() and rate == 8000 and channels == 1


def test_wav_compressed_and_multichannel_raise(spark):
    """Non-PCM formats raise from the decoder (the ffmpeg plug-point);
    stereo raises from the feature extractor (downmix unimplemented,
    never silently averaged)."""
    import struct

    import numpy as np
    import pytest

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        audio_features,
        decode_pcm,
        encode_wav,
    )

    # fmt says IEEE float (3) -> decoder refuses.
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError, match="PCM16"):
        decode_pcm(payload)

    # Stereo container parses but features refuse to downmix.
    stereo = encode_wav(np.array([1, 2, 3, 4], dtype="<i2"), 8000)
    stereo = stereo.replace(
        struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
        struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16),
    )
    media = spark.createDataFrame(
        [(1, stereo, "audio/x-wav")], "media_id long, payload binary, mime string"
    )
    with pytest.raises(Exception, match="downmix"):
        audio_features(media).collect()


def test_wav_feature_math_matches_hand_computation(spark):
    """Deterministic waveform -> exact integer features: peak, zero
    crossings, and rms from the sum of squares, cross-checked by hand."""
    import math

    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        audio_features,
        encode_wav,
    )

    s = np.array([100, -200, 300, 0, -5], dtype="<i2")
    media = spark.createDataFrame(
        [(7, encode_wav(s, 16000), "audio/x-wav")],
        "media_id long, payload binary, mime string",
    )
    row = audio_features(media).collect()[0]
    assert row.n_samples == 5 and row.sample_rate == 16000
    assert row.duration_ms == 5 * 1000.0 / 16000
    assert row.peak == 300
    # sign flips: +100/-200, -200/+300, +300/+0 (0 counts nonneg: no),
    # 0/-5 -> 3 crossings
    assert row.zero_crossings == 3
    assert row.rms == round(math.sqrt((100**2 + 200**2 + 300**2 + 25) / 5), 6)


def test_wav_malformed_containers_fail_cleanly():
    """Malformed-but-RIFF containers must hit the codec's stated error
    contract (ValueError / NotImplementedError), never ZeroDivision or
    struct/numpy internals: short fmt chunk, zero sample rate, and an
    odd-length data chunk (trailing partial sample dropped)."""
    import struct

    import pytest

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        decode_pcm,
    )

    def wav(fmt_body, data):
        body = (
            b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + (b"\x00" if len(fmt_body) % 2 else b"")
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    with pytest.raises(ValueError, match="truncated"):
        decode_pcm(wav(struct.pack("<HHIH", 1, 1, 8000, 16), b""))
    with pytest.raises(ValueError, match="sample rate"):
        decode_pcm(wav(struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16), b""))
    s, rate, ch = decode_pcm(
        wav(struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16), b"\x01\x00\x02")
    )
    assert list(s) == [1] and rate == 8000  # odd tail byte dropped
