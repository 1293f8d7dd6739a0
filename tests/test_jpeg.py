"""Baseline JPEG codec tests (r12 — the entropy-coded plug-point
becomes partial real coverage; operators/jpeg.py docstring states the
exact supported envelope).

The pins, in order of independence:
1. DC-only exactness — ANALYTIC, no trig: with the all-8 quant table
   an IDCT of a DC-only block is the flat value dc+128, so the full
   container chain (markers, Huffman, DC prediction, EOB, stuffing)
   must reproduce closed-form integers.
2. Single-coefficient orientation — the spec formula evaluated by
   hand for a v=1 vertical frequency: columns constant, rows follow
   C(u)/4 · S · cos((2y+1)π/16). Catches the classic block-transpose
   bug a self-consistent encoder/decoder pair cannot see.
3. Sparse-AC round-trips vs an INDEPENDENTLY-written reference
   reconstruction (dequant + basis product + shift + rint + clip) —
   pins zigzag order, run-lengths, ZRL, category coding.
4. Container behaviors: restart intervals, byte stuffing actually
   occurring, multi-table DHT segments, honest NotImplementedError
   for progressive/subsampled/12-bit, loud ValueError for truncation.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from supplier_performance_data_pipeline_spark.operators.jpeg import (
    _IDCT_M,
    _ZZ,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray_dc,
)


def _reference(blocks, w, h, q):
    """Independent reconstruction straight from the spec text."""
    bx, by = (w + 7) // 8, (h + 7) // 8
    nat = np.zeros((len(blocks), 64))
    nat[:, _ZZ] = blocks * q
    f = nat.reshape(-1, 8, 8)
    plane = np.zeros((by * 8, bx * 8))
    for i in range(len(blocks)):
        block = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                acc = 0.0
                for v in range(8):
                    for u in range(8):
                        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                        cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                        acc += (
                            cu * cv * f[i, v, u]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                block[y, x] = acc / 4 + 128.0
        plane[(i // bx) * 8 : (i // bx) * 8 + 8,
              (i % bx) * 8 : (i % bx) * 8 + 8] = block
    return np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)


def test_dc_only_gray_is_analytically_exact():
    rng = np.random.default_rng(1)
    g = rng.integers(-128, 128, size=(3, 2), dtype=np.int64)
    out = decode_jpeg(encode_jpeg_gray_dc(g))
    exp = np.repeat(np.repeat((g + 128).astype(np.uint8), 8, 0), 8, 1)
    assert np.array_equal(out, np.repeat(exp[:, :, None], 3, axis=2))


def test_single_vertical_frequency_orientation():
    """Zigzag k=2 is natural index 8 = (v=1, u=0): the decoded block
    must vary by ROW only, matching the hand-evaluated spec formula —
    the transpose trap."""
    blocks = np.zeros((1, 64), dtype=np.int64)
    blocks[0, 2] = 40
    g = decode_jpeg(encode_jpeg(blocks, 8, 8))[:, :, 0].astype(int)
    assert (g == g[:, :1]).all()
    expected_col = np.clip(
        np.rint(
            128
            + 0.25 * (1 / np.sqrt(2)) * 320
            * np.cos((2 * np.arange(8) + 1) * np.pi / 16)
        ),
        0,
        255,
    ).astype(int)
    assert (g[:, 0] == expected_col).all()


@pytest.mark.parametrize("seed", [2, 3, 4])
def test_sparse_ac_gray_matches_reference(seed):
    rng = np.random.default_rng(seed)
    q = rng.integers(1, 32, size=64).astype(np.int64)
    blocks = np.zeros((6, 64), dtype=np.int64)
    for b in range(6):
        idxs = rng.choice(64, size=12, replace=False)
        blocks[b, idxs] = rng.integers(-80, 81, size=12)
    out = decode_jpeg(encode_jpeg(blocks, 16, 24, qtable=q))
    exp = _reference(blocks, 16, 24, q)
    assert np.array_equal(out, np.repeat(exp[:, :, None], 3, axis=2))


def test_non_multiple_of_8_dims_trim_padding():
    rng = np.random.default_rng(5)
    blocks = rng.integers(-20, 21, size=(4, 64)).astype(np.int64)
    out = decode_jpeg(encode_jpeg(blocks, 13, 11))
    assert out.shape == (11, 13, 3)
    exp = _reference(blocks, 13, 11, np.full(64, 8, dtype=np.int64))
    assert np.array_equal(out, np.repeat(exp[:, :, None], 3, axis=2))


def test_restart_intervals_and_predictor_reset():
    rng = np.random.default_rng(6)
    g = rng.integers(-128, 128, size=(2, 3), dtype=np.int64)
    blocks = np.zeros((6, 64), dtype=np.int64)
    blocks[:, 0] = g.reshape(-1)
    base = decode_jpeg(encode_jpeg(blocks, 24, 16))
    p = encode_jpeg(blocks, 24, 16, restart_interval=2)
    assert b"\xff\xdd" in p and b"\xff\xd0" in p
    assert np.array_equal(decode_jpeg(p), base)


def test_byte_stuffing_occurs_and_roundtrips():
    """Find a fixture whose entropy stream contains a stuffed 0xFF00
    — decoding must unstuff it, not mistake it for a marker."""
    for seed in range(60):
        rng = np.random.default_rng(seed)
        blocks = np.zeros((4, 64), dtype=np.int64)
        blocks[:, 0] = rng.integers(-128, 128, size=4)
        blocks[:, 1:8] = rng.integers(-100, 101, size=(4, 7))
        p = encode_jpeg(blocks, 16, 16)
        scan = p[p.index(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            out = decode_jpeg(p)
            exp = _reference(blocks, 16, 16, np.full(64, 8, np.int64))
            assert np.array_equal(
                out, np.repeat(exp[:, :, None], 3, axis=2)
            )
            return
    pytest.fail("no fixture produced a stuffed byte in 60 seeds")


def test_color_flat_chroma_equals_gray_and_random_matches_formula():
    rng = np.random.default_rng(7)
    q = rng.integers(1, 24, size=64).astype(np.int64)
    y = np.zeros((4, 64), dtype=np.int64)
    y[:, 0] = rng.integers(-100, 101, size=4)
    zero = np.zeros((4, 64), dtype=np.int64)
    gray = decode_jpeg(encode_jpeg(y, 16, 16, qtable=q))
    color = decode_jpeg(encode_jpeg([y, zero, zero], 16, 16, qtable=q))
    assert np.array_equal(gray, color)


def _plane(blocks, rows, cols, q):
    nat = np.zeros((len(blocks), 64))
    nat[:, _ZZ] = blocks * q
    sp = (
        np.einsum("xu,buv,yv->bxy", _IDCT_M, nat.reshape(-1, 8, 8), _IDCT_M)
        + 128.0
    )
    pl = np.zeros((rows * 8, cols * 8))
    for i in range(len(blocks)):
        pl[(i // cols) * 8 : (i // cols) * 8 + 8,
           (i % cols) * 8 : (i % cols) * 8 + 8] = sp[i]
    return pl


def test_420_dc_block_interleave():
    """4:2:0, two MCU rows: the scan carries Y00 Y01 Y10 Y11 Cb Cr per
    MCU; a decoder with the wrong interleave scrambles Y blocks
    between MCU rows. Flat chroma keeps the expectation exact."""
    y = np.zeros((8, 64), dtype=np.int64)
    y[:, 0] = [10, -20, 30, -40, 50, -60, 70, -80]
    zero = np.zeros((2, 64), dtype=np.int64)
    p = encode_jpeg(
        [y, zero, zero], 16, 32, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    out = decode_jpeg(p)
    exp = np.zeros((32, 16), dtype=np.uint8)
    for b in range(8):
        by, bx = b // 2, b % 2
        exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = int(y[b, 0]) + 128
    assert np.array_equal(out, np.repeat(exp[:, :, None], 3, axis=2))


@pytest.mark.parametrize(
    "sampling,ygrid,w,h",
    [
        ([(2, 2), (1, 1), (1, 1)], (4, 4), 32, 24),  # 4:2:0, ragged h
        ([(2, 1), (1, 1), (1, 1)], (2, 4), 32, 16),  # 4:2:2
        ([(1, 2), (1, 1), (1, 1)], (4, 2), 16, 32),  # 4:4:0
    ],
)
def test_subsampled_color_matches_reference(sampling, ygrid, w, h):
    """Chroma-subsampled scans vs the independent reference: per-plane
    dequant+IDCT, replication upsample, JFIF conversion."""
    rng = np.random.default_rng(w * h)
    q = rng.integers(1, 16, size=64).astype(np.int64)
    yr, yc = ygrid
    hs0, vs0 = sampling[0]
    cr_rows, cr_cols = yr // vs0, yc // hs0
    y = rng.integers(-30, 31, size=(yr * yc, 64)).astype(np.int64)
    cb = rng.integers(-15, 16, size=(cr_rows * cr_cols, 64)).astype(np.int64)
    cr = rng.integers(-15, 16, size=(cr_rows * cr_cols, 64)).astype(np.int64)
    out = decode_jpeg(
        encode_jpeg([y, cb, cr], w, h, qtable=q, sampling=sampling,
                    restart_interval=1)
    )
    Y = _plane(y, yr, yc, q)[:h, :w]
    CB = np.repeat(
        np.repeat(_plane(cb, cr_rows, cr_cols, q), vs0, 0), hs0, 1
    )[:h, :w] - 128
    CR = np.repeat(
        np.repeat(_plane(cr, cr_rows, cr_cols, q), vs0, 0), hs0, 1
    )[:h, :w] - 128
    rgb = np.stack(
        [Y + 1.402 * CR, Y - 0.344136 * CB - 0.714136 * CR, Y + 1.772 * CB],
        axis=2,
    )
    exp = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_honest_failures():
    g = np.array([[1]], dtype=np.int64)
    payload = encode_jpeg_gray_dc(g)
    # progressive
    bad = bytearray(payload)
    i = bytes(bad).index(b"\xff\xc0")
    bad[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF0|progressive"):
        decode_jpeg(bytes(bad))
    # sampling factor above 2: rewrite the SOF0 sampling byte
    bad = bytearray(payload)
    # SOF0 body: len(2) P(1) h(2) w(2) nf(1) then (id, hv, tq)
    bad[i + 2 + 2 + 1 + 4 + 1 + 1] = 0x33
    with pytest.raises(NotImplementedError, match="sampling factor"):
        decode_jpeg(bytes(bad))
    # 16-bit quant table
    bad = bytearray(payload)
    j = bytes(bad).index(b"\xff\xdb")
    bad[j + 4] |= 0x10
    with pytest.raises(NotImplementedError, match="quantization"):
        decode_jpeg(bytes(bad))
    # truncation mid-scan
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) - 6])
    # not a JPEG
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + b"\x00" * 8)


def test_multiple_tables_in_one_dht_segment():
    """Real encoders often pack several Huffman tables into ONE DHT
    marker; the table walk must consume them all. Rebuild the fixture
    payload with the two DHT segments fused."""
    g = np.array([[10, -20], [30, 40]], dtype=np.int64)
    p = encode_jpeg_gray_dc(g)
    i1 = p.index(b"\xff\xc4")
    (l1,) = struct.unpack(">H", p[i1 + 2 : i1 + 4])
    i2 = p.index(b"\xff\xc4", i1 + 2)
    (l2,) = struct.unpack(">H", p[i2 + 2 : i2 + 4])
    body = p[i1 + 4 : i1 + 2 + l1] + p[i2 + 4 : i2 + 2 + l2]
    fused = (
        p[:i1]
        + b"\xff\xc4"
        + struct.pack(">H", len(body) + 2)
        + body
        + p[i2 + 2 + l2 :]
    )
    assert np.array_equal(decode_jpeg(fused), decode_jpeg(p))


def test_decode_rgb_dispatches_jpeg():
    from supplier_performance_data_pipeline_spark.operators.jpeg import (
        JPEG_MIME,
    )
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        decode_rgb,
    )

    g = np.array([[5, -5]], dtype=np.int64)
    out = decode_rgb(encode_jpeg_gray_dc(g), JPEG_MIME)
    assert out.shape == (8, 16, 3)
    assert out[0, 0, 0] == 133 and out[0, 8, 0] == 123


# --- progressive DC band (r13) ----------------------------------------------


@pytest.mark.parametrize("al", [0, 1, 3])
def test_progressive_dc_roundtrip_exact(al):
    """SOF2 DC-only: the first scan's point transform plus the full
    refinement chain reconstructs every DC exactly (negative values
    exercise the two's-complement OR), so the decoded image equals
    the baseline DC fixture's closed form dc + 128."""
    from supplier_performance_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive_dc,
    )

    g = ((np.arange(24, dtype=np.int64) * 37 + 11) % 256 - 128).reshape(
        4, 6
    )
    img = decode_jpeg(encode_jpeg_progressive_dc(g, al=al))
    exp = np.repeat(np.repeat(g + 128, 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(img, exp[:, :, None].repeat(3, 2))
    # and identical to the baseline container carrying the same DCs
    assert np.array_equal(img, decode_jpeg(encode_jpeg_gray_dc(g)))


def test_progressive_scan_discipline_errors():
    """The successive-approximation chain is enforced: refinement
    before a first scan, a duplicate first scan, and a broken Ah/Al
    chain all raise; AC scans stay the loud plug-point."""
    from supplier_performance_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive_dc,
    )

    g = np.array([[7, -9]], dtype=np.int64)
    payload = encode_jpeg_progressive_dc(g, al=1)

    def scans(p):
        """(offset, Ss, Se, Ah, Al) per SOS in the payload."""
        out, i = [], 0
        while True:
            i = p.find(b"\xff\xda", i)
            if i < 0:
                return out
            (ln,) = struct.unpack(">H", p[i + 2 : i + 4])
            ns = p[i + 4]
            o = i + 5 + 2 * ns
            out.append((i, p[o], p[o + 1], p[o + 2] >> 4, p[o + 2] & 15))
            i += 2 + ln

    assert [s[1:] for s in scans(payload)] == [(0, 0, 0, 1), (0, 0, 1, 0)]
    # refinement-only file: first scan missing
    (s0, s1) = (scans(payload)[0][0], scans(payload)[1][0])
    with pytest.raises(ValueError, match="before the DC first scan"):
        decode_jpeg(payload[:s0] + payload[s1:])
    # duplicate DC first scan
    first = payload[s0:s1]
    with pytest.raises(ValueError, match="duplicate"):
        decode_jpeg(payload[:s1] + first + payload[s1:])
    # broken chain: refinement claims Ah=2 after a first scan at Al=1
    bad = bytearray(payload)
    o = scans(payload)[1][0] + 5 + 2
    bad[o + 2] = (2 << 4) | 1
    with pytest.raises(ValueError, match="chain broken"):
        decode_jpeg(bytes(bad))
    # AC band: flip the first scan's Se to 63
    bad = bytearray(payload)
    o = scans(payload)[0][0] + 5 + 2
    bad[o + 1] = 63
    with pytest.raises(NotImplementedError, match="AC scans"):
        decode_jpeg(bytes(bad))


def test_progressive_partial_chain_renders_preview():
    """A DC chain cut before Al=0 still decodes — the spec's preview
    semantics: coefficients carry only the refined high bits."""
    from supplier_performance_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive_dc,
    )

    g = np.array([[5, -6, 100]], dtype=np.int64)
    payload = encode_jpeg_progressive_dc(g, al=1)
    i = payload.find(b"\xff\xda", payload.find(b"\xff\xda") + 2)
    preview = decode_jpeg(payload[:i] + b"\xff\xd9")
    exp = (g >> 1 << 1) + 128  # refinement bit never lands
    assert np.array_equal(
        preview[::8, ::8, 0], exp.astype(np.uint8)
    )
