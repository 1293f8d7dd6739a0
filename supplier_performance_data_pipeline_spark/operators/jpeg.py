"""Baseline JPEG (ITU-T T.81) — real entropy decode, numpy + stdlib.

This closes the largest remaining honest plug-point in the media stack
(operators/multimodal.py::decode_rgb routed every ``image/jpeg``
payload to NotImplementedError through r11): a working BASELINE
SEQUENTIAL decoder — marker parse, DQT/DHT/SOF0/DRI/SOS, canonical
Huffman decode with byte unstuffing and restart intervals, DC
prediction, AC run-length/ZRL/EOB, dequantization, the spec's full
2-D IDCT, level shift, and JFIF YCbCr→RGB — plus the matching fixture
encoder. Scope is stated exactly:

- SUPPORTED: SOF0 baseline DCT, 8-bit precision, 1 component
  (grayscale) or 3 components with sampling factors up to 2x2 —
  4:4:4, 4:2:2, 4:4:0, and the ubiquitous 4:2:0 all decode with the
  spec's interleaved MCU block order (per component, Hc x Vc blocks
  left-right top-bottom) and REPLICATION chroma upsampling (spec-
  legal nearest; libjpeg's -nosmooth — documented, deterministic).
  Multi-table DQT/DHT segments, restart markers (DRI/RSTn), APPn/COM
  skip, FF00 byte stuffing, fill bytes. PROGRESSIVE (SOF2) decodes
  its DC band (r13): the interleaved DC first scan (spec G.1.2.1
  point transform, value << Al) plus successive-approximation DC
  refinement scans (one raw bit per block, OR'd at Al) accumulate
  across the multi-scan container and IDCT once at EOI — a DC-only
  progressive file reconstructs exactly.
- NotImplementedError (honest, loud): progressive AC scans (spectral
  selection beyond the DC band — the Pillow plug-point), scans over
  a component subset, extended/lossless/arithmetic frames
  (SOF1/3/9-15), sampling factors above 2, 12-bit precision / 16-bit
  quant tables. These raise at the marker, never shear pixels.

Determinism contract: IDCT is the spec's closed-form float64 basis
product (bit-stable across platforms for the fixture range), final
samples are np.rint (round-half-even, documented) then clipped.
The registered oracle row sidesteps even that: DC-only blocks with an
all-8 quant table make the reconstruction EXACTLY dc+128 per pixel
(IDCT of a DC-only block is the flat value F00/8; 8/8 = 1), so the
DuckDB oracle reproduces the decoded stream in closed form with no
trig anywhere — while the Spark arm still runs the entire container:
Huffman tables, DC prediction chain, EOB per block, stuffing.

Like the PNG/WAV/AVI codecs this is per-payload work inside Arrow
``mapInPandas`` batches on executors — O(coded bits) like any entropy
decoder, never a relational row UDF. The Huffman walk is a Python
loop over numpy-unpacked bits: fixture payloads are tiny; a
production swap-in (libjpeg-turbo via Pillow) plugs in at
decode_rgb's mime dispatch without touching any plan.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MIME = "image/jpeg"

# Zigzag: index i of the scan order -> (row, col) in the 8x8 block,
# flattened to row-major position. _ZZ[i] = natural position of the
# i-th zigzag coefficient.
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K standard Huffman tables (public spec constants):
# (BITS[1..16], HUFFVAL) per (class, destination).
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) canonical Huffman assignment per the
    spec's Annex C code-length ordering."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """((length, code) -> symbol) map for the bit-walk decoder, plus
    the max code length present."""
    enc = _canonical_codes(bits, vals)
    dec = {(ln, code): sym for sym, (code, ln) in enc.items()}
    maxlen = max((ln for _, (_, ln) in enc.items()), default=0)
    return dec, maxlen


# The spec IDCT as a basis product: M[x, u] = c(u)/2 · cos((2x+1)uπ/16),
# f = M F Mᵀ. Float64; for DC-only blocks this is EXACTLY F00/8 flat.
_IDCT_M = np.zeros((8, 8))
for _x in range(8):
    for _u in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _IDCT_M[_x, _u] = _c / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _BitReader:
    """MSB-first bit reader over one UNSTUFFED entropy segment."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        b = self.bits
        p = self.pos
        if p + n > b.size:
            raise ValueError("JPEG entropy segment exhausted mid-symbol")
        v = 0
        for i in range(n):
            v = (v << 1) | int(b[p + i])
        self.pos = p + n
        return v

    def huff(self, table) -> int:
        dec, maxlen = table
        b = self.bits
        p = self.pos
        code = 0
        for ln in range(1, maxlen + 1):
            if p + ln > b.size:
                raise ValueError("JPEG entropy segment exhausted in code")
            code = (code << 1) | int(b[p + ln - 1])
            sym = dec.get((ln, code))
            if sym is not None:
                self.pos = p + ln
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """DIFF/coefficient sign extension (spec F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br: _BitReader, dc_tab, ac_tab, pred: int):
    """One 8x8 block: returns (zigzag int64[64], new DC predictor)."""
    coef = np.zeros(64, dtype=np.int64)
    s = br.huff(dc_tab)
    if s > 11:
        raise ValueError(f"invalid JPEG DC category {s}")
    diff = _extend(br.read(s), s) if s else 0
    dc = pred + diff
    coef[0] = dc
    k = 1
    while k < 64:
        rs = br.huff(ac_tab)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index overflow")
        coef[k] = _extend(br.read(size), size)
        k += 1
    return coef, dc


def decode_jpeg(payload: bytes):
    """(H, W, 3) uint8 from a baseline JFIF/JPEG payload (module
    docstring states the exact supported envelope)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], tuple] = {}
    frame = None
    restart_interval = 0
    planes = None
    prog_coefs = None  # progressive: coefficients accumulate across scans
    prog_grids = None
    cur_al = None  # progressive DC successive-approximation chain state
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        while pos < n and payload[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= n:
            raise ValueError("truncated JPEG (fill bytes to EOF)")
        m = payload[pos]
        pos += 1
        if m == 0xD9:  # EOI
            break
        if 0xD0 <= m <= 0xD7 or m == 0x01:
            continue  # standalone markers
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment body")
        pos += seg_len
        if m == 0xDB:  # DQT, possibly several tables
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quantization tables (12-bit "
                        "precision) unsupported"
                    )
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=o
                ).astype(np.int64)
                o += 64
        elif m == 0xC4:  # DHT, possibly several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                huffs[(tc, th)] = _decode_table(bits, vals)
                o += 17 + nv
        elif m in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            p, fh, fw, nf = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if p != 8:
                raise NotImplementedError(f"JPEG precision {p} unsupported")
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {nf} components unsupported"
                )
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {hs}x{vs} unsupported "
                        "(factors up to 2x2 decode — 4:4:4/4:2:2/"
                        "4:4:0/4:2:0)"
                    )
                comps.append({"id": cid, "tq": tq, "hs": hs, "vs": vs})
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            for c in comps:
                if hmax % c["hs"] or vmax % c["vs"]:
                    raise NotImplementedError(
                        "JPEG sampling factors must divide the frame "
                        f"maxima ({c['hs']}x{c['vs']} vs {hmax}x{vmax})"
                    )
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "hmax": hmax, "vmax": vmax,
                "progressive": m == 0xC2,
            }
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type 0xFF{m:02X} unsupported (SOF0 "
                "baseline sequential and SOF2 progressive DC-only "
                "decode; extended/lossless/arithmetic are the "
                "remaining honest plug-points)"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS + entropy-coded data
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            progressive = frame["progressive"]
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "progressive JPEG scans over a component subset "
                    "unsupported (fully interleaved DC scans only)"
                    if progressive
                    else "JPEG multi-scan (non-interleaved) unsupported"
                )
            specs = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                specs.append((cs, tdta >> 4, tdta & 0x0F))
            # Ss/Se spectral selection + Ah/Al successive approximation
            # (baseline writes 0/63/0 here and the sequential decode
            # ignores them, as before)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            # entropy data: up to the next marker that is not a
            # stuffed 0x00 or a restart RSTn
            start = pos
            segments = []  # restart-interval chunks, unstuffed
            cur = bytearray()
            while pos < n:
                b = payload[pos]
                if b != 0xFF:
                    cur.append(b)
                    pos += 1
                    continue
                nxt = payload[pos + 1] if pos + 1 < n else None
                if nxt == 0x00:
                    cur.append(0xFF)
                    pos += 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    pos += 2
                else:
                    break
            segments.append(bytes(cur))
            if start == pos and not segments[0]:
                raise ValueError("empty JPEG scan")
            if not progressive:
                scan_tabs = []
                for _, td, ta in specs:
                    if (0, td) not in huffs or (1, ta) not in huffs:
                        raise ValueError(
                            "JPEG scan references missing DHT"
                        )
                    scan_tabs.append((huffs[(0, td)], huffs[(1, ta)]))
                planes = _decode_scan(
                    frame, qt, scan_tabs, segments, restart_interval
                )
            elif ss == 0 and se == 0:  # progressive DC band
                if prog_coefs is None:
                    _, _, _, prog_grids = _mcu_geometry(frame)
                    prog_coefs = [
                        np.zeros((r * cl, 64), dtype=np.int64)
                        for r, cl in prog_grids
                    ]
                if ah == 0:  # DC first scan
                    if cur_al is not None:
                        raise ValueError(
                            "duplicate progressive DC first scan"
                        )
                    dc_tabs = []
                    for _, td, _ta in specs:
                        if (0, td) not in huffs:
                            raise ValueError(
                                "JPEG scan references missing DHT"
                            )
                        dc_tabs.append(huffs[(0, td)])
                    _decode_dc_scan(
                        frame, prog_coefs, dc_tabs, segments,
                        restart_interval, 0, al,
                    )
                    cur_al = al
                else:  # DC refinement: one raw bit per block
                    if cur_al is None:
                        raise ValueError(
                            "progressive DC refinement before the "
                            "DC first scan"
                        )
                    if ah != cur_al or al != ah - 1:
                        raise ValueError(
                            "progressive DC successive-approximation "
                            f"chain broken (Ah={ah}, Al={al}; "
                            f"expected Ah={cur_al}, Al={cur_al - 1})"
                        )
                    _decode_dc_scan(
                        frame, prog_coefs, None, segments,
                        restart_interval, ah, al,
                    )
                    cur_al = al
            else:
                raise NotImplementedError(
                    "progressive JPEG AC scans unsupported — the "
                    "DC band (spectral selection 0,0: first scan + "
                    "successive-approximation refinements) decodes; "
                    "AC spectral/refinement scans are the Pillow "
                    "plug-point"
                )
        elif m == 0xD8:
            raise ValueError("unexpected second SOI")
        # APPn (E0-EF), COM (FE), others with length: skipped
    if planes is None and prog_coefs is not None:
        # Progressive reconstruction at EOI: coefficients accumulated
        # across the DC scans IDCT exactly once. A chain ending above
        # Al=0 still renders (the spec's preview semantics — the
        # coefficients simply carry fewer refined bits).
        if cur_al is None:
            raise ValueError("progressive JPEG has no DC scan")
        planes = _coefs_to_planes(frame, qt, prog_coefs, prog_grids)
    if planes is None:
        raise ValueError("JPEG contains no decoded scan")
    fh, fw = frame["h"], frame["w"]
    if len(planes) == 1:
        y = planes[0][:fh, :fw]
        return np.repeat(
            np.clip(np.rint(y), 0, 255).astype(np.uint8)[:, :, None],
            3,
            axis=2,
        )
    # JFIF YCbCr -> RGB (the spec conversion; rint half-even, clipped)
    y = planes[0][:fh, :fw]
    cb = planes[1][:fh, :fw] - 128.0
    cr = planes[2][:fh, :fw] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _mcu_geometry(frame):
    """(mcux, mcuy, total_mcus, per-component (rows, cols) block
    grids) for an interleaved scan of ``frame`` (spec A.2.3)."""
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    grids = [(mcuy * c["vs"], mcux * c["hs"]) for c in comps]
    return mcux, mcuy, mcux * mcuy, grids


def _decode_scan(frame, qt, scan_tabs, segments, restart_interval):
    """Interleaved baseline scan, general sampling (factors ≤ 2): one
    MCU carries, per component in frame order, Hc × Vc blocks scanned
    left-right top-bottom (spec A.2.3). Restart intervals reset DC
    predictors and byte-align (each ``segments`` entry is one
    already-unstuffed interval). Returns FULL-RESOLUTION planes:
    subsampled components are replication-upsampled (spec-legal
    nearest; deterministic)."""
    comps = frame["comps"]
    mcux, mcuy, total_mcus, grids = _mcu_geometry(frame)
    per_seg = restart_interval if restart_interval else total_mcus
    coefs = [
        np.zeros((r * cl, 64), dtype=np.int64) for r, cl in grids
    ]
    mcu = 0
    for seg_bytes in segments:
        if mcu >= total_mcus:
            break
        br = _BitReader(seg_bytes)
        preds = [0] * len(comps)
        for _ in range(min(per_seg, total_mcus - mcu)):
            my, mx = mcu // mcux, mcu % mcux
            for ci, comp in enumerate(comps):
                dc_tab, ac_tab = scan_tabs[ci]
                _, cols = grids[ci]
                for vb in range(comp["vs"]):
                    for hb in range(comp["hs"]):
                        block, preds[ci] = _decode_block(
                            br, dc_tab, ac_tab, preds[ci]
                        )
                        bi = (my * comp["vs"] + vb) * cols + (
                            mx * comp["hs"] + hb
                        )
                        coefs[ci][bi] = block
            mcu += 1
    if mcu != total_mcus:
        raise ValueError(
            f"JPEG scan decoded {mcu} of {total_mcus} MCUs "
            "(truncated or restart-interval mismatch)"
        )
    return _coefs_to_planes(frame, qt, coefs, grids)


def _coefs_to_planes(frame, qt, coefs, grids):
    """Dequantize + IDCT every component's zigzag coefficient blocks
    into FULL-RESOLUTION planes (replication upsampling for
    subsampled components) — shared by the baseline one-scan path and
    the progressive accumulate-then-reconstruct path."""
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for ci, comp in enumerate(comps):
        table = qt.get(comp["tq"])
        if table is None:
            raise ValueError("JPEG component references missing DQT")
        rows, cols = grids[ci]
        nb = rows * cols
        # de-zigzag + dequantize, all blocks at once
        nat = np.zeros((nb, 64), dtype=np.float64)
        nat[:, _ZZ] = coefs[ci] * table
        blocks = nat.reshape(nb, 8, 8)
        # f = M F Mᵀ per block + level shift
        spatial = (
            np.einsum("xu,buv,yv->bxy", _IDCT_M, blocks, _IDCT_M) + 128.0
        )
        plane = np.zeros((rows * 8, cols * 8))
        for i in range(nb):
            y0, x0 = (i // cols) * 8, (i % cols) * 8
            plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[i]
        ry, rx = vmax // comp["vs"], hmax // comp["hs"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane)
    return planes


def _decode_dc_scan(frame, coefs, dc_tabs, segments, restart_interval,
                    ah, al):
    """One PROGRESSIVE DC scan (spectral band 0..0), interleaved over
    all frame components, into the accumulating coefficient arrays.

    First scan (Ah=0): baseline DC Huffman coding of the point-
    transformed values — DIFF + EXTEND against a per-component
    predictor, coefficient = decoded value << Al (spec G.1.2.1).
    Refinement scan (Ah>0): ONE raw bit per block, OR'd in at
    position Al (spec G.1.2.1's successive-approximation DC
    correction; two's-complement OR restores negative DCs exactly).
    Restart intervals reset predictors and byte-align, as in the
    baseline scan."""
    comps = frame["comps"]
    mcux, _, total_mcus, grids = _mcu_geometry(frame)
    per_seg = restart_interval if restart_interval else total_mcus
    mcu = 0
    for seg_bytes in segments:
        if mcu >= total_mcus:
            break
        br = _BitReader(seg_bytes)
        preds = [0] * len(comps)
        for _ in range(min(per_seg, total_mcus - mcu)):
            my, mx = mcu // mcux, mcu % mcux
            for ci, comp in enumerate(comps):
                _, cols = grids[ci]
                for vb in range(comp["vs"]):
                    for hb in range(comp["hs"]):
                        bi = (my * comp["vs"] + vb) * cols + (
                            mx * comp["hs"] + hb
                        )
                        if ah == 0:
                            s = br.huff(dc_tabs[ci])
                            if s > 11:
                                raise ValueError(
                                    f"invalid JPEG DC category {s}"
                                )
                            diff = _extend(br.read(s), s) if s else 0
                            preds[ci] += diff
                            coefs[ci][bi, 0] = preds[ci] << al
                        else:
                            coefs[ci][bi, 0] |= br.read(1) << al
            mcu += 1
    if mcu != total_mcus:
        raise ValueError(
            f"JPEG DC scan decoded {mcu} of {total_mcus} MCUs "
            "(truncated or restart-interval mismatch)"
        )


# --- fixture encoder ---------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec
        return bytes(self.buf)


def _dht_segment(tc, th, table) -> bytes:
    bits, vals = table
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq, table64) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in table64)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _category(v: int) -> int:
    s = 0
    a = abs(v)
    while a:
        s += 1
        a >>= 1
    return s


def _emit_coef(bw: _BitWriter, v: int, s: int) -> None:
    if v < 0:
        v += (1 << s) - 1
    bw.write(v, s)


def encode_jpeg(
    blocks,
    w: int,
    h: int,
    qtable=None,
    restart_interval: int = 0,
    sampling=None,
) -> bytes:
    """Baseline JFIF payload from QUANTIZED zigzag coefficient blocks —
    the fixture encoder (the inverse entropy-coding half; it does not
    run a forward DCT, callers hand it the coefficient domain, which
    is exactly what round-trip tests need to pin Huffman/zigzag/
    dequant/IDCT wiring bit-for-bit).

    ``blocks``: one array (n_blocks, 64) for grayscale, or a list of
    THREE such arrays for YCbCr; each component's block n covers ITS
    plane tile (n // cols_c, n % cols_c) where the per-component grid
    is (mcuy·Vc) × (mcux·Hc). ``sampling`` is a per-component list of
    (H, V) factors ≤ 2 — e.g. ``[(2, 2), (1, 1), (1, 1)]`` for 4:2:0
    — default all 1x1 (4:4:4). The scan interleaves MCUs in spec
    A.2.3 order (per component, Hc × Vc blocks left-right
    top-bottom). Standard Annex K Huffman tables; ``qtable`` (64
    entries, zigzag, default all-8s) is shared by all components;
    ``restart_interval`` > 0 emits DRI + RSTn markers."""
    if isinstance(blocks, (list, tuple)):
        comps = [np.asarray(b, dtype=np.int64) for b in blocks]
    else:
        comps = [np.asarray(blocks, dtype=np.int64)]
    if len(comps) not in (1, 3):
        raise ValueError("encode_jpeg takes 1 or 3 component block sets")
    if sampling is None:
        sampling = [(1, 1)] * len(comps)
    if len(sampling) != len(comps) or any(
        not (1 <= hs <= 2 and 1 <= vs <= 2) for hs, vs in sampling
    ):
        raise ValueError("sampling must give each component (H, V) in 1..2")
    qtable = (
        np.full(64, 8, dtype=np.int64)
        if qtable is None
        else np.asarray(qtable, dtype=np.int64)
    )
    if qtable.shape != (64,) or (qtable < 1).any() or (qtable > 255).any():
        raise ValueError("qtable must be 64 entries in 1..255 (8-bit DQT)")
    hmax = max(hs for hs, _ in sampling)
    vmax = max(vs for _, vs in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcux * mcuy
    grids = [(mcuy * vs, mcux * hs) for hs, vs in sampling]
    for ci, c in enumerate(comps):
        r, cl = grids[ci]
        if c.shape != (r * cl, 64):
            raise ValueError(
                f"component {ci} needs {r * cl} blocks of 64 zigzag "
                f"coefficients (grid {r}x{cl}), got {c.shape}"
            )
    ncomp = len(comps)
    out = bytearray(b"\xff\xd8")  # SOI
    out += (  # APP0 JFIF
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, qtable)
    out += _dht_segment(0, 0, _STD_DC_LUM)
    out += _dht_segment(1, 0, _STD_AC_LUM)
    if ncomp == 3:
        out += _dht_segment(0, 1, _STD_DC_CHR)
        out += _dht_segment(1, 1, _STD_AC_CHR)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    enc_tabs = []
    for ci in range(ncomp):
        th = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (th << 4) | th])
        dc = _canonical_codes(*(_STD_DC_LUM if th == 0 else _STD_DC_CHR))
        ac = _canonical_codes(*(_STD_AC_LUM if th == 0 else _STD_AC_CHR))
        enc_tabs.append((dc, ac))
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    def emit_block(bw, ci, blk, pred):
        dc_codes, ac_codes = enc_tabs[ci]
        diff = int(blk[0]) - pred
        s = _category(diff)
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            _emit_coef(bw, diff, s)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            _emit_coef(bw, v, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
        return int(blk[0])

    per_seg = restart_interval if restart_interval else n_mcus
    mcu = 0
    rst = 0
    while mcu < n_mcus:
        bw = _BitWriter()
        preds = [0] * ncomp
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = mcu // mcux, mcu % mcux
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                _, cols = grids[ci]
                for vb in range(vs):
                    for hb in range(hs):
                        bi = (my * vs + vb) * cols + (mx * hs + hb)
                        preds[ci] = emit_block(
                            bw, ci, comps[ci][bi], preds[ci]
                        )
            mcu += 1
        out += bw.flush()
        if mcu < n_mcus and restart_interval:
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray_dc(dc_grid) -> bytes:
    """Grayscale DC-only baseline JPEG from a (BY, BX) int grid of DC
    coefficients in [-128, 127] — the oracle-exact fixture: with the
    all-8 quant table, block (by, bx) decodes to the FLAT value
    dc + 128 (IDCT of a DC-only block is F00/8 = dc·8/8 exactly; no
    rounding engages)."""
    g = np.asarray(dc_grid, dtype=np.int64)
    if g.ndim != 2:
        raise ValueError("dc_grid must be (BY, BX)")
    if (g < -128).any() or (g > 127).any():
        raise ValueError("DC values must lie in [-128, 127]")
    by, bx = g.shape
    blocks = np.zeros((by * bx, 64), dtype=np.int64)
    blocks[:, 0] = g.reshape(-1)
    return encode_jpeg(blocks, bx * 8, by * 8)


def encode_jpeg_progressive_dc(dc_grid, al: int = 1) -> bytes:
    """Grayscale PROGRESSIVE (SOF2) DC-only JPEG from a (BY, BX) int
    grid of DC coefficients in [-128, 127] — the r13 fixture: scan 1
    Huffman-codes the point-transformed values dc >> al (Ah=0, Al=al;
    arithmetic shift per spec G.1.2.1), then ``al`` refinement scans
    each append ONE raw bit per block (Ah=k, Al=k-1) until Al=0, so
    the accumulated coefficient is exactly ``dc`` and — with the all-8
    quant table — block (by, bx) decodes to the FLAT value dc + 128,
    the same closed form as the baseline fixture. The decoder must
    walk the multi-scan container, keep the successive-approximation
    chain, and OR refinement bits into negative two's-complement DCs
    to reproduce it."""
    g = np.asarray(dc_grid, dtype=np.int64)
    if g.ndim != 2:
        raise ValueError("dc_grid must be (BY, BX)")
    if (g < -128).any() or (g > 127).any():
        raise ValueError("DC values must lie in [-128, 127]")
    if not 0 <= al <= 7:
        raise ValueError("al must lie in 0..7")
    by, bx = g.shape
    flat = [int(v) for v in g.reshape(-1)]
    out = bytearray(b"\xff\xd8")  # SOI
    out += (  # APP0 JFIF
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, np.full(64, 8, dtype=np.int64))
    out += _dht_segment(0, 0, _STD_DC_LUM)
    sof = bytes([8]) + struct.pack(">HH", by * 8, bx * 8) + bytes([1])
    sof += bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    dc_codes = _canonical_codes(*_STD_DC_LUM)

    def sos_header(ah_, al_) -> bytes:
        body = bytes([1, 1, 0x00, 0, 0, (ah_ << 4) | al_])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    # DC first scan: diffs of the point-transformed values
    out += sos_header(0, al)
    bw = _BitWriter()
    pred = 0
    for dc in flat:
        v = dc >> al
        diff = v - pred
        pred = v
        s = _category(diff)
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            _emit_coef(bw, diff, s)
    out += bw.flush()
    # refinement scans: one raw bit per block, Al stepping down to 0
    for k in range(al, 0, -1):
        out += sos_header(k, k - 1)
        bw = _BitWriter()
        for dc in flat:
            bw.write((dc >> (k - 1)) & 1, 1)
        out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
