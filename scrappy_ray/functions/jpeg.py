"""Baseline JPEG (ITU-T T.81) codec on the stdlib + numpy only.

No Pillow / libjpeg in this container, but the multimodal decode
stage should still exercise a REAL interchange codec (reference
parity note: the reference crawler is text-only — this is the
training-data-pipeline extension surface, SURVEY.md §2 "beyond").

``jpeg_encode`` is the deterministic fixture generator: baseline
sequential DCT, 8-bit, grayscale or YCbCr (4:4:4 or 4:2:0), Annex K
quantization + Huffman tables, optional restart markers.
``jpeg_decode_luma`` parses baseline (SOF0/SOF1) AND progressive
(SOF2) JPEGs — multiple DQT/DHT segments, DRI/RSTn, APPn/COM skip,
and for progressive the full four scan types (interleaved DC
first/refinement, non-interleaved AC first/refinement with EOB runs
and correction bits, T.81 G.2) — and reconstructs the LUMA plane.
Chroma is entropy-decoded for sync (baseline) or kept as coefficient
history (progressive refinement needs it) but never IDCTed, because
the downstream feature kernel (``_image_features``) is
grayscale-only. ``jpeg_encode_progressive`` emits a 2-level
successive-approximation scan script over the SAME quantized
coefficients as the baseline encoder, so progressive and baseline
encodes of one image decode to bit-identical pixels — the codec's
internal cross-check.

Scale note: this runs inside the ``decode_images`` actor-pool stage
(one process-wide table build, per-batch decode); payload size × batch
size is the memory knob, same as the PNG path.
"""
from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance base quantization tables
QBASE_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)
QBASE_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
    0xF9, 0xFA]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
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
    0xF9, 0xFA]

# orthonormal 8x8 DCT-II basis (C @ block @ C.T == forward DCT)
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
_C = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_C[0, :] = np.sqrt(1.0 / 8.0)


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/Q below 50, else 200-2Q."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_LUT_CACHE: dict = {}


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) -> flat 16-bit lookup tables (sym, len): one
    peek of the next 16 bits resolves any code in O(1) instead of a
    bit-by-bit tree walk — the entropy decode's hot path. Tables are
    cached process-wide by their (BITS, HUFFVAL) content (the Annex K
    tables recur across every image a worker decodes)."""
    key = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut = np.zeros(1 << 16, np.int32)  # (symbol << 8) | code length
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            lut[base:base + span] = (vals[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()  # plain-list scalar indexing beats numpy here
    _LUT_CACHE[key] = out
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self):
        if self.nbits:
            # pad with 1-bits per spec
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(category size, amplitude bits) for a DC diff / AC coeff."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    amp = v if v >= 0 else v + (1 << size) - 1
    return size, amp


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr, float64 (h, w, 3)."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (H//8 * W//8, 8, 8) row-major blocks (H, W % 8 == 0)."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block_coeffs(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """8x8 float (level-shifted) -> 64 zigzag quantized int coeffs."""
    d = _C @ block @ _C.T
    q = np.round(d.reshape(64) / qt).astype(np.int64)
    return q[ZIGZAG]


def _emit_block(w: _BitWriter, zz: np.ndarray, pred: int,
                dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    size, amp = _magnitude(dc - pred)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(amp, size)
    run = 0
    last = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last = i
            break
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, amp = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(amp, size)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def jpeg_encode(img: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JPEG.

    ``subsampling``: "444" (1x1 chroma) or "420" (2x2 luma per MCU);
    ignored for grayscale. ``restart_interval`` > 0 emits DRI + RSTn
    every that many MCUs (exercises the decoder's restart path)."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l = quant_table(QBASE_LUM, quality).astype(np.float64)
    qt_c = quant_table(QBASE_CHR, quality).astype(np.float64)
    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_c = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)

    if gray:
        comps = [(1, 1, 1, 0)]  # id, hs, vs, tq
    elif subsampling == "420":
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)

    if gray:
        planes = [_pad_edge(img.astype(np.float64), 8 * maxh)]
    else:
        ycc = _rgb_to_ycbcr(img)
        y = _pad_edge(ycc[..., 0], 8 * maxh)
        cb = _pad_edge(ycc[..., 1], 8 * maxh)
        cr = _pad_edge(ycc[..., 2], 8 * maxh)
        if subsampling == "420":
            cb = (cb[0::2, 0::2] + cb[0::2, 1::2]
                  + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4.0
            cr = (cr[0::2, 0::2] + cr[0::2, 1::2]
                  + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4.0
        planes = [y, cb, cr]

    mcus_x = planes[0].shape[1] // (8 * maxh)
    mcus_y = planes[0].shape[0] // (8 * maxv)

    bw = _BitWriter()
    preds = [0] * len(comps)
    mcu_n = 0
    rst = 0
    entropy_parts = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()
                entropy_parts.append(bytes(bw.buf))
                entropy_parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                bw = _BitWriter()
                rst += 1
                preds = [0] * len(comps)
            for ci, (_cid, hs, vs, tq) in enumerate(comps):
                plane = planes[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                        zz = _encode_block_coeffs(
                            blk, qt_l if tq == 0 else qt_c)
                        preds[ci] = _emit_block(
                            bw, zz, preds[ci],
                            dc_l if tq == 0 else dc_c,
                            ac_l if tq == 0 else ac_c)
            mcu_n += 1
    bw.flush()
    entropy_parts.append(bytes(bw.buf))
    entropy = b"".join(entropy_parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    qts = [(0, quant_table(QBASE_LUM, quality))]
    if not gray:
        qts.append((1, quant_table(QBASE_CHR, quality)))
    for tq, qt in qts:
        out.append(seg(0xDB, bytes([tq]) + bytes(qt[ZIGZAG].tolist())))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out.append(seg(0xC0, sof))
    hts = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if not gray:
        hts += [(0x01, DC_CHR_BITS, DC_CHR_VALS),
                (0x11, AC_CHR_BITS, AC_CHR_VALS)]
    for tc_th, bits, vals in hts:
        out.append(seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([len(comps)])
    for cid, _hs, _vs, tq in comps:
        td_ta = 0x00 if tq == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out.append(seg(0xDA, sos))
    out.append(entropy)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


def _component_setup(img: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: (comps, planes, mcus_x, mcus_y) and
    the per-component quantized zigzag coefficient grids."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l = quant_table(QBASE_LUM, quality).astype(np.float64)
    qt_c = quant_table(QBASE_CHR, quality).astype(np.float64)
    if gray:
        comps = [(1, 1, 1, 0)]
    elif subsampling == "420":
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    if gray:
        planes = [_pad_edge(img.astype(np.float64), 8 * maxh)]
    else:
        ycc = _rgb_to_ycbcr(img)
        y = _pad_edge(ycc[..., 0], 8 * maxh)
        cb = _pad_edge(ycc[..., 1], 8 * maxh)
        cr = _pad_edge(ycc[..., 2], 8 * maxh)
        if subsampling == "420":
            cb = (cb[0::2, 0::2] + cb[0::2, 1::2]
                  + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4.0
            cr = (cr[0::2, 0::2] + cr[0::2, 1::2]
                  + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4.0
        planes = [y, cb, cr]
    mcus_x = planes[0].shape[1] // (8 * maxh)
    mcus_y = planes[0].shape[0] // (8 * maxv)
    coeffs = []  # per comp: (bh, bw, 64) zigzag int32
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        qt = qt_l if tq == 0 else qt_c
        bw_c, bh_c = mcus_x * hs, mcus_y * vs
        plane = planes[ci]
        if plane.shape != (bh_c * 8, bw_c * 8):
            plane = _pad_edge(plane, 8)[:bh_c * 8, :bw_c * 8]
        grid = np.zeros((bh_c, bw_c, 64), np.int32)
        for by in range(bh_c):
            for bx in range(bw_c):
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                grid[by, bx] = _encode_block_coeffs(blk, qt)
        coeffs.append(grid)
    return comps, coeffs, mcus_x, mcus_y, h, w, gray


def _pt_dc(v: int, al: int) -> int:
    return v >> al  # arithmetic shift (T.81 DC point transform)


def _pt_ac(v: int, al: int) -> int:
    return -((-v) >> al) if v < 0 else v >> al  # magnitude shift


def jpeg_encode_progressive(img: np.ndarray, quality: int = 85,
                            subsampling: str = "444") -> bytes:
    """Encode as PROGRESSIVE JPEG (SOF2) with a 2-level successive-
    approximation scan script exercising all four scan types the
    decoder implements: interleaved DC first (Al=1) + DC refinement,
    then per-component AC first (Ss=1..63, Al=1) + AC refinement
    (correction bits, EOB-run semantics). The coefficients are the
    SAME quantized values the baseline encoder produces, so
    progressive and baseline encodes of one image must decode to
    bit-identical pixels — that identity is the codec's cross-check
    (tests/test_jpeg.py)."""
    img = np.asarray(img, np.uint8)
    comps, coeffs, mcus_x, mcus_y, h, w, gray = _component_setup(
        img, quality, subsampling)
    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_c = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            tq = next(c[3] for c in comps if c[0] == cid)
            body += bytes([cid, 0x00 if tq == 0 else 0x11])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = [b"\xff\xd8",
           seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    qts = [(0, quant_table(QBASE_LUM, quality))]
    if not gray:
        qts.append((1, quant_table(QBASE_CHR, quality)))
    for tq, qt in qts:
        out.append(seg(0xDB, bytes([tq]) + bytes(qt[ZIGZAG].tolist())))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out.append(seg(0xC2, sof))  # SOF2: progressive
    hts = [(0x00, DC_LUM_BITS, DC_LUM_VALS),
           (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if not gray:
        hts += [(0x01, DC_CHR_BITS, DC_CHR_VALS),
                (0x11, AC_CHR_BITS, AC_CHR_VALS)]
    for tc_th, bits, vals in hts:
        out.append(seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))

    # --- scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_cid, hs, vs, tq) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        v = _pt_dc(int(coeffs[ci][my * vs + by,
                                                  mx * hs + bx, 0]), 1)
                        size, amp = _magnitude(v - preds[ci])
                        code, ln = (dc_l if tq == 0 else dc_c)[size]
                        bw.write(code, ln)
                        if size:
                            bw.write(amp, size)
                        preds[ci] = v
    bw.flush()
    out.append(sos_header([c[0] for c in comps], 0, 0, 0, 1))
    out.append(bytes(bw.buf))

    # --- scan 2: DC refinement, interleaved, Ah=1 -> Al=0 (raw bits)
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_cid, hs, vs, _tq) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        bw.write(int(coeffs[ci][my * vs + by,
                                                mx * hs + bx, 0]) & 1, 1)
    bw.flush()
    out.append(sos_header([c[0] for c in comps], 0, 0, 1, 0))
    out.append(bytes(bw.buf))

    # --- per component: AC first (Al=1) then AC refinement (Al=0),
    # over the component's own (non-interleaved) block dims — MCU
    # padding blocks carry DC only (T.81 A.1.1)
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        ac = ac_l if tq == 0 else ac_c
        cw = -(-(w * hs) // maxh)   # ceil: component sample width
        ch = -(-(h * vs) // maxv)
        bw_n = -(-cw // 8)
        bh_n = -(-ch // 8)
        grid = coeffs[ci][:bh_n, :bw_n].reshape(-1, 64)

        bw = _BitWriter()
        for blk in grid:
            k = 1
            run = 0
            last = 0
            va = [_pt_ac(int(blk[i]), 1) for i in range(64)]
            for i in range(63, 0, -1):
                if va[i]:
                    last = i
                    break
            while k <= last:
                if va[k] == 0:
                    run += 1
                    k += 1
                    continue
                while run >= 16:
                    code, ln = ac[0xF0]
                    bw.write(code, ln)
                    run -= 16
                size, amp = _magnitude(va[k])
                code, ln = ac[(run << 4) | size]
                bw.write(code, ln)
                bw.write(amp, size)
                run = 0
                k += 1
            if last < 63:
                code, ln = ac[0x00]  # EOB (run length 1)
                bw.write(code, ln)
        bw.flush()
        out.append(sos_header([cid], 1, 63, 0, 1))
        out.append(bytes(bw.buf))

        # refinement: Ah=1 -> Al=0 (G.7.2.3 mirror of the decoder)
        bw = _BitWriter()
        for blk in grid:
            hist = [_pt_ac(int(blk[i]), 1) for i in range(64)]
            newly = [i for i in range(1, 64)
                     if hist[i] == 0 and blk[i] != 0]
            k = 1
            for j in newly:
                # count zero-history positions in k..j-1, collecting
                # correction bits of the nonzero-history ones passed;
                # a ZRL span ends AT its 16th zero (decoder mirror) —
                # nonzero-history coeffs after it belong to the next
                # code's correction bits
                while True:
                    run = 0
                    corr = []
                    i = k
                    while i < j and run < 16:
                        if hist[i] == 0:
                            run += 1
                        else:
                            corr.append(int(blk[i]) & 1)
                        i += 1
                    if run == 16:  # need a ZRL first
                        code, ln = ac[0xF0]
                        bw.write(code, ln)
                        for b in corr:
                            bw.write(b, 1)
                        k = i
                        continue
                    code, ln = ac[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if blk[j] > 0 else 0, 1)
                    for b in corr:
                        bw.write(b, 1)
                    k = j + 1
                    break
            # trailing correction bits (if any nonzero-history coeffs
            # remain) ride on an EOB
            tail = [int(blk[i]) & 1 for i in range(k, 64)
                    if hist[i] != 0]
            if k <= 63:
                code, ln = ac[0x00]
                bw.write(code, ln)
                for b in tail:
                    bw.write(b, 1)
        bw.flush()
        out.append(sos_header([cid], 1, 63, 1, 0))
        out.append(bytes(bw.buf))

    out.append(b"\xff\xd9")
    return b"".join(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops AT any
    non-stuffed marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: feed 1-padding, don't consume
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def _ensure(self, n: int):
        while self.nbits < n:
            self._fill()

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_marker(self) -> int:
        """Skip pad bits to the next marker; return its second byte."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return 0xD9


def _huff_decode(br: _BitReader, table) -> int:
    """O(1) table-driven decode: peek 16 bits, look up (sym, len),
    consume len. The fill at a trailing marker feeds 1-padding, so
    peeking past the scan end is safe (pos never passes the marker)."""
    br._ensure(16)
    v = table[(br.acc >> (br.nbits - 16)) & 0xFFFF]
    if v == 0:
        raise ValueError("bad Huffman code")
    br.nbits -= v & 0xFF
    return v >> 8


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    if amp < (1 << (size - 1)):
        return amp - (1 << size) + 1
    return amp


def exif_orientation(data: bytes) -> int:
    """EXIF orientation (1..8) from a JPEG's APP1 segment, or 1 if
    absent/unparseable. Minimal TIFF walk: APP1 "Exif\\0\\0" header,
    byte-order mark (II/MM), IFD0 entry scan for tag 0x0112. Phone
    cameras store sensor-rotated pixels with this tag, so a pipeline
    that ignores it fingerprints/resizes sideways images."""
    if data is None or len(data) < 4 or data[:2] != b"\xff\xd8":
        return 1
    try:
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return 1
            marker = data[pos + 1]
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seg_len,) = struct.unpack_from(">H", data, pos + 2)
            if marker == 0xDA:  # entropy data starts: no EXIF ahead
                return 1
            if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
                t = data[pos + 10:pos + 2 + seg_len]  # TIFF stream
                if t[:2] == b"II":
                    u16 = "<H"
                    u32 = "<I"
                elif t[:2] == b"MM":
                    u16 = ">H"
                    u32 = ">I"
                else:
                    return 1
                (ifd0,) = struct.unpack_from(u32, t, 4)
                (n,) = struct.unpack_from(u16, t, ifd0)
                for i in range(n):
                    e = ifd0 + 2 + 12 * i
                    (tag,) = struct.unpack_from(u16, t, e)
                    if tag == 0x0112:
                        (v,) = struct.unpack_from(u16, t, e + 8)
                        return v if 1 <= v <= 8 else 1
                return 1
            pos += 2 + seg_len
    except (struct.error, IndexError):
        pass
    return 1


def exif_app1_segment(orientation: int, byte_order: str = "II") -> bytes:
    """Build a minimal APP1/EXIF segment carrying one orientation tag
    — the fixture generator for ``exif_orientation`` (our encoder
    never writes EXIF; real-world files do)."""
    bo = byte_order.encode()
    u16 = "<H" if byte_order == "II" else ">H"
    u32 = "<I" if byte_order == "II" else ">I"
    tiff = (bo + struct.pack(u16, 42) + struct.pack(u32, 8)
            + struct.pack(u16, 1)
            + struct.pack(u16, 0x0112) + struct.pack(u16, 3)
            + struct.pack(u32, 1) + struct.pack(u16, orientation)
            + b"\x00\x00" + struct.pack(u32, 0))
    payload = b"Exif\x00\x00" + tiff
    return struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload


def apply_orientation(px: np.ndarray, w: int, h: int,
                      orientation: int):
    """Apply an EXIF orientation (1..8) to a flat gray plane,
    returning (w', h', flat) in display orientation."""
    g = np.asarray(px, np.uint8).reshape(h, w)
    if orientation == 2:
        g = g[:, ::-1]
    elif orientation == 3:
        g = g[::-1, ::-1]
    elif orientation == 4:
        g = g[::-1, :]
    elif orientation == 5:
        g = g.T
    elif orientation == 6:
        g = g.T[:, ::-1]
    elif orientation == 7:
        g = g.T[::-1, ::-1]
    elif orientation == 8:
        g = g.T[::-1, :]
    hh, ww = g.shape
    return ww, hh, np.ascontiguousarray(g).reshape(-1)


def jpeg_decode_luma(data: bytes):
    """Baseline (SOF0/1) or progressive (SOF2) JPEG -> (w, h, flat
    luma uint8), or None if not decodable. Baseline chroma is
    entropy-decoded for bitstream sync but not reconstructed;
    progressive scans accumulate full per-component coefficient
    state (refinement needs chroma history too). The batched IDCT
    over the final Y coefficient blocks is one einsum."""
    if (data is None or len(data) < 4
            or data[0] != 0xFF or data[1] != 0xD8):
        return None
    try:
        return _decode_inner(data)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_inner(data: bytes):
    pos = 2
    qtabs = {}
    htabs = {}
    comps = []
    w = h = 0
    restart = 0
    progressive = False
    state = None  # per-comp zigzag coefficient grids (progressive)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg_end = pos + seg_len
        body = data[pos + 2:seg_end]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq_tq = body[i]
                if pq_tq >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.frombuffer(body[i + 1:i + 65], np.uint8)
                qtabs[pq_tq & 0xF] = t.astype(np.int32)[UNZIGZAG]
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "hs": hv >> 4, "vs": hv & 0xF,
                              "tq": tq})
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                htabs[(tc_th >> 4, tc_th & 0xF)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if not progressive:
                ns = body[0]
                scan = {}
                for si in range(ns):
                    cs, td_ta = body[1 + 2 * si:3 + 2 * si]
                    scan[cs] = (td_ta >> 4, td_ta & 0xF)
                return _decode_scan(data, seg_end, comps, scan, qtabs,
                                    htabs, w, h, restart)
            if not comps or w == 0 or h == 0:
                raise ValueError("missing SOF")
            if state is None:
                maxh = max(c["hs"] for c in comps)
                maxv = max(c["vs"] for c in comps)
                mcus_x = -(-w // (8 * maxh))
                mcus_y = -(-h // (8 * maxv))
                state = [np.zeros((mcus_y * c["vs"], mcus_x * c["hs"],
                                   64), np.int32) for c in comps]
            pos = _decode_progressive_scan(
                data, seg_end, body, comps, state, htabs, restart,
                w, h)
            continue
        pos = seg_end
    if progressive and state is not None:
        return _reconstruct_luma(state[0].reshape(-1, 64), comps[0],
                                 qtabs, state[0].shape[1], w, h)
    raise ValueError("no SOS segment")


def _next_marker(data: bytes, pos: int) -> int:
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise ValueError("unterminated scan")


def _decode_progressive_scan(data, pos, body, comps, state, htabs,
                             restart, w, h):
    """One progressive SOS: DC first / DC refine (interleaved) or AC
    first / AC refine (single component, T.81 G.2 semantics incl. EOB
    runs and correction bits). Returns the offset of the next marker."""
    ns = body[0]
    scan_comps = []
    for si in range(ns):
        cs, td_ta = body[1 + 2 * si:3 + 2 * si]
        ci = next(i for i, c in enumerate(comps) if c["id"] == cs)
        scan_comps.append((ci, td_ta >> 4, td_ta & 0xF))
    ss, se, ah_al = body[1 + 2 * ns:4 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 0xF
    br = _BitReader(data, pos)
    maxh = max(c["hs"] for c in comps)
    maxv = max(c["vs"] for c in comps)
    mcus_x = -(-w // (8 * maxh))
    mcus_y = -(-h // (8 * maxv))

    def expect_rst(n):
        m = br.align_to_marker()
        if not (0xD0 <= m <= 0xD7):
            raise ValueError("expected RST marker")

    if ss == 0:  # DC scan (interleaved over all scan components)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        preds = {ci: 0 for ci, _td, _ta in scan_comps}
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and unit and unit % restart == 0:
                    expect_rst(unit)
                    for k in preds:
                        preds[k] = 0
                for ci, td, _ta in scan_comps:
                    c = comps[ci]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            row, col = my * c["vs"] + by, mx * c["hs"] + bx
                            if ah == 0:  # first pass
                                size = _huff_decode(br, htabs[(0, td)])
                                diff = _extend(br.bits(size), size) \
                                    if size else 0
                                preds[ci] += diff
                                state[ci][row, col, 0] = preds[ci] << al
                            else:  # refinement: one raw bit
                                if br.bit():
                                    state[ci][row, col, 0] += 1 << al
                unit += 1
        return _next_marker(data, br.pos)

    # AC scan: single component, non-interleaved block order
    if ns != 1:
        raise ValueError("interleaved AC scan in progressive")
    ci, _td, ta = scan_comps[0]
    c = comps[ci]
    ac_t = htabs[(1, ta)]
    # the component's OWN sample dims -> block dims (T.81 A.1.1: AC
    # progressive scans are non-interleaved and exclude MCU padding)
    cw = -(-(w * c["hs"]) // maxh)
    ch = -(-(h * c["vs"]) // maxv)
    bw_n = -(-cw // 8)
    bh_n = -(-ch // 8)
    grid = state[ci]
    eobrun = 0
    unit = 0
    for by in range(bh_n):
        for bx in range(bw_n):
            if restart and unit and unit % restart == 0:
                expect_rst(unit)
                eobrun = 0
            unit += 1
            blk = grid[by, bx]
            if ah == 0:  # ---- AC first pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(br, ac_t)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += 16  # ZRL
                    else:
                        k += r
                        if k > se:
                            raise ValueError("AC index overflow")
                        blk[k] = _extend(br.bits(s), s) << al
                        k += 1
            else:  # ---- AC refinement pass (G.7.2)
                p1, m1 = 1 << al, -1 << al

                def corr(idx):
                    if br.bit():
                        blk[idx] += p1 if blk[idx] >= 0 else m1

                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(br, ac_t)
                        r, s = rs >> 4, rs & 0xF
                        newval = 0
                        if s:
                            if s != 1:
                                raise ValueError("bad refine size")
                            newval = p1 if br.bit() else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        while k <= se:
                            if blk[k] != 0:
                                corr(k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            corr(k)
                        k += 1
                    eobrun -= 1
    return _next_marker(data, br.pos)


def _reconstruct_luma(y_coeffs, luma, qtabs, lw_blocks, w, h):
    qt = qtabs[luma["tq"]].astype(np.float64)  # natural order
    deq = (y_coeffs[:, UNZIGZAG].astype(np.float64) * qt).reshape(-1, 8, 8)
    px = np.einsum("ki,nkl,lj->nij", _C, deq, _C) + 128.0
    px = np.clip(np.round(px), 0, 255).astype(np.uint8)
    lh_blocks = len(y_coeffs) // lw_blocks
    plane = (px.reshape(lh_blocks, lw_blocks, 8, 8)
             .transpose(0, 2, 1, 3)
             .reshape(lh_blocks * 8, lw_blocks * 8))
    return w, h, plane[:h, :w].reshape(-1)


def _decode_scan(data, pos, comps, scan, qtabs, htabs, w, h, restart):
    if not comps or w == 0 or h == 0:
        raise ValueError("missing SOF")
    maxh = max(c["hs"] for c in comps)
    maxv = max(c["vs"] for c in comps)
    mcus_x = -(-w // (8 * maxh))
    mcus_y = -(-h // (8 * maxv))
    luma = comps[0]
    lw_blocks = mcus_x * luma["hs"]
    lh_blocks = mcus_y * luma["vs"]
    y_coeffs = np.zeros((lh_blocks * lw_blocks, 64), np.int32)

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_n and mcu_n % restart == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected RST marker")
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = htabs[(0, scan[c["id"]][0])]
                ac_t = htabs[(1, scan[c["id"]][1])]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        zz = _decode_block(br, dc_t, ac_t, preds, ci)
                        if ci == 0:
                            bi = ((my * c["vs"] + by) * lw_blocks
                                  + mx * c["hs"] + bx)
                            y_coeffs[bi] = zz
            mcu_n += 1

    qt = qtabs[luma["tq"]].astype(np.float64)  # already natural order
    deq = (y_coeffs[:, UNZIGZAG].astype(np.float64)
           * qt).reshape(-1, 8, 8)
    # batched inverse orthonormal DCT: C.T @ D @ C
    px = np.einsum("ki,nkl,lj->nij", _C, deq, _C) + 128.0
    px = np.clip(np.round(px), 0, 255).astype(np.uint8)
    plane = (px.reshape(lh_blocks, lw_blocks, 8, 8)
             .transpose(0, 2, 1, 3)
             .reshape(lh_blocks * 8, lw_blocks * 8))
    return w, h, plane[:h, :w].reshape(-1)


def _decode_block(br, dc_t, ac_t, preds, ci) -> np.ndarray:
    zz = np.zeros(64, np.int32)
    size = _huff_decode(br, dc_t)
    diff = _extend(br.bits(size), size) if size else 0
    preds[ci] += diff
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index overflow")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz
