"""GIF (87a/89a) codec on the stdlib + numpy only.

The third real image interchange format behind the multimodal decode
seam (PNG + JPEG in their own modules). GIF is lossless over an
indexed palette, so with the grayscale-256 palette the round-trip is
BIT-EXACT — the codec's cross-check (tests/test_jpeg.py).

``gif_encode_gray`` writes a true LZW-compressed stream (dict growth,
code-width increases, clear at 4096 — so the decoder's dictionary
path including the KwKwK case is exercised by real fixtures), with
optional interlacing. ``gif_decode_gray`` parses either version:
logical screen + global/local color tables, 0x21 extension skipping
(sub-block chains), the 4-pass interlace reorder, and first-frame
extraction for animated files; palette entries fold to luma via the
JFIF weights.

Scale note: runs inside the ``decode_images`` actor-pool stage —
payload-bounded per-row work, same contract as the PNG/JPEG paths.
"""
from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- encoder


class _LsbBitWriter:
    """LSB-first bit packer (GIF's LZW bit order — opposite of JPEG)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int):
        self.acc |= (value & ((1 << width) - 1)) << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """Standard GIF LZW: emit CLEAR, build the string table up to
    4095 (re-CLEAR after), code width grows at table size."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LsbBitWriter()

    def reset():
        return ({(i,): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = reset()
    bw.write(clear, width)
    prefix = ()
    for sym in indices.tolist():
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        bw.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            bw.write(clear, width)
            table, next_code, width = reset()
        prefix = (sym,)
    if prefix:
        bw.write(table[prefix], width)
    bw.write(eoi, width)
    bw.flush()
    return bytes(bw.buf)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.array(rows, np.int64)


def gif_encode_gray(img: np.ndarray, interlace: bool = False,
                    version: bytes = b"GIF89a") -> bytes:
    """Encode (h, w) uint8 grayscale as a GIF with the identity
    256-gray global palette — losslessly (the round-trip is exact)."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape
    out = [version, struct.pack("<HH", w, h),
           bytes([0xF7, 0, 0])]  # GCT present, 256 entries, 8-bit
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out.append(pal.tobytes())
    if version == b"GIF89a":
        # a GCE extension, exercising the decoder's 0x21 skip path
        out.append(bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0]))
    flags = 0x40 if interlace else 0x00  # no LCT
    out.append(bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
               + bytes([flags]))
    rows = img[_interlace_order(h)] if interlace else img
    data = _lzw_compress(rows.reshape(-1), 8)
    out.append(bytes([8]))  # LZW minimum code size
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(bytes([len(chunk)]) + chunk)
    out.append(bytes([0, 0x3B]))  # block terminator + trailer
    return b"".join(out)


# ---------------------------------------------------------------- decoder


class _LsbBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decompress(data: bytes, min_code_size: int,
                    n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _LsbBitReader(data)
    out = np.empty(n_expected, np.uint8)
    n = 0

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset()
    prev = None
    while n < n_expected:
        code = br.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("bad LZW code")
        take = min(len(entry), n_expected - n)
        out[n:n + take] = np.frombuffer(entry[:take], np.uint8)
        n += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n < n_expected:
        raise ValueError("LZW underrun")
    return out


def gif_decode_gray(data: bytes):
    """GIF -> (w, h, flat grayscale uint8) of the FIRST image, or
    None if not a decodable GIF. Palette folds to luma (JFIF
    weights, rounded); extensions are skipped via their sub-block
    chains; interlaced images are de-interlaced."""
    if data is None or len(data) < 13 or data[:4] != b"GIF8":
        return None
    try:
        return _gif_inner(data)
    except (ValueError, IndexError, struct.error):
        return None


def _gif_inner(data: bytes):
    sw, sh = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-block chain
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError("unknown GIF block")
        _left, _top, w, h = struct.unpack_from("<HHHH", data, pos)
        iflags = data[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("no color table")
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decompress(b"".join(chunks), min_code, w * h)
        luma = np.clip(np.round(
            0.299 * pal[:, 0].astype(np.float64)
            + 0.587 * pal[:, 1] + 0.114 * pal[:, 2]), 0,
            255).astype(np.uint8)
        px = luma[idx].reshape(h, w)
        if iflags & 0x40:  # de-interlace
            un = np.empty_like(px)
            un[_interlace_order(h)] = px
            px = un
        return w, h, px.reshape(-1)
    raise ValueError("no image block")


# ------------------------------------------------------------- BMP (bonus)


def bmp_encode_gray(img: np.ndarray, bottom_up: bool = True) -> bytes:
    """(h, w) uint8 grayscale as an 8-bit palettized BMP
    (BITMAPINFOHEADER, 4-byte row padding, optional top-down rows via
    negative height) — lossless, the fixture generator."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape
    stride = (w + 3) & ~3
    pal = bytearray()
    for i in range(256):
        pal += bytes([i, i, i, 0])  # BGRA palette entries
    rows = img[::-1] if bottom_up else img
    px = np.zeros((h, stride), np.uint8)
    px[:, :w] = rows
    data = px.tobytes()
    off = 14 + 40 + 1024
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w,
                            h if bottom_up else -h,
                            1, 8, 0, len(data), 2835, 2835, 256, 0))
    return header + bytes(pal) + data


def bmp_decode_gray(data: bytes):
    """8/24-bit uncompressed BMP -> (w, h, flat gray uint8) or None.
    Handles bottom-up and top-down rows, row padding, palettes
    (folded to luma)."""
    if data is None or len(data) < 54 or data[:2] != b"BM":
        return None
    try:
        (off,) = struct.unpack_from("<I", data, 10)
        hdr_size, w, h_raw = struct.unpack_from("<Iii", data, 14)
        planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
        if hdr_size < 40 or planes != 1 or comp != 0 or w <= 0:
            return None
        if bpp not in (8, 24):
            return None
        bottom_up = h_raw > 0
        h = abs(h_raw)
        if h == 0:
            return None
        stride = ((w * bpp // 8) + 3) & ~3
        raw = np.frombuffer(data, np.uint8, count=stride * h,
                            offset=off).reshape(h, stride)
        if bpp == 8:
            n_colors = struct.unpack_from("<I", data, 46)[0] or 256
            pal = np.frombuffer(data, np.uint8, count=4 * n_colors,
                                offset=14 + hdr_size).reshape(-1, 4)
            luma = np.clip(np.round(
                0.299 * pal[:, 2].astype(np.float64)
                + 0.587 * pal[:, 1] + 0.114 * pal[:, 0]),
                0, 255).astype(np.uint8)
            px = luma[raw[:, :w]]
        else:  # 24-bit BGR
            row = raw[:, :w * 3].reshape(h, w, 3).astype(np.float64)
            px = np.clip(np.round(0.299 * row[:, :, 2]
                                  + 0.587 * row[:, :, 1]
                                  + 0.114 * row[:, :, 0]),
                         0, 255).astype(np.uint8)
        if bottom_up:
            px = px[::-1]
        return w, h, np.ascontiguousarray(px).reshape(-1)
    except (ValueError, struct.error):
        return None
