"""Pure-stdlib PNG rendering of a triples graph.

The reference serves the extraction graph as a PNG
(`/root/reference/lib/scrappy/server/server.rb` content types via
agent.rb:12 — lightrdf hands the DOT graph to graphviz). Neither
graphviz nor Pillow exists in this container, so this module IS the
renderer: a layered left-to-right layout (the visual analogue of the
DOT serializer's ``rankdir=LR``), a numpy RGB canvas, the classic
public-domain 5×7 LCD bitmap font for labels, and a minimal PNG
encoder (zlib + struct, 8-bit truecolor, filter 0) — no third-party
codec anywhere.

Scale note: PNG rendering is a driver-side convenience for SMALL
result graphs (the reference's interactive `/png/<url>` route renders
one page's extraction). It is deliberately NOT a Ray stage; callers
cap the triple count (`MAX_TRIPLES`) rather than rasterize a corpus.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAX_TRIPLES = 500  # interactive-graph guard: beyond this, a raster is unreadable anyway

# Classic 5×7 column-major LCD font (HD44780-style patterns, public
# domain); LSB = top pixel. Lowercase maps onto uppercase glyphs;
# unknown characters render as a hollow box.
_FONT = {
    "0": (0x3E, 0x51, 0x49, 0x45, 0x3E), "1": (0x00, 0x42, 0x7F, 0x40, 0x00),
    "2": (0x42, 0x61, 0x51, 0x49, 0x46), "3": (0x21, 0x41, 0x45, 0x4B, 0x31),
    "4": (0x18, 0x14, 0x12, 0x7F, 0x10), "5": (0x27, 0x45, 0x45, 0x45, 0x39),
    "6": (0x3C, 0x4A, 0x49, 0x49, 0x30), "7": (0x01, 0x71, 0x09, 0x05, 0x03),
    "8": (0x36, 0x49, 0x49, 0x49, 0x36), "9": (0x06, 0x49, 0x49, 0x29, 0x1E),
    "A": (0x7E, 0x11, 0x11, 0x11, 0x7E), "B": (0x7F, 0x49, 0x49, 0x49, 0x36),
    "C": (0x3E, 0x41, 0x41, 0x41, 0x22), "D": (0x7F, 0x41, 0x41, 0x22, 0x1C),
    "E": (0x7F, 0x49, 0x49, 0x49, 0x41), "F": (0x7F, 0x09, 0x09, 0x09, 0x01),
    "G": (0x3E, 0x41, 0x49, 0x49, 0x7A), "H": (0x7F, 0x08, 0x08, 0x08, 0x7F),
    "I": (0x00, 0x41, 0x7F, 0x41, 0x00), "J": (0x20, 0x40, 0x41, 0x3F, 0x01),
    "K": (0x7F, 0x08, 0x14, 0x22, 0x41), "L": (0x7F, 0x40, 0x40, 0x40, 0x40),
    "M": (0x7F, 0x02, 0x0C, 0x02, 0x7F), "N": (0x7F, 0x04, 0x08, 0x10, 0x7F),
    "O": (0x3E, 0x41, 0x41, 0x41, 0x3E), "P": (0x7F, 0x09, 0x09, 0x09, 0x06),
    "Q": (0x3E, 0x41, 0x51, 0x21, 0x5E), "R": (0x7F, 0x09, 0x19, 0x29, 0x46),
    "S": (0x46, 0x49, 0x49, 0x49, 0x31), "T": (0x01, 0x01, 0x7F, 0x01, 0x01),
    "U": (0x3F, 0x40, 0x40, 0x40, 0x3F), "V": (0x1F, 0x20, 0x40, 0x20, 0x1F),
    "W": (0x3F, 0x40, 0x38, 0x40, 0x3F), "X": (0x63, 0x14, 0x08, 0x14, 0x63),
    "Y": (0x07, 0x08, 0x70, 0x08, 0x07), "Z": (0x61, 0x51, 0x49, 0x45, 0x43),
    " ": (0x00, 0x00, 0x00, 0x00, 0x00), ":": (0x00, 0x36, 0x36, 0x00, 0x00),
    "/": (0x20, 0x10, 0x08, 0x04, 0x02), ".": (0x00, 0x60, 0x60, 0x00, 0x00),
    "-": (0x08, 0x08, 0x08, 0x08, 0x08), "_": (0x40, 0x40, 0x40, 0x40, 0x40),
    "#": (0x14, 0x7F, 0x14, 0x7F, 0x14), "?": (0x02, 0x01, 0x51, 0x09, 0x06),
    "=": (0x14, 0x14, 0x14, 0x14, 0x14), "&": (0x36, 0x49, 0x55, 0x22, 0x50),
    "+": (0x08, 0x08, 0x3E, 0x08, 0x08), "%": (0x23, 0x13, 0x08, 0x64, 0x62),
    ",": (0x00, 0x50, 0x30, 0x00, 0x00), '"': (0x00, 0x07, 0x00, 0x07, 0x00),
    "'": (0x00, 0x05, 0x03, 0x00, 0x00), "~": (0x08, 0x04, 0x08, 0x10, 0x08),
    "(": (0x00, 0x1C, 0x22, 0x41, 0x00), ")": (0x00, 0x41, 0x22, 0x1C, 0x00),
    "!": (0x00, 0x00, 0x5F, 0x00, 0x00), "@": (0x3E, 0x41, 0x5D, 0x55, 0x1E),
}
_UNKNOWN = (0x7F, 0x41, 0x41, 0x41, 0x7F)

_BG = (255, 255, 255)
_BORDER = (40, 40, 40)
_FILL_URI = (226, 238, 254)
_FILL_LIT = (254, 244, 214)
_EDGE = (120, 120, 120)
_TEXT = (20, 20, 20)

_CH_W, _CH_H = 6, 7  # 5px glyph + 1px spacing
_PAD_X, _PAD_Y = 4, 3
_NODE_H = _CH_H + 2 * _PAD_Y
_GAP_X, _GAP_Y = 70, 14  # gap_x leaves room for edge labels
_MAX_LABEL = 28
_MAX_SIDE = 4096  # hard canvas clamp


def _glyphs():
    # char -> 7x5 bool bitmap, built once
    out = {}
    for ch, cols in _FONT.items():
        g = np.zeros((7, 5), bool)
        for x, bits in enumerate(cols):
            for y in range(7):
                if bits >> y & 1:
                    g[y, x] = True
        out[ch] = g
    out[None] = np.array(
        [[bool(b >> y & 1) for b in _UNKNOWN] for y in range(7)]
    )
    return out


_GLYPHS = _glyphs()


def _text(img, x: int, y: int, s: str, color=_TEXT):
    h, w, _ = img.shape
    for i, ch in enumerate(s):
        g = _GLYPHS.get(ch)
        if g is None:
            g = _GLYPHS.get(ch.upper())
        if g is None:
            g = _GLYPHS[None]
        x0 = x + i * _CH_W
        if x0 + 5 > w or y + 7 > h or x0 < 0 or y < 0:
            break
        img[y : y + 7, x0 : x0 + 5][g] = color


def _line(img, x0: int, y0: int, x1: int, y1: int, color=_EDGE):
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    xs = np.rint(np.linspace(x0, x1, n + 1)).astype(int)
    ys = np.rint(np.linspace(y0, y1, n + 1)).astype(int)
    h, w, _ = img.shape
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[keep], xs[keep]] = color


def _box(img, x: int, y: int, w: int, h: int, fill, border=_BORDER):
    H, W, _ = img.shape
    x1, y1 = min(x + w, W - 1), min(y + h, H - 1)
    x, y = max(x, 0), max(y, 0)
    if x >= x1 or y >= y1:
        return
    img[y : y1 + 1, x : x1 + 1] = fill
    img[y, x : x1 + 1] = border
    img[y1, x : x1 + 1] = border
    img[y : y1 + 1, x] = border
    img[y : y1 + 1, x1] = border


def _clip(label: str) -> str:
    return label if len(label) <= _MAX_LABEL else label[: _MAX_LABEL - 1] + "~"


def _layout(n_nodes: int, edges) -> list[int]:
    """Layer per node: BFS depth from in-degree-0 roots (all of a cycle's
    nodes fall back to layer 0) — the rankdir=LR analogue."""
    indeg = [0] * n_nodes
    adj: list[list[int]] = [[] for _ in range(n_nodes)]
    for a, b, _p in edges:
        if a != b:
            indeg[b] += 1
            adj[a].append(b)
    layer = [-1] * n_nodes
    frontier = [i for i in range(n_nodes) if indeg[i] == 0] or list(range(min(n_nodes, 1)))
    for i in frontier:
        layer[i] = 0
    depth = 0
    while frontier and depth < n_nodes:
        depth += 1
        nxt = []
        for i in frontier:
            for j in adj[i]:
                if layer[j] < 0:
                    layer[j] = depth
                    nxt.append(j)
        frontier = nxt
    return [max(v, 0) for v in layer]


def render_graph_png(nodes, edges) -> bytes:
    """``nodes``: list of (label, is_literal); ``edges``: list of
    (src_idx, dst_idx, predicate_label). Returns PNG bytes."""
    if not nodes:
        nodes = [("(empty graph)", False)]
    layers = _layout(len(nodes), edges)
    n_layers = max(layers) + 1

    labels = [_clip(lb) for lb, _ in nodes]
    col_w = [0] * n_layers
    col_members: list[list[int]] = [[] for _ in range(n_layers)]
    for i, ly in enumerate(layers):
        col_members[ly].append(i)
        col_w[ly] = max(col_w[ly], len(labels[i]) * _CH_W + 2 * _PAD_X)

    xs, acc = [], _GAP_X // 2
    for w in col_w:
        xs.append(acc)
        acc += w + _GAP_X
    width = min(acc, _MAX_SIDE)
    height = min(
        max((len(m) for m in col_members), default=1) * (_NODE_H + _GAP_Y) + _GAP_Y,
        _MAX_SIDE,
    )

    img = np.empty((height, width, 3), np.uint8)
    img[:] = _BG

    pos = {}
    for ly, members in enumerate(col_members):
        for row, i in enumerate(members):
            x = xs[ly]
            y = _GAP_Y + row * (_NODE_H + _GAP_Y)
            w = len(labels[i]) * _CH_W + 2 * _PAD_X
            pos[i] = (x, y, w)

    # edges under boxes
    for k, (a, b, pred) in enumerate(edges):
        xa, ya, wa = pos[a]
        xb, yb, _wb = pos[b]
        x0, y0 = xa + wa, ya + _NODE_H // 2
        x1, y1 = xb, yb + _NODE_H // 2
        if x1 <= x0:  # back edge: route below
            x1 = xb + pos[b][2]
        _line(img, x0, y0, x1, y1)
        mx, my = (x0 + x1) // 2, (y0 + y1) // 2 - _CH_H - 1 + (k % 3) * 3
        _text(img, mx - len(_clip(pred)) * _CH_W // 2, my, _clip(pred), _EDGE)

    for i, (label, lit) in enumerate(nodes):
        x, y, w = pos[i]
        _box(img, x, y, w, _NODE_H, _FILL_LIT if lit else _FILL_URI)
        _text(img, x + _PAD_X, y + _PAD_Y, labels[i])

    return png_encode(img)


def png_encode(img: np.ndarray) -> bytes:
    """8-bit RGB truecolor PNG, filter 0 per scanline (ISO 15948)."""
    h, w, _ = img.shape
    raw = np.empty((h, w * 3 + 1), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode OUR OWN encoder's output (filter-0 8-bit RGB only) — used
    by tests to round-trip without any third-party codec."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    off, idat, w = 8, b"", 0
    h = 0
    while off < len(data):
        (ln,) = struct.unpack(">I", data[off : off + 4])
        typ = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + ln]
        (crc,) = struct.unpack(">I", data[off + 8 + ln : off + 12 + ln])
        assert crc == zlib.crc32(typ + body) & 0xFFFFFFFF, "bad CRC"
        if typ == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert (depth, ctype) == (8, 2)
        elif typ == b"IDAT":
            idat += body
        off += 12 + ln
    rows = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    assert (rows[:, 0] == 0).all(), "only filter 0 supported"
    return rows[:, 1:].reshape(h, w, 3).copy()
