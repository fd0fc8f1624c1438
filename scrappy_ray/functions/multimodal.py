"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches
stages.

The container has no image/audio codecs, so the DEFAULT DECODE KERNELS
ARE STUBS — ``FakeImageDecoder`` parses a deterministic synthetic
header (``b"IMG!" + w:u16 + h:u16 + pixels``). The real-codec seam is
``PILImageDecoder`` (same actor signature, same output schema): it
imports Pillow ONCE per actor in ``__init__`` and decodes any
PIL-readable payload; where Pillow is absent (this container) it
raises a documented NotImplementedError at actor construction, so
``decode_images(..., real=True)`` works wherever codecs exist and
fails loudly where they don't. Everything Ray-side (schema, batch
sizing for large binaries, actor pool, output layout) is identical
between the two."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

IMAGE_META = pa.struct([("width", pa.int32()), ("height", pa.int32()), ("mode", pa.string())])


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=width * height, dtype=np.uint8)
    return b"IMG!" + struct.pack("<HH", width, height) + pixels.tobytes()


def _image_features(px: np.ndarray) -> tuple[float, str]:
    """Shared feature kernel (fake + PIL paths): mean pixel + a
    perceptual-hash stand-in (64-cell downsample sign bits)."""
    mean_px = float(px.mean()) if px.size else 0.0
    grid = px[: (len(px) // 64) * 64].reshape(64, -1).mean(axis=1) if len(px) >= 64 else px
    bits = (grid > grid.mean()).astype(np.uint8) if grid.size else np.zeros(0, np.uint8)
    return mean_px, hashlib.blake2b(bits.tobytes(), digest_size=8).hexdigest()


class _ImageDecoderBase:
    """Actor stage: decode + feature-extract image payloads.

    batch_size MUST be small for large binaries (a 10 MB payload ×
    batch 256 = 2.5 GB in one task heap — size batch × concurrency to
    the worker, SURVEY.md §7 'wide binary rows'). Subclasses supply
    ``_decode(payload) -> (w, h, flat_gray_px) | None``."""

    def _decode(self, payload: bytes):
        raise NotImplementedError

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        out = {"id": ids, "width": [], "height": [], "mean_px": [], "phash": [], "ok": []}
        for payload in batch.column("payload").to_pylist():
            d = self._decode(payload)
            if d is None:
                out["width"].append(None)
                out["height"].append(None)
                out["mean_px"].append(None)
                out["phash"].append(None)
                out["ok"].append(False)
                continue
            w, h, px = d
            mean_px, phash = _image_features(px)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_px"].append(mean_px)
            out["phash"].append(phash)
            out["ok"].append(True)
        return pa.table(
            {
                "id": pa.array(out["id"], pa.int64()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "mean_px": pa.array(out["mean_px"], pa.float64()),
                "phash": pa.array(out["phash"], pa.string()),
                "ok": pa.array(out["ok"], pa.bool_()),
            }
        )


class FakeImageDecoder(_ImageDecoderBase):
    """Synthetic-format decoder (the container default)."""

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "no image codec in this environment; use PILImageDecoder "
                "(decode_images(real=True)) where Pillow is installed"
            )

    def _decode(self, payload: bytes):
        if payload is None or payload[:4] != b"IMG!":
            return None
        w, h = struct.unpack("<HH", payload[4:8])
        px = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
        return w, h, px


def png_encode_filtered(img: np.ndarray, filters=(0, 1, 2, 3, 4)) -> bytes:
    """Encode a (h, w, 3) uint8 image as 8-bit RGB PNG, forward-
    filtering row ``y`` with ``filters[y % len(filters)]`` — the
    fixture generator for the stdlib decoder (cycling filters so a
    round-trip exercises every un-filter branch). Pure stdlib+numpy."""
    import zlib

    h, w, _ = img.shape
    stride = w * 3
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = img[y].reshape(stride).astype(np.int32)
        f = filters[y % len(filters)]
        line = cur.copy()
        if f == 1:  # Sub
            line[3:] = (cur[3:] - cur[:-3]) % 256
        elif f == 2:  # Up
            line = (cur - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            line = (cur - (left + prev) // 2) % 256
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            line = (cur - pred) % 256
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (ISO 15948 §9): each row
    leads with a filter byte ∈ {0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth}. Row-vectorized where the filter allows (None/Up);
    Sub/Average/Paeth carry an in-row dependency so they walk the row
    in ``bpp``-strided numpy slices."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        else:
            line = cur.copy()
            if f == 1:  # Sub
                for x in range(bpp, stride):
                    line[x] = (line[x] + line[x - bpp]) & 0xFF
            elif f == 3:  # Average
                line[:bpp] = (line[:bpp] + prev[:bpp] // 2) & 0xFF
                for x in range(bpp, stride):
                    line[x] = (line[x] + (line[x - bpp] + prev[x]) // 2) & 0xFF
            elif f == 4:  # Paeth
                line[:bpp] = (line[:bpp] + prev[:bpp]) & 0xFF
                for x in range(bpp, stride):
                    a, b, c = line[x - bpp], prev[x], prev[x - bpp]
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                    line[x] = (line[x] + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {f}")
        out[y] = line.astype(np.uint8)
    return out


def _png_to_gray(data: bytes):
    """Pure-stdlib (zlib + numpy) PNG → (w, h, flat grayscale u8).

    Supports the still-image core: 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.
    RGB→gray uses PIL's exact integer luma ((R·19595 + G·38470 +
    B·7471 + 2¹⁵) >> 16) so outputs are bit-identical to
    ``PILImageDecoder`` wherever both run. Returns None on anything
    that is not such a PNG (caller marks ok=False)."""
    import zlib

    if data is None or len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    off, idat, plte = 8, b"", None
    w = h = depth = ctype = interlace = None
    try:
        while off + 8 <= len(data):
            (ln,) = struct.unpack(">I", data[off:off + 4])
            typ = data[off + 4:off + 8]
            body = data[off + 8:off + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body[:13])
            elif typ == b"PLTE":
                plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
            elif typ == b"IDAT":
                idat += body
            elif typ == b"IEND":
                break
            off += 12 + ln
        if w is None or depth != 8 or interlace != 0 or not idat:
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
        if channels is None or (ctype == 3 and plte is None):
            return None
        stride = w * channels
        raw = np.frombuffer(zlib.decompress(idat), np.uint8)
        if raw.size != h * (stride + 1):
            return None
        px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    except Exception:
        return None
    if ctype == 0:
        gray = px[:, :, 0]
    elif ctype == 4:  # gray + alpha: luma is the gray channel
        gray = px[:, :, 0]
    else:
        rgb = (plte[px[:, :, 0].astype(np.intp)] if ctype == 3
               else px[:, :, :3]).astype(np.uint32)
        gray = ((rgb[:, :, 0] * 19595 + rgb[:, :, 1] * 38470
                 + rgb[:, :, 2] * 7471 + 0x8000) >> 16).astype(np.uint8)
    return int(w), int(h), gray.ravel()


class StdlibPngDecoder(_ImageDecoderBase):
    """REAL image decode with no third-party codec: the PNG container
    (zlib inflate + scanline un-filter) implemented on the stdlib —
    so the real-codec path is exercised even in environments without
    Pillow (this container). Same actor signature / output schema as
    the fake and PIL decoders."""

    def _decode(self, payload: bytes):
        return _png_to_gray(payload)


class PILImageDecoder(_ImageDecoderBase):
    """The real-codec drop-in: Pillow imported ONCE per actor (the
    stateful-stage pattern — setup in ``__init__``, work per batch).
    Decodes any PIL-readable payload (PNG/JPEG/...) to grayscale and
    feeds the same feature kernel as the fake, so pipelines swap
    decoders without schema changes."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "PILImageDecoder requires Pillow, which is not installed "
                "in this environment"
            ) from e
        self._Image = Image

    def _decode(self, payload: bytes):
        if payload is None:
            return None
        import io

        try:
            img = self._Image.open(io.BytesIO(payload)).convert("L")
        except Exception:
            return None
        px = np.asarray(img, dtype=np.uint8).ravel()
        return img.width, img.height, px


class FakeFrameSampler:
    """Video stand-in: payload = concatenated IMG! frames; sample every
    ``stride``-th frame and emit one row per sampled frame."""

    def __init__(self, stride: int = 2, real: bool = False):
        if real:
            raise NotImplementedError("no video codec in this environment")
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"id": [], "frame_idx": [], "width": [], "height": []}
        for vid, payload in zip(batch.column("id").to_pylist(), batch.column("payload").to_pylist()):
            frames = []
            pos = 0
            buf = payload or b""
            while pos + 8 <= len(buf) and buf[pos : pos + 4] == b"IMG!":
                w, h = struct.unpack("<HH", buf[pos + 4 : pos + 8])
                frames.append((pos, w, h))
                pos += 8 + w * h
            for fi in range(0, len(frames), self.stride):
                _, w, h = frames[fi]
                out["id"].append(vid)
                out["frame_idx"].append(fi)
                out["width"].append(w)
                out["height"].append(h)
        return pa.table(
            {
                "id": pa.array(out["id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
            }
        )


def apng_encode(frames, delays_ms: int = 100,
                filters=(0, 1, 2, 3, 4)) -> bytes:
    """Encode a list of same-size (h, w, 3) uint8 frames as an APNG
    (Animated PNG, the PNG 3rd-edition animation chunks acTL/fcTL/
    fdAT) — the fixture generator for the real video-container path.
    First frame rides in IDAT, later frames in fdAT with running
    sequence numbers; every frame's scanlines cycle the PNG filters."""
    import zlib

    h, w, _ = frames[0].shape
    stride = w * 3

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    def filtered(img: np.ndarray) -> bytes:
        raw = bytearray()
        prev = np.zeros(stride, np.int32)
        for y in range(h):
            cur = img[y].reshape(stride).astype(np.int32)
            f = filters[y % len(filters)]
            line = cur.copy()
            if f == 1:
                line[3:] = (cur[3:] - cur[:-3]) % 256
            elif f == 2:
                line = (cur - prev) % 256
            elif f == 3:
                left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
                line = (cur - (left + prev) // 2) % 256
            elif f == 4:
                left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
                ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
                p = left + prev - ul
                pa_ = np.abs(p - left)
                pb = np.abs(p - prev)
                pc_ = np.abs(p - ul)
                pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                np.where(pb <= pc_, prev, ul))
                line = (cur - pred) % 256
            raw.append(f)
            raw.extend(line.astype(np.uint8).tobytes())
            prev = cur
        return zlib.compress(bytes(raw), 6)

    out = [b"\x89PNG\r\n\x1a\n",
           chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)),
           chunk(b"acTL", struct.pack(">II", len(frames), 0))]
    seq = 0
    for i, img in enumerate(frames):
        out.append(chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, delays_ms, 1000, 0, 0)))
        seq += 1
        data = filtered(img)
        if i == 0:
            out.append(chunk(b"IDAT", data))
        else:
            out.append(chunk(b"fdAT", struct.pack(">I", seq) + data))
            seq += 1
    out.append(chunk(b"IEND", b""))
    return b"".join(out)


class ApngFrameSampler:
    """REAL video-container frame sampling with no third-party codec:
    APNG (the PNG animation chunks) parsed on the stdlib, each sampled
    frame's pixel data run through the SAME zlib-inflate + un-filter
    decode as ``StdlibPngDecoder`` — so the sampled frames are
    actually decoded, not just counted. Same actor signature / output
    schema as the fake and imageio samplers. Full-frame (non-region)
    APNGs only; anything else yields no rows for that payload."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def _frames(self, payload: bytes):
        """Yield (frame_idx, w, h, zlib_data) per frame, in order."""
        if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
            return
        off = 8
        w = h = None
        cur = None  # (idx, w, h, [data chunks])
        idx = 0
        animated = False
        while off + 8 <= len(payload):
            (ln,) = struct.unpack(">I", payload[off:off + 4])
            typ = payload[off + 4:off + 8]
            body = payload[off + 8:off + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, ctype, _c, _f, inter = struct.unpack(
                    ">IIBBBBB", body[:13])
                if depth != 8 or ctype != 2 or inter != 0:
                    return
            elif typ == b"acTL":
                animated = True
            elif typ == b"fcTL":
                if cur is not None:
                    yield cur[0], cur[1], cur[2], b"".join(cur[3])
                    idx += 1
                _seq, fw, fh, fx, fy = struct.unpack(">IIIII", body[:20])
                if fx or fy or fw != w or fh != h:
                    return  # region frames unsupported
                cur = (idx, fw, fh, [])
            elif typ == b"IDAT" and cur is not None:
                cur[3].append(body)
            elif typ == b"fdAT" and cur is not None:
                cur[3].append(body[4:])  # strip sequence number
            elif typ == b"IEND":
                break
            off += 12 + ln
        if animated and cur is not None:
            yield cur[0], cur[1], cur[2], b"".join(cur[3])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        out = {"id": [], "frame_idx": [], "width": [], "height": []}
        for vid, payload in zip(batch.column("id").to_pylist(),
                                batch.column("payload").to_pylist()):
            for idx, fw, fh, data in self._frames(payload):
                if idx % self.stride:
                    continue
                try:  # REAL decode of the sampled frame
                    raw = np.frombuffer(zlib.decompress(data), np.uint8)
                    if raw.size != fh * (fw * 3 + 1):
                        continue
                    _png_unfilter(raw, fh, fw * 3, 3)
                except Exception:
                    continue
                out["id"].append(vid)
                out["frame_idx"].append(idx)
                out["width"].append(fw)
                out["height"].append(fh)
        return pa.table({
            "id": pa.array(out["id"], pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "width": pa.array(out["width"], pa.int32()),
            "height": pa.array(out["height"], pa.int32()),
        })


class ImageIOFrameSampler:
    """The real-codec frame-sampling drop-in (mirror of
    ``PILImageDecoder``): imageio + its ffmpeg plugin imported ONCE per
    actor in ``__init__``; decodes any ffmpeg-readable video payload,
    emits one row per ``stride``-th frame with the SAME output schema
    as ``FakeFrameSampler``, so pipelines swap samplers without schema
    changes. Where imageio/ffmpeg are absent (this container) it raises
    a documented NotImplementedError at actor construction."""

    def __init__(self, stride: int = 2):
        try:
            import imageio.v3 as iio  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "ImageIOFrameSampler requires imageio (+ ffmpeg plugin), "
                "which is not installed in this environment"
            ) from e
        self._iio = iio
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"id": [], "frame_idx": [], "width": [], "height": []}
        for vid, payload in zip(batch.column("id").to_pylist(), batch.column("payload").to_pylist()):
            if payload is None:
                continue
            try:
                frames = self._iio.imiter(payload, extension=".mp4")
            except Exception:
                continue
            for fi, frame in enumerate(frames):
                if fi % self.stride:
                    continue
                out["id"].append(vid)
                out["frame_idx"].append(fi)
                out["height"].append(int(frame.shape[0]))
                out["width"].append(int(frame.shape[1]))
        return pa.table(
            {
                "id": pa.array(out["id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
            }
        )


def make_fake_wav(freq_hz: float, n_frames: int = 400, sample_rate: int = 8000,
                  amplitude: float = 0.5, n_channels: int = 1) -> bytes:
    """A real (stdlib-written) 16-bit PCM WAV of a sine tone —
    deterministic test/query payloads that the REAL decoder parses."""
    import io
    import wave

    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    pcm = np.round(np.sin(2 * np.pi * freq_hz * t) * amplitude * 32767.0)
    pcm = np.tile(pcm.astype(np.int16), (n_channels, 1)).T.ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class WavAudioDecoder:
    """Audio decode + feature-extract stage. Unlike the image/video
    seams, this decoder is REAL in this container: WAV/PCM parses with
    the stdlib ``wave`` module (no third-party codec), and features are
    one numpy pass over the frames — duration, full-scale-normalized
    RMS and peak. Same actor-pool contract as the image stage: small
    batches for large binaries, undecodable payloads come back as
    ok=False rows (never dropped silently)."""

    _OFFSET_SCALE = {1: (128.0, 127.0), 2: (0.0, 32767.0), 4: (0.0, 2147483647.0)}
    _DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}

    def _decode(self, payload: bytes):
        import io
        import wave

        if payload is None:
            return None
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                sw = w.getsampwidth()
                if sw not in self._DTYPE:
                    return None
                sr, nch, nf = w.getframerate(), w.getnchannels(), w.getnframes()
                raw = w.readframes(nf)
        except Exception:
            return None
        x = np.frombuffer(raw, dtype=self._DTYPE[sw]).astype(np.float64)
        off, scale = self._OFFSET_SCALE[sw]
        xn = (x - off) / scale
        rms = float(np.sqrt(np.mean(xn * xn))) if len(xn) else 0.0
        peak = float(np.max(np.abs(xn))) if len(xn) else 0.0
        return sr, nch, nf, rms, peak

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        out = {"sample_rate": [], "n_channels": [], "n_frames": [],
               "duration_s": [], "rms": [], "peak": [], "ok": []}
        for payload in batch.column("payload").to_pylist():
            d = self._decode(payload)
            if d is None:
                for k in out:
                    out[k].append(None if k != "ok" else False)
                continue
            sr, nch, nf, rms, peak = d
            out["sample_rate"].append(sr)
            out["n_channels"].append(nch)
            out["n_frames"].append(nf)
            out["duration_s"].append(round(nf / sr, 6) if sr else None)
            out["rms"].append(round(rms, 6))
            out["peak"].append(round(peak, 6))
            out["ok"].append(True)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
                "n_channels": pa.array(out["n_channels"], pa.int32()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "duration_s": pa.array(out["duration_s"], pa.float64()),
                "rms": pa.array(out["rms"], pa.float64()),
                "peak": pa.array(out["peak"], pa.float64()),
                "ok": pa.array(out["ok"], pa.bool_()),
            }
        )


def decode_audio(ds, concurrency: int = 2, batch_size: int = 32):
    """The audio pipeline stage: actor pool, small batches (audio
    payloads are large binaries). The decoder is real (stdlib WAV) —
    see ``WavAudioDecoder``."""
    return ds.map_batches(
        WavAudioDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class StdlibJpegDecoder(_ImageDecoderBase):
    """REAL baseline-JPEG decode with no third-party codec: the full
    T.81 baseline pipeline (marker parse, Huffman entropy decode,
    dequant, batched einsum IDCT) implemented on stdlib + numpy in
    ``functions/jpeg.py``. Luma-plane output feeds the same feature
    kernel as every other decoder."""

    def _decode(self, payload: bytes):
        from .jpeg import jpeg_decode_luma

        return jpeg_decode_luma(payload)


class StdlibGifDecoder(_ImageDecoderBase):
    """REAL GIF decode with no third-party codec (functions/gif.py:
    LZW + interlace + extension skipping, first frame, palette→luma).
    Same actor contract as the PNG/JPEG decoders."""

    def _decode(self, payload: bytes):
        from .gif import gif_decode_gray

        return gif_decode_gray(payload)


class RealImageDecoder(_ImageDecoderBase):
    """The ``real=True`` decoder: Pillow when installed (any
    PIL-readable format), otherwise the stdlib codecs — PNG (zlib +
    un-filter), baseline + progressive JPEG (``functions/jpeg.py``),
    GIF and BMP (``functions/gif.py``) sniffed by magic bytes. A
    real interchange codec runs in EVERY environment; only the
    long-tail format coverage (TIFF/WebP/...) needs Pillow."""

    def __init__(self):
        try:
            self._pil = PILImageDecoder()
        except NotImplementedError:
            self._pil = None

    def _decode(self, payload: bytes):
        if self._pil is not None:
            return self._pil._decode(payload)
        if payload is not None and payload[:2] == b"\xff\xd8":
            from .jpeg import jpeg_decode_luma

            return jpeg_decode_luma(payload)
        if payload is not None and payload[:4] == b"GIF8":
            from .gif import gif_decode_gray

            return gif_decode_gray(payload)
        if payload is not None and payload[:2] == b"BM":
            from .gif import bmp_decode_gray

            return bmp_decode_gray(payload)
        return _png_to_gray(payload)


def _mean_resize(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-mean resample (h, w) -> (out_h, out_w) float64 by integer
    binning — the downsample step of dHash; upsamples by repetition
    first when the source is smaller than the target grid."""
    h, w = plane.shape
    if h < out_h:
        plane = np.repeat(plane, -(-out_h // h), axis=0)
        h = plane.shape[0]
    if w < out_w:
        plane = np.repeat(plane, -(-out_w // w), axis=1)
        w = plane.shape[1]
    row_idx = np.arange(h, dtype=np.int64) * out_h // h
    col_idx = np.arange(w, dtype=np.int64) * out_w // w
    flat = (row_idx[:, None] * out_w + col_idx[None, :]).ravel()
    sums = np.bincount(flat, weights=plane.ravel().astype(np.float64),
                       minlength=out_h * out_w)
    counts = np.bincount(flat, minlength=out_h * out_w)
    return (sums / counts).reshape(out_h, out_w)


def dhash64(px: np.ndarray, w: int, h: int) -> int:
    """64-bit difference hash (dHash): area-mean resize of the gray
    plane to 8×9, adjacent-column gradient signs packed row-major —
    a LOCALITY-PRESERVING fingerprint (re-encodes / small edits flip
    few bits), unlike the cryptographic ``phash`` column which only
    supports exact matching."""
    g = _mean_resize(np.asarray(px, np.uint8).reshape(h, w), 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class ImageDHasher:
    """Actor stage: payload -> (id, dhash) rows for near-dup banding.

    Decodes with the same magic-sniffing real-codec path as
    ``RealImageDecoder`` (Pillow where installed, stdlib PNG/JPEG
    here); undecodable payloads are dropped (near-dup of garbage is
    meaningless). Decoder built once per actor."""

    def __init__(self):
        self._decoder = RealImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = []
        hashes = []
        id_np = batch.column("id").to_pylist()
        for i, payload in enumerate(batch.column("payload").to_pylist()):
            d = self._decoder._decode(payload)
            if d is None:
                continue
            w, h, px = d
            ids.append(id_np[i])
            hashes.append(np.int64(np.uint64(dhash64(px, w, h))))
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "dhash": pa.array(np.array(hashes, np.int64), pa.int64()),
        })


def image_dhash(ds, concurrency: int = 2, batch_size: int = 32):
    """(id, payload) -> (id, dhash): the signature half of image
    near-dup. Small batches — payloads are large binaries."""
    return ds.map_batches(
        ImageDHasher,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_near_dup_pairs(ds, max_hamming: int = 3, max_bucket: int = 200,
                         concurrency: int = 2, batch_size: int = 32):
    """Image near-duplicate pairs: real decode → dHash → banded
    Hamming buckets (functions/dedup.py::hash64_band_pairs). The
    multimodal member of the dedup family — same pigeonhole banding,
    hot-bucket truncation counters and pair-distinct as the text
    path; feed the pairs to ``dedup_by_components`` for clusters."""
    from .dedup import hash64_band_pairs

    sigs = image_dhash(ds, concurrency=concurrency, batch_size=batch_size)
    return hash64_band_pairs(sigs, hash_col="dhash", id_col="id",
                             max_hamming=max_hamming,
                             max_bucket=max_bucket)


class ImageResizer:
    """Actor stage: real decode (magic-sniffed PNG/JPEG, Pillow where
    installed) → area-mean resample to a fixed (out_h, out_w) grid →
    REAL PNG re-encode — the thumbnail/normalize step of an image
    training pipeline, codec-real on both sides with no third-party
    lib. Undecodable payloads come back ok=False with a null payload
    (never silently dropped)."""

    def __init__(self, out_w: int = 32, out_h: int = 32,
                 apply_exif: bool = False):
        self._decoder = RealImageDecoder()
        self.out_w, self.out_h = int(out_w), int(out_h)
        self.apply_exif = apply_exif

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        payloads = []
        oks = []
        for payload in batch.column("payload").to_pylist():
            d = self._decoder._decode(payload)
            if d is None:
                payloads.append(None)
                oks.append(False)
                continue
            w, h, px = d
            if (self.apply_exif and payload is not None
                    and payload[:2] == b"\xff\xd8"):
                from .jpeg import apply_orientation, exif_orientation

                w, h, px = apply_orientation(
                    px, w, h, exif_orientation(payload))
            g = np.clip(np.round(_mean_resize(
                np.asarray(px, np.uint8).reshape(h, w),
                self.out_h, self.out_w)), 0, 255).astype(np.uint8)
            payloads.append(png_encode_filtered(
                np.stack([g, g, g], axis=-1), filters=(0,)))
            oks.append(True)
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([self.out_w if ok else None for ok in oks],
                              pa.int32()),
            "height": pa.array([self.out_h if ok else None for ok in oks],
                               pa.int32()),
            "ok": pa.array(oks, pa.bool_()),
        })


def resize_images(ds, out_w: int = 32, out_h: int = 32,
                  concurrency: int = 2, batch_size: int = 32,
                  apply_exif: bool = False):
    """The image-resize pipeline stage (decode → resample → re-encode
    PNG): actor pool, small batches — payloads are large binaries and
    the output is a binary column too. ``apply_exif=True`` rotates
    JPEG pixels into display orientation (tag 0x0112) first."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h,
                               "apply_exif": apply_exif},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_fingerprint64(xn: np.ndarray) -> int:
    """64-bit audio fingerprint: the signal split into 65 equal
    windows, per-window energy, adjacent-window energy-delta signs
    packed to bits — gain-invariant (signs survive any positive
    scaling) and locality-preserving under trims/re-encodes, the
    audio analogue of the image dHash."""
    x = np.asarray(xn, np.float64)
    if x.size < 65:
        x = np.pad(x, (0, 65 - x.size))
    n = x.size - x.size % 65
    e = (x[:n].reshape(65, -1) ** 2).sum(axis=1)
    bits = e[1:] > e[:-1]
    return int(np.packbits(bits).view(">u8")[0])


class AudioFingerprinter:
    """Actor stage: WAV payload -> (id, afp) rows (mono-folded PCM →
    ``audio_fingerprint64``); undecodable payloads dropped."""

    def __init__(self):
        self._decoder = WavAudioDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        ids = []
        fps = []
        id_np = batch.column("id").to_pylist()
        for i, payload in enumerate(batch.column("payload").to_pylist()):
            if payload is None:
                continue
            try:
                with wave.open(io.BytesIO(payload), "rb") as w:
                    sw = w.getsampwidth()
                    if sw not in WavAudioDecoder._DTYPE:
                        continue
                    nch = w.getnchannels()
                    raw = w.readframes(w.getnframes())
            except Exception:
                continue
            x = np.frombuffer(raw, WavAudioDecoder._DTYPE[sw]).astype(
                np.float64)
            off, scale = WavAudioDecoder._OFFSET_SCALE[sw]
            xn = (x - off) / scale
            if nch > 1:
                xn = xn.reshape(-1, nch).mean(axis=1)
            ids.append(id_np[i])
            fps.append(np.int64(np.uint64(audio_fingerprint64(xn))))
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "afp": pa.array(np.array(fps, np.int64), pa.int64()),
        })


class AudioResampler:
    """Actor stage: WAV payload → mono 16-bit PCM WAV at a fixed
    target rate (linear interpolation) — the sample-rate
    normalization step an audio training pipeline runs before
    featurization, real codec on both sides (stdlib ``wave``).
    Undecodable payloads return ok=False with a null payload."""

    def __init__(self, target_rate: int = 16000):
        self.target_rate = int(target_rate)

    def _resample(self, payload: bytes):
        import io
        import wave

        if payload is None:
            return None
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                sw = w.getsampwidth()
                if sw not in WavAudioDecoder._DTYPE:
                    return None
                sr, nch = w.getframerate(), w.getnchannels()
                raw = w.readframes(w.getnframes())
        except Exception:
            return None
        x = np.frombuffer(raw, WavAudioDecoder._DTYPE[sw]).astype(
            np.float64)
        off, scale = WavAudioDecoder._OFFSET_SCALE[sw]
        xn = (x - off) / scale
        if nch > 1:
            xn = xn.reshape(-1, nch).mean(axis=1)
        if len(xn) == 0 or sr <= 0:
            return None
        n_out = max(1, int(round(len(xn) * self.target_rate / sr)))
        t = np.linspace(0.0, len(xn) - 1.0, n_out)
        y = np.interp(t, np.arange(len(xn), dtype=np.float64), xn)
        pcm = np.round(np.clip(y, -1, 1) * 32767.0).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(self.target_rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue(), n_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        payloads = []
        frames = []
        oks = []
        for payload in batch.column("payload").to_pylist():
            r = self._resample(payload)
            if r is None:
                payloads.append(None)
                frames.append(None)
                oks.append(False)
            else:
                payloads.append(r[0])
                frames.append(r[1])
                oks.append(True)
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(
                [self.target_rate if ok else None for ok in oks],
                pa.int32()),
            "n_frames": pa.array(frames, pa.int64()),
            "ok": pa.array(oks, pa.bool_()),
        })


def resample_audio(ds, target_rate: int = 16000, concurrency: int = 2,
                   batch_size: int = 32):
    """The audio-resample pipeline stage: actor pool, small batches
    (binary in, binary out) — same contract as ``resize_images``."""
    return ds.map_batches(
        AudioResampler,
        fn_constructor_kwargs={"target_rate": target_rate},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_near_dup_pairs(ds, max_hamming: int = 3, max_bucket: int = 200,
                         concurrency: int = 2, batch_size: int = 32):
    """Audio near-duplicate pairs: real WAV decode → energy-delta
    fingerprint → the same banded Hamming machinery as text simhash
    and image dHash (functions/dedup.py::hash64_band_pairs)."""
    from .dedup import hash64_band_pairs

    sigs = ds.map_batches(
        AudioFingerprinter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return hash64_band_pairs(sigs, hash_col="afp", id_col="id",
                             max_hamming=max_hamming,
                             max_bucket=max_bucket)


def decode_images(ds, concurrency: int = 2, batch_size: int = 32, real: bool = False):
    """The image pipeline stage: small batches (large binaries), actor
    pool (decoder state loaded once per actor). ``real=True`` selects
    a real codec in every environment: Pillow where installed, else
    the stdlib PNG decoder (``StdlibPngDecoder``)."""
    return ds.map_batches(
        RealImageDecoder if real else FakeImageDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class RealFrameSampler:
    """The ``real=True`` sampler: imageio/ffmpeg when installed (any
    ffmpeg-readable container), otherwise the stdlib APNG sampler — a
    real container format runs in EVERY environment; only the format
    coverage narrows to APNG where imageio is absent."""

    def __init__(self, stride: int = 2):
        try:
            self._inner = ImageIOFrameSampler(stride=stride)
        except NotImplementedError:
            self._inner = ApngFrameSampler(stride=stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._inner(batch)


def sample_frames(ds, stride: int = 2, concurrency: int = 2, batch_size: int = 8,
                  real: bool = False):
    """The video pipeline stage: tiny batches (video payloads dwarf
    images), actor pool. ``real=True`` selects a real container in
    every environment: imageio/ffmpeg where installed, else the
    stdlib APNG sampler (``ApngFrameSampler``)."""
    return ds.map_batches(
        RealFrameSampler if real else FakeFrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
