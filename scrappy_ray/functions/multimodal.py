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


def decode_images(ds, concurrency: int = 2, batch_size: int = 32, real: bool = False):
    """The image pipeline stage: small batches (large binaries), actor
    pool (decoder state loaded once per actor). ``real=True`` selects
    the Pillow-backed decoder (NotImplementedError where Pillow is
    absent — this container)."""
    return ds.map_batches(
        PILImageDecoder if real else FakeImageDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, stride: int = 2, concurrency: int = 2, batch_size: int = 8,
                  real: bool = False):
    """The video pipeline stage: tiny batches (video payloads dwarf
    images), actor pool. ``real=True`` selects the imageio/ffmpeg-backed
    sampler (NotImplementedError where those are absent — this
    container)."""
    return ds.map_batches(
        ImageIOFrameSampler if real else FakeFrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
