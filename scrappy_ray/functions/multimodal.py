"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches
stages.

The container has no image/audio codecs, so the DECODE KERNELS ARE
STUBS — ``FakeImageDecoder`` parses a deterministic synthetic header
(``b"IMG!" + w:u16 + h:u16 + pixels``) and a real codec drop-in would
only replace ``_decode``; everything Ray-side (schema, batch sizing
for large binaries, actor signature, output layout) is real and
tested. ``decode_image_batch(..., real=True)`` raises
NotImplementedError by design."""

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


class FakeImageDecoder:
    """Actor stage: decode + feature-extract image payloads.

    batch_size MUST be small for large binaries (a 10 MB payload ×
    batch 256 = 2.5 GB in one task heap — size batch × concurrency to
    the worker, SURVEY.md §7 'wide binary rows')."""

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "no image codec in this environment; plug a real decoder here"
            )

    @staticmethod
    def _decode(payload: bytes):
        if payload is None or payload[:4] != b"IMG!":
            return None
        w, h = struct.unpack("<HH", payload[4:8])
        px = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
        return w, h, px

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
            out["width"].append(w)
            out["height"].append(h)
            out["mean_px"].append(float(px.mean()) if px.size else 0.0)
            # perceptual-hash stand-in: 8x8 downsample sign bits
            grid = px[: (len(px) // 64) * 64].reshape(64, -1).mean(axis=1) if len(px) >= 64 else px
            bits = (grid > grid.mean()).astype(np.uint8)
            out["phash"].append(hashlib.blake2b(bits.tobytes(), digest_size=8).hexdigest())
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


def decode_images(ds, concurrency: int = 2, batch_size: int = 32):
    """The image pipeline stage: small batches (large binaries), actor
    pool (decoder state loaded once per actor)."""
    return ds.map_batches(
        FakeImageDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, stride: int = 2, concurrency: int = 2, batch_size: int = 8):
    return ds.map_batches(
        FakeFrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
