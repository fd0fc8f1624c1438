"""Stdlib baseline-JPEG codec (functions/jpeg.py): round-trip
accuracy across quality / subsampling / restart variants, exactness
where the math demands it, and the Ray actor-stage integration."""

import numpy as np
import pyarrow as pa
import pytest

from scrappy_ray.functions.jpeg import (
    _rgb_to_ycbcr,
    jpeg_decode_luma,
    jpeg_encode,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((np.sin(xx / 9.0) + np.cos(yy / 7.0) + 2) / 4 * 255).astype(
        np.uint8)


def test_uniform_midgray_roundtrips_exactly():
    # 128 level-shifts to 0 -> every DCT coefficient 0 -> exact at any Q
    img = np.full((24, 40), 128, np.uint8)
    w, h, px = jpeg_decode_luma(jpeg_encode(img, 90))
    assert (w, h) == (40, 24)
    assert (px == 128).all()


def test_quality_100_near_lossless():
    img = _gradient(37, 53)  # non-multiple-of-8 dims exercise the crop
    w, h, px = jpeg_decode_luma(jpeg_encode(img, 100))
    assert (w, h) == (53, 37)
    mae = np.abs(px.reshape(h, w).astype(float) - img.astype(float)).mean()
    assert mae < 0.2


def test_quality_curve_monotone_and_tight():
    img = _gradient(37, 53)
    maes = []
    for q in (95, 75, 50):
        w, h, px = jpeg_decode_luma(jpeg_encode(img, q))
        maes.append(np.abs(px.reshape(h, w).astype(float)
                           - img.astype(float)).mean())
    assert maes[0] < 0.6 and maes[-1] < 2.0
    assert maes == sorted(maes)  # lower quality -> no better


@pytest.mark.parametrize("sub", ["444", "420"])
def test_color_jpeg_luma_matches_ycbcr_y(sub):
    yy, xx = np.mgrid[0:37, 0:53]
    rgb = np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256],
                   axis=-1).astype(np.uint8)
    w, h, px = jpeg_decode_luma(jpeg_encode(rgb, 90, subsampling=sub))
    assert (w, h) == (53, 37)
    ytrue = _rgb_to_ycbcr(rgb)[..., 0]
    mae = np.abs(px.reshape(h, w).astype(float) - ytrue).mean()
    # luma error independent of chroma subsampling (chroma only has to
    # keep the entropy stream in sync)
    assert mae < 0.8


def test_restart_markers_roundtrip():
    img = _gradient(37, 53)
    data = jpeg_encode(img, 75, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    w, h, px = jpeg_decode_luma(data)
    mae = np.abs(px.reshape(h, w).astype(float) - img.astype(float)).mean()
    assert mae < 2.0
    # same image without restarts decodes to identical pixels: RSTn
    # placement must not change the reconstruction
    w2, h2, px2 = jpeg_decode_luma(jpeg_encode(img, 75))
    assert (px == px2).all()


def test_decoder_rejects_garbage_not_crashes():
    assert jpeg_decode_luma(None) is None
    assert jpeg_decode_luma(b"") is None
    assert jpeg_decode_luma(b"\x89PNG\r\n\x1a\n") is None
    good = jpeg_encode(np.full((8, 8), 77, np.uint8), 90)
    assert jpeg_decode_luma(good[:20]) is None  # truncated
    assert jpeg_decode_luma(good) is not None


def test_decoder_skips_appn_and_com_segments():
    good = jpeg_encode(np.full((8, 8), 200, np.uint8), 90)
    # splice a COM segment right after SOI
    com = b"\xff\xfe" + (11).to_bytes(2, "big") + b"comment!\x00"
    spliced = good[:2] + com + good[2:]
    w, h, px = jpeg_decode_luma(spliced)
    assert (w, h) == (8, 8)
    assert np.abs(px.astype(int) - 200).max() <= 1


def test_jpeg_actor_stage_in_ray(ray_session):
    import ray.data

    from scrappy_ray.functions.multimodal import StdlibJpegDecoder

    imgs = [_gradient(16, 24), _gradient(8, 8)]
    tbl = pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array(
            [jpeg_encode(imgs[0], 90), jpeg_encode(imgs[1], 75),
             b"not a jpeg"], pa.binary()),
    })
    out = (ray.data.from_arrow(tbl)
           .map_batches(StdlibJpegDecoder, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=4, concurrency=1)
           .sort("id").to_pandas())
    assert list(out["ok"]) == [True, True, False]
    assert list(out["width"].dropna().astype(int)) == [24, 8]
    exp0 = float(imgs[0].mean())
    assert abs(out["mean_px"][0] - exp0) < 2.0


def test_real_image_decoder_sniffs_jpeg_and_png(ray_session):
    import ray.data

    from scrappy_ray.functions.multimodal import decode_images
    from scrappy_ray.functions.multimodal import png_encode_filtered

    g = _gradient(12, 16)
    rgb = np.stack([g, g, g], axis=-1)
    tbl = pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(
            [jpeg_encode(g, 90), png_encode_filtered(rgb)], pa.binary()),
    })
    out = decode_images(ray.data.from_arrow(tbl), real=True,
                        concurrency=1).sort("id").to_pandas()
    assert list(out["ok"]) == [True, True]
    assert list(out["width"].astype(int)) == [16, 16]
    # both are (nearly) the same grayscale content
    assert abs(out["mean_px"][0] - out["mean_px"][1]) < 2.0


# ---------------------------------------------------------------- dHash


def test_dhash_stable_under_reencode_distinct_across_images():
    from scrappy_ray.functions.multimodal import dhash64

    yy, xx = np.mgrid[0:48, 0:64]
    img = ((np.sin(xx / 11.0) * np.cos(yy / 13.0) + 1) * 127).astype(
        np.uint8)
    ref = dhash64(img.reshape(-1), 64, 48)
    for q in (95, 85):
        w, h, px = jpeg_decode_luma(jpeg_encode(img, q))
        assert bin(ref ^ dhash64(px, w, h)).count("1") <= 3
    other = ((np.cos(xx / 5.0) * np.sin(yy / 7.0) + 1) * 127).astype(
        np.uint8)
    assert bin(ref ^ dhash64(other.reshape(-1), 64, 48)).count("1") > 10


def test_dhash_tiny_image_upsample_path():
    from scrappy_ray.functions.multimodal import dhash64

    small = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert isinstance(dhash64(small.reshape(-1), 4, 3), int)


def test_hash64_band_pairs_pigeonhole(ray_session):
    import ray.data

    from scrappy_ray.functions.dedup import hash64_band_pairs

    # ids 0,1 differ in 3 bits (found); 0,2 differ in ~32 (not found)
    h0 = 0x0123456789ABCDEF
    h1 = h0 ^ 0b111  # hamming 3, same top 3 bands
    h2 = h0 ^ 0x5555555500000000 ^ 0x33333333  # spread over all bands
    tbl = pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "h64": pa.array(np.array([h0, h1, h2], np.uint64).view(np.int64),
                        pa.int64()),
    })
    df = (hash64_band_pairs(ray.data.from_arrow(tbl))
          .sort(["id_a", "id_b"]).to_pandas())
    assert list(zip(df.id_a, df.id_b)) == [(0, 1)]


def test_image_near_dup_pairs_end_to_end(ray_session):
    import ray.data

    from scrappy_ray.functions.multimodal import (image_near_dup_pairs,
                                                  png_encode_filtered)

    rng = np.random.RandomState(7)
    base_a = np.kron(rng.randint(0, 256, (8, 8), dtype=np.int64),
                     np.ones((5, 7), np.int64)).astype(np.uint8)
    base_b = np.kron(rng.randint(0, 256, (8, 8), dtype=np.int64),
                     np.ones((5, 7), np.int64)).astype(np.uint8)
    tbl = pa.table({
        "id": pa.array([0, 1, 10, 11, 99], pa.int64()),
        "payload": pa.array([
            jpeg_encode(base_a, 95),
            png_encode_filtered(np.stack([base_a] * 3, axis=-1)),
            jpeg_encode(base_b, 95),
            jpeg_encode(base_b, 85),
            b"undecodable junk",
        ], pa.binary()),
    })
    df = (image_near_dup_pairs(ray.data.from_arrow(tbl), concurrency=1)
          .sort(["id_a", "id_b"]).to_pandas())
    assert list(zip(df.id_a, df.id_b)) == [(0, 1), (10, 11)]


def test_resize_images_roundtrips_through_real_codecs(ray_session):
    import ray.data

    from scrappy_ray.functions.multimodal import (_png_to_gray,
                                                  resize_images)

    g = _gradient(40, 56)
    tbl = pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([jpeg_encode(g, 92), b"junk"], pa.binary()),
    })
    out = (resize_images(ray.data.from_arrow(tbl), out_w=16, out_h=12,
                         concurrency=1).sort("id").to_pandas())
    assert list(out["ok"]) == [True, False]
    w, h, px = _png_to_gray(out["payload"][0])
    assert (w, h) == (16, 12)
    # resized content tracks the source's mean brightness
    assert abs(px.astype(float).mean() - g.astype(float).mean()) < 3.0
    assert out["payload"][1] is None


def test_audio_fingerprint_gain_invariant_tone_sensitive():
    from scrappy_ray.functions.multimodal import (audio_fingerprint64,
                                                  make_fake_wav)
    import io
    import wave

    def xn(b):
        with wave.open(io.BytesIO(b), "rb") as w:
            raw = w.readframes(w.getnframes())
        return np.frombuffer(raw, np.int16).astype(np.float64) / 32767.0

    a = audio_fingerprint64(xn(make_fake_wav(440, 2000)))
    b = audio_fingerprint64(xn(make_fake_wav(440, 2000, amplitude=0.25)))
    c = audio_fingerprint64(xn(make_fake_wav(523, 2000)))
    assert bin(a ^ b).count("1") == 0   # pure gain change
    assert bin(a ^ c).count("1") > 10   # different tone


def test_mm_dedup_clusters_matches_frozen_golden(ray_session):
    """Cross-modal dedup composition (text simhash ∪ image dHash ∪
    audio fingerprint → connected components): the kept set equals
    the committed golden — one root per 3-mirror group (the linking
    modality rotates per group) plus every singleton."""
    import os
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as E

    got = E.queries()["mm_dedup_clusters"](
        "/root/testdata/sf0.001").to_pandas()
    gold = pq.read_table(os.path.join(
        os.path.dirname(__file__), "golden", "oracle",
        "mm_dedup_clusters.parquet")).to_pandas()
    assert list(got.doc_id) == list(gold.doc_id)


# ---------------------------------------------------------- progressive


def test_progressive_decodes_pixel_identical_to_baseline():
    """Progressive (SOF2) and baseline encodes carry the SAME
    quantized coefficients, so decoding both must give bit-identical
    pixels — validating all four progressive scan types against the
    already-validated baseline path."""
    from scrappy_ray.functions.jpeg import jpeg_encode_progressive

    yy, xx = np.mgrid[0:37, 0:53]
    rgb = np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256],
                   axis=-1).astype(np.uint8)
    gray = _gradient(37, 53)
    for img, sub in [(gray, "444"), (rgb, "444"), (rgb, "420")]:
        for q in (90, 50):
            db = jpeg_decode_luma(jpeg_encode(img, q, subsampling=sub))
            dp = jpeg_decode_luma(
                jpeg_encode_progressive(img, q, subsampling=sub))
            assert dp is not None
            assert db[:2] == dp[:2]
            assert (db[2] == dp[2]).all()


def test_progressive_noise_battery_zrl_and_eob_paths():
    """Random noise at low quality maximizes ZRL-in-refinement and
    EOB-run traffic; padded 4:2:0 grids exercise the non-interleaved
    AC dims diverging from the interleaved DC grid."""
    from scrappy_ray.functions.jpeg import jpeg_encode_progressive

    for seed, (h, w) in enumerate([(9, 33), (40, 25), (24, 24)]):
        rng = np.random.RandomState(100 + seed)
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for q in (75, 20):
            for sub in ("444", "420"):
                db = jpeg_decode_luma(jpeg_encode(img, q, subsampling=sub))
                dp = jpeg_decode_luma(jpeg_encode_progressive(
                    img, q, subsampling=sub))
                assert dp is not None, (h, w, q, sub)
                assert (db[2] == dp[2]).all(), (h, w, q, sub)


def test_progressive_fuzz_never_crashes():
    from scrappy_ray.functions.jpeg import (jpeg_decode_luma,
                                            jpeg_encode_progressive)

    good = jpeg_encode_progressive(np.full((8, 8), 77, np.uint8), 90)
    assert jpeg_decode_luma(good) is not None
    for cut in (10, 50, len(good) - 3):
        jpeg_decode_luma(good[:cut])  # truncated: None or decode, no raise
    jpeg_decode_luma(good[:2] + b"\xff\xc2\x00\x04\x08\x00" + good[2:])


# ---------------------------------------------------------------- GIF


def test_gif_roundtrip_bit_exact_all_variants():
    """GIF over the identity gray palette is LOSSLESS: encode->decode
    must be bit-exact for plain and interlaced, 87a and 89a (with a
    GCE extension to skip), across content shapes."""
    from scrappy_ray.functions.gif import gif_decode_gray, gif_encode_gray

    rng = np.random.RandomState(5)
    for (h, w) in [(1, 1), (7, 13), (33, 47)]:
        for interlace in (False, True):
            for ver in (b"GIF87a", b"GIF89a"):
                img = rng.randint(0, 256, (h, w)).astype(np.uint8)
                r = gif_decode_gray(gif_encode_gray(
                    img, interlace=interlace, version=ver))
                assert r is not None
                ww, hh, px = r
                assert (ww, hh) == (w, h)
                assert (px.reshape(h, w) == img).all()


def test_gif_lzw_dict_growth_and_compression():
    """Repetitive content must both compress (real dict growth, not
    degenerate clear-per-symbol) and round-trip exactly — this drives
    the decoder through code-width increases, table resets at 4096,
    and the KwKwK special case."""
    from scrappy_ray.functions.gif import gif_decode_gray, gif_encode_gray

    img = np.tile(np.arange(16, dtype=np.uint8).repeat(8),
                  600)[:256 * 256].reshape(256, 256)
    data = gif_encode_gray(img)
    assert len(data) < 256 * 256 // 5  # genuinely compressed
    w, h, px = gif_decode_gray(data)
    assert (px.reshape(256, 256) == img).all()


def test_gif_decoder_rejects_garbage():
    from scrappy_ray.functions.gif import gif_decode_gray, gif_encode_gray

    assert gif_decode_gray(None) is None
    assert gif_decode_gray(b"GIF8") is None
    assert gif_decode_gray(b"not a gif at all") is None
    good = gif_encode_gray(np.full((4, 4), 9, np.uint8))
    assert gif_decode_gray(good[:15]) is None  # truncated
    assert gif_decode_gray(good) is not None


def test_real_image_decoder_sniffs_gif(ray_session):
    import ray.data

    from scrappy_ray.functions.gif import gif_encode_gray
    from scrappy_ray.functions.multimodal import decode_images

    g = _gradient(10, 14)
    tbl = pa.table({
        "id": pa.array([0], pa.int64()),
        "payload": pa.array([gif_encode_gray(g)], pa.binary()),
    })
    out = decode_images(ray.data.from_arrow(tbl), real=True,
                        concurrency=1).to_pandas()
    assert bool(out["ok"][0])
    assert int(out["width"][0]) == 14
    # GIF is lossless: decoded mean is the source mean exactly
    assert abs(out["mean_px"][0] - float(g.mean())) < 1e-9


# ---------------------------------------------------------------- EXIF


def test_exif_orientation_parse_both_byte_orders():
    from scrappy_ray.functions.jpeg import (exif_app1_segment,
                                            exif_orientation)

    base = jpeg_encode(np.full((8, 8), 50, np.uint8), 90)
    assert exif_orientation(base) == 1  # no EXIF
    for bo in ("II", "MM"):
        for o in range(1, 9):
            tagged = base[:2] + exif_app1_segment(o, bo) + base[2:]
            assert exif_orientation(tagged) == o, (bo, o)
            # APP1 must not break the pixel decode
            w, h, px = jpeg_decode_luma(tagged)
            assert (w, h) == (8, 8)
    assert exif_orientation(None) == 1
    assert exif_orientation(b"\xff\xd8\xff\xe1\x00\x04xx") == 1


def test_apply_orientation_transforms():
    from scrappy_ray.functions.jpeg import apply_orientation

    g = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)  # h=2, w=3
    w, h, px = apply_orientation(g.reshape(-1), 3, 2, 6)  # 90° CW
    assert (w, h) == (2, 3)
    assert (px.reshape(3, 2) == np.array([[4, 1], [5, 2], [6, 3]])).all()
    w, h, px = apply_orientation(g.reshape(-1), 3, 2, 3)  # 180°
    assert (w, h) == (3, 2)
    assert (px.reshape(2, 3) == np.array([[6, 5, 4], [3, 2, 1]])).all()
    w, h, px = apply_orientation(g.reshape(-1), 3, 2, 1)  # identity
    assert (px.reshape(2, 3) == g).all()


def test_resize_applies_exif_orientation(ray_session):
    import ray.data

    from scrappy_ray.functions.jpeg import exif_app1_segment
    from scrappy_ray.functions.multimodal import (_png_to_gray,
                                                  resize_images)

    img = _gradient(16, 40)  # wide landscape
    base = jpeg_encode(img, 90)
    rotated = base[:2] + exif_app1_segment(6) + base[2:]
    tbl = pa.table({
        "id": pa.array([0], pa.int64()),
        "payload": pa.array([rotated], pa.binary()),
    })
    out = resize_images(ray.data.from_arrow(tbl), out_w=8, out_h=20,
                        concurrency=1, apply_exif=True).to_pandas()
    # orientation 6 swaps w/h before the resample: the 40x16 source
    # becomes 16x40 portrait, resampled to the 8x20 target cleanly
    w, h, px = _png_to_gray(out["payload"][0])
    assert (w, h) == (8, 20)


def test_audio_resample_stage(ray_session):
    import io
    import wave

    import ray.data

    from scrappy_ray.functions.multimodal import (make_fake_wav,
                                                  resample_audio)

    tbl = pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([
            make_fake_wav(440, n_frames=800, sample_rate=8000),
            make_fake_wav(440, n_frames=800, sample_rate=8000,
                          n_channels=2),
            b"junk"], pa.binary()),
    })
    out = resample_audio(ray.data.from_arrow(tbl), target_rate=16000,
                         concurrency=1).sort("id").to_pandas()
    assert list(out["ok"]) == [True, True, False]
    assert list(out["n_frames"].dropna().astype(int)) == [1600, 1600]
    # decoded resampled tone still is a 440 Hz sine: strong
    # correlation with the reference at the new rate
    with wave.open(io.BytesIO(out["payload"][0]), "rb") as w:
        assert w.getframerate() == 16000
        y = np.frombuffer(w.readframes(w.getnframes()),
                          np.int16).astype(np.float64) / 32767.0
    t = np.arange(len(y)) / 16000.0
    ref = np.sin(2 * np.pi * 440 * t)
    corr = float(np.dot(y, ref) / (np.linalg.norm(y)
                                   * np.linalg.norm(ref)))
    assert corr > 0.99
    # mono fold of an identical-channel stereo input gives the same
    # bytes as the mono input
    assert out["payload"][0] == out["payload"][1]


def test_bmp_roundtrip_and_24bit():
    from scrappy_ray.functions.gif import bmp_decode_gray, bmp_encode_gray

    rng = np.random.RandomState(11)
    for (h, w) in [(1, 1), (5, 7), (33, 47)]:
        for bu in (True, False):
            img = rng.randint(0, 256, (h, w)).astype(np.uint8)
            r = bmp_decode_gray(bmp_encode_gray(img, bottom_up=bu))
            assert r is not None and (r[0], r[1]) == (w, h)
            assert (r[2].reshape(h, w) == img).all()
    assert bmp_decode_gray(b"BMxx") is None
    assert bmp_decode_gray(None) is None


def test_real_image_decoder_sniffs_bmp(ray_session):
    import ray.data

    from scrappy_ray.functions.gif import bmp_encode_gray
    from scrappy_ray.functions.multimodal import decode_images

    g = _gradient(10, 14)
    tbl = pa.table({
        "id": pa.array([0], pa.int64()),
        "payload": pa.array([bmp_encode_gray(g)], pa.binary()),
    })
    out = decode_images(ray.data.from_arrow(tbl), real=True,
                        concurrency=1).to_pandas()
    assert bool(out["ok"][0]) and int(out["width"][0]) == 14
    assert abs(out["mean_px"][0] - float(g.mean())) < 1e-9  # lossless
