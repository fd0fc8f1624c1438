"""Round-5 regression tests: the r4 verdict/advice worklist.

Covers the auto-switch to distributed connected components, the
empty-block guards in the join-free per-group operators, and the
revenue_share zero-total guard.
"""
import numpy as np
import pyarrow as pa
import pytest


def _docs(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })
    )


def test_dedup_by_components_auto_switches_to_distributed(
        ray_session, monkeypatch):
    """Above the pair threshold the default path must be the groupby
    label propagation — the driver union-find (O(endpoints) dict)
    must never run."""
    import ray.data

    import scrappy_ray.functions.dedup as D

    docs = _docs([(i, f"doc {i}") for i in range(6)])
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array([0, 1], pa.int64()),
                  "id_b": pa.array([1, 2], pa.int64())})
    )

    def boom(_):
        raise AssertionError("driver union-find ran on the big-input path")

    monkeypatch.setattr(D, "connected_components", boom)
    kept = sorted(
        r["doc_id"]
        for r in D.dedup_by_components(
            docs, pairs, distributed_pair_threshold=0).take_all()
    )
    assert kept == [0, 3, 4, 5]


def test_dedup_by_components_auto_small_uses_union_find(ray_session):
    """Below the threshold the default stays the union-find fast path
    and matches the distributed result."""
    import ray.data

    from scrappy_ray.functions.dedup import dedup_by_components

    docs = _docs([(i, f"doc {i}") for i in range(6)])
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array([0, 1], pa.int64()),
                  "id_b": pa.array([1, 2], pa.int64())})
    )
    kept_auto = sorted(
        r["doc_id"] for r in dedup_by_components(docs, pairs).take_all())
    kept_forced = sorted(
        r["doc_id"]
        for r in dedup_by_components(docs, pairs, distributed=True).take_all())
    assert kept_auto == kept_forced == [0, 3, 4, 5]


def test_argmin_per_group_survives_empty_blocks(ray_session):
    """An upstream filter that zeroes out whole blocks must not crash
    the per-block partial (ArrowIndexError on take([0]) of an empty
    sort)."""
    import ray.data

    from scrappy_ray.pipelines.relational import argmin_per_group

    t = pa.table({
        "g": pa.array([1, 1, 2, 2], pa.int64()),
        "v": pa.array([5.0, 3.0, 9.0, 1.0], pa.float64()),
        "id": pa.array([0, 1, 2, 3], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4).filter(expr="id >= 1")
    out = argmin_per_group(ds, "g", ["v", "id"], ["id"]).take_all()
    got = {r["g"]: r["id"] for r in out}
    assert got == {1: 1, 2: 3}


def test_first_last_per_group_survives_empty_blocks(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import first_last_per_group

    t = pa.table({
        "g": pa.array([1, 1, 2], pa.int64()),
        "o": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0], pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(4).filter(expr="o >= 2")
    out = first_last_per_group(ds, "g", ["o"], "v").take_all()
    got = {r["g"]: (r["first_v"], r["last_v"]) for r in out}
    assert got == {1: (20.0, 20.0), 2: (30.0, 30.0)}


def test_revenue_share_zero_total_returns_zero_not_nan(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import revenue_share

    t = pa.table({
        "l_extendedprice": pa.array([0.0, 0.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64()),
        "k": pa.array(["a", "b"], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    out = revenue_share(ds, lambda b: b.column("k"), "k")
    shares = out.column("share").to_pylist()
    assert shares == [0.0, 0.0]
    assert not any(np.isnan(s) for s in shares)


def test_revenue_share_empty_input(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import revenue_share

    t = pa.table({
        "l_extendedprice": pa.array([], pa.float64()),
        "l_discount": pa.array([], pa.float64()),
        "k": pa.array([], pa.string()),
    })
    out = revenue_share(ray.data.from_arrow(t), lambda b: b.column("k"), "k")
    assert out.num_rows == 0


def test_domain_filter_semi_join_fallback_matches_broadcast(ray_session):
    """Forcing keep_broadcast_max=0 must route through the distributed
    semi-join and keep exactly the same documents."""
    import ray.data

    from scrappy_ray.functions.webtext import domain_filter

    rows = []
    for i in range(8):
        rows.append({"doc_id": i, "source": f"host{i % 2}.test",
                     "text": "the quick brown fox jumps over the lazy dog."})
    rows.append({"doc_id": 99, "source": "lonely.test",
                 "text": "a single page from a domain with one document."})
    ds = ray.data.from_items(rows)

    kept_bcast = sorted(
        r["doc_id"] for r in domain_filter(ds, min_docs=2).take_all())
    kept_join = sorted(
        r["doc_id"]
        for r in domain_filter(ds, min_docs=2,
                               keep_broadcast_max=0).take_all())
    assert kept_bcast == kept_join == list(range(8))


def test_clean_corpus_domain_gate_join_fallback(ray_session):
    """domain_broadcast_max=0 forces the post-filter semi-join path;
    kept set and rej_domain counter must match the broadcast path."""
    import ray.data

    from scrappy_ray.functions.counters import reset_counters
    from scrappy_ray.pipelines.corpus import clean_corpus

    reset_counters()
    goods = [
        "the cat and the dog are in the house, they have all of it today.",
        "a bird was on the roof and it had one song for this morning here.",
        "they were at the lake by the hill, and the water was not warm.",
        "this is an old book from the shelf that he had not read before.",
    ]
    rows = [{"doc_id": i, "source": "good.test", "text": g}
            for i, g in enumerate(goods)]
    rows.append({"doc_id": 20, "source": "tiny.test",
                 "text": "we can see the small town from here and it is a nice view."})
    ds = ray.data.from_items(rows)

    kept, stats = clean_corpus(
        ds, keep_langs=("en", "und"), min_quality=0.0,
        domain_col="source", min_domain_docs=2,
        domain_broadcast_max=0,
    )
    got = sorted(r["doc_id"] for r in kept.take_all())
    assert got == [0, 1, 2, 3]
    s = stats.to_pylist()[0]
    assert s["rej_domain"] == 1
    assert s["n_kept"] == 4


def test_learn_bpe_prunes_before_gather(ray_session):
    """min_count filtering runs inside the Dataset (distributed) and
    the dropped word-type mass is counted — the driver table is
    bounded on a heavy-tail corpus."""
    import ray.data

    from scrappy_ray.functions.bpe import learn_bpe
    from scrappy_ray.functions.counters import get_counters, reset_counters

    reset_counters()
    # heavy tail: 50 singleton words, 2 repeated words
    rows = [{"doc_id": i, "text": f"unique{i}"} for i in range(50)]
    rows += [{"doc_id": 100 + i, "text": "hello world"} for i in range(5)]
    ds = ray.data.from_items(rows)
    merges = learn_bpe(ds, num_merges=5, min_count=2)
    assert merges  # learned from the repeated words
    import time

    time.sleep(0.3)  # incr is fire-and-forget
    c = get_counters()
    assert c.get("bpe_types_dropped", 0) == 50
    assert c.get("bpe_token_mass_dropped", 0) == 50


def _png_rgb(img, filters):
    """Forward-filter a (h, w, 3) uint8 image with the given per-row
    PNG filter types and wrap it in a minimal PNG container."""
    import struct
    import zlib

    import numpy as np

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
        elif f == 4:  # Paeth (left predictor only needs full Paeth fn)
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            up = prev
            ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
            p = left + up - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, up, ul))
            line = (cur - pred) % 256
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def test_stdlib_png_decoder_all_filters():
    """The pure-stdlib PNG decoder reverses every scanline filter type
    (None/Sub/Up/Average/Paeth) exactly."""
    import numpy as np

    from scrappy_ray.functions.multimodal import _png_to_gray

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _png_rgb(img, filters)
        got = _png_to_gray(data)
        assert got is not None, f"decode failed for filters {filters}"
        w, h, gray = got
        assert (w, h) == (6, 5)
        expect = ((img[:, :, 0].astype(np.uint32) * 19595
                   + img[:, :, 1].astype(np.uint32) * 38470
                   + img[:, :, 2].astype(np.uint32) * 7471 + 0x8000)
                  >> 16).astype(np.uint8).ravel()
        assert np.array_equal(gray, expect), f"pixels differ for {filters}"


def test_real_image_decode_runs_in_this_sandbox(ray_session):
    """decode_images(real=True) now exercises a REAL PNG decode with
    no third-party codec — the r4 verdict's unconditional-test ask.
    Golden-frozen expectations on a deterministic gradient image."""
    import numpy as np
    import ray.data

    from scrappy_ray.functions.multimodal import decode_images

    img = np.zeros((4, 6, 3), np.uint8)
    img[:, :, 0] = np.arange(6, dtype=np.uint8) * 40          # R ramp
    img[:, :, 1] = np.arange(4, dtype=np.uint8)[:, None] * 60  # G ramp
    img[:, :, 2] = 128
    imgs = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([_png_rgb(img, [0, 1, 2, 3, 4]), b"garbage"],
                            pa.binary()),
    })
    out = decode_images(ray.data.from_arrow(imgs),
                        real=True).to_pandas().set_index("id")
    assert out.loc[1, "ok"] and out.loc[1, "width"] == 6 \
        and out.loc[1, "height"] == 4
    # golden: PIL-exact luma of the gradient, frozen
    expect = ((img[:, :, 0].astype(np.uint32) * 19595
               + img[:, :, 1].astype(np.uint32) * 38470
               + img[:, :, 2].astype(np.uint32) * 7471 + 0x8000) >> 16)
    assert out.loc[1, "mean_px"] == float(expect.astype(np.uint8).mean())
    assert out.loc[1, "phash"] == "c33addec3e7b1c43"
    assert not out.loc[2, "ok"]


def test_revisit_stats_salted_identical_under_skew(ray_session):
    """The salted variant must produce output identical to the
    unsalted operator on a skewed key (one user with most events),
    with the hot key actually split across salt chunks."""
    import numpy as np
    import ray.data

    from scrappy_ray.functions.webtext import (revisit_stats,
                                               revisit_stats_salted,
                                               salt_hot_keys)

    rng = np.random.RandomState(3)
    n_hot = 400
    rows = {
        "event_id": list(range(n_hot + 6)),
        "user_id": [1] * n_hot + [2, 2, 2, 3, 3, 4],
        "ts": [1_000_000 * (i + 1) for i in range(n_hot)]
        + [10, 20, 30, 5, 6, 7],
        "event_type": [["a", "b", "c"][i % 3] for i in range(n_hot)]
        + ["x", "x", "y", "p", "p", "q"],
    }
    t = pa.table({
        "event_id": pa.array(rows["event_id"], pa.int64()),
        "user_id": pa.array(rows["user_id"], pa.int64()),
        "ts": pa.array(rows["ts"], pa.int64()),
        "event_type": pa.array(rows["event_type"], pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(8)

    base = revisit_stats(ds).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    salted = revisit_stats_salted(
        ds, hot_threshold=50, n_salt=4).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(base, salted, check_like=True)

    # the hot key really was split
    s = salt_hot_keys(ds, "user_id", "ts", threshold=50, n_salt=4)
    salts = {r["salt"] for r in s.filter(expr="user_id == 1").take_all()}
    assert len(salts) == 4
    cold = {r["salt"] for r in s.filter(expr="user_id == 2").take_all()}
    assert cold == {0}


def test_admin_ui_html_views():
    """The admin UI (reference views/*.haml re-expressed) serves HTML
    to browsers via content negotiation while the JSON API is
    unchanged for API clients."""
    import json
    import threading
    import urllib.request

    from scrappy_ray.kb import load_kb
    from scrappy_ray.server import EngineState, make_server
    from scrappy_ray.sources.testgen import synth_kb_yaml

    state = EngineState(kb=load_kb(synth_kb_yaml()))
    srv = make_server(state)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def get(path, accept):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                headers={"Accept": accept})
            with urllib.request.urlopen(req) as r:
                return r.headers.get_content_type(), r.read().decode()

        for path in ("/", "/extractors", "/samples", "/help"):
            ctype, body = get(path, "text/html,application/xhtml+xml")
            assert ctype == "text/html", path
            assert "<html>" in body and "scrappy_ray" in body, path
        # JSON API unchanged for non-browser clients
        ctype, body = get("/", "application/json")
        assert ctype == "application/json"
        assert "formats" in json.loads(body)
        ctype, body = get("/extractors", "application/json")
        assert "extractors" in json.loads(body)
        # annotator bookmarklet
        ctype, body = get("/javascript", "*/*")
        assert ctype == "application/javascript"
        assert "vsize" in body
    finally:
        srv.shutdown()


def test_apng_frame_sampler_real_in_sandbox(ray_session):
    """sample_frames(real=True) exercises a REAL video container
    (APNG) with no third-party codec: each sampled frame's pixel data
    is inflate+unfiltered, and the output matches the fake sampler's
    schema and stride semantics."""
    import numpy as np
    import ray.data

    from scrappy_ray.functions.multimodal import apng_encode, sample_frames

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
              for _ in range(5)]
    vid = pa.table({
        "id": pa.array([7, 8], pa.int64()),
        "payload": pa.array([apng_encode(frames), b"not a video"],
                            pa.binary()),
    })
    out = sample_frames(ray.data.from_arrow(vid), stride=2,
                        real=True).to_pandas()
    assert out["id"].tolist() == [7, 7, 7]
    assert out["frame_idx"].tolist() == [0, 2, 4]
    assert out["width"].tolist() == [6, 6, 6]
    assert out["height"].tolist() == [4, 4, 4]


def test_fsspec_http_stub_kills_lazy_import_race():
    """After _ensure_fsspec_http_stub, the module Ray's path resolver
    lazily probes on every read/write_parquet resolves instantly from
    sys.modules (no repeated failing import → no thread race), and
    Ray's _is_http_filesystem still returns False for local
    filesystems."""
    import sys

    from scrappy_ray.crawl.driver import _ensure_fsspec_http_stub

    _ensure_fsspec_http_stub()
    assert "fsspec.implementations.http" in sys.modules
    from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

    import pyarrow.fs as pafs
    from ray.data.datasource.path_util import _is_http_filesystem

    assert _is_http_filesystem(pafs.LocalFileSystem()) is False


def test_crawl_resume_after_midround_crash(ray_session, tmp_path):
    """A crash MID-round leaves a partial next-frontier dir on disk
    (spills/writes land before the manifest commits the round); resume
    must discard it and still produce the identical schedule."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from scrappy_ray.crawl import checkpoint as ckpt
    from scrappy_ray.crawl.driver import CrawlConfig, run_crawl
    from scrappy_ray.pipelines.crawl_pipeline import pages_dir_for
    from scrappy_ray.sources.testgen import (SynthWebConfig, seed_urls,
                                             synth_kb_yaml)

    cfg = SynthWebConfig(n_hosts=3, pages_per_host=12)
    pages = pages_dir_for("/root/testdata/sf0.001")

    def mk(d, rounds):
        return CrawlConfig(
            pages_path=pages, kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg), ckpt_dir=d, depth=-1,
            num_buckets=4, extract_concurrency=2, max_rounds=rounds)

    full = run_crawl(mk(str(tmp_path / "full"), 50))

    part_dir = str(tmp_path / "part")
    run_crawl(mk(part_dir, 2))  # "killed" after round 2's manifest
    # simulate the mid-round-3 crash: a partial (garbage) frontier for
    # the round the manifest has NOT committed
    fdir = ckpt.frontier_dir(part_dir, 2)
    assert os.path.isdir(fdir)  # round-2 output exists (committed)
    crash_dir = ckpt.frontier_dir(part_dir, 3)
    os.makedirs(crash_dir, exist_ok=True)
    junk = pa.table({"url": pa.array(["http://junk.test/x"], pa.string())})
    pq.write_table(junk, os.path.join(crash_dir, "partial.parquet"))

    resumed = run_crawl(mk(part_dir, 50))
    a = pads.dataset(full.schedule_path).to_table().sort_by(
        [("seq", "ascending")])
    b = pads.dataset(resumed.schedule_path).to_table().sort_by(
        [("seq", "ascending")])
    assert a.equals(b)
