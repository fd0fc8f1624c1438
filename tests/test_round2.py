"""Round-2 additions: distributed jaccard verify, LSH truncation
counters (no silent caps), distributed connected components, and the
vectorized simhash/explode kernels."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_lsh_truncation_counter_fires(ray_session):
    """A planted 300-identical-doc bucket exceeds the 200-id bucket cap:
    the truncation must be OBSERVABLE via the cluster counters."""
    from scrappy_ray.functions.counters import get_counters, reset_counters
    from scrappy_ray.functions.dedup import minhash_lsh_pairs

    reset_counters()
    ds = _docs([(i, "same exact text repeated for everyone here today") for i in range(300)])
    minhash_lsh_pairs(ds, num_perm=32, bands=8).materialize()
    import time

    time.sleep(0.5)  # fire-and-forget increments drain
    c = get_counters()
    assert c.get("lsh_buckets_truncated", 0) >= 1
    assert c.get("lsh_ids_truncated", 0) >= 100


def test_jaccard_verify_is_distributed_and_correct(ray_session):
    """The verify stage must not gather corpus texts on the driver:
    check results survive a corpus much larger than the candidate set
    (semi-join prunes), and jaccard values are exact."""
    import ray.data

    from scrappy_ray.functions.dedup import ngram_jaccard_verify

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    rows = [(1, base), (2, base.replace("tonight", "today"))]
    # pad the corpus with 500 unrelated docs that must never reach the driver
    rows += [(100 + i, f"unrelated filler document number {i} with distinct words {i*7}") for i in range(500)]
    docs = _docs(rows)
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array([1], pa.int64()), "id_b": pa.array([2], pa.int64())})
    )
    out = ngram_jaccard_verify(pairs, docs, threshold=0.5).take_all()
    assert len(out) == 1
    assert out[0]["id_a"] == 1 and out[0]["id_b"] == 2
    assert 0.5 <= out[0]["jaccard"] <= 1.0

    # empty candidate set → empty result, no crash
    empty = ray.data.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    )
    assert ngram_jaccard_verify(empty, docs).count() == 0


def test_connected_components_distributed_parity(ray_session):
    """Min-label propagation must equal driver union-find on chains,
    stars and singleton-free pair sets."""
    import ray.data

    from scrappy_ray.functions.dedup import (
        connected_components,
        connected_components_distributed,
    )

    rng = np.random.RandomState(3)
    # random graph over 120 nodes: 90 edges → several multi-hop components
    a = rng.randint(0, 120, 90)
    off = rng.randint(1, 15, 90)
    b = a + off
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    )
    uf = connected_components(pairs)
    dist = {}
    for batch in connected_components_distributed(pairs).iter_batches(batch_format="pyarrow"):
        dist.update(zip(batch.column("id").to_pylist(), batch.column("root").to_pylist()))
    assert uf == dist


def test_dedup_by_components_distributed_flag(ray_session):
    import ray.data

    from scrappy_ray.functions.dedup import dedup_by_components

    docs = _docs([(i, f"doc {i}") for i in range(6)])
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array([0, 1], pa.int64()), "id_b": pa.array([1, 2], pa.int64())})
    )
    kept_driver = sorted(r["doc_id"] for r in dedup_by_components(docs, pairs).take_all())
    kept_dist = sorted(
        r["doc_id"] for r in dedup_by_components(docs, pairs, distributed=True).take_all()
    )
    assert kept_driver == kept_dist == [0, 3, 4, 5]


def test_simhash_batch_matches_single():
    from scrappy_ray.functions.dedup import simhash64, simhash64_batch

    texts = ["alpha beta gamma", "alpha beta gamma", "different words entirely", ""]
    batch = simhash64_batch(texts)
    assert batch[0] == batch[1]
    assert int(batch[0]) == simhash64(texts[0])
    assert int(batch[3]) == simhash64("")
    # near-identical docs have small hamming distance
    h1 = simhash64("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    h2 = simhash64("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda")
    assert bin(h1 ^ h2).count("1") <= 8


def test_explode_links_vectorized_kernel():
    from scrappy_ray.crawl.driver import _ENC_BITS, _decode_enc, _explode_links

    links_t = pa.list_(pa.struct([("url", pa.string()), ("depth", pa.int32())]))
    batch = pa.table(
        {
            "seq": pa.array([10, 11, 12], pa.int64()),
            "links": pa.array(
                [
                    [{"url": "a", "depth": 1}, {"url": "b", "depth": 1}],
                    None,
                    [{"url": "c", "depth": 2}],
                ],
                links_t,
            ),
        }
    )
    out = _explode_links(batch)
    assert out.column("url").to_pylist() == ["a", "b", "c"]
    dec = _decode_enc(out)
    assert dec.column("parent_seq").to_pylist() == [10, 10, 12]
    assert dec.column("link_idx").to_pylist() == [0, 1, 0]
    assert out.column("enc").to_pylist() == [10 << _ENC_BITS, (10 << _ENC_BITS) + 1, 12 << _ENC_BITS]
    # empty batch
    empty = pa.table({"seq": pa.array([], pa.int64()), "links": pa.array([], links_t)})
    assert _explode_links(empty).num_rows == 0


def test_explode_clean_triples_vectorized():
    from scrappy_ray.crawl.driver import _explode_clean_triples

    trip_t = pa.list_(
        pa.struct([("s", pa.string()), ("p", pa.string()), ("o", pa.string()), ("lit", pa.bool_())])
    )
    batch = pa.table(
        {
            "triples": pa.array(
                [
                    [
                        {"s": "x", "p": "rdf:type", "o": "sc:Page", "lit": False},
                        {"s": "x", "p": "dc:title", "o": "T", "lit": True},
                    ],
                    [{"s": "y", "p": "rdf:type", "o": "foaf:Person", "lit": False}],
                ],
                trip_t,
            )
        }
    )
    out = _explode_clean_triples(batch)
    assert out.to_pylist() == [
        {"s": "x", "p": "dc:title", "o": "T", "lit": True},
        {"s": "y", "p": "rdf:type", "o": "foaf:Person", "lit": False},
    ]


def test_finalize_small_equals_shuffle(ray_session, synth_web, synth_pages_dir, tmp_path):
    """The adaptive finalize: driver-side Arrow path and Dataset
    shuffle path must produce identical schedule/triples/text outputs."""
    import pyarrow.dataset as pads

    from scrappy_ray.crawl.driver import CrawlConfig, run_crawl
    from scrappy_ray.sources.testgen import seed_urls, synth_kb_yaml

    cfg, _ = synth_web

    def run(name, small_bytes, driver_thresh):
        return run_crawl(
            CrawlConfig(
                pages_path=synth_pages_dir,
                kb_yaml=synth_kb_yaml(),
                seeds=seed_urls(cfg),
                ckpt_dir=str(tmp_path / name),
                depth=-1,
                num_buckets=4,
                extract_concurrency=2,
                finalize_small_bytes=small_bytes,
                driver_round_threshold=driver_thresh,
            )
        )

    # driver-tiny rounds + driver finalize vs bucket-fetch rounds +
    # shuffle finalize — all three execution tiers must agree
    a = run("small", 2 << 30, 1 << 20)  # every round in the driver
    b = run("shuffle", 0, 0)  # bucket-partitioned fetch + shuffle finalize

    def tbl(path, sort_keys):
        return pads.dataset(path).to_table().sort_by(sort_keys).to_pylist()

    assert tbl(a.schedule_path, [("seq", "ascending")]) == tbl(b.schedule_path, [("seq", "ascending")])
    keys = [("s", "ascending"), ("p", "ascending"), ("o", "ascending"), ("lit", "ascending")]
    assert tbl(a.triples_path, keys) == tbl(b.triples_path, keys)
    assert tbl(a.text_path, [("curl", "ascending")]) == tbl(b.text_path, [("curl", "ascending")])


def test_finish_frontier_vectorized_parity():
    """_finish_frontier's Arrow fast path must equal the per-row
    Python helpers (complete_uri/host_of) on every URL shape: absolute,
    ports/userinfo, schemeless, bare word, mailto, empty-host."""
    import pyarrow as pa

    from scrappy_ray.crawl.driver import _finish_frontier
    from scrappy_ray.support import complete_uri, host_of

    urls = [
        "http://site0.test/art/1",
        "HTTPS://MixedCase.Host:8080/x?q=1#f",
        "http://user@host.test/p",
        "site1.test/page",          # schemeless
        "word",                     # bare word → word.com
        "mailto:someone@x.test",    # scheme, no host
        "http:///odd",              # empty host
    ]
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([1] * len(urls), pa.int32()),
            "seq": pa.array(range(len(urls)), pa.int64()),
        }
    )
    out = _finish_frontier(batch)
    exp_curl = [complete_uri(u) for u in urls]
    assert out.column("curl").to_pylist() == exp_curl
    assert out.column("host").to_pylist() == [host_of(c) for c in exp_curl]
    assert out.column("url").to_pylist() == urls
    # 0-row batch keeps the schema
    assert _finish_frontier(batch.slice(0, 0)).num_rows == 0
