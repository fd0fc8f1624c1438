"""Round-4 additions: vectorized seen-shard routing (+ checkpoint
routing versioning), capped/vectorized embedding pair buckets, and the
distributed (anti-join) keep-set application for CC dedup."""

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


def test_dedup_components_antijoin_path_no_driver_dropset(ray_session, monkeypatch):
    """broadcast_threshold=0 forces the left-anti-join path: output must
    equal the broadcast path and _drop_ids (the broadcast applier) must
    never run — the probe that the keep-set was applied distributed."""
    import ray.data

    from scrappy_ray.functions import dedup as D

    docs = _docs([(i, f"doc {i}") for i in range(8)])
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array([0, 1, 5], pa.int64()), "id_b": pa.array([1, 2, 6], pa.int64())})
    )
    expect = sorted(r["doc_id"] for r in D.dedup_by_components(docs, pairs).take_all())

    def _boom(*a, **k):
        raise AssertionError("anti-join path must not gather a driver drop set")

    monkeypatch.setattr(D, "_drop_ids", _boom)
    got = sorted(
        r["doc_id"]
        for r in D.dedup_by_components(
            docs, pairs, distributed=True, broadcast_threshold=0
        ).take_all()
    )
    assert got == expect == [0, 3, 4, 5, 7]


def test_dedup_components_antijoin_id_column_collision(ray_session):
    """docs whose id column is literally 'id' must still anti-join
    cleanly (the drop-label table's key is also 'id')."""
    import ray.data

    from scrappy_ray.functions.dedup import dedup_by_components

    docs = ray.data.from_arrow(
        pa.table({"id": pa.array(list(range(6)), pa.int64())})
    )
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array([0], pa.int64()), "id_b": pa.array([1], pa.int64())})
    )
    kept = sorted(
        r["id"]
        for r in dedup_by_components(
            docs, pairs, id_col="id", distributed=True, broadcast_threshold=0
        ).take_all()
    )
    assert kept == [0, 2, 3, 4, 5]


def test_embedding_pairs_bucket_cap_and_counters(ray_session):
    """A planted hot LSH bucket (300 identical vectors) must be capped
    at max_bucket with the truncation OBSERVABLE via counters, and the
    emitted pair count bounded by C(max_bucket, 2)."""
    import ray.data

    from scrappy_ray.functions.counters import get_counters, reset_counters
    from scrappy_ray.functions.dedup import embedding_pairs

    reset_counters()
    n, cap = 300, 50
    vecs = [[1.0, 0.0, 0.0, 0.0]] * n  # identical → one bucket, all-pairs
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(n)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float64())),
            }
        )
    )
    out = embedding_pairs(ds, threshold=0.9, max_bucket=cap).take_all()
    assert len(out) == cap * (cap - 1) // 2
    # smallest ids are kept; every pair has id_a < id_b under the cap
    assert all(r["id_a"] < r["id_b"] < cap for r in out)
    import time

    time.sleep(0.5)  # fire-and-forget increments drain
    c = get_counters()
    assert c.get("embedding_buckets_truncated", 0) >= 1
    assert c.get("embedding_ids_truncated", 0) >= n - cap


def test_embedding_pairs_vectorized_matches_reference_loop(ray_session):
    """The triu-vectorized in-bucket cosine must emit exactly the pairs
    a per-pair loop would (random vectors, mixed buckets)."""
    import ray.data

    from scrappy_ray.functions.dedup import embedding_pairs

    rng = np.random.RandomState(7)
    base = rng.randn(20, 8)
    vecs = np.vstack([base, base[:5] * 2.0])  # 5 exact-direction dups (cos=1)
    ids = list(range(len(vecs)))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    got = {(r["id_a"], r["id_b"]) for r in embedding_pairs(ds, threshold=0.999).take_all()}
    # reference: brute-force cosine over all pairs, same threshold —
    # LSH can only MISS pairs (different buckets), never invent them
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = unit @ unit.T
    ref = {
        (i, j)
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if cos[i, j] >= 0.999
    }
    assert got <= ref
    # identical-direction near-dups share every hyperplane sign → same
    # bucket → must all be found
    assert {(i, 20 + i) for i in range(5)} <= got


def test_clean_corpus_stats_surface_truncation(ray_session):
    """A planted hot LSH bucket must show up in the flagship pipeline's
    OWN stats table (not just the cluster counters): the report a
    100 TB operator actually reads."""
    from scrappy_ray.functions.counters import reset_counters
    from scrappy_ray.pipelines.corpus import clean_corpus

    reset_counters()
    # 30 NEAR-identical docs (unique suffix survives exact dedup, the
    # long shared prefix dominates every minhash band) vs a 10-id cap
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight " * 4
    docs = _docs(
        [(i, base + f"tail{i}") for i in range(30)]
        + [(1000 + i, f"a unique document with its own words number {i}") for i in range(5)]
    )
    kept, stats = clean_corpus(
        docs, keep_langs=("en", "und"), min_quality=0.0, lsh_max_bucket=10
    )
    s = stats.to_pylist()[0]
    assert s["n_after_exact"] == 35  # unique suffixes survive exact dedup
    assert s["lsh_buckets_truncated"] >= 1
    assert s["lsh_ids_truncated"] >= 10


def test_seen_mark_table_matches_list_api(ray_session):
    """Arrow-native mark_new_table ≡ the list API (same keys, same
    routing), including duplicate urls at different depths."""
    from scrappy_ray.state.seen import SeenSetPool

    urls = [f"http://h{i % 7}.com/p{i}" for i in range(50)] + ["http://h0.com/p0"]
    depths = [i % 3 for i in range(50)] + [2]
    for mode in ("exact", "cuckoo", "bloom"):
        p1 = SeenSetPool(num_shards=3, mode=mode, capacity_per_shard=10000)
        m1 = p1.mark_new(urls, depths)
        p2 = SeenSetPool(num_shards=3, mode=mode, capacity_per_shard=10000)
        t = pa.table(
            {"url": pa.array(urls, pa.string()), "depth": pa.array(depths, pa.int32())}
        )
        m2 = p2.mark_new_table(t).tolist()
        assert m1 == m2
        # re-mark: everything seen now, both APIs agree
        assert p1.mark_new_table(t).tolist() == p2.mark_new(urls, depths) == [False] * len(urls)


def test_imageio_sampler_raises_without_imageio():
    """Where imageio/ffmpeg are absent (this container) the real-codec
    video seam must fail loudly at actor construction, not mid-batch —
    the same contract as PILImageDecoder."""
    from scrappy_ray.functions.multimodal import ImageIOFrameSampler

    try:
        import imageio  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            ImageIOFrameSampler()
    else:
        pytest.skip("imageio present — covered by test_imageio_sampler_real_path")


def test_imageio_sampler_real_path(ray_session):
    """Exercises sample_frames(real=True) end-to-end where imageio +
    ffmpeg exist (skipped in this container): a real mp4 samples
    through the SAME actor signature / output schema as the fake."""
    iio = pytest.importorskip("imageio.v3")
    import ray.data

    from scrappy_ray.functions.multimodal import sample_frames

    frames = np.stack([np.full((16, 24, 3), i * 16, np.uint8) for i in range(6)])
    payload = iio.imwrite("<bytes>", frames, extension=".mp4", fps=4)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([1], pa.int64()), "payload": pa.array([payload], pa.binary())})
    )
    rows = sample_frames(ds, stride=2, real=True).take_all()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert all(r["width"] == 24 and r["height"] == 16 for r in rows)


def test_ntriples_parse_roundtrip_hostile_escapes():
    """parse_ntriples must exactly invert triples_to_ntriples across
    escapes (quote/backslash/newline/tab), bnodes and CURIE expansion."""
    from scrappy_ray.sources.serializers import (
        expand,
        parse_ntriples,
        triples_to_ntriples,
    )

    rows = [
        ("http://a.test/s", "dc:title", 'he said "hi\\there"\n\ttab', True),
        ("_:b0!", "sc:text", "_:b1?", False),
        ("sc:Page", "rdf:type", "http://a.test/o", False),
        ("http://a.test/s", "dc:title", "", True),
    ]
    parsed = parse_ntriples(triples_to_ntriples(rows))
    # serializer expands CURIEs and mangles bnode labels; literals and
    # plain URIs come back byte-identical
    assert parsed[0] == ("http://a.test/s", expand("dc:title"), rows[0][2], True)
    assert parsed[1] == ("_:b0_", expand("sc:text"), "_:b1_", False)
    assert parsed[2] == (expand("sc:Page"), expand("rdf:type"), "http://a.test/o", False)
    assert parsed[3] == ("http://a.test/s", expand("dc:title"), "", True)
    # double round trip is a fixpoint
    again = parse_ntriples(triples_to_ntriples([(s, p, o, l) for s, p, o, l in parsed]))
    assert again == parsed


def test_read_ntriples_dataset_roundtrip(ray_session, tmp_path):
    """write_ntriples → read_ntriples over a Dataset preserves every
    row (the S4 sink as a full round-trippable format)."""
    import ray.data

    from scrappy_ray.sources.serializers import read_ntriples, write_ntriples

    t = pa.table(
        {
            "s": pa.array([f"http://x.test/{i}" for i in range(20)], pa.string()),
            "p": pa.array(["dc:title"] * 20, pa.string()),
            "o": pa.array([f"value {i}\twith\ttabs" for i in range(20)], pa.string()),
            "lit": pa.array([True] * 20, pa.bool_()),
        }
    )
    d = str(tmp_path / "nt")
    n = write_ntriples(ray.data.from_arrow(t), d)
    assert n == 20
    back = read_ntriples(d).sort("o").take_all()
    assert len(back) == 20
    assert back[0]["o"] == "value 0\twith\ttabs"
    assert all(r["p"] == "http://purl.org/dc/elements/1.1/title" for r in back)


def test_frontier_counts_dedup_retried_spill_shards(ray_session, tmp_path):
    """A retried spill task duplicates whole shards in hb_ bucket dirs:
    n_ready (_parquet_rows) and the grant counts (_host_counts) must
    count distinct items, not shards."""
    import os

    import pyarrow.parquet as pq

    from scrappy_ray.crawl.driver import _host_counts, _parquet_rows

    d = str(tmp_path / "frontier")
    os.makedirs(os.path.join(d, "hb_0"))
    t = pa.table(
        {
            "seq": pa.array([0, 1, 2], pa.int64()),
            "host": pa.array(["a.com", "a.com", "b.com"], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "hb_0", "s1.parquet"))
    pq.write_table(t, os.path.join(d, "hb_0", "s2.parquet"))  # the retry duplicate
    # plus a flat part (seed/resume shape) that must still footer-count
    flat = pa.table(
        {"seq": pa.array([3], pa.int64()), "host": pa.array(["c.com"], pa.string())}
    )
    pq.write_table(flat, os.path.join(d, "part-0.parquet"))
    assert _parquet_rows(d) == 4
    assert _host_counts(d) == {"a.com": 2, "b.com": 1, "c.com": 1}


def test_seen_routing_version_guard(ray_session, tmp_path):
    """A checkpoint stamped under a different routing (or shard count)
    must refuse to resume instead of silently mis-routing keys."""
    from scrappy_ray.crawl import checkpoint as ckpt

    d = str(tmp_path / "ck")
    ckpt.save_seen_snapshot(d, -1, [b"D\x80\x04]\x94.", b"D\x80\x04]\x94."])
    ckpt.check_seen_routing(d, 2)  # matching: fine
    with pytest.raises(RuntimeError, match="routing"):
        ckpt.check_seen_routing(d, 4)  # shard-count mismatch
    import os

    os.remove(os.path.join(d, "seen", "ROUTING"))  # legacy (pre-versioning)
    with pytest.raises(RuntimeError, match="pre-versioning"):
        ckpt.check_seen_routing(d, 2)


# ---------------------------------------------------------------- webtext


def test_canonical_url_policy():
    import pyarrow as pa

    from scrappy_ray.functions.webtext import canonical_url_array

    got = canonical_url_array(
        pa.array(
            [
                "HTTP://Site0.TEST:80/Art/1#frag",   # case, default port, fragment
                "http://site0.test/art/1/",           # trailing slash
                "https://x.test:443/",                # https default port + slash
                "http://a.test/p?q=1&B=2#x",          # query preserved (case-folded)
                "http://h.test:8080/p",               # NON-default port kept
            ]
        )
    ).to_pylist()
    assert got == [
        "http://site0.test/art/1",
        "http://site0.test/art/1",
        "https://x.test",
        "http://a.test/p?q=1&b=2",
        "http://h.test:8080/p",
    ]


def test_url_dedup_min_id(ray_session):
    import pyarrow as pa
    import ray.data

    from scrappy_ray.functions.webtext import url_dedup

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([5, 3, 9, 1], pa.int64()),
                "url": pa.array(
                    [
                        "HTTP://A.TEST/x/",
                        "http://a.test/x",
                        "http://a.test/x#frag",
                        "http://b.test/y",
                    ]
                ),
            }
        )
    )
    out = {r["canonical_url"]: r["doc_id"] for r in url_dedup(ds).take_all()}
    assert out == {"http://a.test/x": 3, "http://b.test/y": 1}


def test_scrub_pii_patterns():
    import pyarrow as pa

    from scrappy_ray.functions.webtext import scrub_pii_array

    got = scrub_pii_array(
        pa.array(
            [
                "mail Bob.Smith+x@Example.COM now",
                "call +1 (555) 123-4567 or 555-010-9999",
                "host 10.0.0.1 and 192.168.255.3",
                "no pii here, just sf0.01 and v1.2",
            ]
        )
    ).to_pylist()
    assert got == [
        "mail <EMAIL> now",
        "call <PHONE> or <PHONE>",
        "host <IP> and <IP>",
        "no pii here, just sf0.01 and v1.2",
    ]


def test_normalize_text_nfc_and_whitespace():
    import pyarrow as pa

    from scrappy_ray.functions.webtext import normalize_text_array

    decomp = "café  \t\n noir "
    got = normalize_text_array(pa.array([decomp, "plain", None])).to_pylist()
    assert got[0] == "café noir"  # composed + collapsed + trimmed
    assert got[1] == "plain"
    assert got[2] is None


def test_repetition_kernel_hand_computed():
    import pyarrow as pa

    from scrappy_ray.functions.textstats import repetition_kernel

    out = repetition_kernel(
        pa.array(
            [
                "a a a b",                # top unigram a: 3/4; bigrams: aa,aa,ab -> 2/3
                "x y x y",                # top uni 2/4; bigrams xy,yx,xy -> 2/3
                "only",                   # 1 token: uni 1/1, no bigrams -> 0
                "l1\nl2\nl1\nl3",        # \s+ splits on \n too: tokens
                                          # [l1,l2,l1,l3] -> uni 2/4,
                                          # bigrams all distinct -> 1/3;
                                          # 4 lines, 3 distinct -> dup 1/4
                "",                       # '' -> one empty token, one line
            ]
        )
    )
    uni = [round(v, 6) for v in out["top_unigram_frac"].to_pylist()]
    bi = [round(v, 6) for v in out["top_bigram_frac"].to_pylist()]
    dup = [round(v, 6) for v in out["dup_line_frac"].to_pylist()]
    assert uni == [0.75, 0.5, 1.0, 0.5, 1.0]
    assert bi == [round(2 / 3, 6), round(2 / 3, 6), 0.0, round(1 / 3, 6), 0.0]
    assert dup == [0.0, 0.0, 0.0, 0.25, 0.0]


def test_repetition_bigrams_never_cross_documents():
    import pyarrow as pa

    from scrappy_ray.functions.textstats import repetition_kernel

    # if bigrams leaked across docs, 'b a' at the boundary would tie the
    # second doc's counts differently
    out = repetition_kernel(pa.array(["a b", "a c a c"]))
    assert out["top_bigram_frac"].to_pylist()[1] == pytest.approx(2 / 3)


def test_domain_filter_broadcast_semijoin(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import domain_filter, domain_stats

    rows = []
    # good.test: 3 stopword-rich punctuated docs; bad.test: digit soup
    for i in range(3):
        rows.append({"doc_id": i, "source": "good.test",
                     "text": "the cat and the dog are in the house, they have all of it."})
    for i in range(3, 6):
        rows.append({"doc_id": i, "source": "bad.test",
                     "text": "9 3 4 1 5 9 2 6"})
    rows.append({"doc_id": 6, "source": "tiny.test",
                 "text": "the cat and the dog are in the house, they have all of it."})
    ds = ray.data.from_items(rows)

    stats = {r["source"]: r for r in domain_stats(ds).take_all()}
    assert stats["good.test"]["n_docs"] == 3
    assert stats["good.test"]["mean_quality"] > stats["bad.test"]["mean_quality"]

    kept = domain_filter(ds, min_docs=2, min_quality=0.5)
    got = sorted(r["doc_id"] for r in kept.take_all())
    assert got == [0, 1, 2]  # bad.test fails quality, tiny.test fails count


def test_chunk_documents_windows(ray_session):
    import pyarrow as pa
    import ray.data

    from scrappy_ray.functions.textstats import chunk_documents

    tbl = pa.table({
        "doc_id": [1, 2, 3],
        "text": [" ".join(f"t{i}" for i in range(10)), "a b c", ""],
    })
    out = chunk_documents(ray.data.from_arrow(tbl), chunk_tokens=4, overlap=1).take_all()
    got = [(r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in out]
    assert got == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t3 t4 t5 t6", 4),   # stride 3: overlapping token t3
        (1, 2, "t6 t7 t8 t9", 4),
        (2, 0, "a b c", 3),          # short doc: one (possibly short) chunk
        (3, 0, "", 1),               # '' splits to one empty token (SQL parity)
    ]
    with pytest.raises(ValueError):
        chunk_documents(ray.data.from_arrow(tbl), chunk_tokens=4, overlap=4)


def test_chunk_documents_exact_boundary(ray_session):
    import pyarrow as pa
    import ray.data

    from scrappy_ray.functions.textstats import chunk_documents

    # n == chunk_tokens -> exactly one chunk, no degenerate tail
    tbl = pa.table({"doc_id": [1], "text": ["a b c d"]})
    out = chunk_documents(ray.data.from_arrow(tbl), chunk_tokens=4, overlap=2).take_all()
    assert len(out) == 1 and out[0]["n_tokens"] == 4
    # n == chunk_tokens + 1 -> second chunk holds the overlap + tail
    tbl = pa.table({"doc_id": [1], "text": ["a b c d e"]})
    out = chunk_documents(ray.data.from_arrow(tbl), chunk_tokens=4, overlap=2).take_all()
    assert [(r["chunk_id"], r["chunk_text"]) for r in out] == [(0, "a b c d"), (1, "c d e")]


def test_perplexity_hand_computed(ray_session):
    import math

    import ray.data

    from scrappy_ray.functions.lm import perplexity_scores

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["a b a b", "a x"],
    }))
    out = {r["doc_id"]: r for r in perplexity_scores(ds).take_all()}
    # c1: a=3 b=2 x=1, V=3; c12: ab=2 ba=1 ax=1
    lp0 = (math.log((2 + 1) / (3 + 3)) + math.log((1 + 1) / (2 + 3))
           + math.log((2 + 1) / (3 + 3))) / 3
    lp1 = math.log((1 + 1) / (3 + 3))
    assert out[0]["n_bigrams"] == 3 and out[1]["n_bigrams"] == 1
    assert out[0]["avg_logprob"] == pytest.approx(lp0)
    assert out[1]["avg_logprob"] == pytest.approx(lp1)
    assert out[0]["ppl"] == pytest.approx(math.exp(-lp0))


def test_perplexity_min_count_prunes_rare_bigrams(ray_session):
    import math

    import ray.data

    from scrappy_ray.functions.lm import perplexity_scores

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["a b a b a b", "a x"],
    }))
    out = {r["doc_id"]: r for r in perplexity_scores(ds, min_count=2).take_all()}
    # 'a x' occurs once -> pruned from the model -> scores as unseen
    # (c12=0) while c1/V stay exact: lp = ln(1/(c1_a + V))
    assert out[1]["avg_logprob"] == pytest.approx(math.log(1 / (4 + 3)))
    # frequent bigram 'a b' (3x) survives pruning
    assert out[0]["avg_logprob"] > out[1]["avg_logprob"]


def test_perplexity_single_token_docs_dropped(ray_session):
    import ray.data

    from scrappy_ray.functions.lm import perplexity_scores

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["only", "two tokens"],
    }))
    got = [r["doc_id"] for r in perplexity_scores(ds).take_all()]
    assert got == [1]


def test_hash_sample_deterministic_and_salted(ray_session):
    import ray.data

    from scrappy_ray.functions.sampling import hash_sample

    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(2000))}))
    a = sorted(r["doc_id"] for r in hash_sample(ds, 0.3, salt=1).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(ds, 0.3, salt=1).take_all())
    c = sorted(r["doc_id"] for r in hash_sample(ds, 0.3, salt=2).take_all())
    assert a == b                      # reproducible across runs
    assert a != c                      # salts decorrelate
    assert 0.25 < len(a) / 2000 < 0.35  # rate roughly honored
    # nesting property: a rate-0.1 sample with the same salt is a
    # subset of the rate-0.3 sample (thresholds nest)
    d = set(r["doc_id"] for r in hash_sample(ds, 0.1, salt=1).take_all())
    assert d <= set(a)


def test_stratified_sample_rates(ray_session):
    import ray.data

    from scrappy_ray.functions.sampling import stratified_sample

    n = 900
    tbl = pa.table({
        "doc_id": list(range(n)),
        "source": [("wiki", "cc", "junk")[i % 3] for i in range(n)],
    })
    out = stratified_sample(
        ray.data.from_arrow(tbl), {"wiki": 1.0, "cc": 0.5},
        strat_col="source", salt=9, default_rate=0.0,
    ).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src.get("wiki", ())) == n // 3       # rate 1.0 keeps all
    assert "junk" not in by_src                        # default 0.0 drops all
    assert 0.35 < len(by_src.get("cc", ())) / (n // 3) < 0.65


def test_main_content_drops_boilerplate():
    from scrappy_ray.functions.boilerplate import main_content

    html = (
        '<html><body>'
        '<div class="nav"><a href="/a">home</a> <a href="/b">about this page</a></div>'
        '<h1>A headline with substance</h1>'
        '<p>This paragraph is the real article body with plenty of text '
        'and <a href="/x">one link</a> inside it.</p>'
        '<ul><li>a list item with enough words to pass the length gate</li>'
        '<li>tiny</li></ul>'
        '<div class="footer"><a href="/c">contact</a> <a href="/d">terms of service</a></div>'
        '</body></html>'
    )
    out = main_content(html)
    assert "real article body" in out
    assert "A headline with substance" in out
    assert "list item with enough words" in out
    assert "home" not in out            # nav link list: high link density
    assert "terms of service" not in out
    assert "tiny" not in out            # below min_chars


def test_main_content_nested_blocks_merge():
    from scrappy_ray.functions.boilerplate import main_content

    # inner li must not duplicate text already carried by the outer li
    html = ('<ul><li>outer item text here with sub list'
            '<ul><li>inner item text that is long enough</li></ul></li></ul>')
    out = main_content(html)
    assert out.count("inner item text") == 1


def test_main_content_link_density_boundary():
    from scrappy_ray.functions.boilerplate import main_content

    # a block that is ALL link text is dropped even if long
    html = '<p><a href="/x">this entire paragraph is one long anchor text</a></p>'
    assert main_content(html) == ""
    # same text unlinked is kept
    assert "entire paragraph" in main_content(
        "<p>this entire paragraph is one long anchor text</p>")


def test_paragraph_dedup_first_occurrence(ray_session):
    import ray.data

    from scrappy_ray.functions.dedup import paragraph_dedup

    tbl = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["alpha\nbeta", "beta\ngamma", "gamma\nalpha\ndelta", "alpha"],
    })
    out = {r["doc_id"]: r["text_deduped"]
           for r in paragraph_dedup(ray.data.from_arrow(tbl)).take_all()}
    assert out == {
        0: "alpha\nbeta",   # first occurrences of both
        1: "gamma",         # beta already seen in doc 0
        2: "delta",         # gamma (doc 1), alpha (doc 0) dropped
        # doc 3 vanishes: its only paragraph is a dup
    }


def test_paragraph_dedup_preserves_order_and_internal_dups(ray_session):
    import ray.data

    from scrappy_ray.functions.dedup import paragraph_dedup

    # a paragraph repeated WITHIN one doc keeps only its first position
    tbl = pa.table({"doc_id": [5], "text": ["x\ny\nx\nz"]})
    out = paragraph_dedup(ray.data.from_arrow(tbl)).take_all()
    assert out[0]["text_deduped"] == "x\ny\nz"


def test_asof_join_backward_and_strict(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 1, 2, 3], "t": [10, 5, 1, 7, 4],
        "ev": ["a", "b", "c", "d", "e"],
    }))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2], "rt": [2, 6, 7], "price": [1.5, 2.5, 9.0],
    }))
    out = {(r["k"], r["t"]): r["price_r"]
           for r in asof_join(left, right, by="k", left_on="t", right_on="rt",
                              left_cols=["ev"], right_cols=["price"]).take_all()}
    assert out == {
        (1, 1): None,   # before any right row
        (1, 5): 1.5,    # latest rt <= 5 is 2
        (1, 10): 2.5,   # latest rt <= 10 is 6
        (2, 7): 9.0,    # equality matches in backward mode
        (3, 4): None,   # key with no right rows at all
    }
    strict = {(r["k"], r["t"]): r["price_r"]
              for r in asof_join(left, right, by="k", left_on="t", right_on="rt",
                                 left_cols=["ev"], right_cols=["price"],
                                 strict=True).take_all()}
    assert strict[(2, 7)] is None  # strict: rt == t no longer matches
    assert strict[(1, 5)] == 1.5


def test_range_join_broadcast(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import range_join_broadcast

    bands = pa.table({
        "lo": [10.0, 20.0], "hi": [20.0, 30.0], "band": ["a", "b"],
    })
    ds = ray.data.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5],
        "value": [5.0, 10.0, 19.999, 20.0, 30.0],
    }))
    out = {r["id"]: r["band"]
           for r in range_join_broadcast(ds, bands, value_col="value").take_all()}
    # half-open [lo, hi): 10 in, 20 starts band b, 30 outside
    assert out == {1: None, 2: "a", 3: "a", 4: "b", 5: None}


def test_top_k_per_group_and_pivot(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import pivot_counts, top_k_per_group

    tbl = pa.table({
        "g": ["a", "a", "a", "b", "b"],
        "id": [1, 2, 3, 4, 5],
        "v": [10.0, 30.0, 20.0, 5.0, 5.0],
    })
    out = top_k_per_group(ray.data.from_arrow(tbl), group_col="g", key="v",
                          k=2, tiebreak="id").take_all()
    got = sorted((r["g"], r["id"]) for r in out)
    assert got == [("a", 2), ("a", 3), ("b", 4), ("b", 5)]  # tie on v -> lower id first

    ptbl = pa.table({"u": [1, 1, 2], "t": ["x", "y", "x"]})
    wide = {r["u"]: (r["n_x"], r["n_y"])
            for r in pivot_counts(ray.data.from_arrow(ptbl), "u", "t", ["x", "y"]).take_all()}
    assert wide == {1: (1, 1), 2: (1, 0)}


# ---------------------------------------------------------------- decontam


def test_decontaminate_flag_and_filter(ray_session):
    from scrappy_ray.functions.decontam import benchmark_ngram_set, decontaminate

    bench = _docs([(100, "the quick brown fox jumps over the lazy dog")])
    # doc 1 contains the bench 3-gram "quick brown fox" twice; doc 2 is
    # clean; doc 3 is too short for any 3-gram; doc 4 shares tokens but
    # never a full window
    corpus = _docs([
        (1, "a quick brown fox and a quick brown fox again"),
        (2, "completely unrelated words here"),
        (3, "quick brown"),
        (4, "brown quick fox the dog lazy"),
    ])
    hashes = benchmark_ngram_set(bench, n=3)
    flagged = {r["doc_id"]: (r["n_hits"], r["contaminated"])
               for r in decontaminate(corpus, hashes, n=3, mode="flag").take_all()}
    assert flagged == {1: (2, 1), 2: (0, 0), 3: (0, 0), 4: (0, 0)}

    kept = sorted(r["doc_id"]
                  for r in decontaminate(corpus, hashes, n=3, mode="filter").take_all())
    assert kept == [2, 3, 4]


def test_decontaminate_empty_bench_and_bad_mode(ray_session):
    import numpy as np

    from scrappy_ray.functions.decontam import decontaminate

    corpus = _docs([(1, "some text here okay")])
    out = decontaminate(corpus, np.empty(0, np.uint64), n=2, mode="flag").take_all()
    assert out[0]["n_hits"] == 0 and out[0]["contaminated"] == 0
    with pytest.raises(ValueError):
        decontaminate(corpus, np.empty(0, np.uint64), mode="drop")


def test_benchmark_ngram_set_matches_naive(ray_session):
    """Distributed partial-unique merge == single-pass unique."""
    import numpy as np

    from scrappy_ray.functions.decontam import _window_hashes, benchmark_ngram_set

    rows = [(i, f"tok{i % 3} tok{(i + 1) % 4} tok{i % 2} shared phrase tail {i % 5}")
            for i in range(50)]
    ds = _docs(rows)
    got = benchmark_ngram_set(ds, n=3)
    h, _, _ = _window_hashes(pa.array([r[1] for r in rows]), 3)
    assert np.array_equal(got, np.unique(h))
    assert got.dtype == np.uint64 and np.all(np.diff(got.astype(np.float64)) > 0)


# ------------------------------------------------------------------ tfidf


def test_tfidf_topk_hand_computed(ray_session):
    import math

    from scrappy_ray.functions.tfidf import tfidf_topk

    # N=4 docs. "rare" appears only in doc 1 (df=1); "the" in all (idf=0).
    corpus = _docs([
        (1, "the rare rare word"),
        (2, "the word word"),
        (3, "the shared word"),
        (4, "the shared thing"),
    ])
    out = {(r["doc_id"], r["rnk"]): (r["term"], r["score"])
           for r in tfidf_topk(corpus, k=2).take_all()}
    # doc1: rare tf=2 df=1 -> 2*ln(4); word tf=1 df=3 -> ln(4/3)
    assert out[(1, 1)] == ("rare", round(2 * math.log(4), 4))
    assert out[(1, 2)] == ("word", round(math.log(4 / 3), 4))
    # doc4: shared (df=2) beats thing? thing df=1 -> ln(4)=1.3863 > shared ln(2)
    assert out[(4, 1)] == ("thing", round(math.log(4), 4))
    # "the" (idf=0, score 0.0) ranks below everything nonzero
    assert out[(2, 1)][0] == "word" and out[(2, 2)] == ("the", 0.0)


def test_tfidf_df_spans_blocks(ray_session):
    """DF must be corpus-global even when docs land in different blocks."""
    import ray.data

    from scrappy_ray.functions.tfidf import doc_frequencies, tfidf_topk

    rows = [(i, "alpha beta" if i % 2 else "alpha gamma") for i in range(40)]
    ds = _docs(rows).repartition(8)
    df = {r["term"]: r["sum(df)"] for r in doc_frequencies(ds).take_all()}
    assert df == {"alpha": 40, "beta": 20, "gamma": 20}
    out = tfidf_topk(ds, k=1).take_all()
    # alpha has idf=0 everywhere; beta/gamma (df=20) win rank 1
    assert all(r["term"] in ("beta", "gamma") for r in out)
    assert len(out) == 40


def test_tfidf_tie_and_rank_determinism(ray_session):
    from scrappy_ray.functions.tfidf import tfidf_topk

    # equal tf and df -> identical scores; tie broken by term ascending
    corpus = _docs([(1, "zzz aaa"), (2, "zzz aaa")])
    out = [(r["rnk"], r["term"]) for r in sorted(
        tfidf_topk(corpus, k=2).take_all(), key=lambda r: (r["doc_id"], r["rnk"]))
        if r["doc_id"] == 1]
    assert out == [(1, "aaa"), (2, "zzz")]


# ------------------------------------------------------------------ sketch


def test_hll_error_bound_and_partition_invariance(ray_session):
    import ray.data

    from scrappy_ray.functions.sketch import approx_distinct

    n = 50_000
    tbl = pa.table({"u": pa.array([f"user-{i % n}" for i in range(n * 2)], pa.string())})
    ds = ray.data.from_arrow(tbl)
    est = approx_distinct(ds, "u", p=12)
    assert abs(est - n) / n < 0.05  # ~3 sigma at p=12
    # max-merge makes the estimate independent of block layout
    assert approx_distinct(ds.repartition(16), "u", p=12) == est


def test_hll_by_group_matches_exact_small(ray_session):
    import ray.data

    from scrappy_ray.functions.sketch import approx_distinct_by_group, hll_registers

    rows = {"g": [], "u": []}
    for g, n in (("a", 40), ("b", 7), ("c", 1)):
        for i in range(n * 3):  # repeats must not inflate
            rows["g"].append(g)
            rows["u"].append(f"{g}-{i % n}")
    ds = ray.data.from_arrow(pa.table(rows)).repartition(4)
    got = {r["g"]: r["n_approx"]
           for r in approx_distinct_by_group(ds, "g", "u", p=12).take_all()}
    # linear-counting regime: exact (no register collisions at these sizes)
    assert got == {"a": 40, "b": 7, "c": 1}
    with pytest.raises(ValueError):
        hll_registers(pa.array(["x"]), p=3)


def test_approx_quantiles_bottomk_sample(ray_session):
    import ray.data

    from scrappy_ray.functions.sketch import approx_quantiles_by_group

    rng = np.random.default_rng(7)
    n = 20_000
    tbl = pa.table({
        "g": pa.array(["a"] * n + ["tiny"] * 5),
        "id": pa.array(range(n + 5), pa.int64()),
        "v": pa.array(list(rng.lognormal(0, 1, n)) + [1.0, 2.0, 3.0, 4.0, 5.0],
                      pa.float64()),
    })
    ds = ray.data.from_arrow(tbl)
    out = {r["g"]: r for r in
           approx_quantiles_by_group(ds, "g", "v", "id", [0.5, 0.9], k=1024).take_all()}
    # tiny group (<= k) is exact percentile_disc
    assert out["tiny"]["p50"] == 3.0 and out["tiny"]["p90"] == 5.0
    assert out["tiny"]["n_sample"] == 5
    # big group: rank error within ~3 sigma of sqrt(q(1-q)/k)
    v = np.sort(np.asarray(tbl.column("v"))[:n])
    for q in (0.5, 0.9):
        rank = np.searchsorted(v, out["a"][f"p{int(q*100)}"]) / n
        assert abs(rank - q) < 3 * np.sqrt(q * (1 - q) / 1024) + 0.005, (q, rank)
    # mergeable bottom-k -> block-layout independent
    out2 = {r["g"]: r for r in
            approx_quantiles_by_group(ds.repartition(16), "g", "v", "id",
                                      [0.5, 0.9], k=1024).take_all()}
    assert all(out[g] == out2[g] for g in out)


def _exact_topk(values, k):
    from collections import Counter

    c = Counter(values)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_heavy_hitters_exact_no_truncation(ray_session):
    import ray.data

    from scrappy_ray.functions import counters
    from scrappy_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    vals = [f"host-{int(v)}" for v in rng.zipf(1.3, 30_000) if v < 500]
    ds = ray.data.from_arrow(pa.table({"h": pa.array(vals)})).repartition(8)
    counters.reset_counters()
    out = heavy_hitters(ds, "h", k=10, m=4096)
    got = list(zip(out.column("h").to_pylist(), out.column("c").to_pylist()))
    assert got == _exact_topk(vals, 10)
    cnt = counters.get_counters()
    assert cnt.get("hh_mg_truncated_blocks", 0) == 0  # certificate: exact


def test_heavy_hitters_truncation_counted_still_exact_on_skew(ray_session):
    import ray.data

    from scrappy_ray.functions import counters
    from scrappy_ray.functions.sketch import heavy_hitters

    # 20 heavy values (1000 each) drowned in 40k singletons; m=64 forces
    # MG truncation in every batch, but the heavies dwarf the summed
    # per-batch undercount, so candidate recall — hence top-k — is exact.
    heavies = [f"hot-{i:02d}" for i in range(20) for _ in range(1000)]
    noise = [f"cold-{i}" for i in range(40_000)]
    rng = np.random.default_rng(3)
    vals = np.asarray(heavies + noise, dtype=object)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"h": pa.array(list(vals))})).repartition(8)
    counters.reset_counters()
    out = heavy_hitters(ds, "h", k=20, m=64, batch_size=2048)
    got = list(zip(out.column("h").to_pylist(), out.column("c").to_pylist()))
    assert got == _exact_topk(list(vals), 20)
    cnt = counters.get_counters()
    assert cnt.get("hh_mg_truncated_blocks", 0) > 0  # cap was hit — and counted
    assert cnt.get("hh_mg_max_undercount", 0) > 0


def _classifier_corpus(n=400):
    """Separable two-vocabulary corpus: positives speak 'good' words,
    negatives 'junk' words, both mixed with shared noise."""
    rng = np.random.default_rng(5)
    good = [f"good{i}" for i in range(30)]
    junk = [f"junk{i}" for i in range(30)]
    noise = [f"word{i}" for i in range(200)]
    rows = {"doc_id": [], "text": [], "label": []}
    for i in range(n):
        pos = i % 2
        vocab = good if pos else junk
        toks = list(rng.choice(vocab, 20)) + list(rng.choice(noise, 30))
        rng.shuffle(toks)
        rows["doc_id"].append(i)
        rows["text"].append(" ".join(toks))
        rows["label"].append(pos)
    return pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                     "text": pa.array(rows["text"], pa.string()),
                     "label": pa.array(rows["label"], pa.int64())})


def test_quality_classifier_learns_and_is_layout_invariant(ray_session):
    import ray.data

    from scrappy_ray.functions.classifier import quality_classify

    tbl = _classifier_corpus()
    ds = ray.data.from_arrow(tbl)
    out = pa.concat_tables(list(
        quality_classify(ds, "label", dim=1 << 12, sample_k=128, iters=300)
        .sort("doc_id").iter_batches(batch_format="pyarrow")))
    y = np.asarray(tbl.sort_by("doc_id").column("label"))
    keep = np.asarray(out.column("keep"))
    assert (keep == y).mean() > 0.95  # separable vocab → learned
    # block layout must not change the sample, the weights, or a score
    out16 = pa.concat_tables(list(
        quality_classify(ds.repartition(16), "label", dim=1 << 12,
                         sample_k=128, iters=300)
        .sort("doc_id").iter_batches(batch_format="pyarrow")))
    assert out.equals(out16)


def test_quality_classifier_pretrained_model_and_lottery(ray_session):
    import ray.data

    from scrappy_ray.functions.classifier import (
        quality_classify, train_quality_classifier)

    tbl = _classifier_corpus()
    ds = ray.data.from_arrow(tbl)
    model = train_quality_classifier(ds, "label", dim=1 << 12,
                                     sample_k=128, iters=300)
    # frozen model scores a different corpus without retraining
    new = pa.table({"doc_id": pa.array([900, 901], pa.int64()),
                    "text": pa.array(["good1 good2 good3 word1",
                                      "junk1 junk2 junk3 word1"]),
                    "label": pa.array([1, 0], pa.int64())})
    out = pa.concat_tables(list(
        quality_classify(ray.data.from_arrow(new), "label", model=model,
                         dim=1 << 12).sort("doc_id")
        .iter_batches(batch_format="pyarrow")))
    s = np.asarray(out.column("score"))
    assert s[0] > 0.5 > s[1]
    # Pareto lottery: deterministic per id, admits some low scorers
    lot = pa.concat_tables(list(
        quality_classify(ds, "label", dim=1 << 12, sample_k=128, iters=300,
                         keep_mode="lottery").sort("doc_id")
        .iter_batches(batch_format="pyarrow")))
    lot2 = pa.concat_tables(list(
        quality_classify(ds.repartition(16), "label", dim=1 << 12,
                         sample_k=128, iters=300, keep_mode="lottery")
        .sort("doc_id").iter_batches(batch_format="pyarrow")))
    assert lot.equals(lot2)
    k = np.asarray(lot.column("keep"))
    sc = np.asarray(lot.column("score"))
    assert k[sc > 0.9].mean() > k[sc < 0.1].mean()  # monotone in score
    assert 0 < k.mean() < 1

    with pytest.raises(ValueError):
        quality_classify(ds, "label", keep_mode="coin-flip")
    one_class = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b", "c d"]),
        "label": pa.array([1, 1], pa.int64())}))
    with pytest.raises(ValueError):
        train_quality_classifier(one_class, "label", dim=256)


def test_heavy_hitters_by_group_exact_and_truncation(ray_session):
    from collections import Counter

    import ray.data

    from scrappy_ray.functions import counters
    from scrappy_ray.functions.sketch import heavy_hitters_by_group

    rng = np.random.default_rng(21)
    rows = {"g": [], "v": []}
    exact = {}
    for g, n_vals, n_rows in (("a", 50, 5000), ("b", 300, 8000)):
        vals = [f"{g}-v{int(x) % n_vals:03d}" for x in rng.zipf(1.4, n_rows * 2)[:n_rows]]
        rows["g"] += [g] * len(vals)
        rows["v"] += vals
        exact[g] = sorted(Counter(vals).items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(rows["g"]), "v": pa.array(rows["v"])})).repartition(8)

    counters.reset_counters()
    out = pa.concat_tables(list(
        heavy_hitters_by_group(ds, "g", "v", k=3)
        .sort(["g", "rnk"]).iter_batches(batch_format="pyarrow")))
    got = {}
    for g, v, c in zip(out.column("g").to_pylist(), out.column("v").to_pylist(),
                       out.column("c").to_pylist()):
        got.setdefault(g, []).append((v, c))
    assert got == exact
    assert counters.get_counters().get("hhg_mg_truncated_groups", 0) == 0

    # forced truncation: tiny m, heavies still dwarf the undercount
    counters.reset_counters()
    out2 = pa.concat_tables(list(
        heavy_hitters_by_group(ds, "g", "v", k=3, m=16, batch_size=2048)
        .sort(["g", "rnk"]).iter_batches(batch_format="pyarrow")))
    got2 = {}
    for g, v, c in zip(out2.column("g").to_pylist(), out2.column("v").to_pylist(),
                       out2.column("c").to_pylist()):
        got2.setdefault(g, []).append((v, c))
    assert got2 == exact
    assert counters.get_counters().get("hhg_mg_truncated_groups", 0) > 0


def test_incremental_near_dedup_flags_copies(ray_session):
    import ray.data

    from scrappy_ray.functions.dedup import (
        incremental_near_dedup, minhash_band_index)

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before the night falls down")
    ref = ray.data.from_items([{"doc_id": 100, "text": base}])
    idx = minhash_band_index(ref)
    assert len(idx) > 0
    new = ray.data.from_items([
        {"doc_id": 0, "text": base},                      # exact copy
        {"doc_id": 1, "text": base.replace("dog", "cat")},  # near copy
        {"doc_id": 2, "text": "completely different words about spark "
                              "engines and columnar arrow batch formats"},
    ])
    out = {r["doc_id"]: r for r in
           incremental_near_dedup(new, idx).sort("doc_id").take_all()}
    assert out[0]["near_dup"] == 1 and out[0]["n_band_hits"] > 0
    assert out[1]["near_dup"] == 1       # one-word change shares bands
    assert out[2]["near_dup"] == 0
    kept = [r["doc_id"] for r in
            incremental_near_dedup(new, idx, mode="filter").take_all()]
    assert kept == [2]
    with pytest.raises(ValueError):
        incremental_near_dedup(new, idx, mode="nope")


def test_compression_stats_orders_quality(ray_session):
    import ray.data

    from scrappy_ray.functions.textstats import compression_stats

    rng = np.random.default_rng(2)
    rows = [
        {"doc_id": 0, "text": "buy now " * 200},                     # boilerplate
        {"doc_id": 1, "text": " ".join(                              # variedtext
            rng.choice([f"w{i}" for i in range(5000)], 400))},
        {"doc_id": 2, "text": ""},                                    # empty
    ]
    out = {r["doc_id"]: r for r in
           compression_stats(ray.data.from_items(rows)).sort("doc_id").take_all()}
    assert out[0]["compression_ratio"] < out[1]["compression_ratio"]
    assert out[0]["compression_ratio"] < 0.1    # repetition collapses
    assert out[2]["n_bytes"] == 0 and out[2]["n_compressed"] > 0
    assert out[1]["n_bytes"] > 0


def test_audio_decode_real_wav(ray_session):
    import ray.data

    from scrappy_ray.functions.multimodal import decode_audio, make_fake_wav

    tbl = pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([
            make_fake_wav(200.0, n_frames=800, sample_rate=8000, amplitude=0.5),
            make_fake_wav(50.0, n_frames=400, sample_rate=4000,
                          amplitude=0.9, n_channels=2),
            b"not a wav",
        ], pa.binary()),
    })
    out = {r["id"]: r for r in
           decode_audio(ray.data.from_arrow(tbl)).sort("id").take_all()}
    assert out[0]["sample_rate"] == 8000 and out[0]["n_frames"] == 800
    assert out[0]["duration_s"] == 0.1 and out[0]["ok"]
    # sine RMS ≈ amplitude/√2, peak ≈ amplitude (16-bit quantization)
    assert abs(out[0]["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(out[0]["peak"] - 0.5) < 1e-3
    assert out[1]["n_channels"] == 2 and out[1]["duration_s"] == 0.1
    assert abs(out[1]["rms"] - 0.9 / np.sqrt(2)) < 1e-3
    # undecodable payload: ok=False row, never silently dropped
    assert out[2]["ok"] is False and out[2]["rms"] is None
    assert len(out) == 3


def test_incremental_exact_dedup_both_paths(ray_session):
    import ray.data

    from scrappy_ray.functions.dedup import incremental_exact_dedup

    ref = ray.data.from_items([
        {"doc_id": 100, "text": "seen before one"},
        {"doc_id": 101, "text": "seen before two"},
        {"doc_id": 102, "text": "seen before two"},  # ref-internal dup: fine
    ])
    new = ray.data.from_items([
        {"doc_id": 0, "text": "seen before one"},    # drop
        {"doc_id": 1, "text": "fresh text a"},
        {"doc_id": 2, "text": "seen before two"},    # drop
        {"doc_id": 3, "text": "fresh text b"},
    ])
    kept = sorted(r["doc_id"] for r in
                  incremental_exact_dedup(new, ref).take_all())
    assert kept == [1, 3]
    # forced join path (threshold 0) must agree with the broadcast path
    kept_join = sorted(r["doc_id"] for r in incremental_exact_dedup(
        new, ref, broadcast_threshold=0).take_all())
    assert kept_join == kept
    # schema: the temp hash column never leaks
    cols = incremental_exact_dedup(new, ref).schema().names
    assert "_h" not in cols


def test_substr_dedup_removes_shared_and_within_doc_spans(ray_session):
    import ray.data

    from scrappy_ray.functions.substr_dedup import dedup_substrings

    rows = [
        {"doc_id": 0, "text": "a b c d e f g h"},   # shares 'c d e f' with 2
        {"doc_id": 1, "text": "x y z w q r s t"},   # unique — untouched
        {"doc_id": 2, "text": "m n c d e f o p"},
        {"doc_id": 3, "text": "u u u u u u"},       # within-doc repeat
        {"doc_id": 4, "text": ""},
    ]
    out = {r["doc_id"]: r for r in
           dedup_substrings(ray.data.from_items(rows), n=4)
           .sort("doc_id").take_all()}
    assert out[0]["text_deduped"] == "a b g h" and out[0]["n_removed"] == 4
    assert out[1]["text_deduped"] == "x y z w q r s t" and out[1]["n_removed"] == 0
    assert out[2]["text_deduped"] == "m n o p"
    assert out[3]["text_deduped"] == "" and out[3]["n_removed"] == 6
    assert out[4]["text_deduped"] == "" and out[4]["n_removed"] == 0


def test_substr_dedup_layout_invariance_and_precomputed_set(ray_session):
    import ray.data

    from scrappy_ray.functions.substr_dedup import (
        dedup_substrings, duplicated_window_hashes)

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(60)]
    texts[7] = texts[3]  # whole-doc duplicate → every window duplicated
    tbl = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl)
    a = pa.concat_tables(list(dedup_substrings(ds, n=8).sort("doc_id")
                              .iter_batches(batch_format="pyarrow")))
    b = pa.concat_tables(list(
        dedup_substrings(ds.repartition(16), n=8).sort("doc_id")
        .iter_batches(batch_format="pyarrow")))
    assert a.equals(b)
    rem = dict(zip(a.column("doc_id").to_pylist(), a.column("n_removed").to_pylist()))
    assert rem[3] == 30 and rem[7] == 30  # both copies fully removed

    # frozen dup-set path scores a new split identically
    dup = duplicated_window_hashes(ds, n=8)
    c = pa.concat_tables(list(
        dedup_substrings(ds, n=8, dup_hashes=dup).sort("doc_id")
        .iter_batches(batch_format="pyarrow")))
    assert a.equals(c)

    with pytest.raises(ValueError):
        duplicated_window_hashes(ds, n=8, max_broadcast=1)


def _planted_embeddings():
    """Two well-separated blobs; each blob carries one exact-duplicate
    trio and otherwise-distinct members."""
    rng = np.random.default_rng(13)
    rows = {"vec_id": [], "embedding": []}
    base = {0: np.r_[np.ones(8), np.zeros(8)], 1: np.r_[np.zeros(8), np.ones(8)]}
    vid = 0
    dup_groups = []
    for blob in (0, 1):
        dup = (base[blob] + 0.01 * rng.standard_normal(16)).tolist()
        group = []
        for _ in range(3):  # exact-duplicate trio
            rows["vec_id"].append(vid); rows["embedding"].append(dup)
            group.append(vid); vid += 1
        dup_groups.append(group)
        for _ in range(10):  # distinct members (strong noise)
            v = base[blob] + 0.8 * rng.standard_normal(16)
            rows["vec_id"].append(vid); rows["embedding"].append(v.tolist())
            vid += 1
    tbl = pa.table({"vec_id": pa.array(rows["vec_id"], pa.int64()),
                    "embedding": pa.array(rows["embedding"],
                                          pa.list_(pa.float32()))})
    return tbl, dup_groups


def test_semantic_dedup_planted_groups(ray_session):
    import ray.data

    from scrappy_ray.functions.semdedup import semantic_dedup

    tbl, dup_groups = _planted_embeddings()
    ds = ray.data.from_arrow(tbl)
    out = pa.concat_tables(list(
        semantic_dedup(ds, eps=0.05, n_clusters=2, sample_size=64)
        .sort("vec_id").iter_batches(batch_format="pyarrow")))
    keep = dict(zip(out.column("vec_id").to_pylist(),
                    out.column("keep").to_pylist()))
    for group in dup_groups:  # exactly one survivor per planted trio
        assert sum(keep[i] for i in group) == 1, group
    # distinct members (0.8-sigma noise in 16-d: pairwise cos << 0.95)
    distinct = [i for i in keep if not any(i in g for g in dup_groups)]
    assert all(keep[i] == 1 for i in distinct)
    # layout invariance: same clusters, same survivors
    out16 = pa.concat_tables(list(
        semantic_dedup(ds.repartition(16), eps=0.05, n_clusters=2,
                       sample_size=64)
        .sort("vec_id").iter_batches(batch_format="pyarrow")))
    assert out.equals(out16)


def test_semantic_dedup_cluster_cap_counted(ray_session):
    import ray.data

    from scrappy_ray.functions import counters
    from scrappy_ray.functions.semdedup import semantic_dedup

    tbl, _ = _planted_embeddings()
    ds = ray.data.from_arrow(tbl)
    counters.reset_counters()
    out = pa.concat_tables(list(
        semantic_dedup(ds, eps=0.05, n_clusters=1, sample_size=64,
                       max_cluster=4)
        .sort("vec_id").iter_batches(batch_format="pyarrow")))
    assert out.num_rows == tbl.num_rows  # overflow rows kept, not lost
    cnt = counters.get_counters()
    assert cnt.get("semdedup_clusters_truncated", 0) >= 1
    assert cnt.get("semdedup_ids_unpruned", 0) > 0


def test_heavy_hitters_empty_and_int_key(ray_session):
    import ray.data

    from scrappy_ray.functions.sketch import heavy_hitters

    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    out = heavy_hitters(empty, "x", k=5)
    assert out.num_rows == 0 and out.column_names == ["x", "c"]

    ds = ray.data.from_arrow(pa.table({"x": pa.array([7, 7, 7, 3, 3, 9], pa.int64())}))
    out = heavy_hitters(ds, "x", k=2)
    assert list(zip(out.column("x").to_pylist(), out.column("c").to_pylist())) == \
        [(7, 3), (3, 2)]


def test_mirror_sources_planted_and_guard(ray_session):
    import pytest
    import ray.data

    from scrappy_ray.functions.webtext import mirror_sources

    # 8-token prefix shared by hostA/hostB/hostA (syndicated content);
    # hostC's doc shares only 7 tokens -> different key -> excluded.
    pre = "w0 w1 w2 w3 w4 w5 w6 w7"
    tbl = pa.table({
        "text": pa.array([pre + " tailA", pre + " tailB", pre + " tailA2",
                          "w0 w1 w2 w3 w4 w5 w6 x7 tailC",
                          "solo doc on one host only here now yes"]),
        "source": pa.array(["hostA", "hostB", "hostA", "hostC", "hostD"]),
    })
    ds = ray.data.from_arrow(tbl)
    out = pa.concat_tables(list(
        mirror_sources(ds).sort("content_key").iter_batches(batch_format="pyarrow")))
    assert out.num_rows == 1
    assert out.column("n_sources")[0].as_py() == 2
    assert out.column("sources")[0].as_py() == "hostA,hostB"

    with pytest.raises(ValueError, match="broadcast guard"):
        mirror_sources(ds, survivor_broadcast_max=0).materialize()


def test_levenshtein_pairs_vs_bruteforce():
    import random

    from scrappy_ray.functions.fuzzy import levenshtein_pairs

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, len(b) + 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (a[i - 1] != b[j - 1]))
        return dp[len(b)]

    rng = random.Random(42)
    al = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 9))) for _ in range(120)]
    bl = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 9))) for _ in range(120)]
    al += ["", "", "kitten"]
    bl += ["", "xyz", "sitting"]
    got = list(levenshtein_pairs(al, bl))
    assert got == [ref(a, b) for a, b in zip(al, bl)]
    # byte-level on non-ASCII (DuckDB levenshtein parity): é is 2 UTF-8 bytes
    assert list(levenshtein_pairs(["héllo"], ["hello"])) == [2]


def test_fuzzy_join_blocked(ray_session):
    import ray.data

    from scrappy_ray.functions.fuzzy import fuzzy_join

    left = ray.data.from_arrow(pa.table({
        "probe_id": pa.array([1, 2, 3], pa.int64()),
        "probe": pa.array(["blue widgt",   # 1 deletion from 'blue widget'
                           "blux widget",  # 1 sub INSIDE the 4-char block
                           "zzzz nothing"]),
    }))
    right = ray.data.from_arrow(pa.table({
        "p_id": pa.array([10, 11], pa.int64()),
        "name": pa.array(["blue widget", "blue bolt"]),
    }))
    out = pa.concat_tables(list(
        fuzzy_join(left, right, "probe", "name", max_dist=2, block_chars=4)
        .sort(["probe_id", "p_id"]).iter_batches(batch_format="pyarrow")))
    # probe 1 matches only 'blue widget' (dist 1); 'blue bolt' is dist>2.
    # probe 2 shares no block with anything ('blux' != 'blue') — the
    # documented prefix-blocking recall trade. probe 3 matches nothing.
    assert out.column("probe_id").to_pylist() == [1]
    assert out.column("p_id").to_pylist() == [10]
    assert out.column("dist").to_pylist() == [1]


def test_anchor_texts_planted(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import anchor_texts

    pages = pa.table({
        "url": pa.array(["http://a.test/", "http://b.test/x", "http://c.test/"]),
        "html": pa.array([
            b'<p><a href="/t">home</a> <a href="http://b.test/x">B!</a></p>',
            b'<a href="/t">other</a><a class="z" href="/t">home</a>',
            None,  # fetch miss: skipped, not crashed
        ], pa.binary()),
    })
    out = pa.concat_tables(list(
        anchor_texts(ray.data.from_arrow(pages)).sort("dst")
        .iter_batches(batch_format="pyarrow")))
    rows = {r["dst"]: r for r in out.to_pylist()}
    # /t on a.test resolves against a.test; /t on b.test against b.test
    assert rows["http://a.test/t"]["n_links"] == 1
    t = rows["http://b.test/t"]
    assert (t["n_links"], t["n_sources"]) == (2, 1)
    # tie 'other' vs 'home' at n=1 -> lexicographic smallest wins
    assert t["top_anchor"] == "home" and t["top_anchor_n"] == 1
    assert rows["http://b.test/x"]["top_anchor"] == "B!"


def test_collocations_planted(ray_session):
    import math

    import ray.data

    from scrappy_ray.functions.lm import collocations

    # 'new york' always co-occurs (high PMI); 'the cat'/'the dog' share
    # the frequent 'the' (low PMI). min_count=2 drops singleton pairs.
    docs = ["new york " * 3 + "the cat", "new york the dog the cat",
            "the dog the cat the fish"]
    ds = ray.data.from_items([{"text": t} for t in docs])
    out = pa.concat_tables(list(
        collocations(ds, min_count=2, k=3).iter_batches(batch_format="pyarrow")))
    assert out.column_names == ["w1", "w2", "c", "pmi"]
    assert out.num_rows == 3
    top = out.to_pylist()[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    # exact PMI for the planted pair: c12=4, c1=c2=4, T1=20, T2=17
    assert top["c"] == 4
    assert abs(top["pmi"] - round(math.log((4 / 17) / ((4 / 20) ** 2)), 6)) < 1e-9


def test_robots_stats_planted(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import robots_stats

    robots = b"User-agent: *\nDisallow: /private/\nDisallow: /tmp/\nCrawl-delay: 2\n"
    pages = pa.table({
        "url": pa.array([
            "http://a.test/robots.txt", "http://a.test/",
            "http://a.test/private/x", "http://a.test/tmp/y",
            "http://a.test/pub",
            "http://b.test/", "http://b.test/private/z",  # no robots.txt
        ]),
        "html": pa.array([robots, b"<p>i</p>", b"x", b"y", b"z",
                          b"r", b"s"], pa.binary()),
    })
    out = pa.concat_tables(list(
        robots_stats(ray.data.from_arrow(pages)).sort("host")
        .iter_batches(batch_format="pyarrow")))
    rows = {r["host"]: r for r in out.to_pylist()}
    a = rows["a.test"]
    assert (a["n_disallow"], a["crawl_delay"]) == (2, 2.0)
    assert (a["n_urls"], a["n_blocked"]) == (5, 2)  # /private/x + /tmp/y
    b = rows["b.test"]
    assert (b["n_disallow"], b["crawl_delay"]) == (0, None)
    assert (b["n_urls"], b["n_blocked"]) == (2, 0)  # allow-all without robots


def test_revisit_stats_planted(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import revisit_stats

    us = 1_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
        "ts": pa.array([0, 10 * us, 30 * us, 5 * us, 5 * us],
                       pa.timestamp("us")),
        "event_type": pa.array(["A", "A", "B", "X", "X"]),
    })
    out = pa.concat_tables(list(
        revisit_stats(ray.data.from_arrow(tbl)).sort("user_id")
        .iter_batches(batch_format="pyarrow")))
    rows = {r["user_id"]: r for r in out.to_pylist()}
    # key 7: 3 obs, one A->B change over gaps (10s, 20s) -> rate 0.5, mean 15s
    assert (rows[7]["n_obs"], rows[7]["n_changes"]) == (3, 1)
    assert rows[7]["change_rate"] == 0.5 and rows[7]["mean_gap_s"] == 15.0
    # key 9: ts tie breaks on event_id; no change, gap 0
    assert (rows[9]["n_obs"], rows[9]["n_changes"]) == (2, 0)
    assert rows[9]["mean_gap_s"] == 0.0

    # single observation -> null rate/gap
    one = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([0], pa.timestamp("us")),
        "event_type": pa.array(["A"]),
    }))
    r = revisit_stats(one).take_all()[0]
    assert r["n_obs"] == 1 and r["change_rate"] is None and r["mean_gap_s"] is None


def test_leakage_safe_split_cluster_coherent(ray_session):
    import ray.data

    from scrappy_ray.functions.sampling import leakage_safe_split

    pre = "p0 p1 p2 p3 p4 p5 p6 p7"
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([pre + " a", pre + " b",          # one cluster
                          "q0 q1 q2 q3 q4 q5 q6 q7 c",      # another
                          "solo r0 r1 r2 r3 r4 r5 r6 r7"]),
    })
    out = pa.concat_tables(list(
        leakage_safe_split(ray.data.from_arrow(tbl), train_rate=0.5)
        .sort("doc_id").iter_batches(batch_format="pyarrow")))
    rows = out.to_pylist()
    by_id = {r["doc_id"]: r for r in rows}
    # near-dup docs 1 and 2 share a cluster root and land on the SAME side
    assert by_id[1]["root"] == by_id[2]["root"] == 1
    assert by_id[1]["split"] == by_id[2]["split"]
    assert by_id[3]["root"] == 3 and by_id[4]["root"] == 4
    assert {r["split"] for r in rows} <= {"train", "test"}


def test_fuzzy_join_hot_block_guard(ray_session):
    import ray.data

    from scrappy_ray.functions import counters
    from scrappy_ray.functions.fuzzy import fuzzy_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array(list(range(6)), pa.int64()),
        "k": pa.array(["hot a", "hot b", "hot c", "hot d", "cold x", "cold y"]),
    }))
    right = ray.data.from_arrow(pa.table({
        "rid": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "name": pa.array(["hot a", "hot b", "hot c", "cold x", "cold z"]),
    }))
    counters.reset_counters()
    out = pa.concat_tables(list(
        fuzzy_join(left, right, "k", "name", max_dist=2, block_chars=4,
                   max_block=2)
        .sort(["lid", "rid"]).iter_batches(batch_format="pyarrow")))
    # the 'hot ' block (3 right rows > cap 2) is dropped and counted;
    # the 'cold' block survives: 'cold x'~'cold x'(0), 'cold x'~'cold z'(1),
    # 'cold y'~{x,z}(1,1)
    assert set(zip(out.column("lid").to_pylist(), out.column("rid").to_pylist())) == \
        {(4, 3), (4, 4), (5, 3), (5, 4)}
    cnt = counters.get_counters()
    assert cnt.get("fuzzy_blocks_dropped", 0) == 1
    assert cnt.get("fuzzy_rows_dropped", 0) >= 7  # 4 left + 3 right hot rows


def test_fuzzy_join_distinct_values_identical(ray_session):
    import ray.data

    from scrappy_ray.functions.fuzzy import fuzzy_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array(["blue widgt", "blue widgt", "blue bolt", "zzzz"]),
    }))
    right = ray.data.from_arrow(pa.table({
        "rid": pa.array([10, 11, 12], pa.int64()),
        "name": pa.array(["blue widget", "blue widget", "blue bold"]),
    }))

    def run(**kw):
        t = pa.concat_tables(list(
            fuzzy_join(left, right, "k", "name", max_dist=2, **kw)
            .select_columns(["lid", "rid", "dist"])
            .sort(["lid", "rid"]).iter_batches(batch_format="pyarrow")))
        return t.to_pylist()

    exact = run()
    fast = run(distinct_values=True)
    assert exact == fast and len(exact) > 0
    # duplicated keys expand: lid 1 and 2 both match rid 10 and 11
    assert {(r["lid"], r["rid"]) for r in exact} >= {(1, 10), (1, 11), (2, 10), (2, 11)}


def test_reciprocity_table_planted(ray_session):
    import ray.data

    from scrappy_ray.functions.graph import reciprocity_table

    # 0↔1 reciprocal; 0→2 and 2→3 one-way; duplicates collapse
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 0, 2, 0], pa.int64()),
        "dst": pa.array([1, 0, 2, 3, 1], pa.int64()),
    }))
    out = pa.concat_tables(list(
        reciprocity_table(edges).sort("node")
        .iter_batches(batch_format="pyarrow")))
    assert out.column("node").to_pylist() == [0, 1, 2]
    assert out.column("n_out").to_pylist() == [2, 1, 1]
    assert out.column("n_reciprocal").to_pylist() == [1, 1, 0]
    assert out.column("reciprocity").to_pylist() == [0.5, 1.0, 0.0]


def test_reciprocity_no_reciprocal_pairs(ray_session):
    """A DAG (zero reciprocal edges) must not poison the union arm —
    the empty-join-side regression the union rewrite exists for."""
    import ray.data

    from scrappy_ray.functions.graph import reciprocity_table

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64()),
    }))
    out = pa.concat_tables(list(
        reciprocity_table(edges).sort("node")
        .iter_batches(batch_format="pyarrow")))
    assert out.column("n_reciprocal").to_pylist() == [0, 0, 0]
    assert out.column("reciprocity").to_pylist() == [0.0, 0.0, 0.0]


def test_script_mix_kernel(ray_session):
    import ray.data

    from scrappy_ray.functions.textstats import script_mix

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # 'añoКи漢字abc 12': latin 6, digit 2, space 1, other 4 of 13
        "text": pa.array(["añoКи漢字abc 12", "abcd", ""]),
    }))
    out = pa.concat_tables(list(
        script_mix(ds).sort("doc_id").iter_batches(batch_format="pyarrow")))
    assert out.column("n_chars").to_pylist() == [13, 4, 0]
    r0 = {c: out.column(c)[0].as_py() for c in out.column_names}
    assert round(r0["latin_ratio"], 6) == round(6 / 13, 6)
    assert round(r0["digit_ratio"], 6) == round(2 / 13, 6)
    assert round(r0["space_ratio"], 6) == round(1 / 13, 6)
    assert round(r0["other_ratio"], 6) == round(4 / 13, 6)
    assert out.column("latin_ratio")[1].as_py() == 1.0
    # empty doc → real NULLs, not NaN (oracle-hash distinction)
    assert out.column("latin_ratio")[2].as_py() is None
    assert out.column("other_ratio")[2].as_py() is None


def test_group_sample_deterministic_and_capped(ray_session):
    import ray.data

    from scrappy_ray.functions.sampling import group_sample

    tbl = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(40)]),
    })

    def run(nblocks):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        out = pa.concat_tables(list(
            group_sample(ds, k=4).sort(["source", "doc_id"])
            .iter_batches(batch_format="pyarrow")))
        return out.to_pylist()

    a, b = run(1), run(7)
    assert a == b  # block-layout independent (hash-ordered, not positional)
    per = {}
    for r in a:
        per.setdefault(r["source"], []).append(r["doc_id"])
    assert set(per) == {"s0", "s1", "s2"}
    assert all(len(v) == 4 for v in per.values())


def test_url_template_stats(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import url_template_stats

    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([
            "http://a.test/item/12/page/3",
            "http://a.test/item/9000/page/1",
            "http://a.test/about",
            "http://b.test/item/5/page/2",
        ]),
    }))
    out = pa.concat_tables(list(
        url_template_stats(ds).sort(["host", "template"])
        .iter_batches(batch_format="pyarrow")))
    rows = out.to_pylist()
    assert [(r["host"], r["template"], r["n_urls"]) for r in rows] == [
        ("a.test", "http://a.test/about", 1),
        ("a.test", "http://a.test/item/<n>/page/<n>", 2),
        ("b.test", "http://b.test/item/<n>/page/<n>", 1),
    ]
    assert rows[1]["sample_url"] == "http://a.test/item/12/page/3"


def test_ipc_roundtrip_source_sink(ray_session, tmp_path):
    import ray.data

    from scrappy_ray.sources.ipc import read_ipc, write_ipc

    tbl = pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "text": pa.array([f"doc {i} ø" for i in range(10)]),
        "payload": pa.array([bytes([i]) * 3 for i in range(10)], pa.binary()),
    })
    for comp in (None, "zstd"):
        out_dir = str(tmp_path / f"ipc_{comp}")
        n = write_ipc(ray.data.from_arrow(tbl).repartition(3), out_dir,
                      compression=comp)
        assert n == 10
        back = pa.concat_tables(list(
            read_ipc(out_dir).sort("doc_id")
            .iter_batches(batch_format="pyarrow"))).combine_chunks()
        assert back.select(["doc_id", "text", "payload"]).equals(
            tbl.select(["doc_id", "text", "payload"]))
