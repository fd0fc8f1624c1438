"""Tests for the training-data ops: dedup, similarity, text analysis,
multimodal plumbing, P/R/F metrics."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_exact_dedup():
    from scrappy_ray.functions.dedup import exact_dedup

    ds = _docs_ds([(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")])
    kept = sorted(r["doc_id"] for r in exact_dedup(ds).to_pandas().to_dict("records"))
    assert kept == [1, 2, 5]


def test_minhash_lsh_finds_near_dups():
    from scrappy_ray.functions.dedup import minhash_lsh_pairs, ngram_jaccard_verify

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    near = base.replace("tonight", "today")
    other = "completely different text about ray data pipelines and arrow batches here"
    ds = _docs_ds([(1, base), (2, near), (3, other), (4, base)])
    pairs = minhash_lsh_pairs(ds, num_perm=32, bands=16, shingle_k=5)
    verified = ngram_jaccard_verify(pairs, ds, threshold=0.6)
    got = {(r["id_a"], r["id_b"]) for r in verified.to_pandas().to_dict("records")}
    assert (1, 4) in got  # exact dup always found
    assert (1, 2) in got or (2, 4) in got  # near dup
    assert not any(3 in p for p in got)


def test_simhash_pairs():
    from scrappy_ray.functions.dedup import simhash_pairs, simhash64

    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = a + " lambda"  # 1 token differs ⇒ small hamming
    c = "totally unrelated words describing web crawling frontier politeness"
    assert simhash64(a) == simhash64(a)
    ds = _docs_ds([(1, a), (2, b), (3, c), (4, a)])
    got = {(r["id_a"], r["id_b"]) for r in simhash_pairs(ds, max_hamming=6).to_pandas().to_dict("records")}
    assert (1, 4) in got
    assert not any(3 in p for p in got)


def test_embedding_pairs_and_drop():
    import ray.data

    from scrappy_ray.functions.dedup import drop_near_duplicates, embedding_pairs

    rng = np.random.RandomState(0)
    base = rng.randn(10, 16)
    dup = base[0] + rng.randn(16) * 0.001
    vecs = np.vstack([base, dup[None, :]])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(11), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    pairs = embedding_pairs(ds, vec_col="embedding", id_col="vec_id", threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.to_pandas().to_dict("records")}
    assert got == {(0, 10)}
    kept = drop_near_duplicates(ds, pairs, id_col="vec_id").to_pandas()
    assert sorted(kept["vec_id"]) == list(range(10))  # larger id dropped


def test_topk_cosine_vs_numpy():
    import ray.data

    from scrappy_ray.functions.similarity import topk_cosine

    rng = np.random.RandomState(1)
    vecs = rng.randn(50, 8)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = topk_cosine(ds, vecs[:3], k=4, query_ids=[0, 1, 2]).to_pandas()
    # brute-force oracle
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = n @ n[:3].T
    for q in range(3):
        order = sorted(range(50), key=lambda i: (-cos[i, q], i))
        expected = [i for i in order if i != q][:4]
        got = out[out.query_id == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == expected


def test_lsh_topk_recall():
    import ray.data

    from scrappy_ray.functions.similarity import lsh_topk, topk_cosine

    rng = np.random.RandomState(2)
    vecs = rng.randn(200, 16)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    brute = topk_cosine(ds, vecs[:5], k=3, query_ids=list(range(5))).to_pandas()
    approx = lsh_topk(ds, vecs[:5], k=3, query_ids=list(range(5)), n_planes=4).to_pandas()
    # rank-1 recall: the nearest neighbor should usually survive LSH
    hits = 0
    for q in range(5):
        b1 = brute[(brute.query_id == q) & (brute["rank"] == 1)]["neighbor_id"].tolist()
        a = approx[approx.query_id == q]["neighbor_id"].tolist()
        hits += bool(b1 and b1[0] in a)
    assert hits >= 3


def test_token_stats_and_quality():
    from scrappy_ray.functions.textstats import quality_scores, token_stats

    ds = _docs_ds([(1, "Hello world."), (2, ""), (3, "  a  b  c  ")])
    st = token_stats(ds).to_pandas().set_index("doc_id")
    assert st.loc[1, "n_tokens"] == 2
    assert st.loc[2, "n_tokens"] == 1  # matches duckdb regexp_split of ''
    assert st.loc[3, "n_tokens"] == 3
    q = quality_scores(ds).to_pandas().set_index("doc_id")
    assert q.loc[1, "punct_ratio"] == pytest.approx(1 / 12)
    assert 0 <= q.loc[1, "quality"] <= 1


def test_lang_id():
    from scrappy_ray.functions.textstats import lang_id

    ds = _docs_ds(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "el gato está en la casa y no quiere salir"),
            (3, "zzz qqq"),
        ]
    )
    out = lang_id(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "es"
    assert out.loc[3, "lang_pred"] == "und"


def test_fingerprint_stability():
    from scrappy_ray.functions.textstats import fingerprint

    ds = _docs_ds([(1, "some document body text"), (2, "some document body text"), (3, "other")])
    out = fingerprint(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "fingerprint"] == out.loc[2, "fingerprint"]
    assert out.loc[1, "fingerprint"] != out.loc[3, "fingerprint"]


def test_multimodal_decode_and_frames():
    import ray.data

    from scrappy_ray.functions.multimodal import (
        FakeImageDecoder,
        decode_images,
        make_fake_image,
        sample_frames,
    )

    imgs = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [make_fake_image(4, 3, 1), make_fake_image(8, 8, 2), b"garbage"], pa.binary()
            ),
        }
    )
    out = decode_images(ray.data.from_arrow(imgs)).to_pandas().set_index("id")
    assert out.loc[1, "width"] == 4 and out.loc[1, "height"] == 3 and out.loc[1, "ok"]
    assert not out.loc[3, "ok"]

    vid = pa.table(
        {
            "id": pa.array([7], pa.int64()),
            "payload": pa.array([b"".join(make_fake_image(4, 4, s) for s in range(5))], pa.binary()),
        }
    )
    frames = sample_frames(ray.data.from_arrow(vid), stride=2).to_pandas()
    assert frames["frame_idx"].tolist() == [0, 2, 4]

    with pytest.raises(NotImplementedError):
        FakeImageDecoder(real=True)


def test_pil_decoder_raises_without_pillow():
    """Where Pillow is absent (this container) the real-codec seam must
    fail loudly at actor construction, not mid-batch."""
    from scrappy_ray.functions.multimodal import PILImageDecoder

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            PILImageDecoder()
    else:
        pytest.skip("Pillow present — covered by test_pil_decoder_real_path")


def test_pil_decoder_real_path():
    """Exercises decode_images(real=True) end-to-end where Pillow
    exists (skipped in this container): a real PNG decodes through the
    SAME actor signature / output schema as the fake decoder."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import ray.data

    from scrappy_ray.functions.multimodal import decode_images

    buf = io.BytesIO()
    PIL_Image.new("L", (6, 4), color=128).save(buf, format="PNG")
    imgs = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([buf.getvalue(), b"garbage"], pa.binary()),
        }
    )
    out = decode_images(ray.data.from_arrow(imgs), real=True).to_pandas().set_index("id")
    assert out.loc[1, "width"] == 6 and out.loc[1, "height"] == 4 and out.loc[1, "ok"]
    assert out.loc[1, "mean_px"] == 128.0
    assert not out.loc[2, "ok"]


def test_prf_metrics():
    from scrappy_ray.functions.metrics import per_predicate_metrics, prf

    correct = {("a", "p", "1"), ("b", "p", "2"), ("c", "q", "3")}
    extracted = {("a", "p", "1"), ("b", "p", "x"), ("d", "q", "3")}
    m = prf(correct, extracted)
    assert m["right"] == 1
    assert m["precision"] == pytest.approx(1 / 3)
    assert m["recall"] == pytest.approx(1 / 3)
    # edge cases (optimizer.rb:326-343)
    assert prf(set(), {("x", "y", "z")})["recall"] == 1.0
    assert prf({("x", "y", "z")}, set())["precision"] == 1.0
    assert prf(set(), set())["fscore"] == 1.0

    t = per_predicate_metrics(
        pa.table({"s": ["a", "c"], "p": ["p", "q"], "o": ["1", "3"]}),
        pa.table({"s": ["a", "d"], "p": ["p", "q"], "o": ["1", "3"]}),
    ).to_pandas().set_index("predicate")
    assert t.loc["p", "fscore"] == 1.0
    assert t.loc["q", "missing"] == 1 and t.loc["q", "wrong"] == 1


def test_sessionize():
    import datetime as dt

    import ray.data

    from scrappy_ray.pipelines.relational import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=10)),  # same session
        (1, base + dt.timedelta(minutes=50)),  # gap > 30 ⇒ new session
        (2, base),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    out = sessionize(ray.data.from_arrow(tbl)).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2 and out.loc[1, "n_events"] == 3
    assert out.loc[2, "n_sessions"] == 1


def test_broadcast_join_and_topk():
    import ray.data

    from scrappy_ray.pipelines.relational import broadcast_join, top_k

    big = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 2], pa.int64()), "v": pa.array([10, 20, 30, 40], pa.int64())})
    )
    small = pa.table({"k": pa.array([1, 2], pa.int64()), "name": pa.array(["a", "b"], pa.string())})
    j = broadcast_join(big, small, on="k").to_pandas().sort_values("v")
    assert j["name"].tolist() == ["a", "b", "b"]  # inner join drops k=3
    t = top_k(big, "v", 2).to_pandas()
    assert t["v"].tolist() == [40, 30]


def test_connected_components_and_dedup():
    import ray.data

    from scrappy_ray.functions.dedup import connected_components, dedup_by_components

    # chain 1-2-3, pair 5-6, singleton 9 untouched
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array([1, 2, 5], pa.int64()), "id_b": pa.array([2, 3, 6], pa.int64())})
    )
    comp = connected_components(pairs)
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}
    docs = _docs_ds([(i, f"t{i}") for i in (1, 2, 3, 5, 6, 9)])
    kept = sorted(dedup_by_components(docs, pairs).to_pandas()["doc_id"])
    assert kept == [1, 5, 9]


def test_ivf_topk_recall():
    import ray.data

    from scrappy_ray.functions.similarity import ivf_topk, topk_cosine

    rng = np.random.RandomState(4)
    vecs = rng.randn(300, 12)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    brute = topk_cosine(ds, vecs[:5], k=3, query_ids=list(range(5))).to_pandas()
    ivf = ivf_topk(ds, vecs[:5], k=3, query_ids=list(range(5)), n_centroids=8, nprobe=4).to_pandas()
    hits = 0
    for q in range(5):
        b1 = brute[(brute.query_id == q) & (brute["rank"] == 1)]["neighbor_id"].tolist()
        hits += bool(b1 and b1[0] in ivf[ivf.query_id == q]["neighbor_id"].tolist())
    assert hits >= 3  # nprobe=4 of 8 lists recovers most rank-1 neighbors


def test_sample_vectors_block_order_independent():
    """The IVF training sample must be drawn uniformly regardless of
    block layout: an adversarially CLUSTER-SORTED dataset (block 1 all
    cluster A, block 2 all cluster B) must still yield a sample from
    both clusters — ds.limit() would see only the first block."""
    import ray.data

    from scrappy_ray.functions.similarity import sample_vectors

    rng = np.random.RandomState(7)
    a = rng.randn(400, 8) + 10.0   # cluster A (first block)
    b = rng.randn(400, 8) - 10.0   # cluster B (second block)

    def tbl(vs, start):
        return pa.table(
            {
                "vec_id": pa.array(range(start, start + len(vs)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vs], pa.list_(pa.float64())),
            }
        )

    ds = ray.data.from_arrow([tbl(a, 0), tbl(b, 400)])
    sample = sample_vectors(ds, sample_size=64, seed=3)
    assert sample.shape == (64, 8)
    n_a = int((sample[:, 0] > 0).sum())
    assert 16 <= n_a <= 48  # both clusters well represented
    # deterministic across runs/partitionings
    again = sample_vectors(ds.repartition(5), sample_size=64, seed=3)
    assert np.array_equal(np.sort(sample, axis=0), np.sort(again, axis=0))


def test_ivf_balanced_lists_on_sorted_layout():
    """With the uniform sampler, a cluster-sorted layout trains
    centroids covering BOTH clusters — each cluster's vectors land in
    lists whose centroids are near that cluster (no empty half)."""
    import ray.data

    from scrappy_ray.functions.similarity import ivf_topk, topk_cosine

    rng = np.random.RandomState(9)
    a = rng.randn(200, 8) + 10.0
    b = rng.randn(200, 8) - 10.0
    vecs = np.vstack([a, b])
    t1 = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([v.tolist() for v in a], pa.list_(pa.float64())),
        }
    )
    t2 = pa.table(
        {
            "vec_id": pa.array(range(200, 400), pa.int64()),
            "embedding": pa.array([v.tolist() for v in b], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow([t1, t2])
    qs = np.vstack([a[:3], b[:3]])
    brute = topk_cosine(ds, qs, k=3, query_ids=list(range(6))).to_pandas()
    ivf = ivf_topk(ds, qs, k=3, query_ids=list(range(6)), n_centroids=8, nprobe=4,
                   sample_size=128).to_pandas()
    # queries from BOTH clusters get useful neighbors (a first-block
    # sample would starve cluster B's lists)
    hits = 0
    for q in range(6):
        b1 = brute[(brute.query_id == q) & (brute["rank"] == 1)]["neighbor_id"].tolist()
        hits += bool(b1 and b1[0] in ivf[ivf.query_id == q]["neighbor_id"].tolist())
    assert hits >= 5


def test_rolling_window_semantics(ray_session):
    import ray.data
    from scrappy_ray.pipelines.relational import rolling_window

    tbl = pa.table(
        {
            "user_id": [1, 1, 1, 1, 1, 2, 2],
            "ts": [10, 20, 20, 30, 40, 5, 15],  # tie at ts=20
            "event_id": [100, 102, 101, 103, 104, 200, 201],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0],
        }
    )
    out = (
        rolling_window(ray.data.from_arrow(tbl), "user_id", "ts", "value",
                       "event_id", window=3, lag=1)
        .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True)
    )
    # user 1 order by (ts, event_id): 100(1.0) 101(3.0) 102(2.0) 103(4.0) 104(5.0)
    u1 = out[out.user_id == 1].set_index("event_id")
    assert u1.loc[101, "lag_value"] == 1.0  # tie broken by event_id
    assert u1.loc[102, "lag_value"] == 3.0
    assert u1.loc[100, "mavg"] == 1.0
    assert u1.loc[102, "mavg"] == 2.0           # (1+3+2)/3
    assert u1.loc[104, "mavg"] == pytest.approx((2 + 4 + 5) / 3, abs=1e-4)
    assert u1.loc[104, "running_sum"] == 15.0
    u2 = out[out.user_id == 2].set_index("event_id")
    assert np.isnan(u2.loc[200, "lag_value"])   # first row: LAG is null
    assert u2.loc[201, "mavg"] == 15.0          # frame shorter than window


def test_gopher_stats_rules(ray_session):
    import ray.data
    from scrappy_ray.functions.textstats import gopher_stats

    good = "the cat and the dog have fun with all of that " * 6  # 66 words
    bullets = "- one\n- two\n- three\nplain"
    symbols = "the of ### and ### that have … with … more #"
    tbl = pa.table({"doc_id": [1, 2, 3, 4],
                    "text": [good, bullets, symbols, ""]})
    out = (gopher_stats(ray.data.from_arrow(tbl), min_words=10)
           .to_pandas().set_index("doc_id"))
    assert bool(out.loc[1, "keep"])
    assert out.loc[1, "n_required_stops"] >= 2
    assert out.loc[2, "bullet_line_frac"] == 0.75
    assert not bool(out.loc[2, "keep"])           # too few words
    assert out.loc[3, "symbol_ratio"] > 0.1       # '#' + ellipsis heavy
    assert not bool(out.loc[3, "keep"])
    assert out.loc[4, "n_words"] == 1             # '' splits to ['']
    assert not bool(out.loc[4, "keep"])


def test_mix_corpus_upsampling(ray_session):
    import ray.data
    from scrappy_ray.functions.sampling import mix_corpus

    tbl = pa.table({"doc_id": list(range(100)),
                    "source": (["a"] * 40 + ["b"] * 40 + ["c"] * 20)})
    rates = {"a": 2.0, "b": 0.5}
    out = (mix_corpus(ray.data.from_arrow(tbl), rates, salt=5)
           .to_pandas())
    a = out[out.source == "a"]
    assert len(a) == 80                            # exactly 2 epochs
    assert sorted(a[a.doc_id == 0].epoch) == [0, 1]
    b = out[out.source == "b"]
    assert 0 < len(b) < 40                         # fractional keep
    assert (b.epoch == 0).all()
    assert (out.source != "c").all()               # default rate 0 drops
    # layout invariance: different block structure, identical output
    out2 = (mix_corpus(ray.data.from_arrow(tbl).repartition(7), rates, salt=5)
            .to_pandas())
    k = ["doc_id", "epoch"]
    assert out.sort_values(k).reset_index(drop=True).equals(
        out2.sort_values(k).reset_index(drop=True))


def test_inverted_index_and_search(ray_session):
    import ray.data
    from scrappy_ray.functions.index import (
        build_inverted_index, lookup_postings, search_all_terms)

    tbl = pa.table({"doc_id": [3, 1, 2],
                    "text": ["cat dog cat", "dog fish", "cat bird dog"]})
    ds = ray.data.from_arrow(tbl)
    idx = lookup_postings(build_inverted_index(ds), ["cat", "dog", "none"]) \
        .to_pandas().set_index("token")
    assert list(idx.loc["cat", "postings"]) == [2, 3]   # sorted, distinct
    assert idx.loc["dog", "df"] == 3
    assert "none" not in idx.index
    hits = search_all_terms(ds, ["cat", "dog"]).to_pandas().set_index("doc_id")
    assert sorted(hits.index) == [2, 3]
    assert hits.loc[3, "n_matches"] == 3                # cat x2 + dog
    with pytest.raises(ValueError):
        search_all_terms(ds, [])


def test_inverted_index_min_df(ray_session):
    import ray.data
    from scrappy_ray.functions.index import build_inverted_index

    tbl = pa.table({"doc_id": [1, 2], "text": ["rare common", "common"]})
    out = build_inverted_index(ray.data.from_arrow(tbl), min_df=2).to_pandas()
    assert list(out["token"]) == ["common"]


def test_snapshot_diff_statuses(ray_session):
    import ray.data
    from scrappy_ray.functions.webtext import snapshot_diff

    old = ray.data.from_arrow(pa.table(
        {"url": ["a", "b", "c"], "fingerprint": ["1", "2", "3"]}))
    new = ray.data.from_arrow(pa.table(
        {"url": ["b", "c", "d"], "fingerprint": ["2", "X", "4"]}))
    out = snapshot_diff(old, new).to_pandas().set_index("url")["status"]
    assert out.to_dict() == {"a": "removed", "b": "unchanged",
                             "c": "changed", "d": "added"}


def test_mixture_rates_temperature():
    from scrappy_ray.functions.sampling import mixture_rates

    sizes = {"web": 900, "wiki": 100}
    # T=1: wiki weighted 50/50 against a 9x bigger web -> wiki repeats
    r1 = mixture_rates(sizes, {"web": 0.5, "wiki": 0.5}, temperature=1.0)
    assert r1["wiki"] == pytest.approx(5.0)
    assert r1["web"] == pytest.approx(5 / 9)
    # expected doc mass preserved
    assert r1["web"] * 900 + r1["wiki"] * 100 == pytest.approx(1000)
    # high T flattens p toward uniform: rates inversely track sizes
    rT = mixture_rates(sizes, {"web": 0.9, "wiki": 0.1}, temperature=1e9)
    assert rT["web"] == pytest.approx(rT["wiki"] / 9, rel=1e-3)
    # zero-weight source drops; unknown-weight source errors
    r0 = mixture_rates(sizes, {"web": 1.0})
    assert r0["wiki"] == 0.0
    with pytest.raises(ValueError):
        mixture_rates(sizes, {"nope": 1.0})
    with pytest.raises(ValueError):
        mixture_rates(sizes, {"web": 1.0}, temperature=0)


def test_value_buckets_exact_deciles(ray_session):
    import ray.data
    from scrappy_ray.functions.sketch import value_buckets

    # 100 distinct values 0..99 -> decile b holds values 10b..10b+9
    tbl = pa.table({"doc_id": list(range(100)),
                    "v": [float(i) for i in range(100)]})
    out = (value_buckets(ray.data.from_arrow(tbl), "v", k=10)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (out["bucket"] == out["doc_id"] // 10).all()
    # ties land in ONE bucket; layout invariance
    t2 = pa.table({"doc_id": list(range(90)), "v": [1.0] * 30 + [2.0] * 30 + [3.0] * 30})
    a = value_buckets(ray.data.from_arrow(t2), "v", k=3).to_pandas()
    b = value_buckets(ray.data.from_arrow(t2).repartition(7), "v", k=3).to_pandas()
    assert a.groupby("v")["bucket"].nunique().eq(1).all()
    k = ["doc_id", "bucket"]
    assert a.sort_values(k).reset_index(drop=True)[k].equals(
        b.sort_values(k).reset_index(drop=True)[k])
    # empty input keeps a typed schema
    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert value_buckets(empty, "v").count() == 0


def test_url_trap_stats(ray_session):
    import ray.data
    from scrappy_ray.functions.webtext import url_trap_stats

    tbl = pa.table({"url": [
        "http://ok.test/a",              # depth 1
        "http://ok.test/a/b",            # depth 2
        "http://deep.test/" + "s/" * 9,  # depth 10 -> trap
        "http://qq.test/x?p=1",
        "http://qq.test/y?p=2",
        "http://qq.test/z",              # query_ratio 2/3 -> trap
    ]})
    out = (url_trap_stats(ray.data.from_arrow(tbl), max_query_ratio=0.5,
                          max_depth=7)
           .to_pandas().set_index("host"))
    assert not out.loc["ok.test", "trap"]
    assert out.loc["ok.test", "max_depth"] == 2
    assert out.loc["deep.test", "trap"]
    assert out.loc["qq.test", "trap"]
    assert out.loc["qq.test", "query_ratio"] == pytest.approx(2 / 3, abs=1e-4)
    # layout invariance (partial-aggregate combiner is exact)
    out2 = (url_trap_stats(ray.data.from_arrow(tbl).repartition(5),
                           max_query_ratio=0.5, max_depth=7)
            .to_pandas().set_index("host"))
    assert out.sort_index().equals(out2.sort_index())


def test_span_tag_and_removal(ray_session):
    import ray.data
    from scrappy_ray.functions.spans import apply_span_removal, tag_spans

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["keep AAA mid AAA end", "no match here", "AAAAA overlap"],
    }))
    spans = tag_spans(docs, r"AAA", "x", concurrency=2)
    sdf = spans.to_pandas()
    assert len(sdf[sdf.doc_id == 1]) == 2
    assert sdf[sdf.doc_id == 3].iloc[0][["start", "end"]].tolist() == [0, 3]
    out = (apply_span_removal(docs, spans).to_pandas()
           .set_index("doc_id")["text"])
    assert out[1] == "keep  mid  end"
    assert out[2] == "no match here"     # untagged doc passes through
    assert out[3] == "AA overlap"        # non-overlapping finditer
    # the policy knob: applying NO tags is the identity
    ident = (apply_span_removal(docs, spans, tags=["other"]).to_pandas()
             .set_index("doc_id")["text"])
    assert ident[1] == "keep AAA mid AAA end"


def test_span_removal_merges_overlaps(ray_session):
    import ray.data
    from scrappy_ray.functions.spans import apply_span_removal

    docs = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["abcdefgh"]}))
    spans = ray.data.from_arrow(pa.table({
        "doc_id": [1, 1, 1], "start": [1, 2, 6], "end": [3, 5, 8],
        "tag": ["a", "b", "a"],
    }))
    out = apply_span_removal(docs, spans).to_pandas()["text"][0]
    assert out == "af"  # [1,5) merged from overlapping [1,3)+[2,5), then [6,8)


def test_sitemap_parser(ray_session):
    import ray.data
    from scrappy_ray.sources.sitemap import parse_sitemaps

    urlset = ('<?xml version="1.0"?><urlset>'
              "<url><loc> http://a.test/1 </loc><lastmod>2026-01-02</lastmod></url>"
              "<url><loc>http://a.test/2</loc></url>"          # no lastmod
              "<url><lastmod>2026-01-03</lastmod></url>"       # no loc: dropped
              "</urlset>")
    index = ("<sitemapindex>"
             "<sitemap><loc>http://a.test/sitemap2.xml</loc></sitemap>"
             "</sitemapindex>")
    ds = ray.data.from_arrow(pa.table({"xml": [urlset, index, ""]}))
    out = parse_sitemaps(ds, concurrency=2).to_pandas().sort_values("url")
    assert out["url"].tolist() == [
        "http://a.test/1", "http://a.test/2", "http://a.test/sitemap2.xml"]
    assert out.set_index("url").loc["http://a.test/1", "lastmod"] == "2026-01-02"
    assert out.set_index("url").loc["http://a.test/2", "lastmod"] is None
    assert out.set_index("url").loc["http://a.test/sitemap2.xml", "kind"] == "sitemap"
