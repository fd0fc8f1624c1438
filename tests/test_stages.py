"""Stage-level tests: page store build/lookup, fetch paths, global-seq
prefix sum."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def store(tmp_path_factory, synth_pages_dir):
    from scrappy_ray.stages.fetch import build_page_store

    d = str(tmp_path_factory.mktemp("store"))
    build_page_store(synth_pages_dir, d, num_buckets=4)
    return d


def test_store_build_idempotent_and_sorted(store, synth_pages_dir):
    from scrappy_ray.stages.fetch import build_page_store

    # second call is a no-op (marker)
    assert build_page_store(synth_pages_dir, store, num_buckets=4) == store
    # every bucket is one sorted file (compaction)
    buckets = [d for d in os.listdir(store) if d.startswith("bucket=")]
    assert buckets
    for b in buckets:
        files = [f for f in os.listdir(os.path.join(store, b)) if f.endswith(".parquet")]
        assert files == ["sorted.parquet"]
        urls = pq.read_table(os.path.join(store, b, files[0]), columns=["url"])["url"].to_pylist()
        assert urls == sorted(urls)


def test_lookup_urls_hits_and_misses(store, synth_web):
    from scrappy_ray.sources.testgen import all_urls
    from scrappy_ray.stages.fetch import lookup_urls

    cfg, _ = synth_web
    urls = all_urls(cfg)[:5] + ["http://nowhere.test/x"]
    got = lookup_urls(store, 4, urls)
    assert {r["url"] for r in got} == set(urls[:5])
    assert all(r["html"] for r in got)


def test_fetch_frontier_both_paths(store, synth_web):
    import ray.data

    from scrappy_ray.sources.testgen import all_urls
    from scrappy_ray.stages.fetch import fetch_frontier

    cfg, _ = synth_web
    urls = all_urls(cfg)[:8] + ["http://miss.test/a"]
    frontier = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls),
                "curl": pa.array(urls),
                "depth": pa.array([1] * len(urls), pa.int32()),
                "seq": pa.array(range(len(urls)), pa.int64()),
                "host": pa.array(["h"] * len(urls)),
            }
        )
    )
    for shuffle in (True, False):
        out = fetch_frontier(frontier, store, 4, shuffle=shuffle).to_pandas()
        assert len(out) == len(urls)
        by_url = out.set_index("url")["html"]
        assert by_url["http://miss.test/a"] is None
        assert all(by_url[u] is not None for u in urls[:8])


def test_add_global_seq(ray_session):
    import ray.data

    from scrappy_ray.stages.seq import add_global_seq

    ds = ray.data.from_arrow(pa.table({"x": pa.array(range(100))})).repartition(7).sort("x")
    out, nxt = add_global_seq(ds, start=10, order_cols=("x",))
    assert nxt == 110
    t = out.to_pandas().sort_values("x")
    assert t["seq"].tolist() == list(range(10, 110))


def test_url_bucket_stable():
    from scrappy_ray.stages.fetch import url_bucket

    assert url_bucket("http://a.test/x", 64) == url_bucket("http://a.test/x", 64)
    assert 0 <= url_bucket("anything", 16) < 16


def test_default_num_buckets(synth_pages_dir):
    from scrappy_ray.stages.fetch import default_num_buckets

    n = default_num_buckets(synth_pages_dir)
    assert n >= 16 and (n & (n - 1)) == 0  # power of two
