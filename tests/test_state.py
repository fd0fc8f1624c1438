"""Seen-set shards, cuckoo filter, politeness buckets, robots parsing."""

import pytest

from scrappy_ray.state.cuckoo import CuckooFilter
from scrappy_ray.state.robots import parse_robots


def test_cuckoo_basic():
    f = CuckooFilter(10_000, seed=1)
    keys = [f"k{i}".encode() for i in range(5000)]
    for k in keys:
        assert f.check_and_add(k) is True
    for k in keys:
        assert k in f
        assert f.check_and_add(k) is False
    # false-positive rate small on fresh keys
    fresh = [f"x{i}".encode() for i in range(5000)]
    fp = sum(1 for k in fresh if k in f)
    assert fp < 50  # <1%


def test_cuckoo_snapshot_roundtrip():
    f = CuckooFilter(1000, seed=3)
    for i in range(500):
        f.check_and_add(f"k{i}".encode())
    g = CuckooFilter.loads(f.dumps())
    assert all(f"k{i}".encode() in g for i in range(500))
    assert g.count == f.count


def test_robots_parse():
    r = parse_robots("User-agent: *\nDisallow: /private/\nDisallow: /tmp\n")
    assert not r.allowed("http://h.test/private/x")
    assert not r.allowed("http://h.test/tmpfile")
    assert r.allowed("http://h.test/public")
    assert parse_robots(None).allowed("http://h.test/anything")
    # sections for other agents don't apply
    r2 = parse_robots("User-agent: googlebot\nDisallow: /\n")
    assert r2.allowed("http://h.test/x")


@pytest.mark.usefixtures("ray_session")
def test_seen_pool_exact_and_cuckoo():
    from scrappy_ray.state.seen import SeenSetPool

    for mode in ("exact", "cuckoo", "bloom"):
        pool = SeenSetPool(num_shards=3, mode=mode, capacity_per_shard=10000)
        urls = [f"http://h{i % 5}.test/p{i}" for i in range(200)]
        depths = [i % 3 for i in range(200)]
        mask = pool.mark_new(urls, depths)
        assert all(mask)
        mask2 = pool.mark_new(urls, depths)
        assert not any(mask2)
        # same url different depth is a different item (map_reduce.rb:40)
        mask3 = pool.mark_new(urls[:5], [99] * 5)
        assert all(mask3)
        assert pool.total() == 205
        # snapshot/restore
        snaps = pool.snapshot()
        pool2 = SeenSetPool(num_shards=3, mode=mode, capacity_per_shard=10000)
        pool2.restore(snaps)
        assert not any(pool2.mark_new(urls, depths))


@pytest.mark.usefixtures("ray_session")
def test_host_budget_pool():
    from scrappy_ray.state.politeness import HostBudgetPool

    pool = HostBudgetPool(rate_per_round=3, num_shards=2)
    g = pool.grant({"a.test": 10, "b.test": 2}, rnd=0)
    assert g == {"a.test": 3, "b.test": 2}
    # b.test banked 1 token, capped at burst
    g = pool.grant({"a.test": 1, "b.test": 10}, rnd=1)
    assert g["a.test"] == 1
    assert g["b.test"] == 3  # refill to burst cap


def test_bloom_basic():
    from scrappy_ray.state.bloom import BloomFilter

    f = BloomFilter(10_000, seed=1)
    keys = [f"k{i}".encode() for i in range(5000)]
    out = f.check_and_add_many(keys)
    assert out.all()  # no false negatives on insert
    assert f.count == 5000
    # re-check: all present, none new
    assert f.contains_many(keys).all()
    assert not f.check_and_add_many(keys).any()
    # false-positive rate bounded on fresh keys (sized for ~0.8%)
    fresh = [f"x{i}".encode() for i in range(5000)]
    fp = int(f.contains_many(fresh).sum())
    assert fp < 100  # <2%


def test_bloom_intra_batch_duplicates():
    from scrappy_ray.state.bloom import BloomFilter

    f = BloomFilter(1000, seed=2)
    out = f.check_and_add_many([b"a", b"b", b"a", b"c", b"b", b"a"])
    # first occurrence new, repeats within the same batch not
    assert out.tolist() == [True, True, False, True, False, False]
    assert f.count == 3


def test_bloom_scalar_interface_and_snapshot():
    from scrappy_ray.state.bloom import BloomFilter

    f = BloomFilter(1000, seed=3)
    assert f.check_and_add(b"k1") is True
    assert f.check_and_add(b"k1") is False
    assert b"k1" in f
    assert b"nope" not in f
    for i in range(500):
        f.check_and_add(f"k{i}".encode())
    g = BloomFilter.loads(f.dumps())
    assert g.m == f.m and g.k == f.k and g.count == f.count and g.seed == f.seed
    assert all(f"k{i}".encode() in g for i in range(500))
    # restored filter keeps accepting inserts
    assert g.check_and_add(b"new-key") is True


def test_bloom_seed_independence():
    """Different seeds → different bit patterns (shards are seeded per
    index so correlated fp's across shards are avoided)."""
    from scrappy_ray.state.bloom import BloomFilter

    a, b = BloomFilter(1000, seed=0), BloomFilter(1000, seed=1)
    for i in range(200):
        a.check_and_add(f"k{i}".encode())
        b.check_and_add(f"k{i}".encode())
    assert (a.bits != b.bits).any()
