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

    for mode in ("exact", "cuckoo"):
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
