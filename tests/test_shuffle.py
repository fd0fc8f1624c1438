"""External hash shuffle (stages/shuffle.py): per-bucket reduces must
equal a single-process Arrow reduce on any input — including empty
input, null keys, hot keys, and keys that land in one bucket."""

import numpy as np
import pyarrow as pa
import pytest


def _rand_table(n, seed):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array([f"key{int(x)}" for x in rng.integers(0, max(1, n // 3), n)]),
            "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "w": pa.array([f"w{int(x)}" for x in rng.integers(0, 5, n)]),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_hash_distinct_matches_arrow(tmp_path):
    import ray.data

    from scrappy_ray.stages.shuffle import hash_distinct

    t = _rand_table(5000, 7)
    ds = ray.data.from_arrow(t).map_batches(lambda b: b, batch_format="pyarrow", batch_size=256)
    got = hash_distinct(ds, ["k", "w"], str(tmp_path / "d"), num_buckets=8)
    got_rows = sorted((r["k"], r["w"]) for r in got.take_all())
    exp = t.select(["k", "w"]).group_by(["k", "w"]).aggregate([])
    exp_rows = sorted(zip(exp.column("k").to_pylist(), exp.column("w").to_pylist()))
    assert got_rows == exp_rows


@pytest.mark.usefixtures("ray_session")
def test_hash_first_by_key_matches_arrow(tmp_path):
    import ray.data

    from scrappy_ray.stages.shuffle import hash_first_by_key

    t = _rand_table(4000, 11)
    ds = ray.data.from_arrow(t).map_batches(lambda b: b, batch_format="pyarrow", batch_size=128)
    got = hash_first_by_key(ds, "k", "v", ["w"], str(tmp_path / "f"), num_buckets=4)
    got_map = {r["k"]: r["w"] for r in got.take_all()}
    # expected: w of the min-v row per k (ties broken by sort stability
    # — pick min (v, w) deterministically for comparison)
    exp: dict = {}
    for k, v, w in zip(t.column("k").to_pylist(), t.column("v").to_pylist(), t.column("w").to_pylist()):
        if k not in exp or (v, w) < exp[k]:
            exp[k] = (v, w)
    assert set(got_map) == set(exp)
    for k, (v, w) in exp.items():
        # min-v row wins; if several rows share min v, any of their w
        # values is the sort-stable winner — assert the v matches via
        # membership of (k, got w) among min-v rows
        minv_ws = {
            w2
            for k2, v2, w2 in zip(
                t.column("k").to_pylist(), t.column("v").to_pylist(), t.column("w").to_pylist()
            )
            if k2 == k and v2 == v
        }
        assert got_map[k] in minv_ws


@pytest.mark.usefixtures("ray_session")
def test_hash_shuffle_single_hot_key(tmp_path):
    """Everything in one bucket (one distinct key) still reduces
    correctly — the skew case a 100 TB run must survive."""
    import ray.data

    from scrappy_ray.stages.shuffle import hash_distinct

    t = pa.table({"k": pa.array(["hot"] * 10_000), "w": pa.array(["x"] * 10_000)})
    ds = ray.data.from_arrow(t).map_batches(lambda b: b, batch_format="pyarrow", batch_size=512)
    got = hash_distinct(ds, ["k", "w"], str(tmp_path / "h"), num_buckets=8)
    assert got.take_all() == [{"k": "hot", "w": "x"}]


@pytest.mark.usefixtures("ray_session")
def test_hash_shuffle_empty_and_stale_spill(tmp_path):
    """Empty input yields an empty result, and a stale spill dir from
    a killed run is cleared, not merged."""
    import ray.data

    from scrappy_ray.stages.shuffle import hash_distinct

    d = tmp_path / "s"
    t = pa.table({"k": pa.array(["a", "b"]), "w": pa.array(["1", "2"])})
    first = hash_distinct(ray.data.from_arrow(t), ["k", "w"], str(d), num_buckets=4)
    assert first.count() == 2
    # rerun over DIFFERENT input with the same tmp dir: old shards gone
    t2 = pa.table({"k": pa.array(["c"]), "w": pa.array(["3"])})
    second = hash_distinct(ray.data.from_arrow(t2), ["k", "w"], str(d), num_buckets=4)
    assert second.take_all() == [{"k": "c", "w": "3"}]

    empty = t.slice(0, 0)
    out = hash_distinct(ray.data.from_arrow(empty), ["k", "w"], str(tmp_path / "e"), num_buckets=4)
    assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_empty_shuffle_preserves_schema(tmp_path):
    """Zero spilled rows must not degrade every column to string: a
    zero-link crawl round's result gets unioned with int-typed deferred
    frontier rows, so the empty fallback must carry the input types."""
    import ray.data

    from scrappy_ray.stages.shuffle import hash_distinct

    t = pa.table(
        {
            "url": pa.array([], pa.string()),
            "depth": pa.array([], pa.int32()),
            "enc": pa.array([], pa.int64()),
        }
    )
    out = hash_distinct(
        ray.data.from_arrow(t), ["url", "depth", "enc"], str(tmp_path / "es"), num_buckets=4
    )
    sch = out.schema().base_schema
    assert sch.field("depth").type == pa.int32()
    assert sch.field("enc").type == pa.int64()
    assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_mark_exec_bucket_duplicate_rows_idempotent():
    """A retried spill task duplicates bucket rows; mark_exec must
    grant each (host, seq) frontier row at most once — duplicated rows
    would double-fetch and break seq uniqueness downstream."""
    import ray

    from scrappy_ray.crawl.driver import _make_mark_exec_bucket

    grants = {"a.test": 2, "b.test": 1}
    rows = pa.table(
        {
            "host": pa.array(["a.test", "a.test", "a.test", "b.test", "b.test"]),
            "seq": pa.array([10, 11, 12, 20, 21], pa.int64()),
            "url": pa.array(["u0", "u1", "u2", "u3", "u4"]),
        }
    )
    # simulate a retried spill: the whole table appended twice
    duped = pa.concat_tables([rows, rows])
    mark = _make_mark_exec_bucket(ray.put(grants))
    out = mark(duped)
    execd = sorted(
        (h, s)
        for h, s, e in zip(
            out.column("host").to_pylist(),
            out.column("seq").to_pylist(),
            out.column("exec").to_pylist(),
        )
        if e
    )
    # exactly first 2 of a.test and first 1 of b.test, each once
    assert execd == [("a.test", 10), ("a.test", 11), ("b.test", 20)]
    assert out.num_rows == rows.num_rows  # dupes dropped entirely
