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
