"""Wave-32 operators: connected-component sizes, exact weighted
median, last-touch attribution. (Each also has an oracle_sql entry;
this file covers the edge cases SQL parity can't — singletons,
even-weight ties, users with no qualifying predecessor.)"""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.usefixtures("ray_session")
def test_component_sizes_with_singletons_and_merges():
    import ray.data

    from scrappy_ray.functions.graph import component_sizes

    # component {0,1,2,3} needs two label-propagation hops (3-1 via 2),
    # {10,11} is a pair, 20 and 21 are edge-less singletons
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 10], pa.int64()),
        "dst": pa.array([1, 2, 3, 11], pa.int64()),
    })).repartition(3)
    nodes = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 10, 11, 20, 21], pa.int64()),
    })).repartition(2)
    out = {r["root"]: r["size"]
           for r in component_sizes(edges, nodes).take_all()}
    assert out == {0: 4, 10: 2, 20: 1, 21: 1}


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_ties_and_skew():
    import ray.data

    from scrappy_ray.functions.stats import weighted_median

    # group a: weights {1:1, 2:1} -> 2*cum(1)=1 < tot=2, pick 2?  no:
    # 2*1 >= 2 -> v=1 (lower of the even split, matching the SQL rule)
    # group b: one heavy value dominates regardless of order
    # group c: duplicate (group, value) rows collapse before the pick
    t = pa.table({
        "g": ["a", "a", "b", "b", "b", "c", "c", "c"],
        "v": pa.array([1.0, 2.0, 5.0, 7.0, 9.0, 4.0, 4.0, 8.0]),
        "w": pa.array([1, 1, 1, 10, 1, 1, 2, 2], pa.int64()),
    })
    out = weighted_median(ray.data.from_arrow(t).repartition(4),
                          "g", "v", "w")
    d = dict(zip(out.column("g").to_pylist(),
                 out.column("wmedian").to_pylist()))
    assert d == {"a": 1.0, "b": 7.0, "c": 4.0}

    # cross-check the even-split rule against numpy on random data
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, 200).astype(np.float64)
    wts = rng.integers(1, 9, 200).astype(np.int64)
    t2 = pa.table({"g": ["x"] * 200, "v": vals, "w": wts})
    out2 = weighted_median(ray.data.from_arrow(t2).repartition(6),
                           "g", "v", "w")
    order = np.argsort(vals, kind="stable")
    sv, sw = vals[order], wts[order]
    cum = np.cumsum(sw)
    want = sv[int(np.searchsorted(2 * cum, cum[-1], side="left"))]
    assert out2.column("wmedian").to_pylist() == [want]


@pytest.mark.usefixtures("ray_session")
def test_last_touch_orders_within_user():
    import ray.data

    from scrappy_ray.pipelines.analytics import last_touch

    us = np.array([0, 10, 20, 30, 0, 5], dtype="datetime64[us]")
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(np.r_[us[:4], us[4:]]),
        # user 1: view -> purchase -> click -> purchase (credits view,
        # click); user 2: purchase first (no predecessor -> no credit),
        # then view
        "event_type": ["view", "purchase", "click", "purchase",
                       "purchase", "view"],
    })
    out = last_touch(ray.data.from_arrow(t).repartition(3))
    got = {r["prev_type"]: r["n"] for r in out.take_all()}
    assert got == {"view": 1, "click": 1}

    # ts tie broken by event_id: two events at the same timestamp
    t2 = pa.table({
        "event_id": pa.array([7, 8], pa.int64()),
        "user_id": pa.array([3, 3], pa.int64()),
        "ts": pa.array(np.array([100, 100], dtype="datetime64[us]")),
        "event_type": ["signup", "purchase"],
    })
    out2 = last_touch(ray.data.from_arrow(t2))
    assert {r["prev_type"]: r["n"] for r in out2.take_all()} == {
        "signup": 1}


@pytest.mark.usefixtures("ray_session")
def test_argmin_per_group_ties_and_blocks():
    import ray.data

    from scrappy_ray.pipelines.relational import argmin_per_group

    # group 1: tie on price broken by supplier id; group 2: min lives
    # in a different block than most rows (repartition forces it)
    t = pa.table({
        "pk": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
        "sk": pa.array([9, 4, 7, 1, 2, 3, 5], pa.int64()),
        "price": pa.array([5.0, 5.0, 8.0, 3.0, 1.0, 2.0, 7.0]),
    })
    out = argmin_per_group(ray.data.from_arrow(t).repartition(4),
                           "pk", ["price", "sk"], ["sk", "price"])
    rows = sorted(out.take_all(), key=lambda r: r["pk"])
    assert [(r["pk"], r["sk"], r["price"]) for r in rows] == [
        (1, 4, 5.0), (2, 2, 1.0), (3, 5, 7.0)]


@pytest.mark.usefixtures("ray_session")
def test_revenue_share_sums_to_one():
    import pyarrow.compute as pc
    import ray.data

    from scrappy_ray.pipelines.relational import revenue_share

    rng = np.random.default_rng(11)
    n = 300
    t = pa.table({
        "g": pa.array(rng.integers(0, 4, n).astype(str)),
        "l_extendedprice": np.round(rng.uniform(1, 1000, n), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n), 2),
    })
    out = revenue_share(ray.data.from_arrow(t).repartition(5),
                        lambda b: b.column("g"), "g")
    shares = out.column("share").to_pylist()
    assert abs(sum(shares) - 1.0) < 1e-5
    # exact per-group check vs numpy int arithmetic
    p = np.round(np.asarray(t.column("l_extendedprice")) * 100).astype(
        np.int64)
    d = np.round((1 - np.asarray(t.column("l_discount"))) * 100).astype(
        np.int64)
    r = p * d
    gcol = np.asarray(t.column("g"))
    for i, g in enumerate(out.column("g").to_pylist()):
        want = r[gcol == g].sum()
        assert out.column("revenue")[i].as_py() == pytest.approx(
            round(want / 10000.0, 2))
