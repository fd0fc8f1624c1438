"""Edge-case unit tests for pipelines/analytics.py — the cases the
DuckDB oracle parity test can't construct from the bench tables:
ntile with fewer rows than buckets, rank ties, funnel strictness on
equal timestamps, gap-fill NULL semantics, rollup NULL levels, and
unpivot of zero-count rows."""

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _collect(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def test_rank_windows_ties_and_small_ntile(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import rank_windows

    # one key, 3 rows (< ntiles=4), with a tie on the order column
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "id": pa.array([10, 11, 12], pa.int64()),
        "v": pa.array([5.0, 5.0, 7.0], pa.float64()),
    }))
    out = _collect(rank_windows(ds, "k", "v", "id", ntiles=4).sort("rn"))
    assert out.column("rn").to_pylist() == [1, 2, 3]
    # SQL rank(): tie shares rank 1, next value jumps to 3
    assert out.column("rnk").to_pylist() == [1, 1, 3]
    assert out.column("drnk").to_pylist() == [1, 1, 2]
    # n < k: each row its own bucket (DuckDB ntile)
    assert out.column("tile").to_pylist() == [1, 2, 3]


def test_rank_windows_ntile_remainder(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import rank_windows

    # 10 rows, ntile(4) → bucket sizes 3,3,2,2
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([0] * 10, pa.int64()),
        "id": pa.array(range(10), pa.int64()),
        "v": pa.array(np.arange(10.0)),
    }))
    out = _collect(rank_windows(ds, "k", "v", "id", ntiles=4).sort("rn"))
    assert out.column("tile").to_pylist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_funnel_requires_strict_order(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import funnel_counts

    ts = pa.array(
        [1_000_000, 2_000_000, 3_000_000,   # user 1: full funnel
         5_000_000, 5_000_000,              # user 2: click ties view → no
         9_000_000, 8_000_000],             # user 3: click BEFORE view → no
        pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "et": pa.array(["view", "click", "purchase",
                        "view", "click", "view", "click"]),
        "ts": ts,
    }))
    out = funnel_counts(ds, "u", "et", "ts", ["view", "click", "purchase"])
    assert out.column("step").to_pylist() == ["view", "click", "purchase"]
    assert out.column("n_users").to_pylist() == [3, 1, 1]


def test_retention_offsets(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import retention_cohorts

    day = 86_400_000_000
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
        # u1 active day0 (twice) + day2; u2 active day1 + day2
        "ts": pa.array([10, day * 0 + 20, day * 2 + 5,
                        day * 1 + 7, day * 2 + 9], pa.timestamp("us")),
    }))
    out = _collect(retention_cohorts(ds, "u", "ts")
                   .sort(["cohort_day", "day_offset"]))
    cohort = np.asarray(out.column("cohort_day")
                        .cast(pa.timestamp("us")).cast(pa.int64())) // day
    rows = list(zip(cohort,
                    out.column("day_offset").to_pylist(),
                    out.column("n_users").to_pylist()))
    assert [(int(a), b, c) for a, b, c in rows] == [
        (0, 0, 1), (0, 2, 1), (1, 0, 1), (1, 1, 1)]


def test_resample_gap_fill_nulls(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import resample_counts

    h6 = 6 * 3_600_000_000
    ds = ray.data.from_arrow(pa.table({
        # buckets 0 and 3 occupied; 1 and 2 are gaps
        "ts": pa.array([5, 10, h6 * 3 + 1], pa.timestamp("us")),
        "value": pa.array([1.25, 2.5, 4.0], pa.float64()),
    }))
    out = resample_counts(ds, "ts", "value", hours=6, scale=6)
    assert out.num_rows == 4
    assert out.column("n_events").to_pylist() == [2, 0, 0, 1]
    sv = out.column("sum_value").to_pylist()
    assert sv[0] == 3.75 and sv[3] == 4.0
    assert sv[1] is None and sv[2] is None  # gap rows are NULL, not 0/NaN


def test_rollup_levels_and_null_fill(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import rollup_counts

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(["x", "x", "y"]),
        "b": pa.array(["p", "q", "p"]),
        # 2.125*100 = 212.5 EXACTLY in float: half-away-from-zero (SQL
        # ROUND) gives 213 where Arrow's half_to_even would give 212.
        # 1.005*100 = 100.4999… in float: rounds to 100 in BOTH systems.
        "m": pa.array([1.005, 2.125, 3.0], pa.float64()),
    }))
    out = rollup_counts(ds, "a", "b", "m", scale=2)
    byl = {}
    for i in range(out.num_rows):
        key = (out.column("a")[i].as_py(), out.column("b")[i].as_py())
        byl[key] = (out.column("n")[i].as_py(),
                    out.column("sum_v")[i].as_py())
    assert byl[("x", "p")] == (1, 1.0)
    assert byl[("x", "q")] == (1, 2.13)
    assert byl[("x", None)] == (2, 3.13)
    assert byl[(None, None)] == (3, 6.13)
    assert len(byl) == 6


def test_unpivot_keeps_zero_rows(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import unpivot

    ds = ray.data.from_arrow(pa.table({
        "u": pa.array([7], pa.int64()),
        "n_a": pa.array([0], pa.int64()),
        "n_b": pa.array([4], pa.int64()),
    }))
    out = _collect(unpivot(ds, "u", ["n_a", "n_b"], "t", "n",
                           strip_prefix="n_").sort("t"))
    assert out.column("t").to_pylist() == ["a", "b"]
    assert out.column("n").to_pylist() == [0, 4]
