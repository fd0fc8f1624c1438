"""Analytic operators over event/metric tables: ranking windows,
grouping-set rollups, funnel & retention analysis, time-bucket
resampling with gap fill, wide→long unpivot.

Same design rules as pipelines/relational.py (the reference's
aggregation surface, scrappy lib/scrappy/agent/blind.rb triple rollups,
generalized): every wide step pre-aggregates inside ``map_batches`` so
the shuffle moves O(groups) not O(rows); the only full-group operations
are ``groupby().map_groups`` windows whose partitioning assumption (one
key's rows on one worker) is documented per function. Money/metric sums
go through exact integer cents so the Ray float-addition order can
never drift from the DuckDB oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _run_starts(v: np.ndarray) -> np.ndarray:
    """Index of the first row of each run of equal adjacent values."""
    if len(v) == 0:
        return np.zeros(0, np.int64)
    return np.flatnonzero(np.r_[True, v[1:] != v[:-1]])


def rank_windows(ds, key_col: str, order_col: str, id_col: str,
                 ntiles: int = 4):
    """SQL ranking windows per key — ``row_number`` / ``rank`` /
    ``dense_rank`` ordered by (order, id), and ``ntile(k)`` — as one
    vectorized pass per group. Ray Data has no window operator; the
    Dataset-API expression is ``groupby(key).map_groups`` with numpy
    run-length ranking (no Python loop). Partitioning assumption: one
    key's rows fit one worker — salt hot keys upstream if not.
    ``rank``/``dense_rank`` tie on ``order_col`` alone (SQL semantics);
    ``ntile`` buckets match DuckDB: the first n%k buckets get the extra
    row."""

    def win(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[(order_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(order)
        v = np.asarray(pc.cast(g.column(order_col), pa.float64()))
        n = len(v)
        starts = _run_starts(v)
        runlen = np.diff(np.r_[starts, n])
        rnk = np.repeat(starts + 1, runlen)
        drnk = np.repeat(np.arange(1, len(starts) + 1), runlen)
        i = np.arange(n)
        q, r = divmod(n, ntiles)
        if q == 0:
            tile = i + 1
        else:
            head = r * (q + 1)
            tile = np.where(i < head, i // (q + 1) + 1,
                            r + (i - head) // max(q, 1) + 1)
        return pa.table({
            key_col: g.column(key_col),
            id_col: g.column(id_col),
            "rn": pa.array(i + 1, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
            "drnk": pa.array(drnk, pa.int64()),
            "tile": pa.array(tile, pa.int64()),
        })

    return ds.groupby(key_col).map_groups(win, batch_format="pyarrow")


def _cents(col, scale: int) -> pa.Array:
    """Exact fixed-point ints so distributed float-sum order can't
    drift from an oracle: round(value * 10^scale) as int64."""
    f = pc.cast(col, pa.float64())
    # half_towards_infinity == SQL ROUND (half away from zero); Arrow's
    # default half_to_even would drift on exact .5 products
    return pc.cast(pc.round(pc.multiply(f, float(10 ** scale)),
                            round_mode="half_towards_infinity"), pa.int64())


def rollup_counts(ds, a: str, b: str, measure: str, scale: int = 2):
    """GROUP BY ROLLUP(a, b): counts + exact-cents sums at (a,b), (a)
    and grand-total levels, NULL-filled like SQL. One shuffle: per-batch
    partial (a,b) aggregates bound it to O(groups × blocks); the two
    coarser levels re-aggregate the O(groups) result driver-side (small
    by construction — never the input)."""
    return grouping_sets_counts(ds, a, b, measure, scale,
                                sets=[[a, b], [a], []])


def cube_counts(ds, a: str, b: str, measure: str, scale: int = 2):
    """GROUP BY CUBE(a, b): ROLLUP's levels plus the (b)-only margin —
    same single input shuffle; every coarser level derives from the
    O(groups) fine table."""
    return grouping_sets_counts(ds, a, b, measure, scale,
                                sets=[[a, b], [a], [b], []])


def grouping_sets_counts(ds, a: str, b: str, measure: str, scale: int,
                         sets: list[list[str]]):
    """Shared GROUPING SETS engine for rollup/cube (see rollup_counts
    for the scale shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({a: batch.column(a), b: batch.column(b),
                      "c": _cents(batch.column(measure), scale)})
        g = t.group_by([a, b]).aggregate([("c", "sum"), ("c", "count")])
        return g.rename_columns([a, b, "s", "n"])

    fine = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([a, b]).sum(["s", "n"]))
    ft = _to_table(fine).rename_columns([a, b, "s", "n"])

    def level(keys: list[str]) -> pa.Table:
        if keys:
            g = ft.group_by(keys).aggregate([("s", "sum"), ("n", "sum")])
            g = g.rename_columns(keys + ["s", "n"])
        else:
            g = pa.table({"s": [pc.sum(ft.column("s")).as_py() or 0],
                          "n": [pc.sum(ft.column("n")).as_py() or 0]})
        cols = {}
        for k in (a, b):
            cols[k] = (g.column(k) if k in keys
                       else pa.nulls(len(g), ft.schema.field(k).type))
        cols["n"] = pc.cast(g.column("n"), pa.int64())
        cols["sum_v"] = pc.divide(
            pc.cast(g.column("s"), pa.float64()), float(10 ** scale))
        return pa.table(cols)

    return pa.concat_tables([level(s) for s in sets])


def _to_table(ds) -> pa.Table:
    """Materialize a SMALL (post-aggregate) Dataset to one Arrow table.
    Only ever called on O(groups)-sized results."""
    refs = ds.to_arrow_refs()
    import ray
    tabs = [t for t in ray.get(refs) if t.num_rows]
    if not tabs:
        sch = ds.schema(fetch_if_missing=True)
        if sch is None:
            # Fully-empty pipeline with no recorded schema (e.g. every
            # upstream block filtered away): fall back to the raw
            # (possibly 0-row) block tables so column names survive.
            empties = ray.get(refs)
            if empties:
                return empties[0]
            return pa.table({})
        return (getattr(sch, "base_schema", None) or sch).empty_table()
    return pa.concat_tables(tabs, promote_options="permissive")


def funnel_counts(events_ds, user_col: str, type_col: str, ts_col: str,
                  steps: list[str]):
    """Ordered-funnel conversion: users whose first `steps[i]` event is
    strictly after their first `steps[i-1]` event, per step. Per-batch
    partial min-ts per (user, step) bounds the shuffle to
    O(users × steps × blocks); the per-user comparison then runs on the
    O(users × steps) table; the final count is a sum aggregate."""
    step_arr = pa.array(steps, pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.is_in(batch.column(type_col), value_set=step_arr))
        g = m.group_by([user_col, type_col]).aggregate([(ts_col, "min")])
        return g.rename_columns([user_col, type_col, "t"])

    mins = (events_ds.map_batches(partial, batch_format="pyarrow")
            .groupby([user_col, type_col]).min("t"))

    def reach(group: pa.Table) -> pa.Table:
        idx = pc.index_in(group.column(type_col), value_set=step_arr)
        t = np.asarray(pc.cast(group.column("min(t)"), pa.int64()),
                       dtype=np.int64)
        got = np.full(len(steps), -1, np.int64)
        got[np.asarray(idx, dtype=np.int64)] = t
        flags = np.zeros(len(steps), np.int64)
        prev = None
        for i in range(len(steps)):  # bounded by len(steps), not rows
            ok = got[i] >= 0 and (prev is None or got[i] > prev)
            if not ok:
                break
            flags[i] = 1
            prev = got[i]
        return pa.table({f"r{i}": pa.array([int(flags[i])], pa.int64())
                         for i in range(len(steps))})

    per_user = mins.groupby(user_col).map_groups(reach, batch_format="pyarrow")
    rcols = [f"r{i}" for i in range(len(steps))]

    def block_sum(batch: pa.Table) -> pa.Table:
        return pa.table({c: pa.array([pc.sum(batch.column(c)).as_py() or 0],
                                     pa.int64()) for c in rcols})

    tot = _to_table(per_user.map_batches(block_sum, batch_format="pyarrow"))
    out = {"step_idx": pa.array(range(len(steps)), pa.int64()),
           "step": step_arr,
           "n_users": pa.array(
               [pc.sum(tot.column(c)).as_py() or 0 for c in rcols],
               pa.int64())}
    return pa.table(out)


def retention_cohorts(events_ds, user_col: str, ts_col: str):
    """Cohort retention: users grouped by first-activity day; for each
    (cohort_day, day_offset) the count of users active that day. Two
    shuffles, both pre-reduced per batch: distinct (user, day) pairs,
    then (cohort, offset) counts — O(users × active-days) moves, never
    O(events)."""

    def days(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch.column(ts_col), unit="day")
        t = pa.table({user_col: batch.column(user_col), "day": d})
        g = t.group_by([user_col, "day"]).aggregate([])
        return g

    pairs = (events_ds.map_batches(days, batch_format="pyarrow")
             .groupby([user_col, "day"]).count())

    def offsets(group: pa.Table) -> pa.Table:
        # Ray's Aggregate narrows second-aligned timestamp keys to
        # timestamp[s]; re-widen BEFORE the int64 cast or the epoch
        # values land in the wrong unit.
        d = np.asarray(pc.cast(pc.cast(group.column("day"),
                                       pa.timestamp("us")), pa.int64()),
                       dtype=np.int64)
        cohort = d.min()
        us_day = 86_400_000_000
        return pa.table({
            "cohort_day": pa.array(np.full(len(d), cohort),
                                   pa.timestamp("us")),
            "day_offset": pa.array((d - cohort) // us_day, pa.int64()),
        })

    counted = (pairs.groupby(user_col)
               .map_groups(offsets, batch_format="pyarrow")
               .groupby(["cohort_day", "day_offset"]).count())

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["cohort_day", "day_offset", "n_users"])

    return counted.map_batches(rn, batch_format="pyarrow")


def resample_counts(events_ds, ts_col: str, value_col: str,
                    hours: int = 6, scale: int = 6):
    """Time-bucket resample with gap fill: per fixed bucket the event
    count and exact-fixed-point value sum; buckets with no events emit
    (0, NULL) rows so downstream sees a dense series. The aggregate is
    pre-reduced per batch (shuffle O(buckets × blocks)); the gap fill
    runs on the O(buckets) result driver-side."""

    def partial(batch: pa.Table) -> pa.Table:
        b = pc.floor_temporal(batch.column(ts_col), multiple=hours,
                              unit="hour")
        t = pa.table({"bucket": b,
                      "v": _cents(batch.column(value_col), scale)})
        g = t.group_by(["bucket"]).aggregate([("v", "sum"), ("v", "count")])
        return g.rename_columns(["bucket", "s", "n"])

    agg = _to_table(events_ds.map_batches(partial, batch_format="pyarrow")
                    .groupby("bucket").sum(["s", "n"]))
    agg = agg.rename_columns(["bucket", "s", "n"])
    # re-widen: Ray's Aggregate narrows aligned timestamps to [s]
    bk = np.asarray(pc.cast(pc.cast(agg.column("bucket"),
                                    pa.timestamp("us")), pa.int64()),
                    dtype=np.int64)
    step = hours * 3_600_000_000
    full = np.arange(bk.min(), bk.max() + step, step, dtype=np.int64)
    pos = {int(v): i for i, v in enumerate(bk)}
    idx = np.array([pos.get(int(v), -1) for v in full], np.int64)
    s = np.asarray(pc.cast(agg.column("s"), pa.float64()))
    n = np.asarray(pc.cast(agg.column("n"), pa.int64()), dtype=np.int64)
    have = idx >= 0
    sum_v = np.where(have, s[np.maximum(idx, 0)] / float(10 ** scale), np.nan)
    return pa.table({
        "bucket": pa.array(full, pa.timestamp("us")),
        "n_events": pa.array(np.where(have, n[np.maximum(idx, 0)], 0),
                             pa.int64()),
        "sum_value": pa.array(sum_v, pa.float64(), mask=~have),
    })


def unpivot(ds, row_col: str, value_cols: list[str], name_col: str,
            value_name: str, strip_prefix: str = ""):
    """Wide→long melt: one output row per (row, wide column). Pure
    streaming map_batches — each batch explodes independently, no
    shuffle. The inverse of pivot_counts."""
    names = [c[len(strip_prefix):] if c.startswith(strip_prefix) else c
             for c in value_cols]

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parts = []
        for c, nm in zip(value_cols, names):
            parts.append(pa.table({
                row_col: batch.column(row_col),
                name_col: pa.array([nm] * n, pa.string()),
                value_name: batch.column(c),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def session_ids(events_ds, user_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", gap_minutes: int = 30):
    """Per-EVENT session assignment (the row-level refinement of
    relational.sessionize's per-user counts): within each user, events
    ordered by (ts, id) get an incrementing session number that bumps
    whenever the inactivity gap exceeds ``gap_minutes``. One
    groupby(user).map_groups — a user's events sort and cumsum
    vectorized on one worker (partitioning assumption: one user's
    history fits a worker; at 100 TB that holds because sessions are
    bounded per human, and a pathological bot user degrades one group,
    not the stage)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def assign(group: pa.Table) -> pa.Table:
        g = group.sort_by([(ts_col, "ascending"), (id_col, "ascending")])
        ts = np.asarray(pc.cast(g.column(ts_col), pa.int64()))
        new = np.r_[True, np.diff(ts) > gap_us] if len(ts) else np.zeros(0, bool)
        return pa.table({
            id_col: g.column(id_col),
            user_col: g.column(user_col),
            "session_id": pa.array(np.cumsum(new).astype(np.int64)),
        })

    return events_ds.groupby(user_col).map_groups(
        assign, batch_format="pyarrow")


def event_transitions(events_ds, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id"):
    """Markov transition counts: how often event type A is immediately
    followed by type B within a user's (ts, id)-ordered stream. The
    per-user bigram counting happens INSIDE map_groups (each group
    emits its own partial (from, to, n) rows — O(types²) per user, not
    O(events)), so the final aggregate shuffles a table bounded by
    users × distinct transitions, and the global one is O(types²)."""

    def bigrams(group: pa.Table) -> pa.Table:
        g = group.sort_by([(ts_col, "ascending"), (id_col, "ascending")])
        t = np.asarray(pc.cast(g.column(type_col), pa.string()))
        if len(t) < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pairs = pa.table({"from_type": pa.array(t[:-1]),
                          "to_type": pa.array(t[1:])})
        cnt = pairs.group_by(["from_type", "to_type"]).aggregate(
            [([], "count_all")])
        return cnt.rename_columns(["from_type", "to_type", "n"])

    return (events_ds.groupby(user_col)
            .map_groups(bigrams, batch_format="pyarrow")
            .groupby(["from_type", "to_type"]).sum("n")
            .map_batches(lambda t: t.rename_columns(
                ["from_type", "to_type", "n"]), batch_format="pyarrow")
            .sort(["from_type", "to_type"]))


def value_histogram(ds, value_col: str, nbins: int = 20):
    """Equi-width histogram: two passes, both streaming. Pass 1 is a
    per-block (min, max) partial reduced driver-side to two floats;
    pass 2 bins each batch with one vectorized floor-divide and emits
    per-block partial bin counts, so the shuffle moves
    O(nbins × blocks). The bin arithmetic — width = (max−min)/nbins,
    bin = min(floor((v−min)/width), nbins−1) — is written in the same
    IEEE operation order as the SQL oracle, so edge values land in the
    same bin on both engines."""

    def mm(batch: pa.Table) -> pa.Table:
        r = pc.min_max(batch.column(value_col)).as_py()
        return pa.table({"mn": pa.array([r["min"]], pa.float64()),
                         "mx": pa.array([r["max"]], pa.float64())})

    t = _to_table(ds.map_batches(mm, batch_format="pyarrow"))
    mn = pc.min(t.column("mn")).as_py()
    mx = pc.max(t.column("mx")).as_py()
    width = (mx - mn) / float(nbins)

    def binned(batch: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(batch.column(value_col), pa.float64()))
        b = np.minimum(np.floor((v - mn) / width).astype(np.int64),
                       nbins - 1)
        counts = np.bincount(b, minlength=nbins)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    out = (ds.map_batches(binned, batch_format="pyarrow")
           .groupby("bin").sum("n")
           .map_batches(lambda t: t.rename_columns(["bin", "n"]),
                        batch_format="pyarrow"))

    def edges(batch: pa.Table) -> pa.Table:
        b = np.asarray(pc.cast(batch.column("bin"), pa.int64()))
        lo = pa.array(mn + b * width, pa.float64())
        return pa.table({
            "bin": batch.column("bin"),
            "lo": pc.round(lo, ndigits=6,
                           round_mode="half_towards_infinity"),
            "n": batch.column("n"),
        })

    return out.map_batches(edges, batch_format="pyarrow").sort("bin")


def dist_windows(ds, key_col: str, order_col: str, id_col: str,
                 digits: int = 6):
    """SQL distribution windows per group: PERCENT_RANK (=(rank−1)/
    (n−1), 0 when n=1) and CUME_DIST (= high-rank/n), tie rows sharing
    one value. Vectorized run-length ranking inside groupby().
    map_groups — same partitioning assumption (one key's rows fit a
    worker) as rank_windows, which covers the integer rank family;
    this adds the [0,1]-normalized pair, rounded like the oracle."""

    def win(group: pa.Table) -> pa.Table:
        g = group.sort_by([(order_col, "ascending"),
                           (id_col, "ascending")])
        v = np.asarray(pc.cast(g.column(order_col), pa.float64()))
        n = len(v)
        starts = _run_starts(v)
        sizes = np.diff(np.r_[starts, n])
        rank = np.repeat(starts, sizes)            # 0-based SQL RANK - 1
        high = np.repeat(starts + sizes, sizes)    # rows <= this value
        pr = rank / (n - 1) if n > 1 else np.zeros(n)
        cd = high / n
        rnd = lambda a: pc.round(pa.array(a, pa.float64()), ndigits=digits,
                                 round_mode="half_towards_infinity")
        return pa.table({
            id_col: g.column(id_col),
            key_col: g.column(key_col),
            "pr": rnd(pr),
            "cd": rnd(cd),
        })

    return ds.groupby(key_col).map_groups(win, batch_format="pyarrow")


def hopping_windows(events_ds, ts_col: str, value_col: str,
                    window_us: int, hop_us: int, scale: int = 2):
    """Overlapping (hopping) time windows — the streaming aggregate
    tumbling resample can't express: window length ``window_us``
    advancing every ``hop_us`` (window_us must be a multiple of
    hop_us). Each event lands in window_us/hop_us windows; the fan-out
    happens inside map_batches as vectorized bucket arithmetic (no
    range join, no shuffle of raw rows) and per-block partial (window,
    count, exact-cents sum) aggregates bound the shuffle to
    O(windows × blocks)."""
    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    fanout = window_us // hop_us

    def explode(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch.column(ts_col), pa.int64()))
        c = np.asarray(_cents(batch.column(value_col), scale))
        base = (ts // hop_us) * hop_us
        parts = []
        for i in range(fanout):
            parts.append(pa.table({
                "window_start": pa.array(base - i * hop_us, pa.int64()),
                "one": pa.array(np.ones(len(ts), np.int64)),
                "c": pa.array(c),
            }))
        t = pa.concat_tables(parts)
        g = t.group_by(["window_start"]).aggregate(
            [("one", "sum"), ("c", "sum")])
        return g.rename_columns(["window_start", "n", "s"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.cast(batch.column("window_start"),
                                    pa.timestamp("us")),
            "n": pc.cast(batch.column("sum(n)"), pa.int64()),
            "sum_value": pc.divide(
                pc.cast(batch.column("sum(s)"), pa.float64()),
                float(10 ** scale)),
        })

    return (events_ds.map_batches(explode, batch_format="pyarrow")
            .groupby("window_start").sum(["n", "s"])
            .map_batches(finalize, batch_format="pyarrow")
            .sort("window_start"))


def calendar_profile(events_ds, ts_col: str = "ts"):
    """Event counts by (day-of-week, hour) — the load-calendar heatmap.
    dow/hour derive ARITHMETICALLY from the epoch (Sunday=0 via the
    +4-day Thursday offset) so both engines share one integer formula
    instead of two libraries' calendar conventions; per-batch partial
    counts bound the shuffle to O(168 × blocks)."""
    DAY_US, HOUR_US = 86_400_000_000, 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch.column(ts_col), pa.int64()))
        t = pa.table({
            "dow": pa.array((ts // DAY_US + 4) % 7, pa.int64()),
            "hour": pa.array((ts // HOUR_US) % 24, pa.int64()),
            "one": pa.array(np.ones(len(ts), np.int64)),
        })
        g = t.group_by(["dow", "hour"]).aggregate([("one", "sum")])
        return g.rename_columns(["dow", "hour", "n"])

    return (events_ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["dow", "hour"]).sum("n")
            .map_batches(lambda t: t.rename_columns(["dow", "hour", "n"]),
                         batch_format="pyarrow")
            .sort(["dow", "hour"]))


def user_growth(events_ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Cumulative-distinct growth accounting: per day, how many users
    appear for the FIRST time and how many have been seen so far. The
    cumulative-distinct window (naively a per-day distinct over an
    ever-growing prefix) reduces to one groupby: each user's first-day
    (per-block partial mins, then a min aggregate), per-day new-user
    counts, and an O(days) driver-side cumsum. Day is the epoch-floor
    index (shared integer formula with calendar_profile)."""
    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            user_col: batch.column(user_col),
            "d": pa.array(np.asarray(pc.cast(batch.column(ts_col),
                                             pa.int64())) // DAY_US,
                          pa.int64()),
        })
        g = t.group_by([user_col]).aggregate([("d", "min")])
        return g.rename_columns([user_col, "d"])

    firsts = (events_ds.map_batches(partial, batch_format="pyarrow")
              .groupby(user_col).min("d"))

    def day_counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"day": batch.column("min(d)"),
                      "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["day"]).aggregate([("one", "sum")])
        return g.rename_columns(["day", "new_users"])

    per_day = _to_table(firsts.map_batches(day_counts,
                                           batch_format="pyarrow")
                        .groupby("day").sum("new_users"))
    per_day = per_day.rename_columns(["day", "new_users"]).sort_by(
        [("day", "ascending")])
    new = np.asarray(per_day.column("new_users"), dtype=np.int64)
    return pa.table({
        "day": pc.cast(per_day.column("day"), pa.int64()),
        "new_users": pa.array(new, pa.int64()),
        "cum_users": pa.array(np.cumsum(new), pa.int64()),
    })


def type_cooccurrence(events_ds, user_col: str = "user_id",
                      type_col: str = "event_type"):
    """How often two event types co-occur within one user's history —
    the unordered companion of event_transitions. Distinct
    (user, type) pairs (block-side deduped), one self-join on user
    (fanout ≤ types² per user, never events²), ordered pair filter,
    one count aggregate."""
    from ..common import drop_empty_blocks

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({user_col: batch.column(user_col),
                      type_col: pc.cast(batch.column(type_col),
                                        pa.string())})
        return t.group_by([user_col, type_col]).aggregate([])

    dedup = (events_ds.map_batches(pairs, batch_format="pyarrow")
             .groupby([user_col, type_col]).count()
             .drop_columns(["count()"])
             .materialize())

    a = dedup.map_batches(lambda t: t.rename_columns([user_col, "type_a"]),
                          batch_format="pyarrow")
    b = dedup.map_batches(lambda t: t.rename_columns([user_col, "type_b"]),
                          batch_format="pyarrow")
    joined = drop_empty_blocks(a).join(drop_empty_blocks(b), "inner", 8,
                                       on=(user_col,))

    def ordered(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("type_a"),
                                    batch.column("type_b")))

    return (joined.map_batches(ordered, batch_format="pyarrow")
            .groupby(["type_a", "type_b"]).count()
            .map_batches(lambda t: t.rename_columns(
                ["type_a", "type_b", "n_users"]), batch_format="pyarrow")
            .sort(["type_a", "type_b"]))


def late_events(events_ds, user_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id",
                lateness_us: int = 1_800_000_000):
    """Event-time watermark / late-data flagging — the streaming
    semantics a batch engine expresses per key: within each user's
    ARRIVAL order (the id column), the watermark is the running max
    event time seen so far minus the allowed lateness; an event whose
    own timestamp has already been passed by the watermark is late
    (its window was closed when it arrived). One vectorized
    maximum.accumulate per group — the per-key decomposition is what
    makes watermarks shardable at 100 TB; a global watermark would be
    a single sequential scan."""

    def flag(group: pa.Table) -> pa.Table:
        g = group.sort_by([(id_col, "ascending")])
        ts = np.asarray(pc.cast(g.column(ts_col), pa.int64()))
        if len(ts) == 0:
            prev_max = ts
        else:
            run = np.maximum.accumulate(ts)
            prev_max = np.r_[np.int64(-(1 << 62)), run[:-1]]  # exclusive
        late = (prev_max - lateness_us) > ts
        return pa.table({
            id_col: g.column(id_col),
            user_col: g.column(user_col),
            "is_late": pa.array(late.astype(np.int64), pa.int64()),
        })

    return events_ds.groupby(user_col).map_groups(
        flag, batch_format="pyarrow")


def json_field_stats(events_ds, json_col: str = "props",
                     group_col: str = "event_type", field: str = "k",
                     digits: int = 6):
    """Aggregate an integer field out of a JSON-string column without a
    JSON parser in the hot path: one vectorized RE2 extract per batch
    (Arrow has no JSON kernel; a json.loads per row would be the Python
    loop this engine bans), exact int64 partial sums per group, float
    mean once on the O(groups) table."""
    import re as _re

    pat = r'"' + _re.escape(field) + r'":\s*(?P<v>-?\d+)'

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(pc.cast(batch.column(json_col),
                                       pa.string()), pattern=pat)
        v = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        t = pa.table({
            group_col: batch.column(group_col),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "v": pc.fill_null(v, 0),
            "miss": pc.cast(pc.is_null(v), pa.int64()),
        })
        g = t.group_by([group_col]).aggregate(
            [("one", "sum"), ("v", "sum"), ("miss", "sum")])
        return g.rename_columns([group_col, "n", "sum_v", "n_missing"])

    agg = _to_table(
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col).sum(["n", "sum_v", "n_missing"])
    ).rename_columns([group_col, "n", "sum_v", "n_missing"])
    n = np.asarray(agg.column("n"), dtype=np.int64)
    s = np.asarray(agg.column("sum_v"), dtype=np.int64)
    return pa.table({
        group_col: agg.column(group_col),
        "n": pa.array(n, pa.int64()),
        "sum_v": pa.array(s, pa.int64()),
        "n_missing": pc.cast(agg.column("n_missing"), pa.int64()),
        "mean_v": pc.round(pa.array(s.astype(np.float64) / n, pa.float64()),
                           ndigits=digits,
                           round_mode="half_towards_infinity"),
    }).sort_by([(group_col, "ascending")])


def user_entropy(events_ds, user_col: str = "user_id",
                 type_col: str = "event_type", digits: int = 6):
    """Behavioral diversity per user: Shannon entropy of the user's
    event-type distribution — near-zero entropy marks single-action
    bots. Exact integer (user, type) partial counts bound the shuffle
    to O(users × types × blocks); the -Σ p·log2(p) float math runs once
    per user on the aggregated table, terms summed in type order
    (deterministic) and rounded like the oracle."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({user_col: batch.column(user_col),
                      type_col: pc.cast(batch.column(type_col),
                                        pa.string())})
        g = t.group_by([user_col, type_col]).aggregate([([], "count_all")])
        return g.rename_columns([user_col, type_col, "n"])

    counts = _to_table(
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby([user_col, type_col]).sum("n")
    ).rename_columns([user_col, type_col, "n"])
    counts = counts.sort_by([(user_col, "ascending"),
                             (type_col, "ascending")])
    u = np.asarray(pc.cast(counts.column(user_col), pa.int64()),
                   dtype=np.int64)
    n = np.asarray(counts.column("n"), dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    sizes = np.diff(np.r_[starts, len(u)])
    tot = np.repeat(np.add.reduceat(n, starts), sizes).astype(np.float64)
    p = n / tot
    terms = p * np.log2(p)
    # + 0.0 folds IEEE -0.0 (single-type users: -(0.0)) to +0.0, the
    # same normalization the oracle applies
    ent = -np.add.reduceat(terms, starts) + 0.0
    return pa.table({
        user_col: pa.array(u[starts], pa.int64()),
        "n_events": pa.array(np.add.reduceat(n, starts), pa.int64()),
        "entropy": pc.round(pa.array(ent, pa.float64()), ndigits=digits,
                            round_mode="half_towards_infinity"),
    })


def conversion_time(events_ds, user_col: str = "user_id",
                    type_col: str = "event_type", ts_col: str = "ts",
                    from_type: str = "view", to_type: str = "purchase",
                    digits: int = 4):
    """Funnel latency: for users whose first ``to_type`` follows their
    first ``from_type``, the distribution of the conversion delay —
    n converters plus exact percentile_disc p50/p95 in SECONDS. The
    per-user (first_from, first_to) pair table is O(users) (funnel
    partial-min discipline); the delta percentiles run once on it."""
    step_arr = pa.array([from_type, to_type], pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.is_in(batch.column(type_col),
                                  value_set=step_arr))
        g = m.group_by([user_col, type_col]).aggregate([(ts_col, "min")])
        return g.rename_columns([user_col, type_col, "t"])

    mins = _to_table(
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby([user_col, type_col]).min("t")
    ).rename_columns([user_col, type_col, "t"])
    u = np.asarray(pc.cast(mins.column(user_col), pa.int64()),
                   dtype=np.int64)
    ty = np.asarray(mins.column(type_col).to_pylist(), dtype=object)
    # normalize precision FIRST: Ray's min aggregate may hand back a
    # coarser timestamp unit than the input (observed: 's' for
    # second-aligned values), and a bare int64 cast would then be in
    # the wrong unit
    tcol = mins.column("t")
    if pa.types.is_timestamp(tcol.type):
        tcol = pc.cast(tcol, pa.timestamp("us"))
    t = np.asarray(pc.cast(tcol, pa.int64()), dtype=np.int64)
    from_t = {int(a): int(b) for a, b, c in zip(u, t, ty) if c == from_type}
    deltas = sorted(
        (int(b) - from_t[int(a)]) / 1_000_000.0
        for a, b, c in zip(u, t, ty)
        if c == to_type and int(a) in from_t and int(b) > from_t[int(a)]
    )
    nn = len(deltas)

    def disc(q: float) -> float:
        return deltas[max(int(np.ceil(q * nn)) - 1, 0)] if nn else None

    rnd = lambda v: None if v is None else float(
        pc.round(pa.scalar(v, pa.float64()), ndigits=digits,
                 round_mode="half_towards_infinity").as_py())
    return pa.table({
        "n_converted": pa.array([nn], pa.int64()),
        "p50_s": pa.array([rnd(disc(0.5))], pa.float64()),
        "p95_s": pa.array([rnd(disc(0.95))], pa.float64()),
    })


def type_sequences(events_ds, user_col: str = "user_id",
                   type_col: str = "event_type", ts_col: str = "ts",
                   id_col: str = "event_id"):
    """Ordered per-user event-type sequence (the SQL ``string_agg(...
    ORDER BY ts, id)`` shape) — the session-trajectory view behind
    clickstream mining. The concat is one pyarrow ``binary_join``
    after an in-group vectorized sort; each user contributes ONE
    output row, so the shuffle result is O(users) rows regardless of
    event volume. At 100 TB the per-group payload is bounded by the
    busiest user's stream — cap upstream if a key can be adversarial."""

    def concat(group: pa.Table) -> pa.Table:
        g = group.sort_by([(ts_col, "ascending"), (id_col, "ascending")])
        t = pc.cast(g.column(type_col), pa.string()).combine_chunks()
        seq = pc.binary_join(
            pa.ListArray.from_arrays([0, len(t)], t), ",")
        return pa.table({
            user_col: group.column(user_col).slice(0, 1),
            "type_seq": seq,
            "n": pa.array([group.num_rows], pa.int64()),
        })

    return (events_ds.groupby(user_col)
            .map_groups(concat, batch_format="pyarrow")
            .sort(user_col))


def daily_compare(events_ds, type_a: str, type_b: str,
                  ts_col: str = "ts", type_col: str = "event_type"):
    """Per-day counts of two event types side by side — the FULL OUTER
    JOIN of two grouped subqueries, rewritten join-free: one streaming
    pass emits per-block partial (day, a, b) counts and a single
    O(days × blocks) groupby-sum aligns them, days missing on either
    side coalescing to 0 naturally. The all-to-all moves bounded
    partials, never event rows — the scale-safe shape for any
    "compare two slices over time" report."""

    def partial(batch: pa.Table) -> pa.Table:
        tcol = batch.column(type_col)
        m = pc.or_(pc.equal(tcol, type_a), pc.equal(tcol, type_b))
        f = batch.filter(m)
        day = pc.strftime(f.column(ts_col), format="%Y-%m-%d")
        isa = pc.cast(pc.equal(f.column(type_col), type_a), pa.int64())
        t = pa.table({"day": day, "a": isa,
                      "b": pc.subtract(pa.scalar(1, pa.int64()), isa)})
        g = t.group_by(["day"]).aggregate([("a", "sum"), ("b", "sum")])
        return g.rename_columns(["day", "a", "b"])

    out = (events_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("day").aggregate(*_sum_aliases([("a", "a"), ("b", "b")])))
    return out.map_batches(
        lambda t: t.rename_columns(["day", type_a + "s", type_b + "s"]),
        batch_format="pyarrow").sort("day")


def _sum_aliases(pairs):
    from ray.data.aggregate import Sum

    return [Sum(src, alias_name=alias) for src, alias in pairs]


def event_gaps(events_ds, user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type", id_col: str = "event_id"):
    """Inter-event gap distribution per event type: for every event
    with a predecessor in its user's (ts, id)-ordered stream, the gap
    in whole microseconds (exact int64 — no float time math), then
    exact disc percentiles per type of the LATER event. Gap extraction
    is a vectorized diff inside map_groups (O(user stream) rows in, 
    O(stream-1) narrow rows out); the quantile stage shuffles only
    (type, gap) pairs."""
    from ..pipelines.relational import group_quantiles

    def gaps(group: pa.Table) -> pa.Table:
        g = group.sort_by([(ts_col, "ascending"), (id_col, "ascending")])
        t = np.asarray(pc.cast(pc.cast(g.column(ts_col), pa.timestamp("us")),
                               pa.int64()), dtype=np.int64)
        if len(t) < 2:
            return pa.table({type_col: pa.array([], pa.string()),
                             "gap_us": pa.array([], pa.int64())})
        ty = pc.cast(g.column(type_col), pa.string()).combine_chunks()
        return pa.table({type_col: ty.slice(1),
                         "gap_us": pa.array(np.diff(t), pa.int64())})

    pairs = events_ds.groupby(user_col).map_groups(
        gaps, batch_format="pyarrow")
    return group_quantiles(pairs, type_col, "gap_us",
                           [0.5, 0.9, 0.99]).sort(type_col)


def lag1_autocorr(events_ds, type_col: str = "event_type",
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value", digits: int = 6):
    """Lag-1 autocorrelation of the value stream per (type, day): for
    each (event_type, UTC day) the Pearson correlation between
    consecutive values in (ts, id) order — the standard signal for
    "is this metric a random walk or mean-reverting today".

    Day-bounded grouping is the scale contract: a (type, day) group is
    O(one day's traffic for one type), so the whole group fits one
    ``map_groups`` task at any corpus size (a per-type-only grouping
    would concentrate the full history of a hot type in one task).
    Values are quantized to exact int64 cents (ROUND(value·100), half
    away from zero — mirrored in the oracle SQL) so the moment sums
    (n, Σx, Σy, Σx², Σy², Σxy) are integer-exact and order-free; the
    correlation float math runs once per group, single-threaded, in
    oracle operation order. Groups with <2 events or zero variance on
    either side are dropped (matching the oracle's variance guard).
    Moment magnitudes: cents ≤ ~5e6 ⇒ x² ≤ 2.5e13; n·Σx² stays inside
    int64 for day-groups up to ~10⁸ rows — beyond that, shard days
    into hour buckets upstream."""

    def with_day(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        q = pc.cast(pc.round(pc.multiply(
            pc.cast(batch.column(value_col), pa.float64()),
            pa.scalar(100.0)), round_mode="half_towards_infinity"),
            pa.int64())
        return pa.table({
            type_col: batch.column(type_col),
            "day": pc.divide(us, pa.scalar(86_400_000_000, pa.int64())),
            ts_col: batch.column(ts_col),
            id_col: batch.column(id_col),
            "q": q,
        })

    def per_group(group: pa.Table) -> pa.Table:
        empty = pa.table({type_col: pa.array([], pa.string()),
                          "day": pa.array([], pa.int64()),
                          "n_pairs": pa.array([], pa.int64()),
                          "autocorr": pa.array([], pa.float64())})
        if group.num_rows < 2:
            return empty
        g = group.sort_by([(ts_col, "ascending"), (id_col, "ascending")])
        q = np.asarray(pc.cast(g.column("q"), pa.int64()), dtype=np.int64)
        x, y = q[:-1], q[1:]
        n = int(len(x))
        sx, sy = int(x.sum()), int(y.sum())
        # Python-int moment products: immune to the one-hot-day int64
        # edge the docstring bounds describe
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x * y).sum())
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            return empty
        r = float(num) / math.sqrt(float(vx) * float(vy))
        return pa.table({
            type_col: pa.array([g.column(type_col)[0].as_py()], pa.string()),
            "day": pa.array([g.column("day")[0].as_py()], pa.int64()),
            "n_pairs": pa.array([n], pa.int64()),
            "autocorr": pa.array([r], pa.float64()),
        })

    out = (events_ds.map_batches(with_day, batch_format="pyarrow")
           .groupby([type_col, "day"])
           .map_groups(per_group, batch_format="pyarrow"))

    def final(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("autocorr"), "autocorr",
            pc.round(t.column("autocorr"), ndigits=digits,
                     round_mode="half_towards_infinity"))

    return _to_table(out.map_batches(final, batch_format="pyarrow")).sort_by(
        [(type_col, "ascending"), ("day", "ascending")])


def last_touch(events_ds, target_type: str = "purchase",
               user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type", id_col: str = "event_id"):
    """Last-touch attribution: for every ``target_type`` event with a
    predecessor in its user's (ts, id)-ordered stream, credit the
    immediately preceding event's type; return (prev_type, n) counts.
    The LAG runs as a vectorized shift inside per-user ``map_groups``
    (O(user stream) in, O(targets) narrow rows out, pre-counted per
    group before the O(types) final groupby)."""

    def credit(group: pa.Table) -> pa.Table:
        empty = pa.table({"prev_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        g = group.sort_by([(ts_col, "ascending"), (id_col, "ascending")])
        ty = pc.cast(g.column(type_col), pa.string()).combine_chunks()
        cur = ty.slice(1)
        hit = pc.equal(cur, target_type)
        prev = ty.slice(0, len(ty) - 1).filter(hit)
        if len(prev) == 0:
            return empty
        t = pa.table({"prev_type": prev})
        return (t.group_by(["prev_type"]).aggregate([([], "count_all")])
                .rename_columns(["prev_type", "n"]))

    out = (events_ds.groupby(user_col)
           .map_groups(credit, batch_format="pyarrow")
           .groupby("prev_type").sum("n"))
    return out.map_batches(
        lambda t: t.rename_columns(["prev_type", "n"]),
        batch_format="pyarrow").sort("prev_type")


def weekly_active(events_ds, user_col: str = "user_id",
                  ts_col: str = "ts", window_days: int = 7):
    """Trailing-window distinct-user count per day (the WAU metric):
    for each day present in the data, how many distinct users acted in
    the ``window_days`` ending that day. Sliding DISTINCT cannot sum
    daily distincts, so: dedup (day, user) pairs per block, fan each
    pair out to the ≤7 window-end days it supports (vectorized
    np.repeat), dedup (window, user) with one hash aggregate, count
    per window, and semi-filter windows to days that actually exist
    (broadcast day set — O(days), tiny). Shuffle volume is
    O(active-days × users × window) narrow int rows, never events."""
    from ray.data.aggregate import Count

    def day_pairs(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                    pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()))
        t = pa.table({"day": day,
                      "user": pc.cast(batch.column(user_col), pa.int64())})
        return t.group_by(["day", "user"]).aggregate([])

    pairs = events_ds.map_batches(day_pairs, batch_format="pyarrow")
    pairs = pairs.groupby(["day", "user"]).count().map_batches(
        lambda t: t.select(["day", "user"]), batch_format="pyarrow")

    days_tbl = _to_table(pairs.groupby("day").count())
    days = np.sort(np.asarray(pc.cast(days_tbl.column("day"), pa.int64()),
                              dtype=np.int64))

    def fan_out(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("day"), dtype=np.int64)
        u = np.asarray(batch.column("user"), dtype=np.int64)
        reps = np.full(len(d), window_days, np.int64)
        w = np.repeat(d, reps) + np.tile(np.arange(window_days,
                                                   dtype=np.int64), len(d))
        uu = np.repeat(u, reps)
        keep = np.isin(w, days)  # vectorized existing-day filter
        return pa.table({"day": pa.array(w[keep]),
                         "user": pa.array(uu[keep])})

    wau = (pairs.map_batches(fan_out, batch_format="pyarrow")
           .groupby(["day", "user"]).count()
           .map_batches(lambda t: t.select(["day"]),
                        batch_format="pyarrow")
           .groupby("day").aggregate(Count(alias_name="wau")))
    return wau.map_batches(
        lambda t: t.rename_columns(["day", "wau"]),
        batch_format="pyarrow").sort("day")


def bounce_rate(events_ds, user_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", gap_minutes: int = 30,
                digits: int = 6):
    """Single-event-session share per day: sessions (the 30-minute-gap
    split shared with ``session_ids``) grouped by the day their FIRST
    event lands on; a bounce is a session with exactly one event. Per
    user the gap split is one vectorized pass in map_groups emitting
    O(sessions) rows; the day rollup shuffles session stubs only."""

    gap_us = gap_minutes * 60_000_000

    def sessions(group: pa.Table) -> pa.Table:
        g = group.sort_by([(ts_col, "ascending"), (id_col, "ascending")])
        t = np.asarray(pc.cast(pc.cast(g.column(ts_col), pa.timestamp("us")),
                               pa.int64()), dtype=np.int64)
        new = np.ones(len(t), dtype=bool)
        if len(t) > 1:
            new[1:] = np.diff(t) > gap_us
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(t)])
        day = t[starts] // 86_400_000_000
        return pa.table({
            "day": pa.array(day, pa.int64()),
            "n_sessions": pa.array(np.ones(len(starts), np.int64)),
            "n_bounces": pa.array((sizes == 1).astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    per_day = (events_ds.groupby(user_col)
               .map_groups(sessions, batch_format="pyarrow")
               .groupby("day")
               .aggregate(Sum("n_sessions", alias_name="n_sessions"),
                          Sum("n_bounces", alias_name="n_bounces")))

    def finalize(batch: pa.Table) -> pa.Table:
        rate = pc.round(
            pc.divide(pc.cast(batch.column("n_bounces"), pa.float64()),
                      pc.cast(batch.column("n_sessions"), pa.float64())),
            ndigits=digits, round_mode="half_towards_infinity")
        return pa.table({"day": batch.column("day"),
                         "n_sessions": batch.column("n_sessions"),
                         "n_bounces": batch.column("n_bounces"),
                         "bounce_rate": rate})

    return per_day.map_batches(finalize, batch_format="pyarrow").sort("day")
