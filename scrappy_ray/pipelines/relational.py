"""Relational building blocks used by the query surface: broadcast
joins (ray.put once), pre-aggregated groupbys, top-k, sessionize.

These are the generic engine ops the crawl pipeline composes
(SURVEY.md §2.7-2.8); each has a DuckDB-SQL oracle in
__ray_entry__.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


# per-worker-process cache of fetched broadcast tables, keyed by object
# ref: ray.get is zero-copy for Arrow but the handle lookup + combine is
# still per-call work — memo once per process, not once per batch
_SMALL_SIDE_CACHE: dict = {}
_SMALL_SIDE_CACHE_CAP = 32


def _small_side(ref, on: str) -> tuple[pa.Table, pa.Array]:
    key = ref.hex()
    hit = _SMALL_SIDE_CACHE.get(key)
    if hit is None:
        while len(_SMALL_SIDE_CACHE) >= _SMALL_SIDE_CACHE_CAP:
            _SMALL_SIDE_CACHE.pop(next(iter(_SMALL_SIDE_CACHE)))
        small = ray.get(ref).combine_chunks()
        hit = (small, small.column(on).combine_chunks())
        _SMALL_SIDE_CACHE[key] = hit
    return hit


def broadcast_join(big_ds, small_table: pa.Table, on: str, select: list[str] | None = None,
                   suffix: str = ""):
    """Hash-join a big Dataset against a SMALL Arrow table: the small
    side is ray.put ONCE, fetched+prepared once per worker PROCESS
    (``_small_side`` cache — not per batch), and the probe is a
    vectorized Arrow ``index_in`` (no Python dict, no row loop)."""
    ref = ray.put(small_table)
    small_cols = select or [c for c in small_table.column_names if c != on]

    def join(batch: pa.Table) -> pa.Table:
        small, keys = _small_side(ref, on)
        pos = pc.index_in(batch.column(on), value_set=keys)
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        mask = pos.is_valid()
        batch = batch.filter(mask)
        take = pos.filter(mask)
        for c in small_cols:
            batch = batch.append_column(c + suffix, small.column(c).take(take))
        return batch

    return big_ds.map_batches(join, batch_format="pyarrow")


def top_k(ds, key: str, k: int, descending: bool = True, tiebreak: str | None = None):
    """Distributed top-k: per-block partial top-k then global sort+limit
    (avoids a full global sort of the dataset body)."""
    keys = [(key, "descending" if descending else "ascending")]
    if tiebreak:
        keys.append((tiebreak, "ascending"))

    def partial(batch: pa.Table) -> pa.Table:
        return batch.sort_by(keys).slice(0, k)

    sort_cols = [key] + ([tiebreak] if tiebreak else [])
    desc = [descending] + ([False] if tiebreak else [])
    return ds.map_batches(partial, batch_format="pyarrow").sort(sort_cols, descending=desc).limit(k)


def sessionize(events_ds, user_col="user_id", ts_col="ts", gap_minutes: int = 30):
    """Windowed/streaming-style op: per-user session counts with an
    inactivity gap — groupby(user).map_groups with a vectorized diff
    (the Dataset-API expression of a stateful stream window)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def sess(group: pa.Table) -> pa.Table:
        g = group.sort_by([(ts_col, "ascending")])
        ts = np.asarray(pc.cast(g.column(ts_col), pa.int64()))
        n_sessions = 1 + int((np.diff(ts) > gap_us).sum()) if len(ts) else 0
        return pa.table(
            {
                user_col: pa.array([g.column(user_col)[0].as_py()], g.schema.field(user_col).type),
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "n_events": pa.array([len(ts)], pa.int64()),
            }
        )

    return events_ds.groupby(user_col).map_groups(sess, batch_format="pyarrow")


def round_cols(ds_or_table, cols: list[str], digits: int = 4):
    """Round float columns (both the Ray result and its SQL oracle
    round identically so value-hashes are float-noise-proof)."""

    def r(batch: pa.Table) -> pa.Table:
        for c in cols:
            if c in batch.column_names:
                i = batch.column_names.index(c)
                batch = batch.set_column(
                    i,
                    c,
                    # DuckDB ROUND is half-away-from-zero; Arrow defaults to
                    # half-to-even — ties (e.g. 0.5703125 @ 6 digits) would
                    # hash-mismatch the oracle without the explicit mode.
                    pc.round(
                        pc.cast(batch.column(c), pa.float64()),
                        ndigits=digits,
                        round_mode="half_towards_infinity",
                    ),
                )
        return batch

    if isinstance(ds_or_table, pa.Table):
        return r(ds_or_table)
    return ds_or_table.map_batches(r, batch_format="pyarrow")


def asof_join(left_ds, right_ds, by: str, left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              strict: bool = False):
    """As-of (backward) join — for each left row, the right row of the
    same ``by`` key with the greatest ``right_on`` <= ``left_on``
    (``strict=True``: < instead of <=); unmatched left rows keep nulls.
    Ray Data has no native as-of join, so this composes one from
    primitives (SURVEY §2.7 "custom operators" path a):

      both sides -> one aligned (key, _t, _is_l, payload...) schema
      -> union -> groupby(key).map_groups(sorted-merge)

    The single shuffle is the groupby on ``by``; within a group the
    match is one vectorized ``np.searchsorted`` of left times into the
    sorted right times. PARTITIONING ASSUMPTION: one key's rows
    (both sides) fit in a worker's heap — at 100 TB, salt hot keys or
    pre-aggregate the right side (the oracle query pre-aggregates
    orders per (cust, day), which also makes the match deterministic:
    the right side must be unique on (by, right_on))."""
    import ray.data  # noqa: F401

    lpay, rpay = list(left_cols), list(right_cols)

    # nulls need concrete types on the side that lacks the column:
    # probe each side's schema once
    lschema = left_ds.schema(fetch_if_missing=True)
    rschema = right_ds.schema(fetch_if_missing=True)
    ltypes = {c: lschema.base_schema.field(c).type for c in lpay}
    rtypes = {c: rschema.base_schema.field(c).type for c in rpay}

    def align_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {by: batch.column(by),
                "_t": pc.cast(batch.column(left_on), pa.int64()),
                "_is_l": pa.array(np.ones(n, bool))}
        for c in lpay:
            cols["l_" + c] = batch.column(c)
        for c in rpay:
            cols["r_" + c] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def align_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {by: batch.column(by),
                "_t": pc.cast(batch.column(right_on), pa.int64()),
                "_is_l": pa.array(np.zeros(n, bool))}
        for c in lpay:
            cols["l_" + c] = pa.nulls(n, ltypes[c])
        for c in rpay:
            cols["r_" + c] = batch.column(c)
        return pa.table(cols)

    unioned = left_ds.map_batches(align_left, batch_format="pyarrow").union(
        right_ds.map_batches(align_right, batch_format="pyarrow")
    )

    side = "left" if strict else "right"

    def merge(group: pa.Table) -> pa.Table:
        isl = np.asarray(group.column("_is_l"), dtype=bool)
        t = np.asarray(group.column("_t"), dtype=np.int64)
        lidx = np.flatnonzero(isl)
        if not len(lidx):
            out_cols = {by: group.column(by).slice(0, 0),
                        "_t": group.column("_t").slice(0, 0)}
            for c in lpay:
                out_cols["l_" + c] = group.column("l_" + c).slice(0, 0)
            for c in rpay:
                out_cols["r_" + c] = group.column("r_" + c).slice(0, 0)
            return pa.table(out_cols)
        ridx = np.flatnonzero(~isl)
        if len(ridx):
            rt = t[ridx]
            rorder = np.argsort(rt, kind="stable")
            pos = np.searchsorted(rt[rorder], t[lidx], side=side) - 1
            matched = pos >= 0
            take_np = np.where(matched, ridx[rorder][np.maximum(pos, 0)], -1)
        else:  # key has no right rows: every left row is unmatched
            matched = np.zeros(len(lidx), dtype=bool)
            take_np = np.full(len(lidx), -1, np.int64)
        take_r = pc.if_else(pa.array(matched), pa.array(take_np, pa.int64()),
                            pa.nulls(len(lidx), pa.int64()))
        take_l = pa.array(lidx, pa.int64())
        out_cols = {by: group.column(by).take(take_l),
                    "_t": group.column("_t").take(take_l)}
        for c in lpay:
            out_cols["l_" + c] = group.column("l_" + c).take(take_l)
        for c in rpay:
            out_cols["r_" + c] = group.column("r_" + c).take(take_r)
        return pa.table(out_cols)

    out = unioned.groupby(by).map_groups(merge, batch_format="pyarrow")
    renames = {by: by, "_t": left_on}
    renames.update({"l_" + c: c for c in lpay})
    renames.update({"r_" + c: c + "_r" for c in rpay})

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([renames[c] for c in batch.column_names])

    return out.map_batches(rename, batch_format="pyarrow")


def range_join_broadcast(big_ds, bands: pa.Table, value_col: str,
                         lo_col: str = "lo", hi_col: str = "hi",
                         band_cols: list[str] | None = None):
    """Interval (range) join of a big Dataset against a SMALL table of
    non-overlapping half-open bands [lo, hi) — the ip-to-geo /
    value-to-bucket shape. Ray Data has no non-equi join; with a small
    side this is a broadcast + one vectorized ``np.searchsorted`` per
    batch (never a shuffle). Rows outside every band get nulls.
    Bands must be non-overlapping; they are sorted by ``lo`` here."""
    order = pc.sort_indices(bands.column(lo_col))
    bands = bands.take(order)
    lo = np.asarray(pc.cast(bands.column(lo_col), pa.float64()))
    hi = np.asarray(pc.cast(bands.column(hi_col), pa.float64()))
    cols = band_cols or [c for c in bands.column_names if c not in (lo_col, hi_col)]
    bands_ref = ray.put(bands.select(cols))

    def join(batch: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(batch.column(value_col), pa.float64()))
        pos = np.searchsorted(lo, v, side="right") - 1
        inside = (pos >= 0) & (v < hi[np.maximum(pos, 0)])
        take = pc.if_else(pa.array(inside),
                          pa.array(np.maximum(pos, 0), pa.int64()),
                          pa.nulls(len(v), pa.int64()))
        small, _ = _small_side(bands_ref, cols[0])
        out = dict(zip(batch.column_names, batch.columns))
        for c in cols:
            out[c] = small.column(c).take(take)
        return pa.table(out)

    return big_ds.map_batches(join, batch_format="pyarrow")


def top_k_per_group(ds, group_col: str, key: str, k: int,
                    descending: bool = True, tiebreak: str | None = None):
    """Top-k rows PER GROUP (e.g. best-quality docs per domain). Two
    stages: a per-block partial top-k per group (bounds what the
    shuffle moves to k rows per (group, block)) then the exact per-group
    cut in ``groupby().map_groups``. Deterministic when ``tiebreak``
    makes (key, tiebreak) unique within a group."""
    keys = [(key, "descending" if descending else "ascending")]
    if tiebreak:
        keys.append((tiebreak, "ascending"))

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.sort_by([(group_col, "ascending")] + keys)
        # per-group head(k) within the block: rank rows inside each run
        g = t.column(group_col)
        codes = np.asarray(pc.dictionary_encode(g.combine_chunks()
                           if isinstance(g, pa.ChunkedArray) else g).indices)
        # positions where a new group starts
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        rank = np.arange(len(codes)) - np.repeat(starts, np.diff(np.r_[starts, len(codes)]))
        return t.filter(pa.array(rank < k))

    def cut(group: pa.Table) -> pa.Table:
        return group.sort_by(keys).slice(0, k)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_col).map_groups(cut, batch_format="pyarrow"))


def pivot_counts(ds, row_col: str, col_col: str, categories: list[str]):
    """Pivot long→wide: one row per ``row_col`` value, one count column
    per category of ``col_col`` (e.g. per-user event-type counts).
    Per-batch partial (row, category) counts bound the shuffle to
    O(rows × categories × blocks); the category list is a fixed small
    side so the wide schema is stable. Unlisted categories are ignored."""
    cats = pa.array(categories, pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({row_col: batch.column(row_col),
                      col_col: pc.cast(batch.column(col_col), pa.string())})
        g = t.group_by([row_col, col_col]).aggregate([(col_col, "count")])
        return g.rename_columns([row_col, col_col, "c"])

    counts = ds.map_batches(partial, batch_format="pyarrow") \
               .groupby([row_col, col_col]).sum("c")

    def widen(group: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(group.column(col_col), pa.string()), value_set=cats)
        idx_np = np.asarray(pc.fill_null(idx, -1).cast(pa.int64()), dtype=np.int64)
        c = np.asarray(group.column("sum(c)"), dtype=np.int64)
        row = np.zeros(len(categories), np.int64)
        valid = idx_np >= 0
        np.add.at(row, idx_np[valid], c[valid])
        cols = {row_col: group.column(row_col).slice(0, 1)}
        for j, cat in enumerate(categories):
            cols["n_" + cat] = pa.array([int(row[j])], pa.int64())
        return pa.table(cols)

    return counts.groupby(row_col).map_groups(widen, batch_format="pyarrow")


def group_quantiles(ds, group_col: str, value_col: str, qs: list[float],
                    digits: int = 4):
    """Exact per-group quantiles (percentile_disc semantics: the
    smallest value whose cumulative fraction >= q). Exactness needs the
    group's values together, so this is groupby().map_groups with a
    vectorized sort per group — the partitioning assumption of every
    exact-quantile op. For sketch-sized state at 100 TB swap in a
    t-digest per batch + merge; disc quantiles here stay oracle-exact."""

    def quant(group: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(pc.cast(group.column(value_col), pa.float64())))
        n = len(v)
        cols = {group_col: group.column(group_col).slice(0, 1)}
        for q in qs:
            i = max(int(np.ceil(q * n)) - 1, 0)
            cols[f"p{int(q * 100)}"] = pa.array(
                [round(float(v[i]), digits)], pa.float64()
            )
        cols["n"] = pa.array([n], pa.int64())
        return pa.table(cols)

    return ds.groupby(group_col).map_groups(quant, batch_format="pyarrow")


def rolling_window(ds, key_col: str, order_col: str, value_col: str,
                   id_col: str, window: int = 4, lag: int = 1,
                   digits: int = 4):
    """Per-key ordered window functions — the SQL
    ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW`` moving average,
    ``LAG(value, lag)`` and the running sum — as
    ``groupby(key).map_groups`` with vectorized shifted adds per group
    (the Dataset-API expression of an ordered analytic window; Ray Data
    has no native one).

    Ordering ties on ``order_col`` break on ``id_col`` so the result is
    deterministic and matches an oracle that orders the same way. The
    moving sum is built by adding the ``window`` shifted value arrays in
    increasing-index order (not a cumsum difference) so the float
    addition order is the in-frame order an incremental engine uses.
    Partitioning assumption (same as asof_join/group_quantiles): one
    key's rows fit one worker — salt hotter keys."""
    if window < 1 or lag < 1:
        raise ValueError("window and lag must be >= 1")

    def win(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[(order_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(order)
        v = np.asarray(pc.cast(g.column(value_col), pa.float64()))
        n = len(v)
        # moving sum over the trailing frame, shifted adds oldest-first
        msum = np.zeros(n, np.float64)
        for s in range(window - 1, -1, -1):
            msum[s:] += v[: n - s] if s else v
        cnt = np.minimum(np.arange(n) + 1, window)
        mavg = msum / cnt
        lagv = np.full(n, np.nan)
        if n > lag:
            lagv[lag:] = v[: n - lag]
        run = np.cumsum(v)
        return round_cols(
            pa.table(
                {
                    key_col: g.column(key_col),
                    id_col: g.column(id_col),
                    "mavg": pa.array(mavg, pa.float64()),
                    "lag_value": pa.array(lagv, pa.float64(), mask=np.isnan(lagv)),
                    "running_sum": pa.array(run, pa.float64()),
                }
            ),
            ["mavg", "running_sum"],
            digits,
        )

    return ds.groupby(key_col).map_groups(win, batch_format="pyarrow")


def salted_join(big_ds, small_ds, on: str, salts: int = 4,
                num_partitions: int = 8, join_type: str = "inner"):
    """Skew-safe distributed hash join: a hot join key otherwise lands
    every one of its rows in ONE partition of the shuffle, serializing
    the join on a single worker. Salting spreads it: the big side gets
    a per-row salt in [0, salts) (round-robin inside each block — any
    assignment is correct, it only shapes the partitioning), the small
    side is replicated once per salt value, and the join runs on
    (key, salt) so each hot key fans out across ``salts`` partitions.
    Cost: small side × salts — pair it with a small dimension side, or
    detect the hot keys first (functions/sketch.py heavy hitters) and
    salt only those. Output equals the unsalted join with ``_salt``
    dropped."""

    def salt_big(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_salt", pa.array(np.arange(batch.num_rows, dtype=np.int64)
                              % salts, pa.int64()))

    def replicate(batch: pa.Table) -> pa.Table:
        outs = []
        for s in range(salts):
            outs.append(batch.append_column(
                "_salt", pa.array(np.full(batch.num_rows, s, np.int64),
                                  pa.int64())))
        return pa.concat_tables(outs)

    big = big_ds.map_batches(salt_big, batch_format="pyarrow")
    small = small_ds.map_batches(replicate, batch_format="pyarrow")
    joined = big.join(small, join_type=join_type,
                      num_partitions=num_partitions, on=(on, "_salt"))
    return joined.drop_columns(["_salt"])


def mode_per_group(ds, group_col: str, value_col: str):
    """Deterministic per-group mode: the most frequent value, ties
    broken by the lexicographically smallest value (so the answer is
    unique and block-layout independent). Per-batch partial
    (group, value) counts bound the shuffle to O(distinct pairs ×
    blocks); the top-1 cut reuses top_k_per_group over the aggregated
    (already tiny) count table."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch.column(group_col),
                      value_col: batch.column(value_col)})
        g = t.group_by([group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "n"])

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, value_col]).sum("n")
              .map_batches(lambda t: t.rename_columns(
                  [group_col, value_col, "n"]), batch_format="pyarrow"))
    return top_k_per_group(counts, group_col, key="n", k=1,
                           descending=True, tiebreak=value_col)


# pandas hash_array keys must be exactly 16 chars; two independent
# seeds drive the Kirsch-Mitzenmacher double-hashing scheme
_BLOOM_K1 = "scrappybloomk1aa"
_BLOOM_K2 = "scrappybloomk2bb"


def _bloom_positions(vals, m: int, k: int) -> list[np.ndarray]:
    """k vectorized bit positions per value: (h1 + i·h2) mod m (Kirsch
    & Mitzenmacher 2006 — two hashes simulate k). ONE pandas siphash
    call per seed per batch, no per-row Python."""
    import pandas as pd

    arr = np.asarray(vals, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_BLOOM_K1)
    h2 = pd.util.hash_array(arr, hash_key=_BLOOM_K2) | np.uint64(1)
    return [((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
            for i in range(k)]


def bloom_semi_join(big_ds, big_key: str, small_ds, small_key: str,
                    m_bits: int = 1 << 20, k_hashes: int = 4,
                    num_partitions: int = 8):
    """Semi-join via a broadcast Bloom filter + exact confirm: keep big
    rows whose key appears in the small side. The at-100 TB shape: the
    small side's EXACT key set may be too big to broadcast, but its
    Bloom filter is m_bits/8 bytes regardless of cardinality — built
    distributed (per-block partial filters OR-merged on the driver,
    associative like every other partial here), shipped once into a
    streaming prefilter that drops the overwhelming majority of big
    rows with zero shuffle, and only the surviving sliver pays the
    exact distributed hash join that removes Bloom false positives.
    Output ≡ the plain semi-join (the join confirms), so SQL-oracled."""
    nbytes = m_bits // 8

    def build(batch: pa.Table) -> pa.Table:
        # runs on keys_ds, where the small key is already renamed
        vals = pc.cast(batch.column(big_key), pa.string()).to_numpy(
            zero_copy_only=False)
        bits = np.zeros(m_bits, dtype=bool)
        for pos in _bloom_positions(vals, m_bits, k_hashes):
            bits[pos] = True
        return pa.table({"bloom": pa.array([np.packbits(bits).tobytes()],
                                           pa.binary())})

    from .analytics import _to_table

    keys_ds = (small_ds.select_columns([small_key])
               .map_batches(lambda t: t.rename_columns([big_key]),
                            batch_format="pyarrow")
               .groupby(big_key).count()
               .select_columns([big_key]))  # distinct small keys
    keys_ds = keys_ds.materialize()  # consumed twice: build + confirm

    parts = _to_table(keys_ds.map_batches(build, batch_format="pyarrow"))
    merged = np.zeros(nbytes, dtype=np.uint8)
    for blob in parts.column("bloom").to_pylist():
        merged |= np.frombuffer(blob, dtype=np.uint8)
    bits = np.unpackbits(merged).astype(bool)  # m_bits bools, built once

    def prefilter(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch.column(big_key), pa.string()).to_numpy(
            zero_copy_only=False)
        keep = np.ones(len(vals), dtype=bool)
        for pos in _bloom_positions(vals, m_bits, k_hashes):
            keep &= bits[pos]
        return batch.filter(pa.array(keep))

    survivors = big_ds.map_batches(prefilter, batch_format="pyarrow")
    # exact confirm: inner join against the DISTINCT key table is a
    # semi-join (each survivor matches at most one key row). BOTH sides
    # empty-block-guarded: at larger sf / higher parallelism the
    # prefilter leaves 0-row survivor blocks and the distinct-key
    # groupby emits schema-less empty partitions, either of which trips
    # the Ray 2.49 acero key-resolution defect.
    from ..common import drop_empty_blocks

    return drop_empty_blocks(survivors).join(
        drop_empty_blocks(keys_ds), join_type="inner",
        num_partitions=num_partitions, on=(big_key,))


def first_last_per_group(ds, group_col: str, order_cols: list[str],
                         value_col: str):
    """Join-free ARG_MIN/ARG_MAX: per group, the ``value_col`` of the
    first and of the last row under the (order_cols) total order. Each
    block contributes only its own first+last row per group (2 rows per
    (group, block) cross the shuffle — never the events), and the same
    cut runs once more per group in map_groups. The order must be a
    TOTAL order (include an id tiebreaker) or first/last is undefined."""
    keys = [(c, "ascending") for c in order_cols]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        t = batch.sort_by([(group_col, "ascending")] + keys)
        g = t.column(group_col)
        codes = np.asarray(pc.dictionary_encode(
            g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        ).indices)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)] - 1
        take = np.unique(np.concatenate([starts, ends]))
        return t.take(pa.array(take, pa.int64()))

    def cut(group: pa.Table) -> pa.Table:
        g = group.sort_by(keys)
        return pa.table({
            group_col: g.column(group_col).slice(0, 1),
            "first_v": g.column(value_col).slice(0, 1),
            "last_v": g.column(value_col).slice(g.num_rows - 1, 1),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(cut, batch_format="pyarrow"))


def global_rank(ds, value_col: str, id_col: str, digits: int = 6):
    """Distributed global ROW_NUMBER over (value, id) — the
    zipWithIndex primitive Ray Data lacks — plus the uniform quantile
    transform (rank−1)/(n−1). No global sort materialization: a tiny
    groupby(value).count() gives per-VALUE offsets, the driver
    prefix-sums that O(distinct values) table (the pack_sequences
    bucket discipline), and each value-group ranks its own rows by id
    inside map_groups against its broadcast offset. Works at any row
    count whose VALUE cardinality fits the driver — for a continuous
    column quantize first (sketch.value_buckets shares the trick)."""
    from .analytics import _to_table

    counts = _to_table(ds.groupby(value_col).count())
    order = np.argsort(np.asarray(pc.cast(counts.column(value_col),
                                          pa.int64()), dtype=np.int64),
                       kind="stable")
    vals = np.asarray(pc.cast(counts.column(value_col), pa.int64()),
                      dtype=np.int64)[order]
    ns = np.asarray(counts.column(1), dtype=np.int64)[order]
    offsets = np.r_[0, np.cumsum(ns)][:-1]  # rows before each value
    total = int(ns.sum())

    def rank(group: pa.Table) -> pa.Table:
        g = group.sort_by([(id_col, "ascending")])
        v = int(pc.cast(g.column(value_col), pa.int64())[0].as_py())
        base = int(offsets[np.searchsorted(vals, v)])
        rn = base + 1 + np.arange(g.num_rows, dtype=np.int64)
        q = (rn - 1) / (total - 1) if total > 1 else np.zeros(g.num_rows)
        return pa.table({
            id_col: g.column(id_col),
            value_col: g.column(value_col),
            "rn": pa.array(rn, pa.int64()),
            "qnorm": pc.round(pa.array(q, pa.float64()), ndigits=digits,
                              round_mode="half_towards_infinity"),
        })

    return ds.groupby(value_col).map_groups(rank, batch_format="pyarrow")


def rolling_median(ds, key_col: str, order_col: str, value_col: str,
                   id_col: str, window: int = 5, digits: int = 6):
    """Trailing moving MEDIAN per key (ROWS window-1 PRECEDING..CURRENT)
    — the robust smoother a moving average isn't (one spike shifts the
    mean for `window` rows; the median shrugs). Full windows compute as
    ONE np.median over a sliding_window_view (no per-row Python); only
    the first window-1 warm-up rows per group loop, bounded by the
    window, not the data. Median of an even count averages the two
    middles (percentile_cont semantics, matching SQL MEDIAN)."""

    def win(group: pa.Table) -> pa.Table:
        g = group.sort_by([(order_col, "ascending"), (id_col, "ascending")])
        v = np.asarray(pc.cast(g.column(value_col), pa.float64()))
        n = len(v)
        out = np.empty(n, np.float64)
        head = min(window - 1, n)
        for i in range(head):  # warm-up only: ≤ window-1 iterations
            out[i] = np.median(v[: i + 1])
        if n >= window:
            sw = np.lib.stride_tricks.sliding_window_view(v, window)
            out[window - 1:] = np.median(sw, axis=1)
        return pa.table({
            id_col: g.column(id_col),
            key_col: g.column(key_col),
            "med": pc.round(pa.array(out, pa.float64()), ndigits=digits,
                            round_mode="half_towards_infinity"),
        })

    return ds.groupby(key_col).map_groups(win, batch_format="pyarrow")


def longest_streak(ds, key_col: str, order_col: str, value_col: str,
                   id_col: str):
    """Gaps-and-islands: the longest run of consecutive equal values
    per key under the (order, id) total order; ties broken by the
    lexicographically smallest value then earliest start. One
    vectorized run-length pass per group."""

    def streak(group: pa.Table) -> pa.Table:
        g = group.sort_by([(order_col, "ascending"), (id_col, "ascending")])
        v = np.asarray(pc.cast(g.column(value_col), pa.string())
                       .to_pylist(), dtype=object)
        if len(v) == 0:
            return pa.table({key_col: g.column(key_col).slice(0, 0),
                             "streak_value": pa.array([], pa.string()),
                             "streak_len": pa.array([], pa.int64())})
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        lens = np.diff(np.r_[starts, len(v)])
        vals = v[starts]
        # deterministic champion: max len, then smallest value, then
        # earliest start (lexsort can't key object arrays — narrow in
        # three vectorized steps instead)
        m = lens == lens.max()
        vmin = min(vals[m])
        m &= vals == vmin
        best = np.flatnonzero(m)[np.argmin(starts[m])]
        return pa.table({
            key_col: g.column(key_col).slice(0, 1),
            "streak_value": pa.array([str(vals[best])], pa.string()),
            "streak_len": pa.array([int(lens[best])], pa.int64()),
        })

    return ds.groupby(key_col).map_groups(streak, batch_format="pyarrow")


# ----------------------------------------------------------------- skyline


def _skyline_filter(t: pa.Table, min_col: str, max_col: str) -> pa.Table:
    """Rows of ``t`` on the 2-objective Pareto frontier (minimize
    ``min_col``, maximize ``max_col``) under SQL NOT-EXISTS dominance:
    p is dropped iff some q has q.min ≤ p.min AND q.max ≥ p.max with at
    least one strict — exact duplicates of a frontier point all stay.
    One lexsort + two vectorized prefix passes, no pairwise loop."""
    if t.num_rows == 0:
        return t
    lo = np.asarray(pc.cast(t.column(min_col), pa.float64()),
                    dtype=np.float64)
    hi = np.asarray(pc.cast(t.column(max_col), pa.float64()),
                    dtype=np.float64)
    order = np.lexsort((-hi, lo))           # min_col asc, max_col desc
    lo_s, hi_s = lo[order], hi[order]
    new_grp = np.r_[True, lo_s[1:] != lo_s[:-1]]
    gmax = hi_s[new_grp]                    # per-min-value best max
    gidx = np.cumsum(new_grp) - 1
    # best max among STRICTLY smaller min values (dominates at ≥)
    strict = np.r_[-np.inf, np.maximum.accumulate(gmax)[:-1]]
    dominated = (strict[gidx] >= hi_s) | (hi_s < gmax[gidx])
    keep_idx = np.sort(order[~dominated])
    return t.take(pa.array(keep_idx, pa.int64()))


def skyline(ds, min_col: str, max_col: str):
    """Distributed 2-objective skyline. The global frontier is a subset
    of the union of per-block frontiers (a point dominated only by a
    point in another block is still undominated inside its own block —
    so local filtering never drops a global-frontier point), so: one
    streaming local-skyline pass per block, gather the tiny union, one
    final pass. Driver memory is O(frontier), never O(rows); at 100 TB
    the gather is bounded by the frontier size of each block, which the
    local pass has already cut to the blocks' own Pareto sets."""
    from .analytics import _to_table

    local = ds.map_batches(
        lambda b: _skyline_filter(b, min_col, max_col),
        batch_format="pyarrow")
    return _skyline_filter(_to_table(local), min_col, max_col)


def argmin_per_group(ds, group_col: str, order_cols: list[str],
                     carry_cols: list[str]):
    """Join-free per-group ARGMIN: the ``carry_cols`` of each group's
    first row under the (order_cols) total order — the TPC-H Q2 /
    "cheapest supplier per part" shape without a window shuffle. Each
    block contributes one candidate row per group it sees (O(groups ×
    blocks) rows cross the wire, never the fact rows); the identical
    cut re-runs per group in map_groups. order_cols must be a TOTAL
    order (include an id tiebreaker) or the pick is nondeterministic."""
    keys = [(c, "ascending") for c in order_cols]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        t = batch.sort_by([(group_col, "ascending")] + keys)
        g = t.column(group_col)
        codes = np.asarray(pc.dictionary_encode(
            g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        ).indices)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        return t.take(pa.array(starts, pa.int64()))

    def cut(group: pa.Table) -> pa.Table:
        g = group.sort_by(keys)
        return g.select([group_col] + carry_cols).slice(0, 1)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(cut, batch_format="pyarrow"))


def revenue_share(ds, group_fn, group_name: str,
                  price_col: str = "l_extendedprice",
                  disc_col: str = "l_discount", digits: int = 6):
    """Ratio-to-total revenue per group (the SUM(x)/SUM(x) OVER ()
    window shape): one block-local partial sum in exact cents²-int64
    (price·100 × (1−disc)·100 both integers, so the distributed sum is
    order-independent; overflows int64 only past ~10^9 rows per group —
    switch the partial to a (hi,lo) split pair before that), one
    O(groups) groupby, and the share computed on the gathered tiny
    table. ``group_fn(batch) -> pa.Array`` derives the group key."""

    def partial(batch: pa.Table) -> pa.Table:
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(batch.column(price_col), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0),
                        pc.cast(batch.column(disc_col), pa.float64())),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        t = pa.table({group_name: group_fn(batch),
                      "r": pa.array(p * d, pa.int64())})
        return (t.group_by([group_name]).aggregate([("r", "sum")])
                .rename_columns([group_name, "r"]))

    from .analytics import _to_table

    g = _to_table(ds.map_batches(partial, batch_format="pyarrow")
                  .groupby(group_name).sum("r"))
    if g.num_rows == 0:
        # Empty input: the groupby's aggregate column may not even
        # exist in the recorded schema — return the empty frame.
        return pa.table({group_name: pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64()),
                         "share": pa.array([], pa.float64())})
    r = np.asarray(pc.cast(g.column("sum(r)"), pa.int64()),
                   dtype=np.int64)
    total = float(r.sum())
    if total == 0.0:
        # Empty input or all-zero revenue: 0/0 would silently yield
        # NaN shares — return the (possibly empty) groups with 0s.
        return pa.table({
            group_name: g.column(group_name),
            "revenue": pa.array(np.zeros(len(r)), pa.float64()),
            "share": pa.array(np.zeros(len(r)), pa.float64()),
        }).sort_by([(group_name, "ascending")])
    out = pa.table({
        group_name: g.column(group_name),
        "revenue": pc.round(pa.array(r.astype(np.float64) / 10000.0),
                            ndigits=2,
                            round_mode="half_towards_infinity"),
        "share": pc.round(pa.array(r.astype(np.float64) / total),
                          ndigits=digits,
                          round_mode="half_towards_infinity"),
    })
    return out.sort_by([(group_name, "ascending")])
