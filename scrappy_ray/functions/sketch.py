"""Fixed-size streaming sketches — the aggregates a 100 TB pipeline
uses where exact answers need an all-to-all shuffle it can't afford.

HyperLogLog cardinality (Flajolet, Fusy, Gandouet, Meunier '07, with
the standard linear-counting small-range correction): each block
reduces to a 2^p-byte register array in one vectorized pass; merging
is elementwise max (associative + commutative, so partials combine in
any order — retry/recompute safe); the driver touches O(blocks · 2^p)
bytes, never the data. Hashing is the same deterministic 64-bit
siphash kernel (``pd.util.hash_array``) the engine uses for bucket
routing, so estimates are reproducible run-to-run and machine-to-
machine (goldenable).

Standard error ≈ 1.04/√(2^p): p=12 (4 KiB) → ~1.6 %, p=14 → ~0.8 %.
The 64-bit variant needs no large-range correction at any realistic
cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash64(values) -> np.ndarray:
    """Deterministic uint64 hashes of an Arrow array (fixed-key
    siphash; one C call per batch)."""
    import pandas as pd

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    np_vals = np.asarray(values.to_pylist(), dtype=object)
    return pd.util.hash_array(np_vals)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit length of positive uint64s (6 shift/compare
    steps — exact, unlike float log2 above 2^53)."""
    bl = np.zeros(w.shape, np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        v[big] >>= np.uint64(s)
    return bl + 1


def hll_registers(values, p: int = 12) -> np.ndarray:
    """One vectorized pass: the 2^p uint8 HLL registers of an Arrow
    array's values. Registers from disjoint data merge with
    ``np.maximum``."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    reg = np.zeros(1 << p, np.uint8)
    if len(values) == 0:
        return reg
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    suffix = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rho = np.full(len(h), 64 - p + 1, np.int64)  # all-zero suffix case
    nz = suffix > 0
    rho[nz] = (64 - p) - _bit_length_u64(suffix[nz]) + 1
    np.maximum.at(reg, idx, rho.astype(np.uint8))
    return reg


def hll_estimate(reg: np.ndarray) -> int:
    """Bias-corrected cardinality estimate from a register array."""
    m = len(reg)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:  # linear-counting small-range correction
        est = m * np.log(m / zeros)
    return int(round(est))


def approx_distinct(ds, col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col): per-block registers (one row
    of 2^p bytes each), elementwise-max merge on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        reg = hll_registers(batch.column(col), p)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b.column("reg").to_pylist():
            np.maximum(merged, np.frombuffer(buf, np.uint8), out=merged)
    return hll_estimate(merged)


def approx_distinct_by_group(ds, group_col: str, col: str, p: int = 10):
    """Dataset of (group_col, n_approx): per-(block, group) partial
    registers, then a groupby + per-group max-merge. The shuffle moves
    O(groups × blocks) fixed-size rows — independent of row count."""

    def partial(batch: pa.Table) -> pa.Table:
        groups, codes = np.unique(
            np.asarray(batch.column(group_col).to_pylist(), dtype=object),
            return_inverse=True,
        )
        vals = batch.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        regs = []
        for gi in range(len(groups)):
            regs.append(
                hll_registers(vals.filter(pa.array(codes == gi)), p).tobytes()
            )
        return pa.table({
            group_col: pa.array(list(groups)),
            "reg": pa.array(regs, pa.binary()),
        })

    def merge(group: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, np.uint8)
        for buf in group.column("reg").to_pylist():
            np.maximum(merged, np.frombuffer(buf, np.uint8), out=merged)
        return pa.table({
            group_col: group.column(group_col).slice(0, 1),
            "n_approx": pa.array([hll_estimate(merged)], pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def _mg_reduce(vals: pa.Array, counts: np.ndarray, m: int):
    """Misra–Gries reduction of an exact histogram to ≤ m entries:
    subtract the (m+1)-th largest count from every count, keep the
    still-positive survivors. Survivor counts are LOWER BOUNDS; the
    undercount per value is ≤ the subtracted amount (returned)."""
    if len(counts) <= m:
        return vals, counts, 0
    kth = int(np.partition(counts, len(counts) - (m + 1))[len(counts) - (m + 1)])
    keep = counts > kth
    return vals.filter(pa.array(keep)), counts[keep] - kth, kth


def heavy_hitters(ds, col: str, k: int = 20, m: int = 4096,
                  n_candidates: int | None = None,
                  batch_size: int = 8192) -> pa.Table:
    """Global top-``k`` most frequent values of ``col`` by a two-pass
    sketch-then-recount plan — the shape that works when ``col`` has
    far more distinct values than fit anywhere (a full groupby-count
    + sort is an all-to-all over every distinct value; this moves
    only fixed-size summaries and one tiny candidate recount).

    Pass 1 (candidates): each batch reduces to its exact
    ``value_counts`` histogram, Misra–Gries-reduced (Misra & Gries
    '82) to at most ``m`` (value, lower-bound count) rows; summaries
    merge by summing (Agarwal et al., "Mergeable Summaries", PODS
    '12), so a small groupby-sum + per-block partial top-C gives the
    global top-``n_candidates`` (default ``max(4k, 64)``) estimates
    without the driver ever seeing more than O(blocks × C) rows.

    Pass 2 (recount): the candidate values are broadcast into a
    second pass that emits exact per-batch counts of candidates only
    (``pc.is_in`` filter — stays in C); a tiny groupby-sum yields
    exact global counts, and top-k uses the SQL ``ORDER BY c DESC,
    col`` tiebreak.

    The recount is exact by construction; only candidate RECALL is
    approximate. The result is certified exact when no batch
    truncated (per-batch distinct ≤ m — counter
    ``hh_mg_truncated_blocks`` stays 0), and in general whenever the
    true k-th count exceeds the summed per-batch undercount (counter
    ``hh_mg_max_undercount``). Truncation is never silent — both
    counters surface through ``functions.counters``.
    """
    from . import counters

    C = n_candidates or max(4 * k, 64)

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column(col).combine_chunks().value_counts()
        vals = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        vals, counts, undercount = _mg_reduce(vals, counts, m)
        if undercount:
            counters.incr("hh_mg_truncated_blocks", 1)
            counters.incr("hh_mg_max_undercount", undercount)
        return pa.table({col: vals, "c": pa.array(counts, pa.int64())})

    summaries = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=batch_size)
    # Ray's (sort-based, slower) groupby on purpose, NOT the external
    # hash shuffle: the spill contract requires duplicate-insensitive
    # reducers (retried spill tasks leave duplicate rows), and summing
    # partial counts is not — doubled summaries would inflate candidate
    # estimates. Ray's lineage makes this exact under retries, and the
    # input here is already reduced to O(blocks×m) summary rows.
    merged = summaries.groupby(col).sum("c")  # → (col, "sum(c)")

    def block_top(batch: pa.Table) -> pa.Table:
        cc = batch.column("sum(c)").combine_chunks().to_numpy(zero_copy_only=False)
        if len(cc) <= C:
            return batch
        idx = np.argpartition(-cc, C)[:C]
        return batch.take(pa.array(np.sort(idx)))

    parts = [
        b for b in merged.map_batches(
            block_top, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:  # empty input: typed empty result
        return _empty_hh(ds, col)
    tops = pa.concat_tables(parts)
    tops = tops.sort_by([("sum(c)", "descending"), (col, "ascending")]).slice(0, C)
    cand = tops.column(col).combine_chunks()  # ≤ C values — broadcast side

    def recount(batch: pa.Table) -> pa.Table:
        arr = batch.column(col).combine_chunks()
        hit = arr.filter(pc.is_in(arr, value_set=cand))
        if not len(hit):
            return pa.table({col: arr.slice(0, 0),
                             "c": pa.array([], pa.int64())})
        vc = hit.value_counts()
        return pa.table({col: vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    exact = ds.map_batches(recount, batch_format="pyarrow",
                           batch_size=batch_size).groupby(col).sum("c")
    tbls = [b for b in exact.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not tbls:
        return _empty_hh(ds, col)
    out = pa.concat_tables(tbls)
    out = out.select([col, "sum(c)"]).rename_columns([col, "c"])
    return out.sort_by([("c", "descending"), (col, "ascending")]).slice(0, k)


def heavy_hitters_by_group(ds, group_col: str, col: str, k: int = 5,
                           m: int = 4096, batch_size: int = 8192):
    """Per-group top-``k`` most frequent ``col`` values (e.g. top URLs
    per domain) — Dataset of (group, value, c, rnk). Same two-pass
    shape as :func:`heavy_hitters`, applied per group:

    Pass 1: each batch reduces to exact per-(group, value) counts,
    Misra–Gries-reduced PER GROUP to ≤ m rows (undercount counted via
    ``hhg_mg_truncated_groups`` / ``hhg_mg_max_undercount``); a
    groupby-sum merges summaries, and a per-group map_groups takes the
    top-``4k`` candidate values per group.

    Pass 2: candidates broadcast as one (group, value) hash set; each
    batch emits exact counts of candidate pairs only, a groupby-sum
    yields exact totals, and a final per-group cut ranks top-k by
    (count desc, value asc) — the SQL ``row_number() OVER (PARTITION BY
    g ORDER BY c DESC, v)`` tiebreak. Exact whenever no batch truncated
    a group (per-batch distinct values within the group ≤ m), else
    whenever each true top-k count exceeds the summed undercount."""
    from . import counters

    C = max(4 * k, 16)

    def partial(batch: pa.Table) -> pa.Table:
        t = (batch.select([group_col, col])
             .group_by([group_col, col])
             .aggregate([([], "count_all")])
             .rename_columns([group_col, col, "c"]))
        gv = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        counts = t.column("c").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        groups, codes = np.unique(gv, return_inverse=True)
        keep = np.ones(len(gv), bool)
        adj = counts.copy()
        for gi in range(len(groups)):
            idx = np.flatnonzero(codes == gi)
            if len(idx) > m:
                kth = int(np.partition(counts[idx], len(idx) - (m + 1))[len(idx) - (m + 1)])
                drop = counts[idx] <= kth
                keep[idx[drop]] = False
                adj[idx] -= kth
                counters.incr("hhg_mg_truncated_groups", 1)
                counters.incr("hhg_mg_max_undercount", kth)
        take = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({
            group_col: t.column(group_col).take(take),
            col: t.column(col).take(take),
            "c": pa.array(adj[keep], pa.int64()),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size)
              .groupby([group_col, col]).sum("c"))

    def group_top(group: pa.Table) -> pa.Table:
        cc = group.column("sum(c)").combine_chunks().to_numpy(zero_copy_only=False)
        if len(cc) <= C:
            return group
        idx = np.argpartition(-cc, C)[:C]
        return group.take(pa.array(np.sort(idx)))

    cand_tbl = pa.concat_tables(
        [b for b in merged.groupby(group_col)
         .map_groups(group_top, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow") if b.num_rows]
        or [pa.table({group_col: pa.array([], pa.string()),
                      col: pa.array([], pa.string()),
                      "sum(c)": pa.array([], pa.int64())})]
    )
    # broadcast side: one uint64 hash per candidate (group, value) pair
    cand_keys = np.sort(_pair_hash(cand_tbl.column(group_col),
                                   cand_tbl.column(col)))

    def recount(batch: pa.Table) -> pa.Table:
        t = (batch.select([group_col, col])
             .group_by([group_col, col])
             .aggregate([([], "count_all")])
             .rename_columns([group_col, col, "c"]))
        keys = _pair_hash(t.column(group_col), t.column(col))
        if not len(cand_keys) or not len(keys):
            return t.slice(0, 0)
        pos = np.searchsorted(cand_keys, keys)
        pos[pos == len(cand_keys)] = 0
        take = pa.array(np.flatnonzero(cand_keys[pos] == keys), pa.int64())
        return t.take(take)

    exact = (ds.map_batches(recount, batch_format="pyarrow",
                            batch_size=batch_size)
             .groupby([group_col, col]).sum("c"))

    def final_cut(group: pa.Table) -> pa.Table:
        g = group.sort_by([("sum(c)", "descending"), (col, "ascending")]).slice(0, k)
        return pa.table({
            group_col: g.column(group_col),
            col: g.column(col),
            "c": g.column("sum(c)"),
            "rnk": pa.array(np.arange(1, g.num_rows + 1), pa.int64()),
        })

    return exact.groupby(group_col).map_groups(final_cut, batch_format="pyarrow")


def _pair_hash(groups, values) -> np.ndarray:
    """Deterministic uint64 hash of (group, value) string pairs — the
    broadcast-set key (collision odds ~n²/2^64: negligible at any
    candidate-set size that fits a broadcast). The join stays in Arrow
    (one binary_join kernel), then the engine's fixed-key siphash."""
    if not len(groups):
        return np.empty(0, np.uint64)
    joined = pc.binary_join_element_wise(
        pc.cast(groups, pa.string()), pc.cast(values, pa.string()), "\x1f")
    return _hash64(joined)


def _empty_hh(ds, col: str) -> pa.Table:
    try:
        typ = ds.schema(fetch_if_missing=True).base_schema.field(col).type
    except Exception:
        typ = pa.string()
    return pa.table({col: pa.array([], typ), "c": pa.array([], pa.int64())})


def approx_quantiles_by_group(ds, group_col: str, value_col: str, id_col: str,
                              qs: list[float], k: int = 1024, digits: int = 4):
    """Approximate per-group quantiles from a deterministic bottom-k
    sample: each block keeps, per group, the ``k`` rows whose (unique)
    ``id_col`` hashes smallest; the per-group merge re-takes the
    bottom k and reads percentile_disc quantiles off the sample.

    Bottom-k by a fixed hash is a uniform row sample that is
    MERGEABLE (bottom-k of a union == bottom-k of concatenated
    bottom-k's) and independent of block layout, so results are
    deterministic and goldenable — the property an order-sensitive
    t-digest merge can't give under Ray's nondeterministic block
    arrival. Rank error ~ sqrt(q(1-q)/k) (~1.5 % at k=1024); groups
    with <= k rows come out exact. The shuffle moves O(groups x
    blocks x k) rows, independent of group size.

    ``id_col`` must be unique per row (ties at the k-th hash would
    make the cut nondeterministic otherwise)."""

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash64(batch.column(id_col))
        gvals = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        groups, codes = np.unique(gvals, return_inverse=True)
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = np.asarray(pc.cast(vals, pa.float64()), dtype=np.float64)
        keep = np.zeros(len(h), bool)
        for gi in range(len(groups)):
            idx = np.flatnonzero(codes == gi)
            if len(idx) > k:
                idx = idx[np.argpartition(h[idx], k)[:k]]
            keep[idx] = True
        return pa.table({
            group_col: pa.array(list(gvals[keep])),
            "h": pa.array(h[keep], pa.uint64()),
            "v": pa.array(v[keep], pa.float64()),
        })

    def merge(group: pa.Table) -> pa.Table:
        h = np.asarray(group.column("h"))
        v = np.asarray(group.column("v"))
        if len(h) > k:
            sel = np.argpartition(h, k)[:k]
            v = v[sel]
        v = np.sort(v)
        n = len(v)
        cols = {group_col: group.column(group_col).slice(0, 1)}
        for q in qs:
            i = max(int(np.ceil(q * n)) - 1, 0)
            cols[f"p{int(q * 100)}"] = pa.array(
                [round(float(v[i]), digits)], pa.float64())
        cols["n_sample"] = pa.array([n], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def value_buckets(ds, value_col: str, k: int = 10, keep_cols: list[str] | None = None):
    """EXACT quantile bucketing (curriculum / quality-decile
    assignment): bucket b ∈ [0, k) = the number of percentile_disc
    cutpoints strictly below the row's value, so ties land in one
    bucket and the SQL oracle (``quantile_disc`` cutpoints +
    ``list_filter``) reproduces it bit-for-bit.

    Scale shape — the low-cardinality histogram trick: the only
    shuffle is ``groupby(value).count()`` (O(distinct values ×
    blocks)), the driver folds the O(distinct values) histogram into
    k-1 cutpoints, and assignment is one broadcast ``searchsorted``
    streaming pass. Exact at ANY corpus size whenever the value is
    quantized (a score rounded to d digits has ≤ 10^d + 1 distinct
    values); for genuinely continuous columns use
    ``approx_quantiles_by_group``."""
    hist = ds.groupby(value_col).count().to_pandas()
    if len(hist) == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table({value_col: pa.array([], pa.float64()),
                      "bucket": pa.array([], pa.int64())})
        )
    cnt_col = [c for c in hist.columns if c != value_col][0]
    hist = hist.sort_values(value_col)
    vals = hist[value_col].to_numpy(dtype=np.float64)
    cum = np.cumsum(hist[cnt_col].to_numpy(dtype=np.int64))
    n = int(cum[-1])
    qs = np.arange(1, k) / k
    targets = np.maximum(np.ceil(qs * n).astype(np.int64), 1)
    cuts = vals[np.searchsorted(cum, targets, side="left")]

    def assign(batch: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(batch.column(value_col), pa.float64()), dtype=np.float64)
        b = np.searchsorted(cuts, v, side="left")  # == #cuts strictly < v
        cols = {c: batch.column(c) for c in (keep_cols or batch.column_names)}
        cols["bucket"] = pa.array(b.astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")
