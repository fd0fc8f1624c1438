"""Dataset-statistics operators: column profiling, grouped Pearson
correlation, and z-score outlier detection.

All three follow the engine's moment-sketch discipline: every wide step
pre-aggregates EXACT INTEGER sums inside ``map_batches`` (int64 moments
are associative and order-free, so the distributed reduce can never
drift from a single-threaded SQL oracle the way float partial sums
can), the shuffle moves O(groups), and the float math happens once, on
the tiny aggregated table, with the operation order written to mirror
the oracle SQL expression for expression.

Reference parity: the reference's metrics surface is P/R/F over triple
sets (lib/scrappy/learning — see functions/metrics.py); these extend it
with the table-shape statistics a 100 TB corpus run needs (schema
drift, length-distribution skew, feature correlation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _round_half_away(arr: pa.Array, digits: int) -> pa.Array:
    """SQL ROUND semantics (half away from zero), not Arrow's default
    half-to-even."""
    return pc.round(arr, ndigits=digits, round_mode="half_towards_infinity")


def _to_table(ds) -> pa.Table:
    from ..pipelines.analytics import _to_table as _tt

    return _tt(ds)


# ---------------------------------------------------------------- profiling


def profile_table(ds, columns: list[str], approx: bool = False,
                  p: int = 12):
    """Per-column profile: row count, null count, distinct count, min
    and max (rendered as strings so one schema fits every column
    type). Supported column types: integers and strings.

    Scale shape: one pass emits per-block distinct (column, value)
    pairs — already deduped block-side, so the shuffle moves
    O(distinct × blocks) not O(rows) — plus a tiny per-block stats row
    per column; the global distinct count is a hash aggregate over the
    pair table and the min/max/null reduce runs on the O(columns ×
    blocks) stats table driver-side. For a column whose distinct count
    approaches the row count (a primary key) the pair shuffle IS the
    data — pass ``approx=True`` for the HyperLogLog path
    (functions/sketch.py): per-(block, column) 2^p-byte registers,
    max-merged per column, so the distinct shuffle drops to
    O(columns × blocks) FIXED-SIZE rows at ±~1.6% (p=12) error.
    """
    cols = list(columns)

    if approx:
        from .sketch import hll_estimate, hll_registers

        def regs(batch: pa.Table) -> pa.Table:
            names, bufs = [], []
            for c in cols:
                v = pc.cast(batch.column(c), pa.string())
                v = (v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                     else v).drop_null()
                names.append(c)
                bufs.append(hll_registers(v, p).tobytes())
            return pa.table({"col_name": pa.array(names, pa.string()),
                             "reg": pa.array(bufs, pa.binary())})

        def merge(group: pa.Table) -> pa.Table:
            merged = np.zeros(1 << p, np.uint8)
            for buf in group.column("reg").to_pylist():
                np.maximum(merged, np.frombuffer(buf, np.uint8),
                           out=merged)
            return pa.table({
                "col_name": group.column("col_name").slice(0, 1),
                "nd": pa.array([hll_estimate(merged)], pa.int64()),
            })

        dt = _to_table(ds.map_batches(regs, batch_format="pyarrow")
                       .groupby("col_name")
                       .map_groups(merge, batch_format="pyarrow"))
        n_distinct = {dt.column("col_name")[i].as_py():
                      dt.column("nd")[i].as_py()
                      for i in range(dt.num_rows)}
    else:
        def pairs(batch: pa.Table) -> pa.Table:
            outs = []
            for c in cols:
                v = pc.cast(batch.column(c), pa.string())
                u = pc.unique(v.combine_chunks()
                              if isinstance(v, pa.ChunkedArray) else v)
                u = u.drop_null()
                outs.append(pa.table({
                    "col_name": pa.array([c] * len(u), pa.string()),
                    "value": u,
                }))
            return pa.concat_tables(outs)

        distinct = (ds.map_batches(pairs, batch_format="pyarrow")
                    .groupby(["col_name", "value"]).count()
                    .groupby("col_name").count())
        dt = _to_table(distinct)  # O(columns)
        n_distinct = {dt.column("col_name")[i].as_py():
                      dt.column(1)[i].as_py()
                      for i in range(dt.num_rows)}

    def stats(batch: pa.Table) -> pa.Table:
        rows = {"col_name": [], "n_rows": [], "n_nulls": [],
                "min_num": [], "max_num": [], "min_str": [], "max_str": []}
        for c in cols:
            col = batch.column(c)
            rows["col_name"].append(c)
            rows["n_rows"].append(batch.num_rows)
            rows["n_nulls"].append(col.null_count)
            if pa.types.is_integer(col.type):
                mm = pc.min_max(col).as_py()
                rows["min_num"].append(mm["min"])
                rows["max_num"].append(mm["max"])
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            else:
                s = pc.cast(col, pa.string())
                mm = pc.min_max(s).as_py()
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(mm["min"])
                rows["max_str"].append(mm["max"])
        return pa.table({
            "col_name": pa.array(rows["col_name"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
            "min_num": pa.array(rows["min_num"], pa.int64()),
            "max_num": pa.array(rows["max_num"], pa.int64()),
            "min_str": pa.array(rows["min_str"], pa.string()),
            "max_str": pa.array(rows["max_str"], pa.string()),
        })

    st = _to_table(ds.map_batches(stats, batch_format="pyarrow"))
    g = st.group_by("col_name").aggregate([
        ("n_rows", "sum"), ("n_nulls", "sum"),
        ("min_num", "min"), ("max_num", "max"),
        ("min_str", "min"), ("max_str", "max"),
    ])
    gi = {g.column("col_name")[i].as_py(): i for i in range(g.num_rows)}

    def fmt(i: int, num_col: str, str_col: str) -> str | None:
        v = g.column(num_col)[i].as_py()
        if v is not None:
            return str(v)
        return g.column(str_col)[i].as_py()

    return pa.table({
        "col_name": pa.array(cols, pa.string()),
        "n_rows": pa.array([g.column("n_rows_sum")[gi[c]].as_py()
                            for c in cols], pa.int64()),
        "n_nulls": pa.array([g.column("n_nulls_sum")[gi[c]].as_py()
                             for c in cols], pa.int64()),
        "n_distinct": pa.array([n_distinct.get(c, 0) for c in cols],
                               pa.int64()),
        "min_v": pa.array([fmt(gi[c], "min_num_min", "min_str_min")
                           for c in cols], pa.string()),
        "max_v": pa.array([fmt(gi[c], "max_num_max", "max_str_max")
                           for c in cols], pa.string()),
    })


# ------------------------------------------------------- grouped correlation


def group_corr(ds, group_col: str, x_col: str, y_col: str,
               digits: int = 6):
    """Per-group Pearson correlation of two INTEGER columns via exact
    int64 moments (n, Σx, Σy, Σx², Σy², Σxy): the partial sums combine
    per batch, one O(groups) shuffle, and the correlation formula runs
    once on the aggregated table with the same operation order as the
    SQL oracle — (nΣxy − ΣxΣy) / sqrt(double(nΣx²−Σx²) · (nΣy²−Σy²))."""

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(x_col), pa.int64())
        y = pc.cast(batch.column(y_col), pa.int64())
        t = pa.table({
            group_col: batch.column(group_col),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y),
        })
        g = t.group_by([group_col]).aggregate(
            [(c, "sum") for c in ("one", "sx", "sy", "sxx", "syy", "sxy")])
        return g.rename_columns([group_col, "n", "sx", "sy", "sxx", "syy",
                                 "sxy"])

    agg = _to_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col).sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    ).rename_columns([group_col, "n", "sx", "sy", "sxx", "syy", "sxy"])

    n = np.asarray(agg.column("n"), dtype=np.int64)
    sx = np.asarray(agg.column("sx"), dtype=np.int64)
    sy = np.asarray(agg.column("sy"), dtype=np.int64)
    sxx = np.asarray(agg.column("sxx"), dtype=np.int64)
    syy = np.asarray(agg.column("syy"), dtype=np.int64)
    sxy = np.asarray(agg.column("sxy"), dtype=np.int64)
    num = (n * sxy - sx * sy).astype(np.float64)
    vx = (n * sxx - sx * sx).astype(np.float64)
    vy = (n * syy - sy * sy).astype(np.float64)
    den = np.sqrt(vx * vy)
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where(den > 0, num / den, np.nan)
    return pa.table({
        group_col: agg.column(group_col),
        "n": pa.array(n, pa.int64()),
        "corr_xy": _round_half_away(
            pa.array(corr, pa.float64(), mask=~(den > 0)), digits),
    }).sort_by([(group_col, "ascending")])


# ------------------------------------------------------ grouped OLS regression


def group_linreg(ds, group_col: str, x_col: str, y_col: str,
                 digits: int = 6):
    """Per-group ordinary-least-squares fit y = slope·x + intercept of
    two INTEGER columns, plus R², via the same exact-int64-moment
    discipline as :func:`group_corr` (the two share a moment table; the
    extra cost over corr is zero shuffle bytes). Formulas run once on
    the O(groups) aggregate in oracle operation order:

        slope     = (nΣxy − ΣxΣy) / double(nΣx² − ΣxΣx)
        intercept = Σy/n − slope·(Σx/n)
        r2        = (nΣxy − ΣxΣy)² / (double(nΣx²−ΣxΣx)·double(nΣy²−ΣyΣy))

    Groups with zero x-variance are dropped (slope undefined, matching
    the SQL oracle's WHERE n·Σx²−ΣxΣx > 0 guard); zero y-variance keeps
    slope/intercept but nulls r2."""

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(x_col), pa.int64())
        y = pc.cast(batch.column(y_col), pa.int64())
        t = pa.table({
            group_col: batch.column(group_col),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y),
        })
        g = t.group_by([group_col]).aggregate(
            [(c, "sum") for c in ("one", "sx", "sy", "sxx", "syy", "sxy")])
        return g.rename_columns([group_col, "n", "sx", "sy", "sxx", "syy",
                                 "sxy"])

    agg = _to_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col).sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    ).rename_columns([group_col, "n", "sx", "sy", "sxx", "syy", "sxy"])

    n = np.asarray(agg.column("n"), dtype=np.int64)
    sx = np.asarray(agg.column("sx"), dtype=np.int64)
    sy = np.asarray(agg.column("sy"), dtype=np.int64)
    sxx = np.asarray(agg.column("sxx"), dtype=np.int64)
    syy = np.asarray(agg.column("syy"), dtype=np.int64)
    sxy = np.asarray(agg.column("sxy"), dtype=np.int64)
    num = (n * sxy - sx * sy).astype(np.float64)
    vx = (n * sxx - sx * sx).astype(np.float64)
    vy = (n * syy - sy * sy).astype(np.float64)
    keep = vx > 0
    agg, n, sx, sy = agg.filter(pa.array(keep)), n[keep], sx[keep], sy[keep]
    num, vx, vy = num[keep], vx[keep], vy[keep]
    slope = num / vx
    intercept = sy.astype(np.float64) / n - slope * (sx.astype(np.float64) / n)
    with np.errstate(divide="ignore", invalid="ignore"):
        r2 = np.where(vy > 0, (num * num) / (vx * vy), np.nan)
    return pa.table({
        group_col: agg.column(group_col),
        "n": pa.array(n, pa.int64()),
        "slope": _round_half_away(pa.array(slope, pa.float64()), digits),
        "intercept": _round_half_away(pa.array(intercept, pa.float64()),
                                      digits),
        "r2": _round_half_away(pa.array(r2, pa.float64(), mask=~(vy > 0)),
                               digits),
    }).sort_by([(group_col, "ascending")])


# ----------------------------------------------------------- z-score outliers


def group_outliers(ds, group_col: str, value_col: str, id_col: str,
                   z_thresh: float = 2.0, digits: int = 6):
    """Docs whose value is more than ``z_thresh`` sample standard
    deviations from their group's mean. Exact int64 (n, Σx, Σx²) partial
    sums → O(groups) shuffle → the per-group (mean, sd) table is
    broadcast back into a streaming filter pass (closure capture here;
    swap to relational.broadcast_join when groups outnumber driver
    memory). z is rounded half-away BEFORE the threshold compare so the
    kept set is bit-stable against the SQL oracle."""

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(value_col), pa.int64())
        t = pa.table({
            group_col: batch.column(group_col),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "sx": x, "sxx": pc.multiply(x, x),
        })
        g = t.group_by([group_col]).aggregate(
            [(c, "sum") for c in ("one", "sx", "sxx")])
        return g.rename_columns([group_col, "n", "sx", "sxx"])

    agg = _to_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col).sum(["n", "sx", "sxx"])
    ).rename_columns([group_col, "n", "sx", "sxx"])

    # per-group (mean, sd) — operation order mirrors the oracle SQL:
    # mean = sx::DOUBLE / n; var = (sxx::DOUBLE - sx::DOUBLE*sx/n)/(n-1)
    n_g = np.asarray(agg.column("n"), dtype=np.int64)
    sx_g = np.asarray(agg.column("sx"), dtype=np.int64)
    sxx_g = np.asarray(agg.column("sxx"), dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_g = sx_g.astype(np.float64) / n_g
        var_g = np.where(
            n_g > 1,
            (sxx_g.astype(np.float64) - sx_g.astype(np.float64) * sx_g / n_g)
            / np.maximum(n_g - 1, 1), np.nan)
        sd_g = np.where(var_g > 0, np.sqrt(var_g), np.nan)
    gkeys = agg.column(group_col).combine_chunks() if isinstance(
        agg.column(group_col), pa.ChunkedArray) else agg.column(group_col)

    def flag(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(batch.column(group_col), gkeys.type),
                          value_set=gkeys)
        i = np.asarray(pc.fill_null(idx, -1).cast(pa.int64()), dtype=np.int64)
        have = i >= 0
        mean = np.where(have, mean_g[np.maximum(i, 0)], np.nan)
        sd = np.where(have, sd_g[np.maximum(i, 0)], np.nan)
        x = np.asarray(pc.cast(batch.column(value_col), pa.int64()),
                       dtype=np.int64)
        with np.errstate(invalid="ignore"):
            z = (x - mean) / sd
        zr = _round_half_away(pa.array(z, pa.float64(), mask=np.isnan(z)),
                              digits)
        keep = pc.fill_null(pc.greater(pc.abs(zr), z_thresh), False)
        out = pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            value_col: batch.column(value_col),
            "z": zr,
        })
        return out.filter(keep)

    return ds.map_batches(flag, batch_format="pyarrow")


# ----------------------------------------------------------- robust outliers


def _group_median(ds, group_col: str, value_col: str) -> pa.Table:
    """Exact per-group percentile_disc(0.5) median (the smallest value
    whose cumulative fraction >= 0.5 — an ACTUAL data value, so integer
    inputs stay integers and the oracle compare is exact). map_groups
    needs one group's values on one worker — the partitioning
    assumption of every exact-quantile op (pipelines/relational.py::
    group_quantiles); swap in a merging sketch when a group outgrows a
    worker."""

    def med(group: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(pc.cast(group.column(value_col),
                                       pa.int64())))
        i = max(int(np.ceil(0.5 * len(v))) - 1, 0)
        return pa.table({
            group_col: group.column(group_col).slice(0, 1),
            "med": pa.array([int(v[i])], pa.int64()),
        })

    return _to_table(
        ds.groupby(group_col).map_groups(med, batch_format="pyarrow"))


def mad_outliers(ds, group_col: str, value_col: str, id_col: str,
                 k: float = 1.5):
    """Robust per-group outliers via MAD (median absolute deviation):
    rows whose |x − median| exceeds k × median(|x − median|). Unlike
    the z-score (group_outliers), a single planted spike cannot drag
    the threshold, because medians ignore magnitude. Two exact grouped
    medians (tiny O(groups) tables broadcast back via closure capture)
    sandwich one streaming deviation pass — the integer deviations make
    the k-compare bit-stable against SQL."""
    med_t = _group_median(ds, group_col, value_col)
    gkeys = med_t.column(group_col).combine_chunks()
    med_v = np.asarray(med_t.column("med"), dtype=np.int64)

    def _lookup(batch: pa.Table, table_vals: np.ndarray) -> np.ndarray:
        idx = pc.index_in(pc.cast(batch.column(group_col), gkeys.type),
                          value_set=gkeys)
        i = np.asarray(pc.fill_null(idx, -1).cast(pa.int64()),
                       dtype=np.int64)
        return np.where(i >= 0, table_vals[np.maximum(i, 0)], 0), i >= 0

    def dev(batch: pa.Table) -> pa.Table:
        m, have = _lookup(batch, med_v)
        x = np.asarray(pc.cast(batch.column(value_col), pa.int64()))
        d = np.abs(x - m)
        return pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            value_col: batch.column(value_col),
            "dev": pa.array(np.where(have, d, 0), pa.int64()),
        }).filter(pa.array(have))

    devs = ds.map_batches(dev, batch_format="pyarrow").materialize()
    mad_t = _group_median(devs, group_col, "dev")
    mad_keys = mad_t.column(group_col).combine_chunks()
    mad_v = np.asarray(mad_t.column("med"), dtype=np.int64)

    def flag(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(batch.column(group_col), mad_keys.type),
                          value_set=mad_keys)
        i = np.asarray(pc.fill_null(idx, -1).cast(pa.int64()),
                       dtype=np.int64)
        mad = np.where(i >= 0, mad_v[np.maximum(i, 0)], 0)
        d = np.asarray(pc.cast(batch.column("dev"), pa.int64()))
        return batch.filter(pa.array((i >= 0) & (d > k * mad)))

    return devs.map_batches(flag, batch_format="pyarrow")


# ------------------------------------------------------- exact distinct count


def distinct_count_by_group(ds, group_col: str, value_col: str):
    """Exact COUNT(DISTINCT value) per group: per-block deduped
    (group, value) pairs bound the shuffle to O(distinct pairs ×
    blocks), then two hash aggregates — never a global sort, never a
    row-level shuffle. The exact companion of the HyperLogLog sketch
    (functions/sketch.py) for when the distinct cardinality itself is
    the deliverable."""

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch.column(group_col),
                      value_col: batch.column(value_col)})
        g = t.group_by([group_col, value_col]).aggregate([])
        return g

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby([group_col, value_col]).count()
            .drop_columns(["count()"])
            .groupby(group_col).count()
            .map_batches(lambda t: t.rename_columns(
                [group_col, "n_distinct"]), batch_format="pyarrow")
            .sort(group_col))


# ------------------------------------------------------------ group summary


def group_summary(ds, group_col: str, value_col: str, digits: int = 6):
    """One-pass per-group summary (n, min, max, mean, sample sd) over
    an integer column: per-batch exact int64 (n, Σx, Σx², min, max)
    partials, one O(groups) shuffle, the float math once on the
    aggregated table in oracle operation order (the same moment
    discipline as group_corr/group_outliers)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(value_col), pa.int64())
        t = pa.table({
            group_col: batch.column(group_col),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "sx": x, "sxx": pc.multiply(x, x), "mn": x, "mx": x,
        })
        g = t.group_by([group_col]).aggregate(
            [("one", "sum"), ("sx", "sum"), ("sxx", "sum"),
             ("mn", "min"), ("mx", "max")])
        return g.rename_columns([group_col, "n", "sx", "sxx", "mn", "mx"])

    import ray.data  # noqa: F401
    from ray.data.aggregate import Max, Min, Sum

    agg = _to_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col).aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"), Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"))
    )
    n = np.asarray(agg.column("n"), dtype=np.int64)
    sx = np.asarray(agg.column("sx"), dtype=np.int64)
    sxx = np.asarray(agg.column("sxx"), dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = sx.astype(np.float64) / n
        var = np.where(
            n > 1,
            (sxx.astype(np.float64) - sx.astype(np.float64) * sx / n)
            / np.maximum(n - 1, 1), np.nan)
        sd = np.where(var > 0, np.sqrt(var), np.nan)
    return pa.table({
        group_col: agg.column(group_col),
        "n": pa.array(n, pa.int64()),
        "min_v": agg.column("mn"),
        "max_v": agg.column("mx"),
        "mean_v": _round_half_away(pa.array(mean, pa.float64()), digits),
        "sd_v": _round_half_away(
            pa.array(sd, pa.float64(), mask=np.isnan(sd)), digits),
    }).sort_by([(group_col, "ascending")])


def weighted_mean(ds, group_col: str, value_col: str, weight_col: str,
                  value_scale: int = 4, weight_scale: int = 2,
                  digits: int = 6):
    """Per-group weighted mean Σ(w·x)/Σw on EXACT fixed-point integers:
    values and weights quantize to int64 (round half away, the SQL
    ROUND), the products and sums stay integral (order-free), and the
    one float division happens on the O(groups) table — a distributed
    weighted average that can never drift from the oracle."""
    vs, ws = float(10 ** value_scale), float(10 ** weight_scale)

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(pc.multiply(
            pc.cast(batch.column(value_col), pa.float64()), vs),
            round_mode="half_towards_infinity"), pa.int64())
        w = pc.cast(pc.round(pc.multiply(
            pc.cast(batch.column(weight_col), pa.float64()), ws),
            round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({group_col: batch.column(group_col),
                      "wx": pc.multiply(w, x), "w": w})
        g = t.group_by([group_col]).aggregate([("wx", "sum"), ("w", "sum")])
        return g.rename_columns([group_col, "wx", "w"])

    agg = _to_table(ds.map_batches(partial, batch_format="pyarrow")
                    .groupby(group_col).sum(["wx", "w"])
                    ).rename_columns([group_col, "wx", "w"])
    wx = np.asarray(agg.column("wx"), dtype=np.int64)
    w = np.asarray(agg.column("w"), dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        m = (wx.astype(np.float64) / w) / vs
    return pa.table({
        group_col: agg.column(group_col),
        "wavg": _round_half_away(
            pa.array(m, pa.float64(), mask=~(w > 0)), digits),
    }).sort_by([(group_col, "ascending")])


# ----------------------------------------------------------- chi-square


def chi_square_cells(ds, row_col: str, col_col: str, digits: int = 6):
    """Chi-square contingency audit over two categorical columns: per
    cell the observed count, the independence-expected count
    (row_total × col_total / n), and the (O−E)²/E contribution — the
    drift test for 'did the source mix change per language'. One
    partial-aggregated count shuffle to an O(cells) table; margins and
    the float math run driver-side on that tiny table in oracle
    operation order."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({row_col: batch.column(row_col),
                      col_col: batch.column(col_col)})
        g = t.group_by([row_col, col_col]).aggregate([([], "count_all")])
        return g.rename_columns([row_col, col_col, "obs"])

    cells = _to_table(ds.map_batches(partial, batch_format="pyarrow")
                      .groupby([row_col, col_col]).sum("obs")
                      ).rename_columns([row_col, col_col, "obs"])
    r = np.asarray(cells.column(row_col).to_pylist(), dtype=object)
    c = np.asarray(cells.column(col_col).to_pylist(), dtype=object)
    sparse = np.asarray(cells.column("obs"), dtype=np.int64)
    tot = int(sparse.sum())
    rkeys, ridx = np.unique(r, return_inverse=True)
    ckeys, cidx = np.unique(c, return_inverse=True)
    # DENSIFY to the full keys × keys grid: a zero-observed cell still
    # contributes E to the statistic (the fully-dependent case would
    # otherwise read half its true chi²)
    grid = np.zeros((len(rkeys), len(ckeys)), np.int64)
    grid[ridx, cidx] = sparse
    rt = grid.sum(axis=1)
    ct = grid.sum(axis=0)
    ri, ci = np.meshgrid(np.arange(len(rkeys)), np.arange(len(ckeys)),
                         indexing="ij")
    ri, ci = ri.ravel(), ci.ravel()
    obs = grid[ri, ci]
    e = rt[ri].astype(np.float64) * ct[ci] / tot
    d = obs - e
    contrib = d * d / e
    return pa.table({
        row_col: pa.array(rkeys[ri], pa.string()),
        col_col: pa.array(ckeys[ci], pa.string()),
        "obs": pa.array(obs, pa.int64()),
        "expected": _round_half_away(pa.array(e, pa.float64()), digits),
        "contrib": _round_half_away(pa.array(contrib, pa.float64()),
                                    digits),
    })


# ------------------------------------------------------------- winsorize


def winsorize(ds, group_col: str, value_col: str, id_col: str,
              lo_q: float = 0.05, hi_q: float = 0.95):
    """Per-group winsorization: clip values to the group's exact
    [lo_q, hi_q] percentile_disc band — the standard tail-taming step
    before moment-based stats (a z-score AFTER winsorizing is robust;
    see mad_outliers for the rank-based alternative). Two exact grouped
    percentiles (O(groups) broadcast) around one streaming clip pass;
    disc percentiles are actual data values, so integer columns stay
    integer and the oracle compare is exact."""

    def cuts(group: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(pc.cast(group.column(value_col),
                                       pa.int64())))
        n = len(v)
        lo = int(v[max(int(np.ceil(lo_q * n)) - 1, 0)])
        hi = int(v[max(int(np.ceil(hi_q * n)) - 1, 0)])
        return pa.table({
            group_col: group.column(group_col).slice(0, 1),
            "lo": pa.array([lo], pa.int64()),
            "hi": pa.array([hi], pa.int64()),
        })

    cut_t = _to_table(ds.groupby(group_col).map_groups(
        cuts, batch_format="pyarrow"))
    gkeys = cut_t.column(group_col).combine_chunks()
    lo_v = np.asarray(cut_t.column("lo"), dtype=np.int64)
    hi_v = np.asarray(cut_t.column("hi"), dtype=np.int64)

    def clip(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(batch.column(group_col), gkeys.type),
                          value_set=gkeys)
        i = np.asarray(pc.fill_null(idx, -1).cast(pa.int64()),
                       dtype=np.int64)
        have = i >= 0
        x = np.asarray(pc.cast(batch.column(value_col), pa.int64()))
        clipped = np.clip(x, lo_v[np.maximum(i, 0)],
                          hi_v[np.maximum(i, 0)])
        return pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            value_col: batch.column(value_col),
            "clipped": pa.array(np.where(have, clipped, x), pa.int64()),
        }).filter(pa.array(have))

    return ds.map_batches(clip, batch_format="pyarrow")


def group_gini(ds, group_col: str, value_col: str, digits: int = 6):
    """Per-group Gini coefficient of a nonnegative value — the
    inequality-of-attention audit (is one source's length/traffic
    distribution dominated by a few giants?). Uses the sorted-index
    identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n with 1-based i over the
    ascending sort, which is tie-order invariant. Moments stay exact
    int64 (Σ i·x and Σ x as integers), so the single float division at
    the end is the only rounding site — order-independent and
    hash-stable against a SQL window-function oracle. One vectorized
    sort per group; O(groups) output rows."""

    def gini(group: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(pc.cast(group.column(value_col),
                                       pa.int64()), dtype=np.int64))
        n = len(v)
        s = int(v.sum())
        iw = int((np.arange(1, n + 1, dtype=np.int64) * v).sum())
        g = 2.0 * iw / (n * s) - (n + 1.0) / n if s > 0 else 0.0
        gr = float(pc.round(pa.scalar(g, pa.float64()), ndigits=digits,
                            round_mode="half_towards_infinity").as_py())
        return pa.table({
            group_col: group.column(group_col).slice(0, 1),
            "n": pa.array([n], pa.int64()),
            "gini": pa.array([gr], pa.float64()),
        })

    return (ds.groupby(group_col).map_groups(gini, batch_format="pyarrow")
            .sort(group_col))


# ------------------------------------------------------------ weighted median


def weighted_median(ds, group_col: str, value_col: str, weight_col: str):
    """Exact per-group weighted median: the smallest value v whose
    cumulative weight reaches half the group's total (2·cum ≥ tot —
    integer arithmetic, no float compare). Weights collapse to one
    (group, value) → Σweight row per block before the shuffle, so the
    wide step moves O(distinct values per group), not O(rows); the
    final cumsum-and-pick runs per group over that collapsed table.
    Values are compared, never added, so doubles stay exact."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            group_col: batch.column(group_col),
            "v": batch.column(value_col),
            "w": pc.cast(batch.column(weight_col), pa.int64()),
        })
        g = t.group_by([group_col, "v"]).aggregate([("w", "sum")])
        return g.rename_columns([group_col, "v", "w"])

    collapsed = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby([group_col, "v"]).sum("w")
                 .map_batches(lambda t: t.rename_columns(
                     [group_col, "v", "w"]), batch_format="pyarrow"))

    def pick(group: pa.Table) -> pa.Table:
        g = group.sort_by([("v", "ascending")])
        w = np.asarray(pc.cast(g.column("w"), pa.int64()), dtype=np.int64)
        cum = np.cumsum(w)
        i = int(np.searchsorted(2 * cum, cum[-1], side="left"))
        return pa.table({
            group_col: g.column(group_col).slice(0, 1),
            "wmedian": g.column("v").slice(i, 1),
        })

    from ..pipelines.analytics import _to_table

    return _to_table(collapsed.groupby(group_col).map_groups(
        pick, batch_format="pyarrow")).sort_by([(group_col, "ascending")])
