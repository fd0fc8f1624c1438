"""External hash shuffle: key-partitioned parquet spill + per-bucket
Arrow reduce.

Ray 2.49's groupby/aggregate is a sort-based all-to-all with high
constants on many-small-group workloads (measured here: 55 s for a
60 MB / 1.9M-row distinct at 8 CPUs that Arrow's C++ hash aggregate
does in ~1 s). For reduce-by-key shapes that tolerate unordered
output (distinct, min/first per key) this module sidesteps the
all-to-all entirely:

  stage 1  map_batches: hash(key) % B → append each batch's rows to
           per-bucket parquet shards (the classic external shuffle
           spill; vectorized pandas hash_array, deterministic key)
  stage 2  one task per bucket: read the bucket's shards, reduce with
           an Arrow C++ kernel (group_by / sort+first), emit rows

Both stages are plain map tasks — they scale linearly with workers
and with ``num_buckets`` (the explicit partitioning unit: at 100 TB
raise B so a bucket fits a worker's heap; buckets are independent, so
a failed run can re-reduce only missing buckets). No stage holds more
than one bucket in memory; nothing funnels through the driver.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"


def _bucket_of(batch: pa.Table, key_cols: list[str], num_buckets: int) -> np.ndarray:
    """Deterministic per-row bucket: pandas hash_array (SipHash with a
    fixed key — stable across processes/machines, unlike Python's
    str hash) over the '\\x1f'-joined key columns."""
    import pandas as pd

    parts = [pc.cast(batch.column(c), pa.string()) for c in key_cols]
    if len(parts) == 1:
        key = parts[0]
    else:
        key = pc.binary_join_element_wise(*parts, _SEP)
    arr = key.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(key, pa.ChunkedArray) else key.to_numpy(zero_copy_only=False)
    return (pd.util.hash_array(arr.astype(object), categorize=False) % num_buckets).astype(np.int64)


def prepare_spill_dir(tmp_dir: str) -> str:
    """Clear stale spill from a killed run, create the dir.

    ``tmp_dir`` MUST be visible to every worker AND the driver: spill
    tasks write shards wherever they run and ``reduce_spill`` globs
    bucket dirs from the driver, so on a multi-node cluster the dir has
    to live on shared storage (NFS/Lustre/FUSE-mounted object store).
    A node-local path on a multi-node cluster would silently drop the
    shards written on other nodes — guarded here rather than at read
    time so a misconfigured run fails fast instead of losing data.
    Set SCRAPPY_SHUFFLE_SHARED_FS=1 to attest the path is shared.
    """
    import shutil

    try:
        import ray

        if (
            ray.is_initialized()
            and len([n for n in ray.nodes() if n.get("Alive")]) > 1
            and os.environ.get("SCRAPPY_SHUFFLE_SHARED_FS") != "1"
        ):
            raise RuntimeError(
                f"external-shuffle spill dir {tmp_dir!r} on a multi-node "
                "cluster requires shared storage; point it at a "
                "cluster-visible mount and set SCRAPPY_SHUFFLE_SHARED_FS=1"
            )
    except ImportError:  # pragma: no cover - ray is a hard dep in practice
        pass
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    return tmp_dir


def spill_table(batch: pa.Table, key_cols: list[str], tmp_dir: str,
                num_buckets: int = 32, select: list[str] | None = None,
                local_reduce_fn=None, dir_prefix: str = "bucket=") -> int:
    """Append one batch's rows to the per-bucket spill shards of
    ``tmp_dir`` (callable from inside ANY map stage — e.g. fused into
    an extraction job so links spill as a side effect of the pass that
    produced them, saving a separate job + re-read). Shard names are
    uuid-fresh, so a retried task leaves duplicate rows — callers must
    reduce with duplicate-insensitive kernels (min / distinct / first),
    which every user in this repo does. Returns rows spilled.

    ``dir_prefix`` without an '=' (e.g. "hb_") makes the layout safe to
    re-read with ray.data.read_parquet, which would otherwise hive-infer
    ``bucket`` as an extra partition column."""
    import pyarrow.parquet as pq

    if select is not None:
        batch = batch.select(select)
    if local_reduce_fn is not None and batch.num_rows:
        batch = local_reduce_fn(batch)
    if not batch.num_rows:
        return 0
    buckets = _bucket_of(batch, key_cols, num_buckets)
    shard = uuid.uuid4().hex[:12]
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = batch.take(pa.array(order, pa.int64()))
    sb = buckets[order]
    edges = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
    bounds = np.r_[edges, len(sb)]
    for i, start in enumerate(edges):
        end = bounds[i + 1]
        b = int(sb[start])
        d = os.path.join(tmp_dir, f"{dir_prefix}{b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sorted_tbl.slice(start, end - start), os.path.join(d, f"{shard}.parquet"))
    return batch.num_rows


def reduce_spill(tmp_dir: str, reduce_fn, dir_prefix: str = "bucket=",
                 bucket_post_fn=None):
    """Stage 2 alone: one task per existing spill bucket, each reduced
    with ``reduce_fn`` at Arrow C++ speed. ``bucket_post_fn`` (if set)
    runs ONCE per bucket on the reduced table — the fusion point for
    per-key follow-up stages (e.g. seen-set marking at one actor RPC
    per bucket instead of a separate map stage per 32k-row batch).
    Unlike ``reduce_fn`` it is NOT applied as a local combiner, so it
    may be stateful/effectful per key. CAVEAT (same contract as a
    map-stage equivalent): a Ray-retried bucket task re-runs the post
    fn for that bucket's keys, so an effectful post fn must tolerate
    at-least-once execution (the crawl's seen-mark accepts this: a
    re-marked url reads as already-seen and is dropped — the same
    behavior a retried _SeenMark map task had before the fusion).
    Returns a (lazy) Dataset — the caller owns ``tmp_dir`` cleanup
    after consuming it."""
    import ray.data

    bucket_dirs = sorted(glob.glob(os.path.join(tmp_dir, f"{dir_prefix}*")))
    if not bucket_dirs:
        return None

    def reduce_bucket(batch) -> pa.Table:
        import pyarrow.dataset as pads

        tables = []
        for d in batch["dir"]:
            t = pads.dataset(str(d)).to_table()
            if t.num_rows:
                t = reduce_fn(t)
                if bucket_post_fn is not None:
                    t = bucket_post_fn(t)
                tables.append(t)
        if not tables:
            t = pads.dataset(str(batch["dir"][0])).to_table()
            return t.slice(0, 0)
        return pa.concat_tables(tables).combine_chunks()

    return ray.data.from_items([{"dir": d} for d in bucket_dirs]).map_batches(
        reduce_bucket, batch_size=1, batch_format="numpy"
    )


def hash_partition_reduce(ds, key_cols: list[str], reduce_fn, tmp_dir: str,
                          num_buckets: int = 32, select: list[str] | None = None,
                          local_reduce: bool = False, bucket_post_fn=None):
    """Generic two-stage external shuffle-reduce.

    ``reduce_fn(table) -> table`` runs ONCE per bucket over all of the
    bucket's rows (Arrow C++ speed); it must be insensitive to row
    order across shards. Returns a Dataset of the concatenated reduce
    outputs (unordered across buckets — sort downstream if needed).
    ``local_reduce=True`` additionally applies ``reduce_fn`` per batch
    before spilling (a combiner — only pays when keys repeat within
    batches). The caller owns ``tmp_dir`` cleanup after consuming the
    result (the returned Dataset lazily reads the spill files).
    """
    import ray.data

    prepare_spill_dir(tmp_dir)

    def spill(batch: pa.Table) -> pa.Table:
        n = spill_table(batch, key_cols, tmp_dir, num_buckets, select,
                        reduce_fn if local_reduce else None)
        return pa.table({"rows": pa.array([n], pa.int64())})

    ds.map_batches(spill, batch_format="pyarrow").count()  # execute stage 1

    out = reduce_spill(tmp_dir, reduce_fn, bucket_post_fn=bucket_post_fn)
    if out is None:
        # Empty input: reproduce the real reduce-output schema so
        # downstream unions don't see every column degraded to string
        # (a zero-link crawl round unioned with deferred int frontier
        # rows would otherwise fail or corrupt the frontier schema).
        # select=None means reduce_fn sees FULL rows — give it the full
        # dataset schema, not just the key columns (a mark-style
        # reduce_fn reads/creates non-key columns even on empty input).
        empty = _empty_like(ds, select, fallback_cols=key_cols)
        try:
            empty = reduce_fn(empty)
            if bucket_post_fn is not None:
                empty = bucket_post_fn(empty)
        except Exception:
            import logging

            logging.getLogger(__name__).warning(
                "hash_partition_reduce: reduce_fn rejected the empty-input "
                "schema probe; returning the un-reduced empty schema "
                "(downstream consumers of reduce-added columns will fail)",
                exc_info=True,
            )
        return ray.data.from_arrow(empty)
    return out


def _empty_like(ds, cols: list[str] | None, fallback_cols: list[str] | None = None) -> pa.Table:
    """Zero-row table with ``cols`` (or, when None, ALL of ``ds``'s
    columns) typed from ``ds``'s schema; string fallback only when the
    schema is genuinely unknowable."""
    try:
        sch = ds.schema(fetch_if_missing=True)
        base = getattr(sch, "base_schema", None) or sch
        if isinstance(base, pa.Schema):
            names = list(base.names) if cols is None else cols
            have = set(base.names)
            if all(c in have for c in names):
                return pa.table(
                    {c: pa.array([], base.field(c).type) for c in names}
                )
    except Exception:
        pass
    return pa.table({c: pa.array([], pa.string()) for c in (cols or fallback_cols or [])})


def hash_distinct(ds, cols: list[str], tmp_dir: str, num_buckets: int = 32,
                  local_reduce: bool = True):
    """DISTINCT ``cols`` via the external hash shuffle (unordered)."""

    def distinct(t: pa.Table) -> pa.Table:
        return t.group_by(cols).aggregate([])

    return hash_partition_reduce(ds, cols, distinct, tmp_dir,
                                 num_buckets=num_buckets, select=cols,
                                 local_reduce=local_reduce)


def hash_first_by_key(ds, key_col: str, order_col: str, payload_cols: list[str],
                      tmp_dir: str, num_buckets: int = 32):
    """Min-``order_col`` row per ``key_col`` (first-wins) via the
    external hash shuffle; returns (key, *payload) columns unordered.
    The Arrow reduce is sort + boundary mask — no per-group Python."""
    out_cols = [key_col] + payload_cols

    def first(t: pa.Table) -> pa.Table:
        srt = t.sort_by([(key_col, "ascending"), (order_col, "ascending")])
        keys = srt.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        k = keys.to_numpy(zero_copy_only=False)
        firstmask = np.ones(len(k), bool)
        if len(k):
            firstmask[1:] = k[1:] != k[:-1]
        return srt.filter(pa.array(firstmask)).select([key_col, order_col] + payload_cols)

    red = hash_partition_reduce(ds, [key_col], first, tmp_dir,
                                num_buckets=num_buckets,
                                select=[key_col, order_col] + payload_cols,
                                local_reduce=True)
    return red.map_batches(lambda b: b.select(out_cols), batch_format="pyarrow")
