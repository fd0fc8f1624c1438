"""The "fetch" stage: frontier ⋈ pages lookup via a bucket-partitioned
page store.

In this engine fetching a URL means looking it up in the Common-Crawl-
style pages table (BASELINE.json input_hint). A naive
``frontier.join(pages)`` would shuffle the full 100 TB pages table
every crawl round; instead the store is hash-partitioned by url ONCE
(an index build — the analogue of the reference keeping its Mechanize
session/cache per agent, blind_agent.rb:5-6), and every round only the
buckets containing frontier URLs are read, with a parquet ``url in
(...)`` predicate pushed down to row groups.

Scaling: per-round I/O is O(|frontier| / |store|) of the corpus, the
per-bucket lookup is a ``groupby(bucket).map_groups`` (one task per
touched bucket), and bucket count is chosen so one bucket's parquet
fits a task's heap comfortably.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray

from ..support import complete_uri

FETCH_COLUMNS = ["url", "html"]


# Store layout version: bumped when the url→bucket hash changes (the
# bucket assignment is persisted in the store directory, so hash and
# layout must move together; a new tag ⇒ a fresh store build).
STORE_LAYOUT = "h2"


def _bucket_np(urls, num_buckets: int):
    """Vectorized url→bucket: one pandas hash_array call over the whole
    column (same stable siphash kernel the external shuffle keys on,
    stages/shuffle.py) — replaces the per-row Python md5 loop that
    dominated store builds."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(urls, dtype=object)
    if not len(arr):
        return np.empty(0, np.int64)
    return (pd.util.hash_array(arr) % num_buckets).astype(np.int64)


def url_bucket(url: str, num_buckets: int) -> int:
    return int(_bucket_np([url], num_buckets)[0])


def _bucket_array(urls, num_buckets: int) -> pa.Array:
    """urls: list/ndarray of str or a pyarrow (Chunked)Array."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if isinstance(urls, pa.Array):
        urls = urls.to_numpy(zero_copy_only=False)
    return pa.array(_bucket_np(urls, num_buckets), pa.int32())


def store_dir_for(pages_path: str, num_buckets: int) -> str:
    """Canonical page-store location for a corpus: keyed by corpus
    path, bucket count AND hash-layout version, so a hash change can
    never read a store partitioned under the old scheme."""
    key = hashlib.md5(os.path.abspath(pages_path).encode()).hexdigest()[:12]
    return f"/tmp/scrappy_ray_store/{key}-b{num_buckets}-{STORE_LAYOUT}"


def default_num_buckets(pages_path: str, target_rows_per_bucket: int = 2500) -> int:
    """Bucket count scaled to the corpus so a point lookup touches a
    bounded slice (~target rows) regardless of corpus size."""
    import glob

    import pyarrow.parquet as pq

    files = (
        glob.glob(os.path.join(pages_path, "**", "*.parquet"), recursive=True)
        if os.path.isdir(pages_path)
        else [pages_path]
    )
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    n = max(16, rows // target_rows_per_bucket)
    return 1 << (n - 1).bit_length()  # power of two


@ray.remote
def _compact_bucket(bucket_dir: str, row_group_size: int) -> int:
    """Sort one bucket by url and rewrite as a single small-row-group
    file — url min/max statistics then let `url isin (...)` lookups
    prune row groups instead of scanning the bucket."""
    import glob

    files = sorted(glob.glob(os.path.join(bucket_dir, "*.parquet")))
    if not files:
        return 0
    t = pa.concat_tables([pq.read_table(f) for f in files]).sort_by([("url", "ascending")])
    tmp = os.path.join(bucket_dir, "sorted.parquet.tmp")
    pq.write_table(t, tmp, row_group_size=row_group_size)
    for f in files:
        os.remove(f)
    os.replace(tmp, os.path.join(bucket_dir, "sorted.parquet"))
    return t.num_rows


def build_page_store(pages_path: str, store_dir: str, num_buckets: int = 64,
                     row_group_size: int = 512) -> str:
    """One-time hash-partition + per-bucket sort of the pages table —
    the crawl's fetch index. Streaming Ray Data job (read → add bucket
    → partitioned write), then one compaction task per bucket (sort by
    url, small row groups) so point lookups are row-group-pruned
    index reads, not bucket scans."""
    import ray.data
    import shutil

    # The marker records the hash-layout version + bucket count the
    # store was partitioned under. The default store_dir_for() path
    # embeds both, but an explicit cfg.store_dir survives layout bumps
    # — a stale-layout store must be rebuilt, not silently probed with
    # the new hash (lookups would hit the wrong bucket and pages would
    # quietly come back missing).
    done_marker = os.path.join(store_dir, "_DONE")
    marker_want = f"{STORE_LAYOUT}:{num_buckets}"
    if os.path.exists(done_marker):
        with open(done_marker) as f:
            got = f.read().strip()
        if got == marker_want:
            return store_dir
        shutil.rmtree(store_dir)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", _bucket_array(batch.column("url"), num_buckets)
        )

    ds = ray.data.read_parquet(pages_path)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["bucket"]
    )
    ray.get(
        [
            _compact_bucket.remote(os.path.join(store_dir, d), row_group_size)
            for d in os.listdir(store_dir)
            if d.startswith("bucket=")
        ]
    )
    with open(done_marker, "w") as f:
        f.write(marker_want)
    return store_dir


def _bucket_dir(store_dir: str, bucket: int) -> str:
    return os.path.join(store_dir, f"bucket={bucket}")


# per-process LRU of recently-read bucket datasets — the engine's
# analogue of the reference's bounded response cache
# (/root/reference/lib/scrappy/agent/cache.rb:20-39, 100 entries):
# repeated point lookups (robots.txt probes, small frontier batches)
# skip re-opening the same bucket's file metadata.
_BUCKET_CACHE: dict = {}
_BUCKET_CACHE_CAP = 100


def _bucket_dataset(store_dir: str, bucket: int):
    key = (store_dir, bucket)
    ds = _BUCKET_CACHE.pop(key, None)
    if ds is None:
        d = _bucket_dir(store_dir, bucket)
        ds = pads.dataset(d) if os.path.isdir(d) else False
    _BUCKET_CACHE[key] = ds  # reinsert → LRU order
    while len(_BUCKET_CACHE) > _BUCKET_CACHE_CAP:
        _BUCKET_CACHE.pop(next(iter(_BUCKET_CACHE)))
    return ds


def lookup_urls(store_dir: str, num_buckets: int, urls: list[str], columns=FETCH_COLUMNS) -> list[dict]:
    """Point lookup used by robots actors / small-round fetch."""
    out = []
    by_bucket: dict[int, list[str]] = {}
    for u, b in zip(urls, _bucket_np(urls, num_buckets)):
        by_bucket.setdefault(int(b), []).append(u)
    for b, us in by_bucket.items():
        ds = _bucket_dataset(store_dir, b)
        if ds is False:
            continue
        t = ds.to_table(columns=columns, filter=pc.field("url").isin(us))
        out.extend(t.to_pylist())
    return out


def make_fetch_group(store_dir: str):
    """``map_groups`` function over frontier grouped by bucket: reads
    the single touched bucket with a pushed-down url filter and
    left-joins html onto the frontier rows (miss ⇒ null html — the
    reference's non-HTML ⇒ empty-extraction path, agent.rb:231-237)."""

    def fetch_group(group: pa.Table) -> pa.Table:
        bucket = group.column("bucket")[0].as_py()
        curls = group.column("curl").to_pylist()
        d = _bucket_dir(store_dir, bucket)
        if os.path.isdir(d):
            pages = pads.dataset(d).to_table(
                columns=FETCH_COLUMNS, filter=pc.field("url").isin(list(set(curls)))
            )
        else:
            pages = pa.table({"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())})
        page_map = {u.as_py(): i for i, u in enumerate(pages.column("url"))}
        html_col = pages.column("html")
        htmls = [
            (html_col[page_map[u]].as_py() if u in page_map else None) for u in curls
        ]
        return group.drop_columns(["bucket"]).append_column("html", pa.array(htmls, pa.binary()))

    return fetch_group


def fetch_frontier_table(tbl: pa.Table, store_dir: str, num_buckets: int):
    """Small-round fetch over a DRIVER-RESIDENT frontier table: the
    driver bucket-partitions the rows (zero-copy slices of the
    bucket-sorted table, one Ray block per touched bucket) so each
    lookup task reads EXACTLY ONE bucket file with its full url list.

    Total bucket reads = O(touched buckets) — unlike a plain
    ``map_batches`` fetch where every task probes every bucket its
    batch hashes into (O(tasks × buckets) reads of the same files,
    measured NOT to scale: 3.3s@2cpu → 4.5s@8cpu on a 50k-url round).
    """
    import numpy as np
    import ray.data

    if tbl.num_rows == 0:
        return ray.data.from_arrow(tbl.append_column("html", pa.array([], pa.binary())))
    buckets = _bucket_np(tbl.column("curl").combine_chunks().to_numpy(zero_copy_only=False), num_buckets)
    order = np.argsort(buckets, kind="stable")
    srt = tbl.take(pa.array(order, pa.int64()))
    bs = buckets[order]
    edges = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1], True])
    blocks = []
    for i in range(len(edges) - 1):
        lo, hi = int(edges[i]), int(edges[i + 1])
        blk = srt.slice(lo, hi - lo)
        blocks.append(blk.append_column("bucket", pa.array([int(bs[lo])] * (hi - lo), pa.int32())))
    ds = ray.data.from_arrow(blocks)
    # batch_size=None → one whole block (= one bucket) per task
    return ds.map_batches(make_fetch_group(store_dir), batch_format="pyarrow", batch_size=None)


def fetch_frontier(frontier_ds, store_dir: str, num_buckets: int, shuffle: bool = True):
    """frontier Dataset (url, curl, depth, seq, ...) → + html column.

    ``shuffle=True`` (the at-scale path): repartition by url bucket so
    each task touches exactly one bucket file. ``shuffle=False`` (small
    rounds): plain map_batches where a task reads every bucket its
    batch's urls hash into — no shuffle fixed cost; right when the
    frontier round is far smaller than the bucket count × row-group
    size."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", _bucket_array(batch.column("curl"), num_buckets)
        )

    if shuffle:
        return (
            frontier_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(make_fetch_group(store_dir), batch_format="pyarrow")
        )

    def fetch_direct(batch: pa.Table) -> pa.Table:
        curls = batch.column("curl").to_pylist()
        found = {
            r["url"]: r["html"]
            for r in lookup_urls(store_dir, num_buckets, list(set(curls)))
        }
        htmls = [found.get(u) for u in curls]
        return batch.append_column("html", pa.array(htmls, pa.binary()))

    return frontier_ds.map_batches(fetch_direct, batch_format="pyarrow")
