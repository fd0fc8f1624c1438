"""The BFS-superstep crawl driver (Ray-Data-native §3.1 re-architecture).

Each round is a Dataset pipeline::

    frontier_r (parquet)
      → politeness split   groupby(host).map_groups + token-bucket actors
      → fetch              groupby(bucket).map_groups over the page store
      → extract            map_batches(ExtractPages actor pool, Arrow)
      → checkpoint         write round=r/extraction parquet
    links(round=r)
      → explode            map_batches (Arrow list flatten)
      → in-round dedup     groupby(url,depth).map_groups(min seq)   [shuffle]
      → robots filter      map_batches + robots cache actors
      → seen anti-join     map_batches + sharded seen-set actors
      → order + seq        sort(parent_seq, link_idx) + block prefix-sum
      → frontier_{r+1}     union(deferred) → parquet checkpoint

Determinism: the executed order (round, seq) is identical to the
single-threaded simulator (crawl/simulator.py) at ANY parallelism —
verified by tests/test_crawl.py — and with politeness off equals the
reference's workers=1 FIFO order (agent.rb / map_reduce.rb)."""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.extract_stage import make_extract_fn
from ..stages.fetch import build_page_store, fetch_frontier, fetch_frontier_table
from ..stages.seq import add_global_seq
from ..state.politeness import HostBudgetPool
from ..state.robots import RobotsCachePool
from ..state.seen import SeenSetPool, shard_of
from ..support import complete_uri, host_of
from . import checkpoint as ckpt
from .priority import DEFAULT_PRIORITY_FN, priority_arrow, priority_py

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("curl", pa.string()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("host", pa.string()),
        ("priority", pa.float64()),
    ]
)


@dataclass
class CrawlConfig:
    pages_path: str
    kb_yaml: str
    seeds: list[str]
    ckpt_dir: str
    depth: int = -1
    num_buckets: int = 16
    seen_shards: int = 4
    seen_mode: str = "exact"  # "cuckoo" / "bloom" for the 10^10 design point
    seen_capacity_per_shard: int = 1_000_000
    url_only_seen: bool = False
    host_budget: float | None = None  # items per host per round (None = off)
    budget_shards: int = 2
    # robots Crawl-delay → per-host politeness rate: with a nominal
    # round duration of S seconds, a host declaring Crawl-delay d gets
    # rate min(host_budget, max(1, S/d)) items/round. 0 = off (default;
    # requires robots=True and host_budget to act). Overrides can only
    # SLOW a host below the global budget, never exceed it.
    robots_delay_round_s: float = 0.0
    # rounds with ≤ this many frontier/link rows take the driver-side
    # fast path (no shuffle fixed costs); larger rounds use the full
    # Dataset shuffle pipeline. Both paths are semantically identical
    # (tests force threshold=0 to prove it).
    small_round_threshold: int = 100_000
    # rounds with ≤ this many urls run fetch+extract IN the driver
    # process (page-store point lookup + the same extract fn): below
    # ~400 urls a Ray Dataset job's fixed launch cost exceeds the
    # whole round's compute. 0 disables (tests prove path equality).
    driver_round_threshold: int = 400
    robots: bool = False
    robots_shards: int = 2
    # distributed rounds persist the next frontier ALREADY partitioned
    # by hash(host) into this many bucket dirs ("hb_N/"). Politeness
    # marking then needs NO per-round spill job and NO marked-parquet
    # write: each consumer lazily reads whole host buckets and applies
    # the vectorized rank-mark in its own pipeline. This is the fixed
    # per-round Dataset-job-count reduction (the measured ~11 s/round
    # launch overhead at 32 CPUs was the residual 8→32 scaling gap).
    mark_buckets: int = 32
    # frontier scheduling order. "fifo" (default) = the reference's
    # queue semantics (map_reduce.rb:22-29): within a round, per-host
    # grants go to the lowest discovery seq. "priority" = the
    # north_star's priority frontier: rows carry a float64 priority
    # (priority_fn over url/depth, computed at discovery) and both the
    # per-host grant ranking and the optional global round_budget
    # select by (priority desc, seq asc).
    frontier_order: str = "fifo"
    priority_fn: str = "short_url"
    # global cap on executions per round (None = off). In priority
    # mode this is what makes the frontier a real priority queue: each
    # superstep pops the globally best ``round_budget`` granted rows
    # and defers the rest (they keep seq + priority and re-compete).
    round_budget: int | None = None
    max_rounds: int = 200
    extract_concurrency: int = 4
    extract_batch_size: int = 64
    referenceable: bool = False
    # page store location override; default derives from pages_path so
    # repeated crawls of the same corpus reuse the one-time index build
    store_dir: str | None = None
    # finalize (schedule/text/triples rollup) takes a driver-side
    # vectorized-Arrow path while the extraction outputs fit comfortably
    # in driver memory, and the Dataset shuffle path above that. Same
    # adaptive small/shuffle design as the round loop; both paths are
    # parity-tested. Ray's sort-based groupby costs ~25× the Arrow
    # group_by at sub-GB scale (measured: 30.8s vs 1.2s on 788k triples).
    finalize_small_bytes: int = 2 << 30


@dataclass
class CrawlResult:
    ckpt_dir: str
    rounds: int
    manifest: dict
    schedule_path: str
    triples_path: str
    text_path: str

    def schedule_table(self) -> pa.Table:
        import pyarrow.dataset as pads

        return pads.dataset(self.schedule_path).to_table().sort_by([("seq", "ascending")])


def _frontier_table(items: list[dict], priority_fn: str = DEFAULT_PRIORITY_FN) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([i["url"] for i in items], pa.string()),
            "curl": pa.array([complete_uri(i["url"]) for i in items], pa.string()),
            "depth": pa.array([i["depth"] for i in items], pa.int32()),
            "seq": pa.array([i["seq"] for i in items], pa.int64()),
            "host": pa.array([host_of(complete_uri(i["url"])) for i in items], pa.string()),
            "priority": pa.array(
                [priority_py(priority_fn, i["url"], i["depth"]) for i in items], pa.float64()
            ),
        }
    )


def _make_mark_exec_bucket(grants_ref, order: str = "fifo"):
    """Politeness mark for one host-hash bucket (MANY hosts at once):
    execute each host's first ``grants[host]`` items, ranked in seq
    order (fifo) or (priority desc, seq) order (priority mode).
    Fully vectorized — numpy rank-within-host over the bucket, the
    same kernel as the driver-side small path — with the grant table
    precomputed ONCE per round (one batched RPC per budget shard) and
    broadcast via ray.put. No per-host Python, no per-host RPCs."""
    import numpy as np

    from ..common import cached_get

    sort_keys = (
        [("host", "ascending"), ("seq", "ascending")]
        if order == "fifo"
        else [("host", "ascending"), ("priority", "descending"), ("seq", "ascending")]
    )

    def mark_exec(tbl: pa.Table) -> pa.Table:
        srt = tbl.sort_by(sort_keys)
        # A retried spill task leaves duplicate rows in the bucket
        # (spill_table's documented contract is duplicate-insensitive
        # reduces only). Frontier rows are unique by seq, so dupes are
        # identical rows sitting adjacent after the sort — drop them
        # before ranking, else each copy gets marked and fetched.
        seqs = srt.column("seq")
        if isinstance(seqs, pa.ChunkedArray):
            seqs = seqs.combine_chunks()
        sq = seqs.to_numpy(zero_copy_only=False)
        if len(sq):
            keep = np.ones(len(sq), bool)
            keep[1:] = sq[1:] != sq[:-1]
            if not keep.all():
                srt = srt.filter(pa.array(keep))
        hosts = srt.column("host")
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        h = hosts.to_numpy(zero_copy_only=False)
        n = len(h)
        if not n:
            return srt.append_column("exec", pa.array([], pa.bool_()))
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        ranks = np.arange(n, dtype=np.int64) - np.repeat(starts, np.diff(np.r_[starts, n]))
        grants = cached_get(grants_ref)
        limits = np.array([grants.get(h[s], 0) for s in starts], np.int64)
        mask = ranks < np.repeat(limits, np.diff(np.r_[starts, n]))
        return srt.append_column("exec", pa.array(mask))

    return mark_exec


def _order_sort_keys(order: str) -> list:
    """Round-budget selection key: FIFO = discovery order; priority
    mode = best priority first, discovery order within ties."""
    return (
        [("seq", "ascending")]
        if order == "fifo"
        else [("priority", "descending"), ("seq", "ascending")]
    )


def _topk_table(tbl: pa.Table, k: int, order: str) -> tuple[pa.Table, pa.Table]:
    """(exec top-k, deferred rest) of a driver-resident frontier table."""
    srt = tbl.sort_by(_order_sort_keys(order))
    return srt.slice(0, k), srt.slice(k)


@ray.remote
def _merge_partial_topk(k: int, order: str, *tables: pa.Table):
    """Worker-side merge of per-block partial top-Ks: returns the
    GLOBAL top-k's seq identifiers as a sorted int64 numpy array (the
    broadcastable keep-set — 8 bytes/row, never the full rows)."""
    import numpy as np

    # filtered upstreams can emit schema-less empty blocks (Ray 2.49);
    # drop them before concat or the schemas mismatch
    tables = [t for t in tables if t.num_columns]
    if not tables:
        return np.empty(0, np.int64)
    merged = pa.concat_tables(tables).sort_by(_order_sort_keys(order))
    seqs = merged.column("seq").combine_chunks().to_numpy(zero_copy_only=False)
    return np.sort(seqs[:k].astype(np.int64))


def _round_topk_keep(exec_ds, k: int, order: str):
    """Distributed round-budget selection: per-block partial top-K of
    the NARROW (seq, priority) projection, then ONE worker task merges
    the ≤ blocks×K partial rows and returns the keep-set ref. Nothing
    funnels through the driver; the keep-set is K int64s, broadcast
    once. (If K×blocks ever outgrows one merge task, raise the block
    size or pre-merge per spill bucket — documented scale knob.)"""

    def partial(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({"seq": pa.array([], pa.int64()), "priority": pa.array([], pa.float64())})
        return batch.select(["seq", "priority"]).sort_by(_order_sort_keys(order)).slice(0, k)

    parts = exec_ds.map_batches(partial, batch_format="pyarrow").materialize()
    refs = parts.to_arrow_refs()
    return _merge_partial_topk.remote(k, order, *refs)


def _seq_member_mask(sq, keep_arr):
    """Vectorized membership of seq values in a SORTED int64 keep-set
    (searchsorted — no per-batch hash-set build)."""
    import numpy as np

    if len(keep_arr):
        idx = np.searchsorted(keep_arr, sq)
        idx[idx == len(keep_arr)] = len(keep_arr) - 1
        return keep_arr[idx] == sq
    return np.zeros(len(sq), bool)


def _make_seq_member_filter(keep_ref, keep: bool):
    """Filter batches by membership of seq in the broadcast keep-set."""
    import numpy as np

    from ..common import cached_get

    def member_filter(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        keep_arr = cached_get(keep_ref)
        sq = batch.column("seq").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        member = _seq_member_mask(sq, keep_arr)
        return batch.filter(pa.array(member if keep else ~member))

    return member_filter


@ray.remote
def _bucket_granted_topk(bucket_dir: str, grants_ref_cell: list, order: str, k: int) -> pa.Table:
    """Phase A of the fused budget-overflow round: rank-mark ONE
    host-hash bucket from a NARROW (host, seq, priority) scan and
    return its granted rows' bucket-local top-K of (seq, priority).
    The full-row pass (phase B) re-marks and spills — this pass only
    feeds the global keep-set merge, so it never touches url/curl.
    ``grants_ref_cell`` is a 1-list wrapping the grants ObjectRef (bare
    refs in task args get auto-resolved; the mark kernel expects the
    ref for its per-process cached_get)."""
    import pyarrow.dataset as pads

    t = pads.dataset(bucket_dir).to_table(columns=["host", "seq", "priority"])
    marked = _make_mark_exec_bucket(grants_ref_cell[0], order)(t)
    granted = marked.filter(marked.column("exec"))
    return granted.select(["seq", "priority"]).sort_by(_order_sort_keys(order)).slice(0, k)


def _bucket_topk_keep(fdir: str, grants_ref, order: str, k: int):
    """Global round-budget keep-set over a bucketed frontier: one
    narrow rank-mark + partial-top-K task per hb_ bucket, one merge
    task — no shuffle, no full-row read, keep-set is K int64s."""
    import glob

    bucket_dirs = sorted(glob.glob(os.path.join(fdir, "hb_*")))
    parts = [_bucket_granted_topk.remote(d, [grants_ref], order, k) for d in bucket_dirs]
    return _merge_partial_topk.remote(k, order, *parts)


@ray.remote
def _file_host_counts(path: str) -> dict:
    """value_counts of one frontier file's host column (remote task)."""
    import pyarrow.parquet as pq

    col = pq.read_table(path, columns=["host"]).column("host").combine_chunks()
    vc = pc.value_counts(col)
    return dict(zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()))


@ray.remote
def _bucket_host_counts(bucket_dir: str) -> dict:
    """value_counts of one BUCKETED frontier dir's host column, deduped
    by seq first: a retried spill task (or a re-executed lazy plan with
    the fused mark's defer-spill side effect) leaves duplicate rows in
    hb_N dirs, and grant/threshold arithmetic must count items, not
    shards. A seq's host is fixed, so per-bucket dedup is global dedup."""
    import numpy as np
    import pyarrow.dataset as pads

    t = pads.dataset(bucket_dir).to_table(columns=["host", "seq"])
    if not t.num_rows:
        return {}
    seqs = t.column("seq").combine_chunks().to_numpy(zero_copy_only=False)
    uniq, idx = np.unique(seqs, return_index=True)
    host = t.column("host").combine_chunks()
    if len(uniq) != len(seqs):
        host = host.take(pa.array(idx, pa.int64()))
    vc = pc.value_counts(host)
    return dict(zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()))


def _host_counts(fdir: str) -> dict[str, int]:
    """Per-host frontier counts: one remote value_counts task per flat
    frontier file / per hb_ bucket dir (seq-deduped), merged on the
    driver. Driver work is O(distinct hosts × files) — never O(frontier
    rows) — so the per-round grant table stays the small side at a
    10^10-row frontier."""
    import glob

    flat = sorted(glob.glob(os.path.join(fdir, "*.parquet")))
    hb = sorted(glob.glob(os.path.join(fdir, "hb_*")))
    partials = ray.get(
        [_file_host_counts.remote(f) for f in flat]
        + [_bucket_host_counts.remote(b) for b in hb]
    )
    counts: dict[str, int] = {}
    for d in partials:
        for h, c in d.items():
            counts[h] = counts.get(h, 0) + int(c)
    return counts


class _SeenMark:
    def __init__(self, pool: SeenSetPool, url_only: bool):
        self.pool = pool
        self.url_only = url_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self.pool.mark_new_table(batch, self.url_only)
        return batch.filter(pa.array(mask))


class _RobotsFilter:
    def __init__(self, pool: RobotsCachePool):
        self.pool = pool

    def __call__(self, batch: pa.Table) -> pa.Table:
        curls = [complete_uri(u) for u in batch.column("url").to_pylist()]
        mask = self.pool.allowed(curls)
        return batch.filter(pa.array(mask, pa.bool_()))


# (parent_seq, link_idx) packed into one int64 discovery key: min(enc)
# per (url, depth) IS first-wins dedup, and sorting by enc IS the
# (parent_seq, link_idx) order — so the shuffle path's in-round dedup
# is a fully-vectorized hash AGGREGATE (no per-group Python across
# millions of tiny groups) and its ordering sort is single-column.
_ENC_BITS = 20  # link_idx < 2^20 per document


def _explode_links(batch: pa.Table) -> pa.Table:
    """extraction rows (seq, links) → candidate rows (url, depth, enc).
    Fully vectorized: pc.list_flatten + np.repeat — no per-row Python
    (this IS the at-scale path; the driver-side small path reuses it)."""
    import numpy as np

    links_col = batch.column("links")
    if isinstance(links_col, pa.ChunkedArray):
        links_col = links_col.combine_chunks()
    lengths = pc.list_value_length(links_col).fill_null(0)
    lens = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(lens.sum())
    if not total:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "depth": pa.array([], pa.int32()),
                "enc": pa.array([], pa.int64()),
            }
        )
    seq_col = batch.column("seq")
    if isinstance(seq_col, pa.ChunkedArray):
        seq_col = seq_col.combine_chunks()
    parent_seq = np.repeat(seq_col.to_numpy(zero_copy_only=False).astype(np.int64), lens)
    # per-parent 0..len-1 index: global arange minus each row's start offset
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    link_idx = np.arange(total, dtype=np.int64) - starts
    flat = pc.list_flatten(links_col)
    return pa.table(
        {
            "url": pc.cast(flat.field("url"), pa.string()),
            "depth": pc.cast(flat.field("depth"), pa.int32()),
            "enc": pa.array((parent_seq << _ENC_BITS) + link_idx, pa.int64()),
        }
    )


def _local_min_enc(batch: pa.Table) -> pa.Table:
    """Block-local first-wins combiner: min(enc) per (url, depth)
    inside the block (Arrow C++ hash aggregate) — semantics-preserving
    (min of block minima == global min) pre-aggregation that shrinks
    the global groupby's all-to-all exchange."""
    if not batch.num_rows:
        return batch
    out = batch.group_by(["url", "depth"]).aggregate([("enc", "min")])
    return out.rename_columns(["url", "depth", "enc"])


def _decode_enc(batch: pa.Table) -> pa.Table:
    """enc → (parent_seq, link_idx) columns (vectorized bit ops)."""
    enc = batch.column("enc")
    parent_seq = pc.shift_right(enc, _ENC_BITS)
    link_idx = pc.cast(pc.bit_wise_and(enc, (1 << _ENC_BITS) - 1), pa.int32())
    return batch.append_column("parent_seq", parent_seq).append_column("link_idx", link_idx)


def _links_small_path(edir: str, nfdir: str, seen, robots, cfg, next_seq: int, defer_tbl) -> int:
    """Driver-side link → frontier processing for small rounds:
    identical semantics to the Dataset shuffle path (in-round
    first-wins dedup → robots → seen anti-join → sort → global seq)
    without its per-round shuffle fixed costs."""
    import numpy as np
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    t = pads.dataset(edir).to_table(columns=["seq", "links"])
    cand = _explode_links(t)  # same vectorized kernel as the shuffle path
    if cand.num_rows:
        # first-wins dedup: min enc per (url, depth)
        dedup = cand.group_by(["url", "depth"]).aggregate([("enc", "min")])
        dedup = dedup.sort_by([("enc_min", "ascending")])
        items = list(
            zip(
                (np.asarray(dedup.column("enc_min")) >> _ENC_BITS).tolist(),
                (np.asarray(dedup.column("enc_min")) & ((1 << _ENC_BITS) - 1)).tolist(),
                dedup.column("url").to_pylist(),
                dedup.column("depth").to_pylist(),
            )
        )
    else:
        items = []
    if robots is not None and items:
        mask = robots.allowed([complete_uri(u) for _, _, u, _ in items])
        items = [it for it, ok in zip(items, mask) if ok]
    if items:
        mask = seen.mark_new([u for _, _, u, _ in items], [d for _, _, _, d in items], cfg.url_only_seen)
        items = [it for it, ok in zip(items, mask) if ok]
    rows = [
        {"url": u, "depth": d, "seq": next_seq + i}
        for i, (_, _, u, d) in enumerate(items)
    ]
    new_tbl = _frontier_table(rows, cfg.priority_fn)
    if defer_tbl is not None and defer_tbl.num_rows:
        new_tbl = pa.concat_tables([defer_tbl.select(new_tbl.column_names), new_tbl])
    os.makedirs(nfdir, exist_ok=True)
    pq.write_table(new_tbl, os.path.join(nfdir, "part-0.parquet"))
    return next_seq + len(rows)


def _finish_frontier(batch: pa.Table, priority_fn: str = DEFAULT_PRIORITY_FN) -> pa.Table:
    """(url, depth, seq) → frontier schema rows. Vectorized for the
    overwhelming case (absolute scheme://host URLs after link
    completion): host via one Arrow regex extract; rows the fast path
    can't classify fall back to the exact Python helpers
    (complete_uri / urlparse host_of) so semantics are byte-identical."""
    urls = batch.column("url")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    urls = pc.cast(urls, pa.string())
    has_scheme = pc.fill_null(pc.match_substring_regex(urls, r"^\w*:"), False)
    if pc.all(has_scheme).as_py() if batch.num_rows else True:
        curls = urls
    else:
        curls = pa.array([complete_uri(u) for u in urls.to_pylist()], pa.string())
    ex = pc.extract_regex(curls, r"^(?P<scheme>[^:/?#]+)://(?P<host>[^/?#]*)")
    hosts = pc.utf8_lower(pc.struct_field(ex, "host"))
    if hosts.null_count:  # no '://' → urlparse fallback per odd row
        fixed = [
            host_of(c) if h is None else h
            for c, h in zip(curls.to_pylist(), hosts.to_pylist())
        ]
        hosts = pa.array(fixed, pa.string())
    return pa.table(
        {
            "url": batch.column("url"),
            "curl": curls,
            "depth": batch.column("depth"),
            "seq": batch.column("seq"),
            "host": pc.cast(hosts, pa.string()),
            "priority": priority_arrow(priority_fn, urls, batch.column("depth")),
        }
    )


def _frontier_files(d: str) -> list[str]:
    """Frontier parquet files — flat (small-path part-0) or host-hash
    bucketed (``hb_N/shard.parquet``, distributed rounds)."""
    import glob

    return sorted(
        glob.glob(os.path.join(d, "*.parquet"))
        + glob.glob(os.path.join(d, "hb_*", "*.parquet"))
    )


def _read_frontier_table(fdir: str) -> pa.Table:
    """Whole frontier as one Arrow table (driver small paths), deduped
    by seq: a retried spill task leaves duplicate rows in bucketed
    frontier dirs (spill_table's uuid-shard contract); frontier rows
    are unique by seq with identical payloads, so keep one per seq —
    the same idempotence rule the distributed mark applies."""
    import numpy as np
    import pyarrow.dataset as pads

    t = pads.dataset(_frontier_files(fdir)).to_table()
    if t.num_rows:
        seqs = t.column("seq").combine_chunks().to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(seqs, return_index=True)
        if len(uniq) != len(seqs):
            t = t.take(pa.array(np.sort(idx), pa.int64()))
    return t


def _make_mark_defer_spill(grants_ref, order: str, nfdir: str, mark_buckets: int,
                           keep_ref=None):
    """Politeness mark for one WHOLE host-hash bucket of an
    already-bucketed frontier (the fused path): apply the vectorized
    rank-mark, spill the deferred rows STRAIGHT into the next round's
    frontier buckets (same host hash ⇒ same bucket layout), and return
    the granted rows — which stream on into the fetch job. No mark
    shuffle, no marked-parquet write, no defer union: two whole
    Dataset-job launches per round cheaper than the fallback.

    ``keep_ref`` (budget-overflow rounds) is the broadcast global
    round-budget keep-set: exec additionally requires seq ∈ keep, and
    granted-but-over-budget rows defer with everything else — the
    rank-mark and the top-K selection share this one pass per bucket."""
    import numpy as np

    from ..common import cached_get
    from ..stages.shuffle import spill_table

    mark = _make_mark_exec_bucket(grants_ref, order)

    def mark_bucket(tbl: pa.Table) -> pa.Table:
        marked = mark(tbl)
        mask = marked.column("exec")
        if keep_ref is not None and marked.num_rows:
            keep_arr = cached_get(keep_ref)
            sq = marked.column("seq").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            mask = pc.and_(mask, pa.array(_seq_member_mask(sq, keep_arr)))
        defer = marked.filter(pc.invert(mask)).drop_columns(["exec"])
        if defer.num_rows:
            spill_table(defer, ["host"], nfdir, mark_buckets, dir_prefix="hb_")
        return marked.filter(mask).drop_columns(["exec"])

    return mark_bucket


@ray.remote
def _finish_write_block(tbl: pa.Table, offset: int, nfdir: str, priority_fn: str,
                        bucketed: bool, num_buckets: int) -> int:
    """One sorted links block → seq-stamped frontier rows → written.
    Flat writes are offset-named (idempotent under task retry);
    bucketed spills are uuid-named and deduped by seq downstream."""
    import pyarrow.parquet as pq

    from ..stages.shuffle import spill_table

    if "seq" in tbl.column_names:
        tbl = tbl.drop_columns(["seq"])
    tbl = tbl.append_column("seq", pa.array(range(offset, offset + tbl.num_rows), pa.int64()))
    out = _finish_frontier(tbl, priority_fn)
    if bucketed:
        spill_table(out, ["host"], nfdir, num_buckets, dir_prefix="hb_")
    else:
        pq.write_table(out, os.path.join(nfdir, f"part-{offset:012d}.parquet"))
    return out.num_rows


_SEQ_TIMINGS: dict = {}


def _seq_finish_write(links_ds, start: int, nfdir: str, priority_fn: str,
                      bucketed: bool, num_buckets: int) -> int:
    """Global-seq assignment + frontier completion + frontier WRITE
    fused into the seq tasks themselves: the sorted links Dataset is
    materialized once, block offsets come from the same block-prefix-sum
    scheme as stages/seq.add_global_seq, and each block is stamped,
    finished and written by one plain ray.remote task — saving the
    whole materialize→map_batches→write_parquet Dataset-job launch the
    unfused path pays every round. Returns next_seq."""
    from ..stages.seq import _block_meta

    os.makedirs(nfdir, exist_ok=True)
    t0 = time.perf_counter()
    refs = links_ds.materialize().to_arrow_refs()
    t1 = time.perf_counter()
    metas = ray.get([_block_meta.remote(r, ("enc",)) for r in refs])
    order = sorted((i for i in range(len(refs)) if metas[i][1] > 0), key=lambda i: metas[i][0])
    futures = []
    offset = start
    for i in order:
        futures.append(
            _finish_write_block.remote(refs[i], offset, nfdir, priority_fn, bucketed, num_buckets)
        )
        offset += metas[i][1]
    ray.get(futures)
    # per-round profile surfaced in the manifest (scaling diagnosis):
    # mat = reduce→robots→seen→sort pipeline execution, write = seq
    # stamp + frontier finish + parquet write
    _SEQ_TIMINGS.update(mat_s=round(t1 - t0, 4),
                        write_s=round(time.perf_counter() - t1, 4))
    return offset


@ray.remote
def _bucket_distinct_seq(bucket_dir: str) -> int:
    """Distinct seq count of one hb_ bucket dir (narrow int64 scan) —
    footer row counts over-count when a retried spill task left
    duplicate shards."""
    import numpy as np
    import pyarrow.dataset as pads

    t = pads.dataset(bucket_dir).to_table(columns=["seq"])
    if not t.num_rows:
        return 0
    return len(np.unique(t.column("seq").combine_chunks().to_numpy(zero_copy_only=False)))


def _parquet_rows(d: str) -> int:
    """Frontier item count: parquet footers for flat files (written
    once by the driver/write_parquet), distinct-seq for hb_ bucket dirs
    (retry-duplicated shards must not inflate n_ready, the grant
    arithmetic, or the small/distributed threshold choice)."""
    import glob

    import pyarrow.parquet as pq

    n = sum(
        pq.read_metadata(f).num_rows
        for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
    )
    hb = sorted(glob.glob(os.path.join(d, "hb_*")))
    if hb:
        n += sum(ray.get([_bucket_distinct_seq.remote(b) for b in hb]))
    return n


def _links_driver_cutoff(cfg: CrawlConfig) -> int:
    """Executed-count cutoff below which the round's link processing
    stays driver-side: scales DOWN with cluster CPUs (the distributed
    path's fixed cost amortizes faster the more workers there are),
    never above the round threshold itself."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    return min(cfg.small_round_threshold,
               max(20_000, 1_000_000 // max(ncpu, 1)))


def _maybe_warm_extract_workers(cfg: CrawlConfig):
    """Fire-and-forget KB-compile warmup across the worker pool: one
    1-row extraction task per CPU (html=None → the cheap fetched=False
    path) run on a daemon thread, so worker processes compile the KB
    concurrently with the seed rounds instead of all at once on the
    first big round's critical path."""
    import threading

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        return
    if ncpu < 8:
        return

    def _warm():
        try:
            fn = make_extract_fn(cfg.kb_yaml, cfg.referenceable)
            tbl = pa.table({
                "url": pa.array([f"http://warm.invalid/{i}"
                                 for i in range(ncpu)], pa.string()),
                "html": pa.array([None] * ncpu, pa.binary()),
            })
            ray.data.from_arrow(tbl).repartition(ncpu).map_batches(
                fn, batch_format="pyarrow", batch_size=1).materialize()
        except Exception:
            pass  # warmup is best-effort; the crawl works without it

    t = threading.Thread(target=_warm, daemon=True)
    t.start()
    return t


def run_crawl(cfg: CrawlConfig) -> CrawlResult:
    from ..stages.fetch import store_dir_for

    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    store_dir = cfg.store_dir or store_dir_for(cfg.pages_path, cfg.num_buckets)
    build_page_store(cfg.pages_path, store_dir, cfg.num_buckets)

    seen = SeenSetPool(cfg.seen_shards, cfg.seen_mode, cfg.seen_capacity_per_shard)
    budget = HostBudgetPool(cfg.host_budget, cfg.budget_shards) if cfg.host_budget else None
    robots = RobotsCachePool(store_dir, cfg.num_buckets, cfg.robots_shards) if cfg.robots else None

    # Warm the extraction workers' process-level KB caches in the
    # background while the (driver-side) seed rounds run: the first
    # distributed round otherwise pays one KB compile per worker
    # process at once (~2 s at 32 CPUs, measured). Gated to ≥8 CPUs so
    # tiny local sessions (tests) skip the extra job. The thread is
    # JOINED before finalize: a warm job still in flight at interpreter
    # exit (short CLI crawls) segfaults in Ray's teardown.
    _warm_thread = _maybe_warm_extract_workers(cfg)

    manifest = ckpt.load_manifest(cfg.ckpt_dir)
    if manifest and manifest.get("rounds"):
        # ---- resume: restore state as of the last complete round ----
        # seen snapshots are per-round DELTAS (O(round) each); replay
        # them in order from the seed snapshot (-1) through `last`
        last = manifest["rounds"][-1]["round"]
        ckpt.check_seen_routing(cfg.ckpt_dir, cfg.seen_shards)
        seen.restore_deltas(
            [ckpt.load_seen_snapshot(cfg.ckpt_dir, r) for r in range(-1, last + 1)]
        )
        if budget:
            bs = ckpt.load_budget_snapshot(cfg.ckpt_dir, last)
            if bs:
                budget.restore(bs)
        next_seq = manifest["next_seq"]
        start_round = last + 1
    else:
        manifest = {"config": {"seeds": cfg.seeds, "depth": cfg.depth}, "rounds": [], "next_seq": 0}
        items = [{"url": u, "depth": cfg.depth, "seq": i} for i, u in enumerate(cfg.seeds)]
        seen.mark_new([i["url"] for i in items], [i["depth"] for i in items], cfg.url_only_seen)
        fdir = ckpt.frontier_dir(cfg.ckpt_dir, 0)
        os.makedirs(fdir, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(_frontier_table(items, cfg.priority_fn), os.path.join(fdir, "part-0.parquet"))
        next_seq = len(items)
        start_round = 0
        ckpt.save_seen_snapshot(cfg.ckpt_dir, -1, seen.snapshot_delta())

    # robots Crawl-delay → per-host rate overrides, pushed once per
    # newly-seen host (O(hosts) driver set — the host_counts path
    # already flows hosts through the driver). Idempotent across
    # resume: re-pushing recomputes identical rates.
    _rates_pushed: set[str] = set()

    def _push_robots_rates(hosts) -> None:
        if not (budget and robots and cfg.robots_delay_round_s > 0):
            return
        new = [h for h in hosts if h and h not in _rates_pushed]
        if not new:
            return
        _rates_pushed.update(new)
        delays = robots.crawl_delays(new)
        rates = {
            h: min(float(cfg.host_budget), max(1.0, cfg.robots_delay_round_s / d))
            for h, d in delays.items() if d and d > 0
        }
        if rates:
            budget.set_rates(rates)

    rnd = start_round
    while rnd < cfg.max_rounds:
        fdir = ckpt.frontier_dir(cfg.ckpt_dir, rnd)
        if not os.path.isdir(fdir):
            break
        n_ready = _parquet_rows(fdir)
        if n_ready == 0:
            break
        small = n_ready <= cfg.small_round_threshold
        # a crashed attempt of THIS round may have left a partial next
        # frontier (defer spills / block writes land there before the
        # manifest commits the round) — re-running must start clean
        import shutil as _sh0

        _sh0.rmtree(ckpt.frontier_dir(cfg.ckpt_dir, rnd + 1), ignore_errors=True)
        frontier = None if small else ray.data.read_parquet(_frontier_files(fdir))
        t0 = time.perf_counter()

        # -- politeness split ------------------------------------------
        defer_tbl = None  # small path carries deferred rows driver-side
        if budget and small:
            import numpy as np

            # row order here IS the within-host grant order: discovery
            # seq (fifo) or (priority desc, seq) in priority mode
            ft = _read_frontier_table(fdir).sort_by(
                [("seq", "ascending")]
                if cfg.frontier_order == "fifo"
                else [("priority", "descending"), ("seq", "ascending")]
            )
            # vectorized per-host mark: within-host rank (in row order)
            # < granted count. One batched grant call per round.
            hosts_np = ft.column("host").combine_chunks().to_numpy(zero_copy_only=False)
            uniq, inv, cnt = np.unique(hosts_np, return_inverse=True, return_counts=True)
            _push_robots_rates(uniq.tolist())
            grants = budget.grant({h: int(c) for h, c in zip(uniq.tolist(), cnt.tolist())}, rnd)
            order = np.argsort(inv, kind="stable")
            ranks = np.empty(len(inv), np.int64)
            starts = np.r_[0, np.cumsum(cnt)[:-1]]
            ranks[order] = np.arange(len(inv), dtype=np.int64) - np.repeat(starts, cnt)
            mask = ranks < np.array([grants[h] for h in uniq.tolist()], np.int64)[inv]
            exec_tbl = ft.filter(pa.array(mask))
            defer_tbl = ft.filter(pa.array(~mask))
            exec_ds = None  # small path fetches from the driver table
            defer_ds, n_deferred = None, defer_tbl.num_rows
        elif budget:
            import glob as _glob

            # grants computed ONCE on the driver from a narrow host-count
            # scan (O(distinct hosts) rows), with ONE batched RPC per
            # budget shard — then broadcast so the marking stage does
            # zero actor traffic. n_deferred follows arithmetically.
            counts = _host_counts(fdir)
            _push_robots_rates(counts.keys())
            grants = budget.grant(counts, rnd)
            n_deferred = sum(c - min(c, grants.get(h, 0)) for h, c in counts.items())
            grants_ref = ray.put(grants)
            hb_dirs = sorted(_glob.glob(os.path.join(fdir, "hb_*")))
            flat_files = _glob.glob(os.path.join(fdir, "*.parquet"))
            # FUSED mark: a host-hash-bucketed frontier (written that
            # way by the previous distributed round) needs NO mark
            # shuffle and NO marked-parquet write — one task per bucket
            # rank-marks its (whole) hosts, spills the deferred rows
            # straight into the next round's frontier buckets, and the
            # granted rows stream on into the fetch job. A round-budget
            # OVERFLOW fuses too: a narrow per-bucket rank-mark +
            # partial-top-K pass builds the global keep-set first, then
            # the one full-row pass marks exec = granted ∧ in-budget
            # and spills everything else (granted-but-over-budget rows
            # keep seq+priority and re-compete next round).
            fused = bool(hb_dirs) and not flat_files
            if fused:
                from ..stages.shuffle import reduce_spill

                keep_ref = None
                if cfg.round_budget is not None and (n_ready - n_deferred) > cfg.round_budget:
                    keep_ref = _bucket_topk_keep(
                        fdir, grants_ref, cfg.frontier_order, cfg.round_budget
                    )
                    # executed = exactly round_budget (granted > budget);
                    # with n_deferred set so, the generic round-budget
                    # section below sees no residual overflow and skips.
                    n_deferred = n_ready - cfg.round_budget
                exec_ds = reduce_spill(
                    fdir,
                    _make_mark_defer_spill(
                        grants_ref, cfg.frontier_order,
                        ckpt.frontier_dir(cfg.ckpt_dir, rnd + 1), cfg.mark_buckets,
                        keep_ref=keep_ref,
                    ),
                    dir_prefix="hb_",
                )
                defer_ds = None  # deferred rows already persisted by the mark tasks
                exec_tbl = None
            else:
                marked_dir = os.path.join(ckpt.round_dir(cfg.ckpt_dir, rnd), "marked")
                # fallback (flat frontier — seeds/resume — or round-budget
                # overflow): mark via the external hash shuffle — spill by
                # host hash, then ONE vectorized rank-mark task per bucket
                # (numpy rank-within-host < grant — identical to the small
                # path's kernel). NOT groupby(host).map_groups: per-host
                # Python calls across millions of hosts is the at-scale
                # anti-pattern, and Ray's sort groupby pays ~10× besides.
                from ..stages.shuffle import hash_partition_reduce

                import shutil as _shm

                _shm.rmtree(marked_dir, ignore_errors=True)  # stale crashed-attempt output
                mark_tmp = os.path.join(ckpt.round_dir(cfg.ckpt_dir, rnd), "mark_shuf")
                hash_partition_reduce(
                    frontier, ["host"], _make_mark_exec_bucket(grants_ref, cfg.frontier_order), mark_tmp
                ).write_parquet(marked_dir)
                import shutil as _sh

                _sh.rmtree(mark_tmp, ignore_errors=True)
                marked = ray.data.read_parquet(marked_dir)
                exec_ds = marked.filter(expr="exec == True").drop_columns(["exec"])
                defer_ds = marked.filter(expr="exec == False").drop_columns(["exec"])
                exec_tbl = None
        elif small:
            exec_tbl = _read_frontier_table(fdir)
            exec_ds, defer_ds, n_deferred = None, None, 0
        else:
            exec_ds, exec_tbl = frontier, None
            defer_ds, n_deferred = None, 0

        # -- round budget (priority-frontier global top-K) -------------
        if cfg.round_budget is not None and (n_ready - n_deferred) > cfg.round_budget:
            k = cfg.round_budget
            if exec_tbl is not None:
                exec_tbl, extra_tbl = _topk_table(exec_tbl, k, cfg.frontier_order)
                defer_tbl = (
                    extra_tbl
                    if defer_tbl is None
                    else pa.concat_tables([defer_tbl, extra_tbl.select(defer_tbl.column_names)])
                )
                n_deferred += extra_tbl.num_rows
            else:
                # distributed: per-block partial top-K → one merge task
                # → broadcast keep-set; both consumers re-filter the
                # parquet-backed granted set (no driver gather).
                keep_ref = _round_topk_keep(exec_ds, k, cfg.frontier_order)
                granted_ds = exec_ds
                exec_ds = granted_ds.map_batches(
                    _make_seq_member_filter(keep_ref, True), batch_format="pyarrow"
                )
                extra_ds = granted_ds.map_batches(
                    _make_seq_member_filter(keep_ref, False), batch_format="pyarrow"
                )
                defer_ds = extra_ds if defer_ds is None else defer_ds.union(extra_ds)
                n_deferred += (n_ready - n_deferred) - k

        # -- fetch + extract + checkpoint ------------------------------
        this_round = rnd

        def tag_round(batch: pa.Table, _r=this_round) -> pa.Table:
            return batch.append_column("round", pa.array([_r] * batch.num_rows, pa.int32()))

        t_fetch0 = time.perf_counter()
        edir = ckpt.extraction_dir(cfg.ckpt_dir, rnd)
        extract_fn = make_extract_fn(cfg.kb_yaml, cfg.referenceable)

        def extract_with_round(batch: pa.Table, _fn=extract_fn, _tag=tag_round) -> pa.Table:
            return _fn(_tag(batch))

        if small and exec_tbl.num_rows <= cfg.driver_round_threshold:
            # tiny round: fetch + extract entirely in the driver process
            # (same fetch lookup, same extract fn — a Ray job's fixed
            # launch cost exceeds this round's whole compute)
            import pyarrow.parquet as pq

            from ..stages.fetch import lookup_urls

            found = {
                r["url"]: r["html"]
                for r in lookup_urls(store_dir, cfg.num_buckets, list(set(exec_tbl.column("curl").to_pylist())))
            }
            htmls = [found.get(u) for u in exec_tbl.column("curl").to_pylist()]
            with_html = exec_tbl.append_column("html", pa.array(htmls, pa.binary()))
            os.makedirs(edir, exist_ok=True)
            pq.write_table(extract_with_round(with_html), os.path.join(edir, "part-0.parquet"))
        else:
            # small rounds: driver-resident frontier → bucket-partitioned
            # point-lookup fetch (one task per touched bucket; see
            # stages/fetch.py::fetch_frontier_table). Big rounds: the
            # Dataset shuffle fetch.
            fetched = (
                fetch_frontier_table(exec_tbl, store_dir, cfg.num_buckets)
                if small
                else fetch_frontier(exec_ds, store_dir, cfg.num_buckets, shuffle=True)
            )
            (
                fetched.map_batches(
                    extract_with_round,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=cfg.extract_batch_size,
                )
                .write_parquet(edir)
            )

        t_fetch = time.perf_counter() - t_fetch0

        # -- link discovery → next frontier ----------------------------
        # The links path has its own cutoff, keyed on the EXECUTED
        # count (known by now), not the frontier size: a budget crawl's
        # frontier can hold 100k+ pending rows while each round
        # executes only a few thousand (driver links win), and a BFS
        # round can execute 70k urls whose ~20× link fanout swamps the
        # single-threaded driver path (distributed links win — at 32
        # CPUs the shuffle clears 140k link-source rows in ~0.4 s vs
        # ~2 s driver-side, measured r5). The driver path is kept
        # whenever the small politeness path produced a deferred TABLE
        # (that coupling is driver-side by construction).
        t_links0 = time.perf_counter()
        links_small = small and (
            defer_tbl is not None
            or (n_ready - n_deferred) <= _links_driver_cutoff(cfg)
        )
        if links_small:
            next_seq_after = _links_small_path(
                edir, ckpt.frontier_dir(cfg.ckpt_dir, rnd + 1), seen, robots, cfg, next_seq, defer_tbl
            )
        else:
            from ..stages.shuffle import hash_partition_reduce

            # first-wins in-round dedup (min enc per url,depth) via the
            # external hash shuffle — spill partitioned by key hash,
            # per-bucket Arrow min; ~10× Ray's sort-based groupby at
            # this shape and every stage is a plain map task. (The
            # spill stays a separate job over large read blocks: fusing
            # it into the 64-row extraction batches was measured to
            # drown in tiny per-batch shard files.)
            links_tmp = os.path.join(ckpt.round_dir(cfg.ckpt_dir, rnd), "links_shuf")
            exploded = ray.data.read_parquet(edir, columns=["seq", "links"]).map_batches(
                _explode_links, batch_format="pyarrow"
            )
            # bucket count sized to the round: each bucket should hold
            # ~100k+ rows before more buckets pay — shard-file count is
            # tasks × buckets, and at 32 workers × 32 buckets the tiny
            # per-file costs dominate this narrow (url, depth, enc)
            # payload. Scales up automatically for genuinely big rounds.
            n_link_buckets = max(8, min(64, n_ready // 100_000 * 8))
            # robots + seen-mark FUSED into the per-bucket reduce task
            # (bucket_post_fn): the reduced bucket is already distinct
            # per (url, depth), so marking there is exactly-once, costs
            # ONE seen-actor scatter per bucket instead of a separate
            # 32k-batch map stage per round, and removes two whole
            # Dataset stages from the round's critical path.
            _robots_f = _RobotsFilter(robots) if robots else None
            _seen_f = _SeenMark(seen, cfg.url_only_seen)

            def _post_bucket(t: pa.Table, _r=_robots_f, _s=_seen_f) -> pa.Table:
                if _r is not None:
                    t = _r(t)
                return _s(t)

            t_spill0 = time.perf_counter()
            links = hash_partition_reduce(
                exploded, ["url", "depth"], _local_min_enc, links_tmp,
                num_buckets=n_link_buckets,
                select=["url", "depth", "enc"], local_reduce=True,
                bucket_post_fn=_post_bucket,
            )
            t_spill = time.perf_counter() - t_spill0
            links = links.sort("enc")  # enc order == (parent_seq, link_idx) order

            nfdir = ckpt.frontier_dir(cfg.ckpt_dir, rnd + 1)
            # budget crawls persist the next frontier ALREADY partitioned
            # by hash(host) (hb_N/ bucket dirs) so the next round's
            # politeness mark needs no shuffle (the fused path above)
            bucketed_out = budget is not None
            if defer_ds is None:
                # no deferred Dataset to union (fused mark spilled its
                # defers already; or no budget): fuse seq assignment,
                # frontier completion AND the write into the seq tasks —
                # one whole Dataset-job launch per round cheaper.
                next_seq_after = _seq_finish_write(
                    links, next_seq, nfdir, cfg.priority_fn, bucketed_out, cfg.mark_buckets
                )
            else:
                new_ds, next_seq_after = add_global_seq(links, next_seq, order_cols=("enc",))
                next_frontier = new_ds.map_batches(
                    _finish_frontier, batch_format="pyarrow",
                    fn_kwargs={"priority_fn": cfg.priority_fn},
                )
                if n_deferred:
                    next_frontier = defer_ds.union(next_frontier)
                if bucketed_out:
                    from ..stages.shuffle import spill_table

                    def _spill_frontier(batch: pa.Table, _d=nfdir, _nb=cfg.mark_buckets) -> pa.Table:
                        n = spill_table(batch, ["host"], _d, _nb, dir_prefix="hb_")
                        return pa.table({"rows": pa.array([n], pa.int64())})

                    os.makedirs(nfdir, exist_ok=True)
                    next_frontier.map_batches(_spill_frontier, batch_format="pyarrow").count()
                else:
                    next_frontier.write_parquet(nfdir)
            import shutil as _sh

            _sh.rmtree(links_tmp, ignore_errors=True)  # spill consumed
        n_new = next_seq_after - next_seq
        next_seq = next_seq_after
        t_links = time.perf_counter() - t_links0

        # -- round complete: snapshots, metrics, manifest --------------
        t_snap0 = time.perf_counter()
        ckpt.save_seen_snapshot(cfg.ckpt_dir, rnd, seen.snapshot_delta())
        if budget:
            ckpt.save_budget_snapshot(cfg.ckpt_dir, rnd, budget.snapshot())
        wall = time.perf_counter() - t0
        n_exec = n_ready - n_deferred
        manifest["rounds"].append(
            {
                "round": rnd,
                "scheduled": n_ready,
                "executed": n_exec,
                "deferred": n_deferred,
                "new_items": n_new,
                "wall_s": round(wall, 4),
                "fetch_extract_s": round(t_fetch, 4),
                "links_s": round(t_links, 4),
                "links_spill_s": round(t_spill, 4) if not small else None,
                "links_mat_s": _SEQ_TIMINGS.get("mat_s") if not small else None,
                "links_write_s": _SEQ_TIMINGS.get("write_s") if not small else None,
                "snapshot_s": round(time.perf_counter() - t_snap0, 4),
                "urls_per_sec": round(n_exec / wall, 2) if wall > 0 else None,
            }
        )
        manifest["next_seq"] = next_seq
        ckpt.save_manifest(cfg.ckpt_dir, manifest)
        rnd += 1

    if _warm_thread is not None:
        _warm_thread.join()  # tiny job; done long before here in real crawls
    return _finalize(cfg, manifest, rnd)


def _finalize(cfg: CrawlConfig, manifest: dict, rounds: int) -> CrawlResult:
    """Union all rounds → schedule / distinct triples / text tables."""
    import glob

    edirs = [
        f
        for r in manifest["rounds"]
        for f in sorted(glob.glob(os.path.join(ckpt.extraction_dir(cfg.ckpt_dir, r["round"]), "*.parquet")))
    ]
    import shutil

    out_sched = os.path.join(cfg.ckpt_dir, "schedule")
    out_triples = os.path.join(cfg.ckpt_dir, "triples")
    out_text = os.path.join(cfg.ckpt_dir, "text")
    for d in (out_sched, out_triples, out_text):
        shutil.rmtree(d, ignore_errors=True)  # re-finalize after resume
    if edirs:
        total_bytes = sum(os.path.getsize(f) for f in edirs)
        if total_bytes <= cfg.finalize_small_bytes:
            _finalize_small(edirs, out_sched, out_triples, out_text)
        else:
            _finalize_shuffle(edirs, out_sched, out_triples, out_text)
    return CrawlResult(
        ckpt_dir=cfg.ckpt_dir,
        rounds=rounds,
        manifest=manifest,
        schedule_path=out_sched,
        triples_path=out_triples,
        text_path=out_text,
    )


def _ensure_fsspec_http_stub() -> None:
    """If ``fsspec.implementations.http`` cannot import (no aiohttp in
    this environment), cache a stub module exposing a sentinel
    ``HTTPFileSystem`` class so Ray's per-call lazy probe becomes a
    race-free sys.modules hit instead of a repeated failing import
    (which, attempted from two threads at once, surfaces as a plain
    ImportError that crashes the Dataset job)."""
    import sys as _sys

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    import types as _types

    stub = _types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel — nothing instantiates it
        pass

    stub.HTTPFileSystem = HTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = stub


def _finalize_shuffle(edirs, out_sched, out_triples, out_text) -> None:
    """The at-scale finalize: external hash shuffles (key-partitioned
    parquet spill + per-bucket Arrow reduce, ``stages/shuffle.py``) —
    right when the extraction outputs exceed driver memory. Ray's
    sort-based groupby costs ~10× this on the same data (measured:
    55 s vs ~6 s for the 1.9M-row triples distinct at 8 CPUs), and
    every stage here is a plain map task, so throughput scales with
    workers and ``num_buckets`` is the explicit partitioning unit."""
    import shutil as _sh
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from ..stages.shuffle import hash_distinct, hash_first_by_key

    tmp = tempfile.mkdtemp(prefix="finalize_shuf_", dir=os.path.dirname(out_sched) or "/tmp")

    # The three outputs are independent reductions over the same round
    # files — launched CONCURRENTLY (driver threads; each is its own
    # Dataset execution) so the streaming executor pipelines them
    # instead of paying three sequential job launch+drain walls.
    # Ray's path resolution lazily imports fsspec.implementations.http
    # on EVERY read_parquet/write_parquet (the aiohttp-less import
    # always fails, is caught, and is re-attempted next call). Two
    # threads racing that import see each other's partially-initialized
    # module and die with a plain ImportError Ray's ModuleNotFoundError
    # guard doesn't catch. Caching a stub module makes the lookup
    # race-free and instant for every later Dataset job too.
    _ensure_fsspec_http_stub()

    def _read(cols):
        return ray.data.read_parquet(edirs, columns=cols)

    def _sched():
        _read(["seq", "url", "depth", "round"]).write_parquet(out_sched)

    def _text():
        # text: one row per url, first-crawled wins (min seq per curl)
        fetched = _read(["curl", "seq", "text", "fetched"]).filter(
            expr="fetched == True")
        hash_first_by_key(
            fetched, "curl", "seq", ["text"], os.path.join(tmp, "text")
        ).write_parquet(out_text)

    def _triples():
        # final distinct cleaned triples (agent.rb:160-162 clean + uniq)
        trip = _read(["triples"]).map_batches(
            _explode_clean_triples, batch_format="pyarrow"
        )
        hash_distinct(
            trip, ["s", "p", "o", "lit"], os.path.join(tmp, "trip")
        ).write_parquet(out_triples)

    try:
        with ThreadPoolExecutor(max_workers=3) as ex:
            futs = [ex.submit(f) for f in (_sched, _text, _triples)]
            for f in futs:
                f.result()  # surface the first exception
    finally:
        _sh.rmtree(tmp, ignore_errors=True)


def _finalize_small(edirs, out_sched, out_triples, out_text) -> None:
    """Driver-side vectorized finalize (Arrow C++ group_by / sort):
    identical outputs to ``_finalize_shuffle`` (parity-tested), ~25×
    faster below driver-memory scale where Ray's sort-based groupby
    overhead dominates."""
    import numpy as np
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    os.makedirs(out_sched, exist_ok=True)
    os.makedirs(out_text, exist_ok=True)
    os.makedirs(out_triples, exist_ok=True)
    pq.write_table(
        pads.dataset(edirs).to_table(columns=["seq", "url", "depth", "round"]),
        os.path.join(out_sched, "part-0.parquet"),
    )
    ft = pads.dataset(edirs).to_table(columns=["curl", "seq", "text", "fetched"])
    ft = ft.filter(pc.equal(ft.column("fetched"), True))
    srt = ft.sort_by([("curl", "ascending"), ("seq", "ascending")])
    curls = srt.column("curl").combine_chunks().to_numpy(zero_copy_only=False)
    first = np.ones(len(curls), bool)
    if len(curls):
        first[1:] = curls[1:] != curls[:-1]  # min-seq row per curl
    pq.write_table(
        srt.filter(pa.array(first)).select(["curl", "text"]),
        os.path.join(out_text, "part-0.parquet"),
    )
    trip = _explode_clean_triples(pads.dataset(edirs).to_table(columns=["triples"]))
    pq.write_table(
        trip.group_by(["s", "p", "o", "lit"]).aggregate([]),
        os.path.join(out_triples, "part-0.parquet"),
    )


# the P18-adjacent crawl-output filter (agent.rb:160-162): drop the
# engine-internal rdf:type markers before the distinct
_CLEAN_DROP_TYPES = pa.array(["sc:Index", "sc:Page", "sc:NewUri"], pa.string())


def _explode_clean_triples(batch: pa.Table) -> pa.Table:
    """list<struct> triples → flat (s,p,o,lit) rows, filtered —
    fully vectorized (pc.list_flatten + boolean mask, no row loop)."""
    col = batch.column("triples")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    s, p, o = flat.field("s"), flat.field("p"), flat.field("o")
    lit = flat.field("lit")
    drop = pc.and_(pc.equal(p, "rdf:type"), pc.is_in(o, value_set=_CLEAN_DROP_TYPES))
    keep = pc.invert(pc.fill_null(drop, False))
    return pa.table(
        {
            "s": pc.cast(s.filter(keep), pa.string()),
            "p": pc.cast(p.filter(keep), pa.string()),
            "o": pc.cast(o.filter(keep), pa.string()),
            "lit": pc.cast(lit.filter(keep), pa.bool_()),
        }
    )
