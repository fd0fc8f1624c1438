"""Cross-document sequence packing: GPT-style concat-and-chunk.

Pretraining prep's last step concatenates every document (in a fixed
order, with an end-of-document separator token) into one global token
stream and cuts it into fixed-length training windows — unlike
``textstats.chunk_documents`` (per-document windows), every window here
may span document boundaries, so the operator needs each document's
GLOBAL token offset: a distributed prefix scan, which Ray Data has no
primitive for.

The scan is expressed with the id-range-bucket pattern the repo uses
elsewhere (asof_join documents its partitioning assumption the same
way):

1. one cheap ``Min/Max(id)`` aggregate fixes ``num_buckets`` contiguous
   id ranges (assumption: integer ids, roughly uniform token mass per
   range — at 100 TB the ranges would come from a quantile sketch
   instead, nothing else changes);
2. a narrow counting pass computes per-BUCKET token sums (per-batch
   partial combine → an O(buckets×blocks) groupby — never per-doc rows
   to the driver), whose exclusive cumsum on the driver (O(buckets))
   gives every bucket its global base offset, broadcast by closure;
3. the assembly pass groups full rows by bucket once
   (``groupby(bucket).map_groups`` — the one corpus-sized exchange,
   inherent: packing is a global reorder). Inside a bucket the global
   position of the k-th flattened token is just ``base + k``, so window
   cuts are ``P % T == 0`` — piece building is one LargeListArray
   re-offsetting + ``binary_join``, no Python loop over rows, tokens or
   windows.

Windows that cross a bucket boundary (exactly the windows whose id
appears in ≥2 buckets — computable on the driver from the O(buckets)
base table alone) are the only rows that need a second groupby to merge
their pieces; there are at most ``num_buckets`` of them, so the merge
exchange is O(buckets) rows while the 1/T·corpus "interior" windows
stream straight through. Token semantics (``\\s+`` split of
``trim(text) || ' <sep>'``) are shared with the SQL oracle; all join
levels use a single-space separator, so per-bucket piece joins compose
associatively to the same string the oracle's per-document
``string_agg`` produces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _TOKEN_SPLIT

SEP_TOKEN = "<eod>"
_BUCKET = "_pk_bucket"


def _doc_tokens(text_col) -> pa.Array:
    """``trim(text) || ' <sep>'`` split on ``\\s+`` — one list of tokens
    per document, separator included (an empty document contributes
    ``['', '<sep>']``, matching the SQL oracle exactly)."""
    text = pc.fill_null(pc.cast(text_col, pa.string()), "")
    joined = pc.binary_join_element_wise(
        pc.utf8_trim_whitespace(text),
        pa.scalar(SEP_TOKEN),
        pa.scalar(" "),
    )
    toks = pc.split_pattern_regex(joined, _TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def pack_sequences(ds, seq_tokens: int = 2048, text_col: str = "text",
                   id_col: str = "doc_id", num_buckets: int = 64,
                   id_range: tuple[int, int] | None = None):
    """Pack documents (ordered by ``id_col``) into fixed-length token
    sequences. Returns ``(seq_id, text, n_tokens)``; every sequence has
    ``seq_tokens`` tokens except a possibly-short final one. Pass
    ``id_range=(lo, hi)`` to skip the Min/Max pass when known."""
    if seq_tokens <= 0:
        raise ValueError("seq_tokens must be positive")
    T = int(seq_tokens)

    if id_range is None:
        from ray.data.aggregate import Max, Min

        mm = ds.aggregate(Min(id_col), Max(id_col))
        lo, hi = mm[f"min({id_col})"], mm[f"max({id_col})"]
        if lo is None:  # empty input
            return _empty_out(ds)
        lo, hi = int(lo), int(hi)
    else:
        lo, hi = int(id_range[0]), int(id_range[1])
    width = max(1, -(-(hi - lo + 1) // num_buckets))

    def _buckets(ids: np.ndarray) -> np.ndarray:
        return np.clip((ids - lo) // width, 0, num_buckets - 1)

    # ---- pass 2: per-bucket token sums (narrow, partial-combined) ----
    def partial_counts(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
        lens = np.asarray(
            pc.list_value_length(_doc_tokens(batch.column(text_col))), dtype=np.int64
        )
        b = _buckets(ids)
        ub, inv = np.unique(b, return_inverse=True)
        sums = np.bincount(inv, weights=lens).astype(np.int64)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "n": pa.array(sums, pa.int64())})

    per_bucket = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bucket").sum("n").to_pandas()
    )
    if len(per_bucket) == 0:
        return _empty_out(ds)
    per_bucket = per_bucket.sort_values("bucket")
    bks = per_bucket["bucket"].to_numpy(dtype=np.int64)
    tots = per_bucket["sum(n)"].to_numpy(dtype=np.int64)
    bases_arr = np.concatenate([[0], np.cumsum(tots)[:-1]])
    bases = {int(b): int(s) for b, s in zip(bks, bases_arr)}
    # windows produced by >= 2 buckets (O(buckets) driver work)
    produced: dict[int, int] = {}
    for base, tot in zip(bases_arr, tots):
        if tot <= 0:
            continue
        for w in {int(base) // T, int(base + tot - 1) // T}:
            produced[w] = produced.get(w, 0) + 1
        # interior windows of a bucket are produced only by it
    shared = np.array(sorted(w for w, c in produced.items() if c >= 2), np.int64)

    # ---- pass 3: per-bucket assembly ----
    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
        return batch.append_column(_BUCKET, pa.array(_buckets(ids), pa.int64()))

    def assemble(g: pa.Table) -> pa.Table:
        b = int(g.column(_BUCKET)[0].as_py())
        base = bases[b]
        order = pc.sort_indices(g.column(id_col))
        g = g.take(order)
        toks = _doc_tokens(g.column(text_col))
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        m = len(flat)
        if m == 0:
            return _empty_parts()
        pos = base + np.arange(m, dtype=np.int64)
        cut = np.flatnonzero(pos % T == 0)
        if len(cut) == 0 or cut[0] != 0:
            cut = np.concatenate([np.array([0], np.int64), cut])
        offsets = np.concatenate([cut, [m]]).astype(np.int64)
        pieces = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat)
        starts = pos[cut]
        seq_ids = starts // T
        idx = np.searchsorted(shared, seq_ids)
        idx = np.minimum(idx, max(len(shared) - 1, 0))
        is_shared = (shared[idx] == seq_ids) if len(shared) else np.zeros(len(seq_ids), bool)
        return pa.table({
            "seq_id": pa.array(seq_ids, pa.int64()),
            "part_start": pa.array(starts, pa.int64()),
            "piece": pc.binary_join(pieces, " "),
            "piece_n": pa.array(np.diff(offsets), pa.int64()),
            "_merge": pa.array(is_shared, pa.bool_()),
        })

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(assemble, batch_format="pyarrow")
    )

    def interior(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.invert(batch.column("_merge")))
        return pa.table({"seq_id": t.column("seq_id"),
                         "text": t.column("piece"),
                         "n_tokens": t.column("piece_n")})

    def boundary(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("_merge"))

    def merge(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g.column("part_start"))
        g = g.take(order)
        txt = " ".join(p.as_py() for p in g.column("piece"))
        n = int(pc.sum(g.column("piece_n")).as_py())
        return pa.table({"seq_id": g.column("seq_id").slice(0, 1),
                         "text": pa.array([txt], pa.string()),
                         "n_tokens": pa.array([n], pa.int64())})

    done = parts.map_batches(interior, batch_format="pyarrow")
    if len(shared) == 0:
        # no window crosses a bucket boundary (e.g. one bucket, or every
        # bucket's token count is a multiple of T) — skip the merge leg
        # entirely (a groupby over a guaranteed-empty dataset would also
        # degrade the union's schema)
        return done
    merged = (
        parts.map_batches(boundary, batch_format="pyarrow")
        .groupby("seq_id")
        .map_groups(merge, batch_format="pyarrow")
    )
    return done.union(merged)


def _empty_parts() -> pa.Table:
    return pa.table({"seq_id": pa.array([], pa.int64()),
                     "part_start": pa.array([], pa.int64()),
                     "piece": pa.array([], pa.string()),
                     "piece_n": pa.array([], pa.int64()),
                     "_merge": pa.array([], pa.bool_())})


def _empty_out(ds):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "seq_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "n_tokens": pa.array([], pa.int64()),
    }))
