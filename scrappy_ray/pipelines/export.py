"""Resumable deterministic training-shard export.

The last step of a corpus pipeline writes the training shards, and at
100 TB two properties matter more than anything clever:

1. **Deterministic shards** — shard s holds exactly the rows with
   ``knuth_hash(id) % num_shards == s``, each shard file sorted by
   ``(shuffle_key, id)``. A pure function of the row ids: re-running
   the export on the same corpus (any block layout, any retry
   history) produces byte-identical files, so downstream training is
   reproducible and shards can be diffed/verified by hash.
2. **Resumable output** — shards write via the external-spill dirs the
   crawler's shuffle uses (`stages/shuffle.py::spill_table`), then one
   compaction task per shard dedups-by-id (a retried spill task leaves
   duplicate parts — dedup makes compaction idempotent), sorts, and
   atomically renames ``shard-NNNN.parquet`` next to a per-shard
   ``_DONE.NNNN`` marker. A crashed run re-runs ONLY the shards with
   no marker; finished shards are never re-read or re-written.

Spill + compact is two passes over the data but only ONE all-to-all
(the spill); the compaction is embarrassingly parallel per shard.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sampling import _hash_bucket

_PARTS = "_export_parts"


def _shard_done(out_dir: str, s: int) -> str:
    return os.path.join(out_dir, f"_DONE.{s:04d}")


def _shard_file(out_dir: str, s: int) -> str:
    return os.path.join(out_dir, f"shard-{s:04d}.parquet")


def export_shards(ds, out_dir: str, num_shards: int = 8,
                  id_col: str = "doc_id", salt: int = 0) -> dict:
    """Export ``ds`` to ``num_shards`` deterministic, individually
    resumable parquet shards under ``out_dir``. Returns
    ``{"written": [...], "skipped": [...], "rows": N}`` (rows counts
    only newly written shards)."""
    import ray
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    os.makedirs(out_dir, exist_ok=True)
    todo = [s for s in range(num_shards) if not os.path.exists(_shard_done(out_dir, s))]
    if not todo:
        return {"written": [], "skipped": list(range(num_shards)), "rows": 0}
    todo_set = set(todo)
    parts_dir = os.path.join(out_dir, _PARTS)
    # a previous crashed attempt's parts are superseded wholesale: the
    # spill below re-emits every unfinished shard's rows (finished
    # shards spill nothing), and compaction dedups by id anyway
    import shutil

    shutil.rmtree(parts_dir, ignore_errors=True)
    os.makedirs(parts_dir, exist_ok=True)

    def spill(batch: pa.Table) -> pa.Table:
        import uuid

        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
        key = _hash_bucket(ids, salt).astype(np.int64)
        shard = (key % num_shards).astype(np.int64)
        keep = np.isin(shard, list(todo_set))
        if keep.any():
            t = batch.append_column("_shuffle_key", pa.array(key, pa.int64()))
            t = t.filter(pa.array(keep))
            sh = shard[keep]
            order = np.argsort(sh, kind="stable")
            t = t.take(pa.array(order, pa.int64()))
            sh = sh[order]
            edges = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
            bounds = np.r_[edges, len(sh)]
            part = uuid.uuid4().hex[:12]
            for i, start in enumerate(edges):
                s = int(sh[start])
                d = os.path.join(parts_dir, f"s_{s:04d}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    t.slice(start, int(bounds[i + 1]) - int(start)),
                    os.path.join(d, f"{part}.parquet"),
                )
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    # the one corpus-sized pass (side-effect spill, shared-fs layout —
    # same assumption as the crawler's external shuffle)
    ds.map_batches(spill, batch_format="pyarrow").count()

    @ray.remote
    def compact(s: int) -> int:
        d = os.path.join(parts_dir, f"s_{s:04d}")
        if not os.path.isdir(d) or not glob.glob(os.path.join(d, "*.parquet")):
            t = None
            n = 0
        else:
            t = pads.dataset(d).to_table()
            # retry-idempotence: a re-executed spill task duplicates rows
            ids = np.asarray(pc.cast(t.column(id_col), pa.int64()), dtype=np.int64)
            _, first = np.unique(ids, return_index=True)
            t = t.take(pa.array(np.sort(first), pa.int64()))
            t = t.sort_by([("_shuffle_key", "ascending"), (id_col, "ascending")])
            t = t.drop_columns(["_shuffle_key"])
            n = t.num_rows
        tmp = _shard_file(out_dir, s) + ".tmp"
        pq.write_table(t if t is not None else _empty_like_dir(parts_dir, id_col), tmp)
        os.replace(tmp, _shard_file(out_dir, s))
        with open(_shard_done(out_dir, s), "w") as f:
            f.write(str(n))
        return n

    rows = sum(ray.get([compact.remote(s) for s in todo]))
    shutil.rmtree(parts_dir, ignore_errors=True)
    return {
        "written": todo,
        "skipped": [s for s in range(num_shards) if s not in todo_set],
        "rows": rows,
    }


def _empty_like_dir(parts_dir: str, id_col: str) -> pa.Table:
    """Typed empty shard: borrow the schema from any sibling part (an
    all-empty export degrades to the minimal id schema)."""
    import pyarrow.dataset as pads

    any_part = glob.glob(os.path.join(parts_dir, "s_*", "*.parquet"))
    if any_part:
        sch = pads.dataset(any_part[0]).schema
        sch = pa.schema([f for f in sch if f.name != "_shuffle_key"])
        return pa.table({f.name: pa.array([], f.type) for f in sch})
    return pa.table({id_col: pa.array([], pa.int64())})
