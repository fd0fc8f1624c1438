"""Arrow IPC file (Feather V2) source + sink.

Arrow IPC is the zero-parse interchange format between Arrow-native
engines (the on-wire/on-disk twin of the in-memory format Ray Data
blocks already use): columnar, mmap-able, optionally
buffer-compressed. It is the natural shard format for warm
intermediate corpora — no decode on read, unlike parquet — at the
cost of weaker compression, so pipelines use it for shuffle-adjacent
spills and fast re-reads, parquet for cold storage.

Ray-Data-first shape (the ``sources/warc.py`` pattern):

- ``write_ipc(ds, out_dir)`` → ``map_batches`` writer, one ``.arrow``
  shard per input block, named by the block's minimum id —
  deterministic given a partitioning, so a re-run overwrites rather
  than duplicates (resumable per shard).
- ``read_ipc(paths)`` → ``read_binary_files`` (file == work unit) →
  one ``pa.ipc.open_file`` per shard inside ``map_batches``; the
  record batches come back zero-copy from the file buffer.

Pure pyarrow (``pa.ipc``) — no third-party dependency.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def write_ipc(ds, out_dir: str, id_col: str = "doc_id",
              compression: str | None = None) -> int:
    """IPC sink: one Feather-V2 ``.arrow`` shard per input block.
    ``compression`` may be ``"zstd"``/``"lz4"``/None (None = mmap-able
    raw buffers). Returns the number of rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        # built per task: IpcWriteOptions wraps C++ state cloudpickle
        # can't ship, so it must not be closure-captured
        opts = pa.ipc.IpcWriteOptions(
            compression=compression) if compression else None
        ids = np.asarray(batch.column(id_col).cast(pa.int64()), dtype=np.int64)
        path = os.path.join(out_dir, f"part-{int(ids.min()):012d}.arrow")
        tmp = path + ".tmp"
        with pa.OSFile(tmp, "wb") as f, \
                pa.ipc.new_file(f, batch.schema, options=opts) as w:
            w.write_table(batch)
        os.replace(tmp, path)  # atomic: readers never see partial shards
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    written = ds.map_batches(write, batch_format="pyarrow").sum("n")
    return int(written or 0)


def read_ipc(paths, **read_kwargs):
    """IPC source: one Dataset row per stored row. ``paths`` is a
    file/dir/list as accepted by ``ray.data.read_binary_files``; each
    shard parses in one task."""
    import ray.data

    files = ray.data.read_binary_files(paths, **read_kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            pa.ipc.open_file(pa.BufferReader(blob.as_py())).read_all()
            for blob in batch.column("bytes")
        ]
        return pa.concat_tables(tables).combine_chunks() if tables \
            else pa.table({})

    return files.map_batches(parse, batch_format="pyarrow")
