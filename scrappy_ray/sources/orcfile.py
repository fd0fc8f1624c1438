"""Apache ORC source + sink.

ORC is the columnar format of the Hive/Trino/Spark warehouse world —
the interchange a user migrating pipelines from that stack still has
on disk. Same Ray-Data-first shape as ``sources/ipc.py``:

- ``write_orc(ds, out_dir)`` → ``map_batches`` writer, one ``.orc``
  shard per input block named by the block's minimum id (deterministic
  given a partitioning: a re-run overwrites, never duplicates —
  resumable per shard, written via tmp+rename so readers never see a
  partial file).
- ``read_orc(paths)`` → ``read_binary_files`` (file == work unit) →
  one ``pyarrow.orc`` parse per shard inside ``map_batches``.

Pure pyarrow (``pyarrow.orc``) — no third-party dependency.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def write_orc(ds, out_dir: str, id_col: str = "doc_id",
              compression: str = "zstd") -> int:
    """ORC sink: one ``.orc`` shard per input block. Returns rows
    written."""
    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        from pyarrow import orc

        ids = np.asarray(batch.column(id_col).cast(pa.int64()),
                         dtype=np.int64)
        path = os.path.join(out_dir, f"part-{int(ids.min()):012d}.orc")
        tmp = path + ".tmp"
        orc.write_table(batch, tmp, compression=compression)
        os.replace(tmp, path)  # atomic: readers never see partial shards
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    written = ds.map_batches(write, batch_format="pyarrow").sum("n")
    return int(written or 0)


def read_orc(paths, columns: list[str] | None = None, **read_kwargs):
    """ORC source: one Dataset row per stored row; ``columns`` prunes
    at the parse (ORC is columnar — unrequested columns are never
    decoded)."""
    import ray.data

    files = ray.data.read_binary_files(paths, **read_kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        tables = [
            orc.ORCFile(pa.BufferReader(blob.as_py())).read(columns=columns)
            for blob in batch.column("bytes")
        ]
        return pa.concat_tables(tables).combine_chunks() if tables \
            else pa.table({})

    return files.map_batches(parse, batch_format="pyarrow")
