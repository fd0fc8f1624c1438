"""Global discovery-sequence assignment.

The crawl's deterministic ordering (SURVEY.md §4 "Ordering") needs a
contiguous global seq over the sorted new-frontier Dataset. Ray Data
has no global row_number, so this does a block-level prefix sum: take
the sorted dataset's blocks (in order), count rows per block with tiny
remote tasks, then add the per-block offset — O(num_blocks) driver
work, never materializing rows on the driver. Scales to arbitrarily
large frontiers."""

from __future__ import annotations

import pyarrow as pa
import ray


@ray.remote
def _nrows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _add_seq(tbl: pa.Table, offset: int, col: str) -> pa.Table:
    seqs = pa.array(range(offset, offset + tbl.num_rows), pa.int64())
    if col in tbl.column_names:
        tbl = tbl.drop_columns([col])
    return tbl.append_column(col, seqs)


def add_global_seq(ds, start: int, col: str = "seq"):
    """ds must already be sorted in the desired order. Returns
    (new_dataset, next_start)."""
    import ray.data

    refs = ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    out_refs = []
    offset = start
    for r, n in zip(refs, counts):
        out_refs.append(_add_seq.remote(r, offset, col))
        offset += n
    return ray.data.from_arrow_refs(out_refs), offset
