"""Global discovery-sequence assignment.

The crawl's deterministic ordering (SURVEY.md §4 "Ordering") needs a
contiguous global seq over the sorted new-frontier Dataset. Ray Data
has no global row_number, so this does a block-level prefix sum: take
the sorted dataset's blocks, compute each block's (min sort key, row
count) with tiny remote tasks, order blocks by their minima — robust
even if the executor yields range partitions out of order
(``preserve_order`` is not assumed) — then add per-block offsets.
O(num_blocks) driver work, never materializing rows on the driver."""

from __future__ import annotations

import pyarrow as pa
import ray


@ray.remote
def _block_meta(tbl: pa.Table, order_cols: tuple) -> tuple:
    """(min sort-key tuple, num_rows) for one block."""
    if tbl.num_rows == 0:
        return (None, 0)
    key = tuple(tbl.column(c)[0].as_py() for c in order_cols)
    return (key, tbl.num_rows)


@ray.remote
def _add_seq(tbl: pa.Table, offset: int, col: str) -> pa.Table:
    seqs = pa.array(range(offset, offset + tbl.num_rows), pa.int64())
    if col in tbl.column_names:
        tbl = tbl.drop_columns([col])
    return tbl.append_column(col, seqs)


def add_global_seq(ds, start: int, col: str = "seq", order_cols: tuple = ("parent_seq", "link_idx")):
    """``ds`` must be sorted by ``order_cols`` (range-partitioned
    blocks, rows sorted within each). Returns (new_dataset, next_seq).
    Blocks are re-ordered by their first sort key, so the result does
    not depend on executor block-yield order."""
    import ray.data

    # materialize first: bare to_arrow_refs() on a lazy plan executes
    # it TWICE in Ray 2.49 (once for rows, once more — full AllToAlls
    # included — as a limit-1 schema probe); a MaterializedDataset
    # hands refs out without re-execution
    refs = ds.materialize().to_arrow_refs()
    metas = ray.get([_block_meta.remote(r, order_cols) for r in refs])
    order = sorted(
        (i for i in range(len(refs)) if metas[i][1] > 0), key=lambda i: metas[i][0]
    )
    out_refs = []
    offset = start
    for i in order:
        out_refs.append(_add_seq.remote(refs[i], offset, col))
        offset += metas[i][1]
    return ray.data.from_arrow_refs(out_refs), offset
