"""Shared worker-side helpers.

``cached_get``: per-process memo of deserialized broadcast objects.
``ray.get`` of the same ObjectRef re-deserializes Python containers on
every call, so stages that read a broadcast dict/set per batch (or per
group) memoize the deserialized value once per worker process instead.
"""

from __future__ import annotations

import ray

_BCAST_CACHE: dict = {}
_BCAST_CACHE_CAP = 32


def cached_get(ref):
    key = ref.hex()
    if key not in _BCAST_CACHE:
        while len(_BCAST_CACHE) >= _BCAST_CACHE_CAP:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


@ray.remote
def _block_nrows(tbl) -> int:
    return tbl.num_rows


def drop_empty_blocks(ds):
    """Workaround for a Ray 2.49 hash-shuffle join defect: a 0-row
    block on the join's LEFT side makes pyarrow's acero key resolution
    fail ("No match or multiple matches for key field ..."). Rebuilds
    the dataset from only its non-empty blocks — refs move, rows
    don't (the filter runs as tiny remote row-count tasks)."""
    import ray.data

    refs = ds.materialize().to_arrow_refs()  # lazy to_arrow_refs() double-executes (limit-1 schema probe)
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c]
    if not keep:
        keep = refs[:1]  # preserve schema for downstream consumers
    return ray.data.from_arrow_refs(keep)
