"""Frontier priority functions (the north_star's priority-frontier
mode: "a priority frontier maintained via groupby(host)-aggregate-sort
shuffles").

A priority is a deterministic float64 computed from (url, depth) at
the moment a frontier row is created (seed init, link discovery) and
carried in the frontier parquet. Scheduling in
``frontier_order="priority"`` mode is two-stage, both stages keyed
(priority desc, seq asc):

  1. per-host politeness grants rank within host by priority instead
     of discovery order, and
  2. an optional global ``round_budget`` K selects the round's exec
     set — the distributed path does per-block partial top-K and one
     worker-side merge (never a driver gather).

Every function exists in two parity-tested forms: a vectorized Arrow
kernel (the Ray path) and a scalar Python form (the simulator — the
correctness spine). FIFO remains the default order, matching the
reference's queue semantics (map_reduce.rb:22-29).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_PRIORITY_FN = "short_url"


def priority_arrow(name: str, urls: pa.Array, depths: pa.Array) -> pa.Array:
    """Vectorized priority over url/depth columns → float64 array."""
    if name == "depth":
        # remaining crawl depth: higher = closer to a seed. Constant on
        # depth=-1 (unbounded) crawls — use a url-based fn there.
        return pc.cast(depths, pa.float64())
    if name == "short_url":
        # classic frontier heuristic: shorter URLs first (roots and
        # section pages before deep leaf pages / query variants)
        return pc.multiply(
            pc.cast(pc.utf8_length(pc.cast(urls, pa.string())), pa.float64()), -1.0
        )
    raise ValueError(f"unknown priority_fn {name!r}")


def priority_py(name: str, url: str, depth: int) -> float:
    """Scalar form — MUST match priority_arrow exactly (simulator
    parity is asserted over it)."""
    if name == "depth":
        return float(depth)
    if name == "short_url":
        return -float(len(url))
    raise ValueError(f"unknown priority_fn {name!r}")
