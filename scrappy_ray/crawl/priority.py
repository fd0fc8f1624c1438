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

import re

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_PRIORITY_FN = "short_url"

# scheme://host — host ends at the first of / ? #. The vectorized and
# scalar forms share this exact pattern (parity-tested).
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<host>[^/?#]*)"
_HOST_RE_C = re.compile(_HOST_RE)

# per-process cache for table-backed priority fns ("host_rank:<path>"):
# the (host, score) parquet loads ONCE per worker process, not per
# batch — the same process-cache pattern as the extraction KB.
_HOST_SCORES: dict[str, tuple] = {}


def _host_scores(path: str):
    cached = _HOST_SCORES.get(path)
    if cached is None:
        import numpy as np
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        hosts = pc.cast(t.column("host"), pa.string()).combine_chunks()
        scores = np.asarray(
            pc.cast(t.column("score"), pa.float64()), dtype=np.float64
        )
        cached = (hosts, scores, dict(zip(hosts.to_pylist(), scores.tolist())))
        _HOST_SCORES[path] = cached
    return cached


def priority_arrow(name: str, urls: pa.Array, depths: pa.Array) -> pa.Array:
    """Vectorized priority over url/depth columns → float64 array."""
    if name.startswith("host_rank:"):
        # authority-driven frontier: priority = the url's host's score
        # from a frozen (host, score) parquet — e.g. host-level
        # PageRank of a prior crawl (pipelines/rankcrawl.py). Unknown
        # hosts score 0 (crawled before never-seen hosts only if the
        # table says so; scores may be negative).
        import numpy as np

        hosts, scores, _ = _host_scores(name.split(":", 1)[1])
        u = pc.cast(urls, pa.string())
        h = pc.fill_null(
            pc.struct_field(pc.extract_regex(u, _HOST_RE), "host"), ""
        )
        idx = pc.fill_null(pc.index_in(h, value_set=hosts), -1)
        idxn = np.asarray(pc.cast(idx, pa.int64()), dtype=np.int64)
        out = np.where(idxn >= 0, scores[np.maximum(idxn, 0)], 0.0)
        return pa.array(out, pa.float64())
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
    if name.startswith("host_rank:"):
        _, _, d = _host_scores(name.split(":", 1)[1])
        m = _HOST_RE_C.match(url)
        return d.get(m.group("host") if m else "", 0.0)
    if name == "depth":
        return float(depth)
    if name == "short_url":
        return -float(len(url))
    raise ValueError(f"unknown priority_fn {name!r}")
