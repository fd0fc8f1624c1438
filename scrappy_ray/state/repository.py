"""Extraction repository: time-windowed read-through cache.

Replicates the reference's Sesame-repository memo
(/root/reference/lib/scrappy/agent/agent.rb:165-213,
/root/reference/lib/scrappy/repository.rb:6-32): extractions are
stored under a ``(url, epoch)`` context; a request within
``window_s`` seconds reuses the stored triples instead of
re-extracting; empty extractions store an ``(url, sc:extraction,
sc:Empty)`` marker so the context exists (agent.rb:183-189).

Storage is partitioned Parquet keyed by url-hash prefix (two hex
chars → 256 dirs), one file per (url, ts) context — the Ray-friendly
stand-in for Sesame contexts; "recent contexts" is a file-name
predicate, no scan."""

from __future__ import annotations

import hashlib
import os
import time
import urllib.parse

import pyarrow as pa
import pyarrow.parquet as pq

_TRIPLE_SCHEMA = pa.schema(
    [("s", pa.string()), ("p", pa.string()), ("o", pa.string()), ("lit", pa.bool_())]
)


class ExtractionRepository:
    def __init__(self, root: str, window_s: float = 900.0):
        self.root = root
        self.window_s = window_s
        os.makedirs(root, exist_ok=True)

    def _dir_for(self, url: str) -> str:
        h = hashlib.md5(url.encode("utf-8", "ignore")).hexdigest()
        return os.path.join(self.root, h[:2], urllib.parse.quote(url, safe=""))

    def store(self, url: str, triples: list, ts: float | None = None) -> str:
        """agent.rb:176-196; empty extraction → sc:Empty marker."""
        ts = int(ts if ts is not None else time.time())
        rows = triples or [(url, "sc:extraction", "sc:Empty", False)]
        d = self._dir_for(url)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{ts}.parquet")
        pq.write_table(
            pa.table(
                {
                    "s": pa.array([t[0] for t in rows], pa.string()),
                    "p": pa.array([t[1] for t in rows], pa.string()),
                    "o": pa.array([str(t[2]) for t in rows], pa.string()),
                    "lit": pa.array([bool(t[3]) for t in rows], pa.bool_()),
                }
            ),
            path,
        )
        return path

    def recent_contexts(self, url: str, now: float | None = None) -> list[str]:
        """repository.rb:6-12: contexts for url within the window."""
        now = now if now is not None else time.time()
        d = self._dir_for(url)
        if not os.path.isdir(d):
            return []
        out = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            ts = int(f[: -len(".parquet")])
            if now - ts <= self.window_s:
                out.append(os.path.join(d, f))
        return out

    def fetch(self, url: str, now: float | None = None) -> list | None:
        """Read-through: stored triples (sc:extraction markers dropped,
        agent.rb:203-207) or None when no recent context exists."""
        ctxs = self.recent_contexts(url, now)
        if not ctxs:
            return None
        triples = []
        for c in ctxs:
            t = pq.read_table(c)
            for r in t.to_pylist():
                if r["p"] == "sc:extraction":
                    continue
                triples.append((r["s"], r["p"], r["o"], r["lit"]))
        return triples

    def get_or_extract(self, url: str, extract_fn, now: float | None = None) -> list:
        """The read-through path of Agent#request_from_repository."""
        cached = self.fetch(url, now)
        if cached is not None:
            return cached
        triples = extract_fn(url)
        self.store(url, triples, now)
        return triples


def observe(uris: list[str], request_fn, period_s: float, iterations: int = 1,
            sleep_fn=time.sleep, clock=time.time) -> list[dict]:
    """Agent#observe (agent.rb:140-151): periodically re-request a URI
    list, sleeping out the remainder of each period. ``iterations``
    bounds the loop (the reference loops forever); clock/sleep are
    injectable for tests."""
    log = []
    for it in range(iterations):
        t0 = clock()
        for uri in uris:
            request_fn(uri)
            log.append({"iteration": it, "uri": uri, "t": clock()})
        remaining = period_s - (clock() - t0)
        if it < iterations - 1 and remaining > 0:
            sleep_fn(remaining)
    return log
