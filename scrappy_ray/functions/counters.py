"""Cluster-wide metric counters (a named zero-CPU actor).

The dedup/LSH stages bound per-bucket work (candidate caps) — the
"no silent caps" rule requires those truncations to be OBSERVABLE.
Stages fire-and-forget ``incr`` (no round-trip on the hot path); the
driver reads ``get_counters()`` after a run and surfaces the counts
(e.g. in a pipeline's metrics dict or a test assertion).
"""

from __future__ import annotations

import ray

_ACTOR_NAME = "scrappy_ray_counters"


@ray.remote(num_cpus=0)
class _Counters:
    def __init__(self):
        self._c: dict[str, int] = {}

    def incr(self, key: str, n: int = 1) -> None:
        self._c[key] = self._c.get(key, 0) + n

    def get(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c = {}


_HANDLE = None  # per-process cache — avoid a name lookup per call


def _handle():
    global _HANDLE
    if _HANDLE is None:
        _HANDLE = _Counters.options(name=_ACTOR_NAME, get_if_exists=True).remote()
    return _HANDLE


def incr(key: str, n: int = 1) -> None:
    """Fire-and-forget increment (safe from inside map_batches/map_groups)."""
    if n:
        _handle().incr.remote(key, n)


def get_counters() -> dict[str, int]:
    return ray.get(_handle().get.remote())


def reset_counters() -> None:
    ray.get(_handle().reset.remote())
