"""Sharded URL-seen set: the crawl frontier's dedup state.

Replaces the reference's single shared Queue.history array
(/root/reference/lib/scrappy/agent/map_reduce.rb:13-42; equality on
the whole {uri, depth} item) with a pool of Ray actors sharded by
``hash(url) % num_shards``. Each shard is an exact Python set (test
scale, reference-parity mode), a cuckoo filter, or a bloom filter
(the 10^10 design points — bloom is ~40% smaller at the same fp rate
and fully vectorized per batch; cuckoo supports exact fingerprints)
behind the same interface. Shards snapshot/restore for
checkpoint-resume.

Keys are "url\\tdepth" to keep the reference's (url, depth) pair
semantics; pass ``url_only=True`` for plain URL dedup at scale.
"""

from __future__ import annotations

import hashlib

import ray

from .bloom import BloomFilter
from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0)
class SeenShard:
    def __init__(self, mode: str = "exact", capacity: int = 1_000_000, seed: int = 0):
        self.mode = mode
        if mode == "cuckoo":
            self.filt = CuckooFilter(capacity, seed)
        elif mode == "bloom":
            self.filt = BloomFilter(capacity, seed=seed)
        else:
            self.filt = set()
        self.delta: list[bytes] = []  # keys added since last delta snapshot

    def check_and_add(self, keys: list[bytes]) -> list[bool]:
        """For each key: True if newly added (unseen before)."""
        if self.mode == "bloom":
            out = self.filt.check_and_add_many(keys)
            self.delta.extend(k for k, new in zip(keys, out) if new)
            return [bool(x) for x in out]
        if self.mode == "cuckoo":
            out = [self.filt.check_and_add(k) for k in keys]
            self.delta.extend(k for k, new in zip(keys, out) if new)
            return out
        out = []
        for k in keys:
            if k in self.filt:
                out.append(False)
            else:
                self.filt.add(k)
                self.delta.append(k)
                out.append(True)
        return out

    def snapshot_delta(self) -> bytes:
        """Keys added since the previous delta snapshot (O(round), not
        O(total seen)); restore by replaying deltas in round order."""
        import pickle

        out = b"D" + pickle.dumps(self.delta)
        self.delta = []
        return out

    def restore_delta(self, data: bytes) -> None:
        import pickle

        assert data[:1] == b"D"
        keys = pickle.loads(data[1:])
        if self.mode == "bloom":
            self.filt.check_and_add_many(keys)  # idempotent, keeps count right
        else:
            for k in keys:
                if self.mode == "cuckoo":
                    if k not in self.filt:
                        self.filt.add(k)
                else:
                    self.filt.add(k)
        self.delta = []

    def contains(self, keys: list[bytes]) -> list[bool]:
        if self.mode == "bloom":
            return [bool(x) for x in self.filt.contains_many(keys)]
        return [k in self.filt for k in keys]

    def size(self) -> int:
        return self.filt.count if self.mode in ("cuckoo", "bloom") else len(self.filt)

    def snapshot(self) -> bytes:
        if self.mode == "cuckoo":
            return b"C" + self.filt.dumps()
        if self.mode == "bloom":
            return b"B" + self.filt.dumps()
        import pickle

        return b"E" + pickle.dumps(self.filt)

    def restore(self, data: bytes) -> None:
        import pickle

        if data[:1] == b"C":
            self.mode = "cuckoo"
            self.filt = CuckooFilter.loads(data[1:])
        elif data[:1] == b"B":
            self.mode = "bloom"
            self.filt = BloomFilter.loads(data[1:])
        else:
            self.mode = "exact"
            self.filt = pickle.loads(data[1:])


def shard_of(url: str, num_shards: int) -> int:
    return int.from_bytes(hashlib.md5(url.encode("utf-8", "ignore")).digest()[:4], "big") % num_shards


class SeenSetPool:
    """Driver-side handle pool. ``mark_new`` batches keys per shard and
    returns the newly-added mask in input order."""

    def __init__(self, num_shards: int = 8, mode: str = "exact", capacity_per_shard: int = 1_000_000):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(mode=mode, capacity=capacity_per_shard, seed=i)
            for i in range(num_shards)
        ]

    @staticmethod
    def key(url: str, depth: int, url_only: bool = False) -> bytes:
        return url.encode("utf-8", "ignore") if url_only else f"{url}\t{depth}".encode("utf-8", "ignore")

    def mark_new(self, urls: list[str], depths: list[int], url_only: bool = False) -> list[bool]:
        per_shard: dict[int, list[int]] = {}
        keys = []
        for i, (u, d) in enumerate(zip(urls, depths)):
            keys.append(self.key(u, d, url_only))
            per_shard.setdefault(shard_of(u, self.num_shards), []).append(i)
        futures = {
            s: self.shards[s].check_and_add.remote([keys[i] for i in idxs])
            for s, idxs in per_shard.items()
        }
        mask = [False] * len(urls)
        for s, idxs in per_shard.items():
            for i, new in zip(idxs, ray.get(futures[s])):
                mask[i] = new
        return mask

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list[bytes]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[bytes]) -> None:
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, snaps)])

    def snapshot_delta(self) -> list[bytes]:
        return ray.get([s.snapshot_delta.remote() for s in self.shards])

    def restore_deltas(self, rounds_of_snaps: list[list[bytes]]) -> None:
        """Replay per-round delta snapshots in order."""
        for snaps in rounds_of_snaps:
            ray.get([s.restore_delta.remote(b) for s, b in zip(self.shards, snaps)])
