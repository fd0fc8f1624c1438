"""Bucketized cuckoo filter for the 10^10-URL-seen design point.

The reference's URL-seen set is an exact in-memory history array
(/root/reference/lib/scrappy/agent/map_reduce.rb:13-42) — O(n) memory
and O(n) lookups. At 10^10 URLs an exact set per shard is infeasible;
a cuckoo filter gives ~1 byte/key with bounded false positives (a
false positive = a URL wrongly considered already-crawled, which is an
acceptable crawl-completeness tradeoff, never a correctness violation
of the seen-set invariant "no item crawled twice").

Standard design (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNLL'14 — public): 4-slot buckets, 16-bit fingerprints,
partial-key cuckoo hashing with bounded eviction kicks.
"""

from __future__ import annotations

import hashlib

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0):
        n_buckets = max(8, int(capacity / _SLOTS / 0.84))
        # power of two for cheap masking
        self.n_buckets = 1 << (n_buckets - 1).bit_length()
        self.table = np.zeros((self.n_buckets, _SLOTS), dtype=np.uint16)
        self.seed = seed
        self.count = 0
        self._rng_state = np.uint64(0x9E3779B97F4A7C15 ^ seed)

    def _hash(self, key: bytes) -> tuple[int, int]:
        d = hashlib.md5(key + self.seed.to_bytes(4, "big")).digest()
        fp = (int.from_bytes(d[0:2], "big") % 65535) + 1  # non-zero
        i1 = int.from_bytes(d[2:10], "big") & (self.n_buckets - 1)
        return fp, i1

    def _alt(self, i: int, fp: int) -> int:
        # partial-key: i xor hash(fp)
        h = (fp * 0x5BD1E995) & 0xFFFFFFFF
        return (i ^ h) & (self.n_buckets - 1)

    def __contains__(self, key: bytes) -> bool:
        fp, i1 = self._hash(key)
        if fp in self.table[i1]:
            return True
        return fp in self.table[self._alt(i1, fp)]

    def add(self, key: bytes) -> bool:
        """Insert; returns False if the filter is over-full (caller
        should grow / spill a new filter)."""
        fp, i1 = self._hash(key)
        for i in (i1, self._alt(i1, fp)):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict
        i = i1
        for _ in range(_MAX_KICKS):
            self._rng_state = np.uint64(
                (int(self._rng_state) * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            )
            slot = int(self._rng_state) % _SLOTS
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    def check_and_add(self, key: bytes) -> bool:
        """True if key was new (and is now inserted)."""
        if key in self:
            return False
        if not self.add(key):
            raise MemoryError("cuckoo filter over capacity; resize shard")
        return True

    # snapshot / restore for checkpointing
    def dumps(self) -> bytes:
        head = np.array([self.n_buckets, self.count, self.seed], dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def loads(cls, data: bytes) -> "CuckooFilter":
        head = np.frombuffer(data[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_buckets = int(head[0])
        obj.count = int(head[1])
        obj.seed = int(head[2])
        obj.table = np.frombuffer(data[24:], dtype=np.uint16).reshape(obj.n_buckets, _SLOTS).copy()
        obj._rng_state = np.uint64(0x9E3779B97F4A7C15 ^ obj.seed)
        return obj
