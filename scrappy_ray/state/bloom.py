"""Bloom filter URL-seen shard backend (the third seen-set mode next
to exact and cuckoo — the north-star names "bloom/cuckoo URL-seen").

Versus the cuckoo filter (state/cuckoo.py) the tradeoff is: ~40% less
memory at the same false-positive rate and a fully VECTORIZED batch
membership path (one pandas hash_array call per batch instead of an
md5 per key), but no deletion and a soft capacity — past ``capacity``
inserts the false-positive rate degrades smoothly instead of raising.
A false positive means a URL is wrongly considered already-crawled —
an acceptable completeness tradeoff at the 10^10 design point, never
a violation of the "no item crawled twice" invariant.

Standard partitioned double-hashing design (Kirsch & Mitzenmacher,
"Less Hashing, Same Performance", ESA'06 — public): position_j =
(h1 + j*h2) mod m with two independent 64-bit siphashes of the key.
"""

from __future__ import annotations

import math

import numpy as np

_MAX_K = 16


def _hash_pair(keys_obj: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hashes per key (pandas siphash over the
    byte payloads — one vectorized call per batch, no per-key Python
    digest). h2 is forced odd so strides are coprime with the
    power-of-two bit-array size."""
    import pandas as pd

    k1 = f"{seed & 0xFFFFFFFF:016d}"
    k2 = f"{(seed * 2654435761 + 97) & 0xFFFFFFFF:016d}"
    h1 = pd.util.hash_array(keys_obj, hash_key=k1)
    h2 = pd.util.hash_array(keys_obj, hash_key=k2) | np.uint64(1)
    return h1, h2


class BloomFilter:
    """Same snapshot/membership interface as CuckooFilter plus the
    vectorized ``contains_many`` / ``check_and_add_many`` batch forms
    the seen shards use."""

    def __init__(self, capacity: int, fp_rate: float = 0.008, seed: int = 0):
        # m = -n·ln(p)/ln(2)^2 bits, rounded up to a power of two so
        # position masking is a single AND
        m = max(512, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = 1 << (m - 1).bit_length()
        self.k = min(_MAX_K, max(1, round(self.m / max(1, capacity) * math.log(2))))
        self.bits = np.zeros(self.m >> 3, dtype=np.uint8)
        self.seed = seed
        self.count = 0

    def _positions(self, keys: list[bytes]) -> np.ndarray:
        """(n, k) int64 bit positions."""
        arr = np.empty(len(keys), dtype=object)
        arr[:] = keys
        h1, h2 = _hash_pair(arr, self.seed)
        j = np.arange(self.k, dtype=np.uint64)
        pos = (h1[:, None] + j[None, :] * h2[:, None]) & np.uint64(self.m - 1)
        return pos.astype(np.int64)

    def _test(self, pos: np.ndarray) -> np.ndarray:
        """Per-row AND over the k probed bits → (n,) bool present."""
        byte = self.bits[pos >> 3]
        return ((byte >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)

    def _set(self, pos: np.ndarray) -> None:
        flat = pos.reshape(-1)
        np.bitwise_or.at(self.bits, flat >> 3, np.uint8(1) << (flat & 7).astype(np.uint8))

    def contains_many(self, keys: list[bytes]) -> np.ndarray:
        if not keys:
            return np.zeros(0, dtype=bool)
        return self._test(self._positions(keys))

    def check_and_add_many(self, keys: list[bytes]) -> np.ndarray:
        """(n,) bool: True where the key was new (now inserted). An
        intra-batch duplicate is new only at its FIRST occurrence —
        matching the sequential per-key semantics of the other modes."""
        if not keys:
            return np.zeros(0, dtype=bool)
        arr = np.empty(len(keys), dtype=object)
        arr[:] = keys
        uniq, first_idx, inverse = np.unique(arr, return_index=True, return_inverse=True)
        pos = self._positions(list(uniq))
        present = self._test(pos)
        new_u = ~present
        if new_u.any():
            self._set(pos[new_u])
            self.count += int(new_u.sum())
        first = np.zeros(len(keys), dtype=bool)
        first[first_idx] = True
        return new_u[inverse] & first

    # scalar forms (interface parity with CuckooFilter)
    def __contains__(self, key: bytes) -> bool:
        return bool(self.contains_many([key])[0])

    def add(self, key: bytes) -> bool:
        self.check_and_add_many([key])
        return True

    def check_and_add(self, key: bytes) -> bool:
        return bool(self.check_and_add_many([key])[0])

    # snapshot / restore for checkpointing
    def dumps(self) -> bytes:
        head = np.array([self.m, self.k, self.count, self.seed], dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def loads(cls, data: bytes) -> "BloomFilter":
        head = np.frombuffer(data[:32], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.m, obj.k, obj.count, obj.seed = (int(x) for x in head)
        obj.bits = np.frombuffer(data[32:], dtype=np.uint8).copy()
        return obj
