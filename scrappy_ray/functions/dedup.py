"""Deduplication operators over a documents table.

All operators stream: per-batch signature computation is numpy/Arrow
vectorized inside ``map_batches``; the only shuffles are the
signature-key ``groupby`` exchanges, keyed so hot buckets stay bounded.

- exact_dedup          hash-partition + per-group min-id
- minhash_lsh_pairs    shingle → minhash → band → bucket groupby → verify
- simhash_pairs        64-bit simhash → 4×16-bit band buckets → hamming verify
- ngram_jaccard        exact Jaccard verification for candidate pairs
- embedding_pairs      cosine near-dup via random-hyperplane LSH buckets
- drop_near_duplicates greedy keep-smallest-id using any pairs table
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# -- exact --------------------------------------------------------------


def _md5_col(texts: list[str]) -> pa.Array:
    return pa.array([hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts], pa.string())


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", ids_only: bool = False):
    """Keep the min-id document of each exact-text group.
    DuckDB-oracle equivalent: GROUP BY md5(text) → min(id).
    ``ids_only`` uses the fully-vectorized hash-aggregate (no per-group
    Python) and returns just the kept id column."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column("_h", _md5_col(batch.column(text_col).to_pylist()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    if ids_only:
        from ray.data.aggregate import Min

        return (
            hashed.groupby("_h")
            .aggregate(Min(id_col, alias_name=id_col))
            .drop_columns(["_h"])
        )

    def keep_first(group: pa.Table) -> pa.Table:
        return group.sort_by([(id_col, "ascending")]).slice(0, 1)

    return hashed.groupby("_h").map_groups(keep_first, batch_format="pyarrow").drop_columns(["_h"])


def _distinct(ds, cols: list[str]):
    """Vectorized distinct on key columns: hash-aggregate count then
    drop — no per-group Python (map_groups would pay per-group call
    overhead across millions of tiny groups)."""
    from ray.data.aggregate import Count

    return ds.groupby(cols).aggregate(Count(alias_name="_c")).drop_columns(["_c"])


# -- minhash + LSH ------------------------------------------------------

_PRIME31 = (1 << 31) - 1  # Mersenne prime; 31-bit operands keep a*x+b in uint64


def _shingles(text: str, k: int) -> np.ndarray:
    """Distinct 31-bit k-byte-shingle hashes, fully vectorized:
    polynomial rolling hash over the UTF-8 bytes via numpy sliding
    windows (stable across runs, no Python loop — unlike per-shingle
    cryptographic hashing, which would dominate at corpus scale)."""
    b = np.frombuffer((text or "").lower().encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        h = np.uint64(2166136261)
        for x in b.astype(np.uint64):
            h = (h * np.uint64(16777619)) ^ x  # FNV-1, wraps mod 2^64
        return np.array([int(h) & _PRIME31], dtype=np.uint64)
    pows = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    w = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    hashes = (w * pows[None, :]).sum(axis=1, dtype=np.uint64)  # mod 2^64
    # fold 64→31 bits, keep distinct
    return np.unique((hashes ^ (hashes >> np.uint64(33))) & np.uint64(_PRIME31))


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _PRIME31, size=num_perm).astype(np.uint64)
    b = rng.randint(0, _PRIME31, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """min over shingles of (a·x + b) mod p — fully vectorized:
    (n_shingles × num_perm) uint64 matrix, no Python loop."""
    sh = _shingles(text, k)
    m = (sh[:, None] * a[None, :] + b[None, :]) % _PRIME31
    return m.min(axis=0)


class MinHashBands:
    """map_batches actor: text → (band_id, band_hash, id) rows.
    Permutation params are built once per actor (stateful setup)."""

    def __init__(self, text_col="text", id_col="doc_id", num_perm=64, bands=16, shingle_k=5):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_band, out_hash, out_id = [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(t, self.a, self.b, self.k)
            for bnd in range(self.bands):
                chunk = sig[bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_band.append(bnd)
                out_hash.append(h)
                out_id.append(i)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "bhash": pa.array(out_hash, pa.string()),
                self.id_col: pa.array(out_id, batch.schema.field(self.id_col).type),
            }
        )


def _bucket_pairs(group: pa.Table, id_col: str, max_bucket: int = 200) -> pa.Table:
    ids = sorted(group.column(id_col).to_pylist())[:max_bucket]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    t = group.schema.field(id_col).type
    return pa.table({"id_a": pa.array(a, t), "id_b": pa.array(b, t)})


def minhash_lsh_pairs(ds, text_col="text", id_col="doc_id", num_perm=64, bands=16, shingle_k=5, concurrency=4):
    """Candidate near-duplicate pairs via MinHash+LSH banding
    (Broder '97 / Leskovec-Rajaraman-Ullman MMDS ch.3 — public)."""

    def pairs(group: pa.Table) -> pa.Table:
        return _bucket_pairs(group, id_col)

    cand = (
        ds.map_batches(
            MinHashBands,
            fn_constructor_kwargs=dict(
                text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
            ),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .groupby(["band", "bhash"])
        .map_groups(pairs, batch_format="pyarrow")
    )
    # distinct pairs (same pair can collide in several bands)
    return _distinct(cand, ["id_a", "id_b"])


def ngram_jaccard_verify(pairs_ds, docs_ds, text_col="text", id_col="doc_id", k=5, threshold=0.7):
    """Exact n-gram Jaccard for candidate pairs: broadcast the needed
    documents' shingle sets (small side — candidates only)."""
    import ray

    pairs_ds = pairs_ds.materialize()  # iterated below AND mapped after — avoid lazy re-execution
    need_ids = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        need_ids.update(b.column("id_a").to_pylist())
        need_ids.update(b.column("id_b").to_pylist())

    texts = {}
    for b in docs_ds.iter_batches(batch_format="pyarrow"):
        for i, t in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
            if i in need_ids:
                texts[i] = t
    shingle_ref = ray.put({i: set(_shingles(t, k).tolist()) for i, t in texts.items()})

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(shingle_ref)
        ja = []
        for a_, b_ in zip(batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist()):
            sa, sb = sh.get(a_, set()), sh.get(b_, set())
            ja.append(len(sa & sb) / len(sa | sb) if sa | sb else 1.0)
        out = batch.append_column("jaccard", pa.array(ja, pa.float64()))
        return out.filter(pc.field("jaccard") >= threshold)

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


# -- simhash ------------------------------------------------------------


def simhash64(text: str) -> int:
    """Charikar '02 simhash over whitespace tokens (public algorithm)."""
    v = np.zeros(64, dtype=np.int64)
    for tok in (text or "").lower().split():
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        v += np.where(bits.astype(np.int64) == 1, 1, -1)
    bits = (v > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def simhash_pairs(ds, text_col="text", id_col="doc_id", max_hamming=3):
    """Near-dup pairs by simhash banding: 4×16-bit chunks — any pair
    within hamming ≤3 shares at least one chunk (pigeonhole)."""

    def sigs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        out = {"band": [], "bhash": [], id_col: [], "sim": []}
        for i, h in zip(ids, hs):
            for bnd in range(4):
                out["band"].append(bnd)
                out["bhash"].append((h >> (16 * bnd)) & 0xFFFF)
                out[id_col].append(i)
                out["sim"].append(h)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "bhash": pa.array(out["bhash"], pa.int32()),
                id_col: pa.array(out[id_col], batch.schema.field(id_col).type),
                "sim": pa.array([s - (1 << 63) for s in out["sim"]], pa.int64()),  # store signed
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column(id_col).to_pylist(), group.column("sim").to_pylist())
        )[:200]
        a, b = [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ha = (rows[i][1] + (1 << 63)) ^ (rows[j][1] + (1 << 63))
                if bin(ha).count("1") <= max_hamming and rows[i][0] != rows[j][0]:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
        t = group.schema.field(id_col).type
        return pa.table({"id_a": pa.array(a, t), "id_b": pa.array(b, t)})

    cand = ds.map_batches(sigs, batch_format="pyarrow").groupby(["band", "bhash"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    return _distinct(cand, ["id_a", "id_b"])


# -- embedding cosine ---------------------------------------------------


def embedding_pairs(ds, vec_col="embedding", id_col="vec_id", threshold=0.95, n_planes=8, seed=11):
    """Embedding near-dup pairs: random-hyperplane LSH bucket groupby
    then in-bucket exact cosine (the scale path — no all-pairs)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        rng = np.random.RandomState(seed)
        planes = rng.randn(vecs.shape[1], n_planes)
        sig = (vecs @ planes > 0).astype(np.uint8)
        codes = (sig * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table(
            {
                "bucket": pa.array(codes, pa.int32()),
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        vecs = np.array(group.column(vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        cos = unit @ unit.T
        a, b, c = [], [], []
        order = np.argsort(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                i, j = order[x], order[y]
                if cos[i, j] >= threshold:
                    a.append(ids[i])
                    b.append(ids[j])
                    c.append(float(cos[i, j]))
        t = group.schema.field(id_col).type
        return pa.table(
            {"id_a": pa.array(a, t), "id_b": pa.array(b, t), "cosine": pa.array(c, pa.float64())}
        )

    cand = ds.map_batches(bucketize, batch_format="pyarrow").groupby("bucket").map_groups(
        pairs, batch_format="pyarrow"
    )
    return _distinct(cand, ["id_a", "id_b"])


# -- keep-set from pairs ------------------------------------------------


def connected_components(pairs_ds) -> dict:
    """Duplicate clusters from a candidate-pairs table: streaming
    union-find on the driver. The state is O(pair endpoints) — only
    documents that appear in some near-dup pair, a tiny fraction of
    the corpus — which is the case ray_guide.md marks as appropriate
    for driver-side union-find (the fully-distributed alternative is
    iterated min-label propagation via groupby). Pairs stream through
    ``iter_batches``; the corpus never materializes.

    Returns {id: root} where root is the component's min id."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        for x, y in zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()):
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = find(x), find(y)
            if rx != ry:
                # union by min id keeps roots deterministic
                lo, hi = (rx, ry) if rx < ry else (ry, rx)
                parent[hi] = lo
    return {x: find(x) for x in parent}


def dedup_by_components(ds, pairs_ds, id_col="doc_id"):
    """Exact cluster dedup: keep only each connected component's min-id
    member (transitively correct, unlike the greedy pair-drop below)."""
    import ray

    comp = connected_components(pairs_ds)
    drop = {i for i, root in comp.items() if i != root}
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = pa.array([i not in d for i in batch.column(id_col).to_pylist()], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def drop_near_duplicates(ds, pairs_ds, id_col="doc_id"):
    """Greedy dedup: drop any doc that appears as the LARGER id of a
    near-dup pair (deterministic keep-smallest; one pass, no iterative
    connected components — documented approximation of CC dedup)."""
    import ray

    drop: set = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        drop.update(b.column("id_b").to_pylist())
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = pa.array([i not in d for i in batch.column(id_col).to_pylist()], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
