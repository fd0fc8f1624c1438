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

    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    if ids_only:
        return (
            hashed.groupby("_h")
            .aggregate(Min(id_col, alias_name=id_col))
            .drop_columns(["_h"])
        )

    # full rows: vectorized hash-aggregate winners then a hash join
    # back — NOT map_groups (per-group Python across millions of
    # near-singleton groups is the classic at-scale anti-pattern)
    from ..common import drop_empty_blocks

    hashed = hashed.materialize()  # consumed twice: winners + probe side
    winners = hashed.groupby("_h").aggregate(Min(id_col, alias_name=id_col))
    joined = (
        drop_empty_blocks(hashed)
        .join(drop_empty_blocks(winners), join_type="inner", num_partitions=8, on=("_h", id_col))
        .drop_columns(["_h"])
    )
    # small outputs leave most of the 8 join partitions empty; strip
    # them so downstream joins don't hit the Ray 0-row-block defect
    return drop_empty_blocks(joined)


def incremental_exact_dedup(new_ds, ref_ds, text_col: str = "text",
                            id_col: str = "doc_id",
                            broadcast_threshold: int = 1_000_000,
                            num_partitions: int = 8):
    """Drop rows of ``new_ds`` whose exact text already appears in a
    FROZEN reference corpus — the continuous-crawl / snapshot-update
    shape (dedup the new crawl against everything already kept, without
    re-deduping the old corpus). Matching is on md5(text), the same key
    the ``exact_dedup`` oracle groups on.

    Scale split: the reference side reduces to its DISTINCT md5 set
    first (hash-aggregate, no per-group Python). Below
    ``broadcast_threshold`` distinct hashes the set is gathered once
    and broadcast (``ray.put`` + ``pc.is_in`` per batch — cheaper than
    shuffling the new corpus); above it, the new corpus is
    LEFT-ANTI-joined against the reference hash table — no driver
    state proportional to the reference."""
    import ray

    from ..common import drop_empty_blocks

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_h", _md5_col(batch.column(text_col).to_pylist()))

    ref_hashes = _distinct(
        ref_ds.map_batches(add_hash, batch_format="pyarrow")
        .select_columns(["_h"]), ["_h"]
    ).materialize()  # consumed twice: count + (broadcast | join)
    n_ref = ref_hashes.count()
    hashed_new = new_ds.map_batches(add_hash, batch_format="pyarrow")

    if n_ref > broadcast_threshold:
        right = ref_hashes.map_batches(
            lambda b: b.rename_columns(["__ref_h"]), batch_format="pyarrow")
        return drop_empty_blocks(hashed_new).join(
            drop_empty_blocks(right), "left_anti", num_partitions,
            on=("_h",), right_on=("__ref_h",),
        ).drop_columns(["_h"])

    chunks = [b.column("_h").combine_chunks()
              for b in ref_hashes.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    ref_set = pa.concat_arrays(chunks) if chunks else pa.array([], pa.string())
    ref_ref = ray.put(ref_set)

    def drop_seen(batch: pa.Table) -> pa.Table:
        seen = pc.is_in(batch.column("_h"), value_set=ray.get(ref_ref))
        return batch.filter(pc.invert(seen)).drop_columns(["_h"])

    return hashed_new.map_batches(drop_seen, batch_format="pyarrow")


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
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        if not n:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "bhash": pa.array([], pa.uint64()),
                    self.id_col: batch.column(self.id_col),
                }
            )
        # per-doc signature (vectorized over shingles × permutations),
        # then the banding fold is vectorized over docs × bands: an
        # FNV-1a accumulate across the band's rows (r is a small
        # constant) + an avalanche finish — bucket partition identical
        # to any strong per-band hash, with zero per-(doc,band) Python.
        sigs = np.empty((n, self.num_perm), np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(t, self.a, self.b, self.k)
        chunks = sigs.reshape(n, self.bands, self.rows_per_band)
        h = np.full((n, self.bands), 0xCBF29CE484222325, np.uint64)
        for j in range(self.rows_per_band):
            h = (h ^ chunks[:, :, j]) * np.uint64(0x100000001B3)  # mod 2^64
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.bands), pa.int64())
        return pa.table(
            {
                "band": pa.array(band, pa.int32()),
                "bhash": pa.array(h.reshape(-1), pa.uint64()),
                self.id_col: ids.take(rep),
            }
        )


_BAND_FOLD = np.uint64(0x9E3779B97F4A7C15)


def _band_keys(band: np.ndarray, bhash: np.ndarray) -> np.ndarray:
    """(band, bhash) folded to one int64 membership key (same fold on
    index and probe sides; collision odds ~n²/2^64)."""
    k = bhash.astype(np.uint64) ^ ((band.astype(np.uint64) + np.uint64(1)) * _BAND_FOLD)
    return k.view(np.int64)


def minhash_band_index(ref_ds, text_col="text", id_col="doc_id", num_perm=64,
                       bands=16, shingle_k=5, concurrency=4) -> np.ndarray:
    """Sorted int64 band keys of a FROZEN reference corpus — the
    probe-side index for :func:`incremental_near_dedup`. Size is
    O(ref docs × bands) int64s (a 10^9-doc reference at 16 bands is
    ~128 GB — shard the index by key range past broadcast size, the
    same escape hatch as substr_dedup's dup set)."""

    def keys(batch: pa.Table) -> pa.Table:
        band = np.asarray(batch.column("band"))
        bh = np.asarray(batch.column("bhash").combine_chunks()
                        .to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(np.unique(_band_keys(band, bh)),
                                       pa.int64())})

    parts = (ref_ds.map_batches(
        MinHashBands,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k),
        batch_format="pyarrow", concurrency=concurrency,
    ).map_batches(keys, batch_format="pyarrow"))
    chunks = [np.asarray(b.column("k"))
              for b in parts.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not chunks:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(chunks))


class _NearDupProbe(MinHashBands):
    """Actor stage: MinHash-band the new docs and probe the broadcast
    reference index — index fetched ONCE per actor in ``__init__``
    (zero-copy from the local object store), membership via one
    vectorized searchsorted per batch."""

    def __init__(self, index_ref, **kwargs):
        super().__init__(**kwargs)
        import ray

        self._index = ray.get(index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = super().__call__(batch)
        band = np.asarray(rows.column("band"))
        bh = np.asarray(rows.column("bhash").combine_chunks()
                        .to_numpy(zero_copy_only=False)) if rows.num_rows else np.empty(0, np.uint64)
        keys = _band_keys(band, bh)
        hit = np.zeros(len(keys), bool)
        if len(self._index) and len(keys):
            pos = np.searchsorted(self._index, keys)
            pos[pos == len(self._index)] = 0
            hit = self._index[pos] == keys
        ids = batch.column(self.id_col)
        n = len(ids)
        rep_ids = np.repeat(np.arange(n, dtype=np.int64), self.bands)
        n_hits = np.bincount(rep_ids, weights=hit, minlength=n).astype(np.int64)
        return pa.table({
            self.id_col: ids,
            "n_band_hits": pa.array(n_hits, pa.int64()),
            "near_dup": pa.array((n_hits > 0).astype(np.int64), pa.int64()),
        })


def incremental_near_dedup(new_ds, band_index: np.ndarray, text_col="text",
                           id_col="doc_id", num_perm=64, bands=16,
                           shingle_k=5, concurrency=4, mode: str = "flag"):
    """Flag (or drop, ``mode='filter'``) new documents that share ≥ 1
    MinHash LSH band with a FROZEN reference corpus
    (:func:`minhash_band_index`) — the near-dup analogue of
    :func:`incremental_exact_dedup` for continuous-crawl updates. A
    band hit is an LSH CANDIDATE at the banding curve's sensitivity
    (same num_perm/bands trade-off as ``minhash_lsh_pairs``), not an
    exact-Jaccard verdict — the standard frozen-filter deployment."""
    import ray

    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be 'flag' or 'filter', got {mode!r}")
    index_ref = ray.put(np.asarray(band_index, np.int64))
    flagged = new_ds.map_batches(
        _NearDupProbe,
        fn_constructor_kwargs=dict(index_ref=index_ref, text_col=text_col,
                                   id_col=id_col, num_perm=num_perm,
                                   bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow", concurrency=concurrency,
    )
    if mode == "flag":
        return flagged

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("near_dup"), 0)).select([id_col])

    return flagged.map_batches(keep, batch_format="pyarrow")


def _bucket_pairs(group: pa.Table, id_col: str, max_bucket: int = 200) -> pa.Table:
    ids_col = group.column(id_col)
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    ids = np.sort(ids_col.to_numpy(zero_copy_only=False))
    if len(ids) > max_bucket:
        # NO SILENT CAPS: a hot LSH bucket loses candidate recall here —
        # surface it through the cluster-wide counters so the driver can
        # see how many buckets/ids were truncated after the run
        from .counters import incr

        incr("lsh_buckets_truncated", 1)
        incr("lsh_ids_truncated", len(ids) - max_bucket)
        ids = ids[:max_bucket]
    ai, bi = np.triu_indices(len(ids), k=1)  # all i<j pairs, no Python loop
    t = group.schema.field(id_col).type
    return pa.table({"id_a": pa.array(ids[ai], t), "id_b": pa.array(ids[bi], t)})


def minhash_lsh_pairs(ds, text_col="text", id_col="doc_id", num_perm=64, bands=16, shingle_k=5,
                      concurrency=4, max_bucket=200):
    """Candidate near-duplicate pairs via MinHash+LSH banding
    (Broder '97 / Leskovec-Rajaraman-Ullman MMDS ch.3 — public)."""

    def pairs(group: pa.Table) -> pa.Table:
        return _bucket_pairs(group, id_col, max_bucket=max_bucket)

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


def ngram_jaccard_verify(pairs_ds, docs_ds, text_col="text", id_col="doc_id", k=5,
                         threshold=0.7, num_partitions=8):
    """Exact n-gram Jaccard for candidate pairs — fully distributed:

    1. collect the candidate-ID set from the pairs table (the SMALL
       side by construction: LSH candidates, not the corpus) and
       broadcast it once (``ray.put``);
    2. semi-join the documents table against that set INSIDE
       ``map_batches`` (vectorized ``pc.is_in``) and compute each
       surviving doc's shingle set there — the corpus streams through
       workers, never through the driver;
    3. two distributed hash joins pairs⋈shingles (on id_a, then id_b);
    4. per-pair Jaccard over the joined sorted shingle arrays.

    Unlike a driver-side text gather, this holds only O(candidates)
    state anywhere, so an LSH flood degrades to a bigger shuffle —
    not a driver OOM."""
    import ray

    from ..common import cached_get

    pairs_ds = pairs_ds.materialize()  # consumed twice (id scan + joins)
    if pairs_ds.count() == 0:
        try:
            id_t = pairs_ds.schema().base_schema.field("id_a").type
        except Exception:
            id_t = pa.int64()
        empty = pa.table(
            {
                "id_a": pa.array([], id_t),
                "id_b": pa.array([], id_t),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        import ray.data

        return ray.data.from_arrow(empty)

    need_ids: set = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        need_ids.update(b.column("id_a").to_pylist())
        need_ids.update(b.column("id_b").to_pylist())
    ids_ref = ray.put(pa.array(sorted(need_ids)))

    def doc_shingles(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col), value_set=cached_get(ids_ref))
        kept = batch.filter(pc.fill_null(mask, False))
        # shingle arrays ride as binary (uint64 little-endian bytes):
        # Arrow hash joins don't support list-typed payload columns
        sh = [_shingles(t, k).tobytes() for t in kept.column(text_col).to_pylist()]
        return pa.table({id_col: kept.column(id_col), "sh": pa.array(sh, pa.binary())})

    from ..common import drop_empty_blocks

    # doc_shingles filters per batch, so sh_ds routinely carries 0-row
    # blocks — guard BOTH join sides: Ray 2.49's hash-shuffle join
    # breaks on 0-row left blocks deterministically, and 0-row blocks
    # on either side can flakily surface as ArrowInvalid inside
    # HashShuffleAggregator.finalize depending on which aggregator
    # partition they land in (observed intermittently in the corpus
    # funnel test; see common.drop_empty_blocks)
    sh_ds = drop_empty_blocks(docs_ds.map_batches(doc_shingles, batch_format="pyarrow"))
    sh_a = sh_ds.rename_columns({id_col: "id_a", "sh": "sh_a"})
    sh_b = sh_ds.rename_columns({id_col: "id_b", "sh": "sh_b"})

    half = drop_empty_blocks(
        drop_empty_blocks(pairs_ds).join(sh_a, "inner", num_partitions, on=("id_a",))
    )
    joined = half.join(sh_b, "inner", num_partitions, on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        import numpy as np

        ja = []
        for sa_b, sb_b in zip(batch.column("sh_a").to_pylist(), batch.column("sh_b").to_pylist()):
            sa = np.frombuffer(sa_b or b"", np.uint64)
            sb = np.frombuffer(sb_b or b"", np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            ja.append(inter / union if union else 1.0)
        out = batch.drop_columns(["sh_a", "sh_b"]).append_column(
            "jaccard", pa.array(ja, pa.float64())
        )
        return out.filter(pc.field("jaccard") >= threshold)

    return joined.map_batches(verify, batch_format="pyarrow")


# -- simhash ------------------------------------------------------------


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a_batch(tokens: list[bytes]) -> np.ndarray:
    """64-bit FNV-1a of each byte string, vectorized across the whole
    list: the loop is over CHARACTER POSITIONS (≤ max token length),
    not tokens — no per-token Python/hashlib call."""
    n = len(tokens)
    if not n:
        return np.zeros(0, np.uint64)
    lens = np.fromiter((len(t) for t in tokens), np.int64, n)
    maxlen = int(lens.max())
    mat = np.zeros((n, max(maxlen, 1)), np.uint8)
    flat = np.frombuffer(b"".join(tokens), np.uint8)
    if len(flat):
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(len(flat), dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        mat[rows, cols] = flat
    h = np.full(n, _FNV_OFFSET, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] ^ mat[active, j].astype(np.uint64)) * _FNV_PRIME
    return h


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Charikar '02 simhash (public algorithm), batch-vectorized: every
    token in the batch is uniqued and FNV-hashed in one vectorized pass,
    and per-document ±1 bit votes accumulate via ``np.add.at`` — no
    per-token Python loop, no per-token hashlib call."""
    n = len(texts)
    if not n:
        return np.zeros(0, np.uint64)
    toks: list[str] = []
    counts = np.zeros(n, np.int64)
    for i, t in enumerate(texts):
        ts = (t or "").lower().split()
        toks.extend(ts)
        counts[i] = len(ts)
    if not toks:
        return np.zeros(n, np.uint64)
    doc_of = np.repeat(np.arange(n), counts)
    uniq, inv = np.unique(np.array(toks, dtype=object), return_inverse=True)
    h = _fnv1a_batch([u.encode("utf-8", "ignore") for u in uniq.tolist()])
    bit_pos = np.arange(64, dtype=np.uint64)
    signs = (((h[:, None] >> bit_pos[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1)
    votes = np.zeros((n, 64), np.int64)
    np.add.at(votes, doc_of, signs[inv])
    out_bits = (votes > 0).astype(np.uint64)
    return (out_bits << bit_pos[None, :]).sum(axis=1, dtype=np.uint64)


def simhash64(text: str) -> int:
    """Single-document convenience wrapper over ``simhash64_batch``."""
    return int(simhash64_batch([text])[0])


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount (numpy 1.26 has no bitwise_count)."""
    return np.unpackbits(x.astype(np.uint64).view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def simhash_pairs(ds, text_col="text", id_col="doc_id", max_hamming=3, max_bucket=200):
    """Near-dup pairs by simhash banding: 4×16-bit chunks — any pair
    within hamming ≤3 shares at least one chunk (pigeonhole)."""

    def sigs(batch: pa.Table) -> pa.Table:
        h = simhash64_batch(batch.column(text_col).to_pylist())
        n = len(h)
        rep = pa.array(np.repeat(np.arange(n), 4), pa.int64())
        band = np.tile(np.arange(4, dtype=np.int64), n)
        bhash = (np.repeat(h, 4) >> (np.uint64(16) * band.astype(np.uint64))) & np.uint64(0xFFFF)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "band": pa.array(band.astype(np.int32), pa.int32()),
                "bhash": pa.array(bhash.astype(np.int32), pa.int32()),
                id_col: ids.take(rep),
                # store signed: x - 2^63 ≡ flipping the top bit, XOR-safe
                "sim": pa.array(np.repeat((h ^ np.uint64(1 << 63)).view(np.int64), 4), pa.int64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(group.column(id_col)), kind="stable")
        if len(order) > max_bucket:
            from .counters import incr

            incr("simhash_buckets_truncated", 1)
            incr("simhash_ids_truncated", len(order) - max_bucket)
            order = order[:max_bucket]
        ids = group.column(id_col).take(pa.array(order, pa.int64()))
        ids_np = np.asarray(ids)
        sims = np.asarray(group.column("sim"))[order].view(np.uint64)
        m = len(sims)
        ii, jj = np.triu_indices(m, k=1)
        ham = _popcount64(sims[ii] ^ sims[jj])
        keep = (ham <= max_hamming) & (ids_np[ii] != ids_np[jj])
        t = group.schema.field(id_col).type
        return pa.table(
            {
                "id_a": ids.take(pa.array(ii[keep], pa.int64())),
                "id_b": ids.take(pa.array(jj[keep], pa.int64())),
            }
        ).cast(pa.schema([("id_a", t), ("id_b", t)]))

    cand = ds.map_batches(sigs, batch_format="pyarrow").groupby(["band", "bhash"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    return _distinct(cand, ["id_a", "id_b"])


def hash64_band_pairs(ds, hash_col="h64", id_col="id", bands=4,
                      max_hamming=3, max_bucket=200):
    """Near-dup pairs over ANY precomputed 64-bit locality hash column
    (dHash for images, simhash for text, a rolling fingerprint...):
    the 64 bits split into ``bands`` equal chunks — by pigeonhole any
    pair within hamming ≤ bands-1 shares at least one chunk — each
    chunk a (band, bhash) bucket groupby, exact hamming verify inside
    the bucket, hot buckets truncated with a counter (same scale
    story as simhash_pairs, which this generalizes)."""
    assert 64 % bands == 0 and max_hamming < bands
    bits = 64 // bands
    mask = np.uint64((1 << bits) - 1)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = np.asarray(batch.column(hash_col), dtype=np.int64).view(np.uint64)
        n = len(h)
        rep = pa.array(np.repeat(np.arange(n), bands), pa.int64())
        band = np.tile(np.arange(bands, dtype=np.int64), n)
        bhash = (np.repeat(h, bands)
                 >> (np.uint64(bits) * band.astype(np.uint64))) & mask
        return pa.table({
            "band": pa.array(band.astype(np.int32), pa.int32()),
            "bhash": pa.array(bhash.view(np.int64), pa.int64()),
            id_col: ids.take(rep),
            "h64": pa.array(np.repeat(h, bands).view(np.int64), pa.int64()),
        })

    def pairs(group: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(group.column(id_col)), kind="stable")
        if len(order) > max_bucket:
            from .counters import incr

            incr("hash64_buckets_truncated", 1)
            incr("hash64_ids_truncated", len(order) - max_bucket)
            order = order[:max_bucket]
        ids = group.column(id_col).take(pa.array(order, pa.int64()))
        ids_np = np.asarray(ids)
        hs = np.asarray(group.column("h64"))[order].view(np.uint64)
        m = len(hs)
        ii, jj = np.triu_indices(m, k=1)
        ham = _popcount64(hs[ii] ^ hs[jj])
        keep = (ham <= max_hamming) & (ids_np[ii] != ids_np[jj])
        t = group.schema.field(id_col).type
        return pa.table({
            "id_a": ids.take(pa.array(ii[keep], pa.int64())),
            "id_b": ids.take(pa.array(jj[keep], pa.int64())),
        }).cast(pa.schema([("id_a", t), ("id_b", t)]))

    cand = (ds.map_batches(band_rows, batch_format="pyarrow")
            .groupby(["band", "bhash"])
            .map_groups(pairs, batch_format="pyarrow"))
    return _distinct(cand, ["id_a", "id_b"])


# -- embedding cosine ---------------------------------------------------


def embedding_pairs(ds, vec_col="embedding", id_col="vec_id", threshold=0.95, n_planes=8, seed=11,
                    max_bucket: int = 200):
    """Embedding near-dup pairs: random-hyperplane LSH bucket groupby
    then in-bucket exact cosine (the scale path — no all-pairs)."""

    # plane matrix per (dim) built once per worker process, not per
    # batch (dim is only known from the data; same constructor-hoist
    # pattern as MinHashBands)
    plane_cache: dict[int, np.ndarray] = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        from ..functions.similarity import _as_matrix

        vecs = _as_matrix(batch.column(vec_col))
        planes = plane_cache.get(vecs.shape[1])
        if planes is None:
            planes = np.random.RandomState(seed).randn(vecs.shape[1], n_planes)
            plane_cache[vecs.shape[1]] = planes
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
        order = np.argsort(np.asarray(group.column(id_col)), kind="stable")
        if len(order) > max_bucket:
            # NO SILENT CAPS: hot-bucket truncation surfaces through the
            # cluster-wide counters (same contract as the minhash and
            # simhash buckets above) — keep the max_bucket smallest ids
            from .counters import incr

            incr("embedding_buckets_truncated", 1)
            incr("embedding_ids_truncated", len(order) - max_bucket)
            order = order[:max_bucket]
        ids = group.column(id_col).take(pa.array(order, pa.int64()))
        ids_np = np.asarray(ids)
        vecs = np.array(group.column(vec_col).take(pa.array(order, pa.int64())).to_pylist(),
                        dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        cos = unit @ unit.T
        m = len(ids_np)
        ii, jj = np.triu_indices(m, k=1)  # all i<j pairs, no Python loop
        keep = cos[ii, jj] >= threshold
        t = group.schema.field(id_col).type
        return pa.table(
            {
                "id_a": ids.take(pa.array(ii[keep], pa.int64())),
                "id_b": ids.take(pa.array(jj[keep], pa.int64())),
                "cosine": pa.array(cos[ii[keep], jj[keep]], pa.float64()),
            }
        ).cast(pa.schema([("id_a", t), ("id_b", t), ("cosine", pa.float64())]))

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


def connected_components_distributed(pairs_ds, max_iters: int = 64):
    """Fully-distributed connected components over a pairs Dataset:
    iterated min-label propagation via groupby (the Dataset-API
    expression of label propagation — Kiveris et al. '14 "Connected
    Components in MapReduce" is the public pattern). Each iteration:
    label(v) ← min(label(v), min over neighbors' labels), as a
    join + union + groupby-Min. Converges in O(component diameter)
    rounds; near-dup clusters are shallow, so a handful in practice.

    Use when pair endpoints exceed driver memory (the union-find in
    ``connected_components`` is the small-endpoint fast path).
    Returns a Dataset (id, root). Labels must be orderable; progress
    is detected by the strictly-decreasing count of id != root rows
    changing... specifically by the per-iteration count of rows whose
    label changed (labels only decrease, so zero changes ⇒ fixpoint).
    """
    import ray.data
    from ray.data.aggregate import Min

    def undirect(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"id": batch.column("id_a"), "nbr": batch.column("id_b")})
        rev = pa.table({"id": batch.column("id_b"), "nbr": batch.column("id_a")})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    from ..common import drop_empty_blocks

    edges = drop_empty_blocks(pairs_ds.map_batches(undirect, batch_format="pyarrow"))
    if edges.count() == 0:
        try:
            id_t = pairs_ds.schema().base_schema.field("id_a").type
        except Exception:
            id_t = pa.int64()
        return ray.data.from_arrow(
            pa.table({"id": pa.array([], id_t), "root": pa.array([], id_t)})
        )
    # init: label(v) = min(v, min neighbor) — one aggregate
    labels = (
        edges.groupby("id").aggregate(Min("nbr", alias_name="root")).map_batches(
            lambda b: b.set_column(
                b.column_names.index("root"),
                "root",
                pc.min_element_wise(b.column("root"), b.column("id")),
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    labels = drop_empty_blocks(labels)
    for _ in range(max_iters):
        # propagate: neighbor's current label reaches v through the edge
        cand = drop_empty_blocks(
            edges.join(labels, "inner", 8, on=("nbr",), right_on=("id",), right_suffix="_l")
            .select_columns(["id", "root"])
            .union(labels)
            .groupby("id")
            .aggregate(Min("root", alias_name="root"))
        )
        changed = (
            labels.join(cand, "inner", 8, on=("id",), right_suffix="_new")
            .filter(expr="root != root_new")
            .count()
        )
        labels = cand
        if changed == 0:
            break
    return labels


def dedup_by_components(ds, pairs_ds, id_col="doc_id",
                        distributed: bool | None = None,
                        distributed_pair_threshold: int = 2_000_000,
                        broadcast_threshold: int = 1_000_000, num_partitions: int = 8):
    """Exact cluster dedup: keep only each connected component's min-id
    member (transitively correct, unlike the greedy pair-drop below).

    Path selection mirrors ``incremental_exact_dedup``'s
    broadcast↔anti-join switch: with ``distributed=None`` (default)
    the pair count picks the path — ≤``distributed_pair_threshold``
    pairs run the driver union-find fast path (state O(pair
    endpoints), the ray_guide-sanctioned small case), above it the
    groupby min-label propagation so a 100-TB near-dup pair set never
    builds an O(endpoints) Python dict on the driver. Forcing
    ``distributed=True/False`` overrides the switch.

    The distributed path also applies the keep-set without gathering
    it: below ``broadcast_threshold`` drop-ids the set is broadcast
    (``ray.put`` + ``pc.is_in`` — cheaper than shuffling the corpus),
    above it the corpus is LEFT-ANTI-joined against the drop-label
    table — no driver state proportional to pair endpoints on the
    at-scale path."""
    import ray

    from ..common import drop_empty_blocks

    if distributed is None:
        # One cheap count picks the path; materialize so the count and
        # the chosen CC pass don't re-execute the upstream pair hunt.
        pairs_ds = pairs_ds.materialize()
        distributed = pairs_ds.count() > distributed_pair_threshold
    if distributed:
        labels = connected_components_distributed(pairs_ds)
        dropl = drop_empty_blocks(
            labels.filter(expr="id != root").select_columns(["id"])
        ).materialize()  # consumed twice: count + (broadcast | join)
        n_drop = dropl.count()
        if n_drop == 0:
            return ds
        if n_drop > broadcast_threshold:
            right = dropl
            if id_col == "id":
                right = dropl.map_batches(
                    lambda b: b.rename_columns(["__drop_id"]), batch_format="pyarrow"
                )
            return drop_empty_blocks(ds).join(
                right,
                "left_anti",
                num_partitions,
                on=(id_col,),
                right_on=("__drop_id" if id_col == "id" else "id",),
            )
        drop = set()
        for b in dropl.iter_batches(batch_format="pyarrow"):
            drop.update(b.column("id").to_pylist())
    else:
        comp = connected_components(pairs_ds)
        drop = {i for i, root in comp.items() if i != root}
    return _drop_ids(ds, drop, id_col)


def drop_near_duplicates(ds, pairs_ds, id_col="doc_id"):
    """Greedy dedup: drop any doc that appears as the LARGER id of a
    near-dup pair (deterministic keep-smallest; one pass, no iterative
    connected components — documented approximation of CC dedup)."""
    import ray

    drop: set = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        drop.update(b.column("id_b").to_pylist())
    return _drop_ids(ds, drop, id_col)


def _drop_ids(ds, drop: set, id_col: str):
    """Anti-join against a broadcast id set — ``ray.put`` once, probed
    with vectorized ``pc.is_in`` per batch (no per-row membership
    loop). The set is bounded by the pair count, the small side by
    construction."""
    import ray

    from ..common import cached_get

    if not drop:
        return ds
    drop_ref = ray.put(pa.array(sorted(drop)))

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col), value_set=cached_get(drop_ref))
        return batch.filter(pc.invert(pc.fill_null(mask, False)))

    return ds.map_batches(keep, batch_format="pyarrow")


# -- paragraph-level exact dedup -----------------------------------------

# k = doc_id * _PARA_STRIDE + paragraph_index: a single sortable
# first-occurrence key (documents ordered by id, paragraphs by position
# within the document). Bounds paragraphs-per-document; documented in
# paragraph_dedup.
_PARA_STRIDE = 1_000_000


def paragraph_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                    sep: str = "\n", num_partitions: int = 8):
    """Corpus-wide paragraph-level exact dedup (the practical variant
    of Lee et al. '21 substring dedup, public): every paragraph keeps
    only its FIRST occurrence — ordered by (doc id, position) — across
    the whole corpus, and each document is reassembled from its
    surviving paragraphs (documents left with none are dropped).

    Dataflow: explode (vectorized split + ordinality) → ``groupby(para)
    .min(k)`` (the one shuffle, over distinct paragraphs) → distributed
    hash join back on the paragraph → ``map_groups`` reassembly per
    document. No driver-side state at any point; requires fewer than
    ``_PARA_STRIDE`` paragraphs per document."""
    import ray.data  # noqa: F401

    from ..common import drop_empty_blocks

    def explode(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        paras = pc.split_pattern(text, sep)
        if isinstance(paras, pa.ChunkedArray):
            paras = paras.combine_chunks()
        lens = np.asarray(pc.list_value_length(paras), dtype=np.int64)
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
        doc = np.repeat(ids, lens)
        # 1-based position within each document
        idx = np.arange(lens.sum(), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        ) + 1
        return pa.table({
            "para": pc.list_flatten(paras),
            id_col: pa.array(doc, pa.int64()),
            "idx": pa.array(idx, pa.int64()),
            "k": pa.array(doc * _PARA_STRIDE + idx, pa.int64()),
        })

    paras = ds.map_batches(explode, batch_format="pyarrow")
    firsts = paras.groupby("para").min("k")
    kept = drop_empty_blocks(paras).join(
        drop_empty_blocks(firsts), "inner", num_partitions,
        on=("para",), right_suffix="_f",
    )

    def only_first(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("k"), batch.column("min(k)")))

    kept = kept.map_batches(only_first, batch_format="pyarrow")

    def reassemble(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("idx"))
        joined = sep.join(group.column("para").take(order).to_pylist())
        return pa.table({
            id_col: group.column(id_col).slice(0, 1),
            "text_deduped": pa.array([joined], pa.string()),
        })

    return kept.groupby(id_col).map_groups(reassemble, batch_format="pyarrow")
