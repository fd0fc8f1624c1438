"""Approximate-nearest-neighbor search over an embedding column.

- ``topk_cosine``: brute-force baseline — per-batch numpy matmul of the
  dataset against a BROADCAST query matrix (``ray.put`` once, read per
  task; never re-shipped per batch), partial top-k per batch, final
  top-k via a small per-query groupby reduction. O(N·Q·d) compute
  streamed over blocks — the honest baseline at any corpus size.
- ``lsh_topk``: the scale path — random-hyperplane LSH bucket index;
  queries probe only their bucket (+ optional multiprobe hamming-1
  neighbors), so per-query work is O(bucket) not O(N).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy-ish via
    Arrow list flatten (fixed-dim embeddings; falls back to the Python
    path for ragged/null rows)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(col), -1)
    except (ValueError, pa.ArrowInvalid):
        return np.array(col.to_pylist(), dtype=np.float64)


def sample_vectors(ds, vec_col="embedding", id_col="vec_id", sample_size: int = 2048,
                   seed: int = 0) -> np.ndarray:
    """Deterministic uniform sample of embedding rows: per-block
    bottom-``sample_size`` by a seeded hash of the id (a bottom-k
    sketch — the k globally smallest hashes are a uniform random
    sample under ANY partitioning), merged in ONE worker task. Unlike
    ``ds.limit()``, the result is independent of block order, so a
    time- or host-clustered 100 TB layout cannot skew the sample.
    Each block contributes ≤ sample_size rows to the merge; if
    blocks × sample_size ever outgrows one task, pre-merge per spill
    bucket (documented scale knob)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({"h": pa.array([], pa.uint64()), vec_col: batch.column(vec_col)})
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        if np.issubdtype(ids_np.dtype, np.integer):
            # keep uint64 arithmetic — int64 + uint64 upcasts to float64
            h = pd.util.hash_array(ids_np.astype(np.uint64) + np.uint64(seed))
        else:
            h = pd.util.hash_array(ids_np.astype(object), hash_key=f"{seed:016d}")
        order = np.argsort(h, kind="stable")[:sample_size]
        return pa.table(
            {
                "h": pa.array(h[order], pa.uint64()),
                vec_col: batch.column(vec_col).take(pa.array(order, pa.int64())),
            }
        )

    @ray.remote
    def merge(*tables):
        tabs = [t for t in tables if t.num_columns]
        if not tabs:
            return np.empty((0, 0))
        m = pa.concat_tables(tabs).sort_by([("h", "ascending")]).slice(0, sample_size)
        return _as_matrix(m.column(vec_col))

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    return ray.get(merge.remote(*parts.to_arrow_refs()))


def topk_cosine(ds, queries: np.ndarray, k: int = 5, vec_col="embedding", id_col="vec_id",
                query_ids: list | None = None, exclude_self: bool = True):
    """Top-k cosine neighbors for each query row. Returns a Dataset
    (query_id, neighbor_id, rank, cosine) with rank 1..k ordered by
    (-cosine, neighbor_id)."""
    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put(qn)
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = _as_matrix(batch.column(vec_col))
        ids_col = batch.column(id_col)
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids_np = ids_col.to_numpy(zero_copy_only=False)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        cos = vn @ qm.T  # (n × Q)
        n, nq = cos.shape
        kk = min(k + (1 if exclude_self else 0), n)
        # one argpartition over ALL queries at once (axis=0), then
        # fancy-index the (kk × Q) selection — no per-query Python loop
        if n > kk:
            part = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # (kk, Q)
        else:
            part = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, nq))
        qidx = np.broadcast_to(np.arange(nq), part.shape)
        return pa.table(
            {
                "query_id": pa.array(
                    np.asarray(qids, np.int64)[qidx].reshape(-1, order="F"), pa.int64()
                ),
                "neighbor_id": pa.array(
                    ids_np[part].reshape(-1, order="F").astype(np.int64), pa.int64()
                ),
                "cosine": pa.array(
                    cos[part, qidx].reshape(-1, order="F").astype(np.float64), pa.float64()
                ),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        rows = sorted(
            zip(group.column("cosine").to_pylist(), group.column("neighbor_id").to_pylist()),
            key=lambda r: (-r[0], r[1]),
        )
        if exclude_self:
            rows = [r for r in rows if r[1] != qid]
        rows = rows[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int32()),
                "cosine": pa.array([r[0] for r in rows], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def train_kmeans(ds, vec_col="embedding", id_col="vec_id", n_centroids: int = 16,
                 seed: int = 31, sample_size: int = 2048, iters: int = 8) -> np.ndarray:
    """Coarse k-means centroids trained on a uniform bottom-k-by-id-hash
    sample (``sample_vectors`` — block-layout independent, so results
    are deterministic and goldenable). Lloyd iterations on the sample
    only; empty clusters keep their previous centroid. Shared by
    ``ivf_topk`` (the IVF quantizer) and ``semdedup.semantic_dedup``."""
    sample = sample_vectors(ds, vec_col=vec_col, id_col=id_col,
                            sample_size=sample_size, seed=seed)
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_topk(ds, queries: np.ndarray, k: int = 5, vec_col="embedding", id_col="vec_id",
             n_centroids: int = 16, nprobe: int = 4, seed: int = 31,
             query_ids: list | None = None, sample_size: int = 2048, iters: int = 8):
    """IVF-style ANN: a coarse k-means quantizer is trained on a
    UNIFORM sample (``sample_vectors`` — bottom-k-by-id-hash, spread
    over every block, so a sorted/clustered 100 TB layout cannot skew
    the centroids the way ``ds.limit()``'s first-blocks sample would),
    vectors are assigned to their nearest centroid via a vectorized
    matmul per batch (groupby list = the inverted file), and each
    query probes only its ``nprobe`` nearest lists. Per-query work is
    O(nprobe/n_centroids) of the corpus — the classic IVF-Flat layout
    (Jégou et al. '11, public)."""
    q = np.asarray(queries, dtype=np.float64)
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))

    # --- train the coarse quantizer on a uniform sample (tiny) ---
    cent = train_kmeans(ds, vec_col=vec_col, id_col=id_col, n_centroids=n_centroids,
                        seed=seed, sample_size=sample_size, iters=iters)
    cent_ref = ray.put(cent)

    def assign_lists(batch: pa.Table) -> pa.Table:
        C = ray.get(cent_ref)
        vecs = _as_matrix(batch.column(vec_col))
        d2 = ((vecs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                "list_id": pa.array(d2.argmin(axis=1), pa.int32()),
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
            }
        )

    # queries → probed lists
    qd2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe: dict[int, list[int]] = {}
    for qi in range(len(q)):
        for c in np.argsort(qd2[qi])[:nprobe]:
            probe.setdefault(int(c), []).append(qi)
    probe_ref = ray.put((probe, q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)))

    def list_topk(group: pa.Table) -> pa.Table:
        pr, qn = ray.get(probe_ref)
        qis = pr.get(group.column("list_id")[0].as_py(), [])
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if not qis:
            return empty
        vecs = _as_matrix(group.column(vec_col))
        ids = group.column(id_col).to_pylist()
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        cos = vn @ qn[qis].T
        out = {"query_id": [], "neighbor_id": [], "cosine": []}
        for col, qi in enumerate(qis):
            for i in np.argsort(-cos[:, col])[: k + 1]:
                out["query_id"].append(qids[qi])
                out["neighbor_id"].append(ids[i])
                out["cosine"].append(float(cos[i, col]))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        seen = set()
        rows = []
        for c, n in sorted(
            zip(group.column("cosine").to_pylist(), group.column("neighbor_id").to_pylist()),
            key=lambda r: (-r[0], r[1]),
        ):
            if n == qid or n in seen:
                continue
            seen.add(n)
            rows.append((c, n))
        rows = rows[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int32()),
                "cosine": pa.array([r[0] for r in rows], pa.float64()),
            }
        )

    return (
        ds.map_batches(assign_lists, batch_format="pyarrow")
        .groupby("list_id")
        .map_groups(list_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def lsh_topk(ds, queries: np.ndarray, k: int = 5, vec_col="embedding", id_col="vec_id",
             n_planes: int = 6, seed: int = 23, query_ids: list | None = None,
             multiprobe: bool = True):
    """LSH-bucketed ANN: index vectors into 2^n_planes buckets, probe
    each query's bucket (and hamming-1 neighbors when ``multiprobe``)."""
    q = np.asarray(queries, dtype=np.float64)
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))

    def codes_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
        sig = (m @ planes > 0).astype(np.int64)
        return (sig * (1 << np.arange(n_planes))).sum(axis=1)

    # plane matrix built ONCE on the driver (dim known from the query
    # matrix) and captured by the closure — not rebuilt per batch
    planes = np.random.RandomState(seed).randn(q.shape[1], n_planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = _as_matrix(batch.column(vec_col))
        return pa.table(
            {
                "bucket": pa.array(codes_of(vecs, planes), pa.int32()),
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
            }
        )

    qcodes = codes_of(q, planes)
    probe: dict[int, list[int]] = {}
    for qi, c in enumerate(qcodes):
        buckets = [int(c)]
        if multiprobe:
            buckets += [int(c) ^ (1 << b) for b in range(n_planes)]
        for b in buckets:
            probe.setdefault(b, []).append(qi)
    probe_ref = ray.put((probe, q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)))

    def bucket_topk(group: pa.Table) -> pa.Table:
        pr, qn = ray.get(probe_ref)
        bucket = group.column("bucket")[0].as_py()
        qis = pr.get(bucket, [])
        if not qis:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        vecs = _as_matrix(group.column(vec_col))
        ids = group.column(id_col).to_pylist()
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        cos = vn @ qn[qis].T
        out = {"query_id": [], "neighbor_id": [], "cosine": []}
        for col, qi in enumerate(qis):
            order = np.argsort(-cos[:, col])[: k + 1]
            for i in order:
                out["query_id"].append(qids[qi])
                out["neighbor_id"].append(ids[i])
                out["cosine"].append(float(cos[i, col]))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        seen = set()
        rows = []
        for c, n in sorted(
            zip(group.column("cosine").to_pylist(), group.column("neighbor_id").to_pylist()),
            key=lambda r: (-r[0], r[1]),
        ):
            if n == qid or n in seen:
                continue
            seen.add(n)
            rows.append((c, n))
        rows = rows[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int32()),
                "cosine": pa.array([r[0] for r in rows], pa.float64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def embedding_norms(ds, emb_col: str = "embedding", id_col: str = "vec_id",
                    digits: int = 6, quant: int = 1_000_000):
    """Per-vector L2 norm — the embedding-hygiene check (zero /
    exploded vectors break cosine ops downstream). Components QUANTIZE
    to int64 (round half away at 1e-6) before squaring, so the per-row
    sum is exact integer arithmetic: numpy's pairwise summation and an
    engine's sequential list_sum would otherwise disagree in the last
    ulp on plain floats. One streaming pass over the flattened Arrow
    list buffer (offsets + reduceat — no per-row Python)."""

    def norms(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64) * quant
        q = (np.sign(flat) * np.floor(np.abs(flat) + 0.5)).astype(np.int64)
        # offsets from lengths, not col.offsets: a sliced ListArray's
        # raw offsets don't start at 0 while flatten() compacts
        lens = np.asarray(pc.fill_null(pc.list_value_length(col), 0),
                          dtype=np.int64)
        starts = np.r_[0, np.cumsum(lens)][:-1]
        sq = q * q
        if len(sq):
            # reduceat rejects start == len (trailing empty rows): clip,
            # then zero the empty rows the clip mis-reads
            sums = np.add.reduceat(sq, np.minimum(starts, len(sq) - 1))
        else:
            sums = np.zeros(batch.num_rows, np.int64)
        sums = np.where(lens == 0, 0, sums)
        norm = np.sqrt(sums.astype(np.float64)) / quant
        return pa.table({
            id_col: batch.column(id_col),
            "l2_norm": pc.round(pa.array(norm, pa.float64()),
                                ndigits=digits,
                                round_mode="half_towards_infinity"),
        })

    return ds.map_batches(norms, batch_format="pyarrow")


def embedding_dim_stats(ds, emb_col: str = "embedding", dims: int = 64,
                        digits: int = 6, quant: int = 1_000_000):
    """Per-dimension mean and sample variance across the whole
    embedding table — the drift monitor for an embedding pipeline (a
    dimension whose variance collapses or mean wanders flags a model /
    preprocessing change). Components quantize to int64 (the
    embedding_norms discipline) so the per-dimension (n, Σq, Σq²)
    partial sums are exact and order-free; the shuffle carries one
    O(dims) row set per block and the float math runs once."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64) * quant
        q = (np.sign(flat) * np.floor(np.abs(flat) + 0.5)).astype(np.int64)
        m = q.reshape(-1, dims)
        return pa.table({
            "dim": pa.array(np.arange(1, dims + 1, dtype=np.int64)),
            "n": pa.array(np.full(dims, m.shape[0], np.int64)),
            "sx": pa.array(m.sum(axis=0)),
            "sxx": pa.array((m * m).sum(axis=0)),
        })

    from ..pipelines.analytics import _to_table

    agg = _to_table(ds.map_batches(partial, batch_format="pyarrow")
                    .groupby("dim").sum(["n", "sx", "sxx"])
                    ).rename_columns(["dim", "n", "sx", "sxx"])
    n = np.asarray(agg.column("n"), dtype=np.int64)
    sx = np.asarray(agg.column("sx"), dtype=np.int64)
    sxx = np.asarray(agg.column("sxx"), dtype=np.int64)
    qf = float(quant)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = (sx.astype(np.float64) / n) / qf
        var = ((sxx.astype(np.float64) - sx.astype(np.float64) * sx / n)
               / np.maximum(n - 1, 1)) / (qf * qf)
    rnd = lambda a: pc.round(pa.array(a, pa.float64()), ndigits=digits,
                             round_mode="half_towards_infinity")
    return pa.table({
        "dim": agg.column("dim"),
        "n": pa.array(n, pa.int64()),
        "mean_v": rnd(mean),
        "var_v": rnd(var),
    }).sort_by([("dim", "ascending")])


def label_centroids(ds, label_col: str = "label",
                    emb_col: str = "embedding", dims: int = 64,
                    digits: int = 6, quant: int = 1_000_000):
    """Per-label centroid of an embedding column — the class-prototype
    vector aggregate (k-means update step / per-source drift probe).
    Same exactness discipline as embedding_dim_stats: components
    quantize to int64 so per-(label, dim) partial sums are exact and
    order-free; each block ships one O(labels × dims) long-format row
    set (label, dim, sx, n), the groupby is over that narrow table,
    and the float division runs once at the end."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64) * quant
        q = (np.sign(flat) * np.floor(np.abs(flat) + 0.5)).astype(np.int64)
        m = q.reshape(-1, dims)
        labels = np.asarray(pc.cast(batch.column(label_col), pa.int64()))
        uniq, inv = np.unique(labels, return_inverse=True)
        acc = np.zeros((len(uniq), dims), np.int64)
        np.add.at(acc, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, dims)),
            "dim": pa.array(np.tile(np.arange(1, dims + 1, dtype=np.int64),
                                    len(uniq))),
            "sx": pa.array(acc.ravel()),
            "n": pa.array(np.repeat(cnt, dims)),
        })

    from ..pipelines.analytics import _to_table

    agg = _to_table(ds.map_batches(partial, batch_format="pyarrow")
                    .groupby(["label", "dim"]).sum(["sx", "n"])
                    ).rename_columns(["label", "dim", "sx", "n"])
    sx = np.asarray(agg.column("sx"), dtype=np.int64)
    n = np.asarray(agg.column("n"), dtype=np.int64)
    out = pa.table({
        "label": agg.column("label"),
        "dim": agg.column("dim"),
        "n": agg.column("n"),
        "centroid": pc.round(
            pa.array((sx.astype(np.float64) / n) / float(quant)),
            ndigits=digits, round_mode="half_towards_infinity"),
    })
    return out.sort_by([("label", "ascending"), ("dim", "ascending")])
