"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. '23, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", public arXiv:2303.09540).

The web-scale shape: cluster every embedding with a coarse k-means
(quantizer trained on a uniform sample — ``similarity.train_kmeans``,
the same block-layout-independent trainer the IVF index uses), then
prune near-duplicates WITHIN each cluster only, so the pairwise work
is O(Σ cluster²) instead of O(N²) and parallelizes as one
``groupby(cluster).map_groups``. No all-pairs pass, no driver state.

Within a cluster the paper keeps, from every group of embeddings with
pairwise cosine above ``1 - eps``, the member FARTHEST from the
cluster centroid (retaining the "edge" examples that carry the most
signal). That rule is implemented as the standard greedy sweep:
members ordered by (centroid-similarity ASC, id ASC — deterministic),
and a member is dropped when any EARLIER member — kept or itself
dropped — is within ``eps`` cosine of it (the paper's released
upper-triangle-max rule: transitive near-dup chains collapse to their
single earliest member). The earliest member of each group — the
farthest-from-centroid one — survives. The sweep is one vectorized
(B×B) matmul + column-max per cluster, capped at ``max_cluster``
members (overflow members are kept un-pruned and COUNTED via
``functions.counters`` — never a silent cap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .similarity import _as_matrix, train_kmeans


def semantic_dedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                   eps: float = 0.05, n_clusters: int = 16, seed: int = 31,
                   sample_size: int = 2048, iters: int = 8,
                   max_cluster: int = 4096, digits: int = 6):
    """(id, cluster, centroid_sim, keep) for every row — ``keep`` = 0
    marks a semantic duplicate (a kept neighbor within ``eps`` cosine
    exists in its cluster). Filter on ``keep`` downstream, or join the
    drop-set away; emitting the full assignment keeps the operator
    composable (the cluster ids double as a corpus map)."""
    cent = train_kmeans(ds, vec_col=vec_col, id_col=id_col,
                        n_centroids=n_clusters, seed=seed,
                        sample_size=sample_size, iters=iters)
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    cent_ref = ray.put((cent, cn))

    def assign(batch: pa.Table) -> pa.Table:
        C, _ = ray.get(cent_ref)
        vecs = _as_matrix(batch.column(vec_col))
        d2 = ((vecs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            "cluster": pa.array(d2.argmin(axis=1), pa.int32()),
            id_col: batch.column(id_col),
            vec_col: batch.column(vec_col),
        })

    thr = 1.0 - eps

    def prune(group: pa.Table) -> pa.Table:
        from . import counters

        _, CN = ray.get(cent_ref)
        cluster = group.column("cluster")[0].as_py()
        ids = np.asarray(group.column(id_col).combine_chunks()
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        vecs = _as_matrix(group.column(vec_col))
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        csim = vn @ CN[cluster]
        keep = np.ones(len(ids), bool)

        # deterministic sweep order: farthest-from-centroid first
        order = np.lexsort((ids, csim))
        if len(order) > max_cluster:
            counters.incr("semdedup_clusters_truncated", 1)
            counters.incr("semdedup_ids_unpruned", len(order) - max_cluster)
            order = order[:max_cluster]
        if len(order) > 1:
            m = vn[order] @ vn[order].T
            np.fill_diagonal(m, -np.inf)
            m[np.tril_indices(len(order), k=-1)] = -np.inf  # earlier-only
            dup = np.max(m, axis=0) >= thr
            keep[order[dup]] = False
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array(np.full(len(ids), cluster, np.int32()), pa.int32()),
            "centroid_sim": pa.array(np.round(csim, digits), pa.float64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )
