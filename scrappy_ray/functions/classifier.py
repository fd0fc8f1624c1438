"""GPT-3-style quality-classifier filtering (Brown et al. '20 App. A;
CCNet, Wenzek et al. '19 — both public): train a linear classifier to
tell a high-quality reference slice from random web documents, score
every document, and keep the docs that clear a threshold — or, in
lottery mode, that win a deterministic variant of GPT-3's Pareto
resampling rule.

Ray-Data-native split of the work:

- **TRAIN is the small side.** A deterministic, block-layout-
  independent bottom-k-by-id-hash sample per class (the same mergeable
  bottom-k pattern as ``sketch.approx_quantiles_by_group``) is gathered
  to the driver — O(2k) rows, never the corpus — and fit with
  full-batch Adagrad logistic regression on hashed bag-of-words
  features (feature hashing, Weinberger et al. '09; Adagrad, Duchi et
  al. '11). Fixed iteration count, fixed sample ordering, no RNG ⇒
  bit-identical weights on any cluster layout.
- **SCORE is the at-scale side.** The weight vector (2^b float64 —
  0.5 MB at b=16) is broadcast once into a streaming ``map_batches``
  (closure capture; Ray serializes it into the object store once per
  task graph). Per batch: token→bucket is one vectorized siphash call,
  per-doc logits are one ``np.bincount`` segment sum — no Python per
  row.

The GPT-3 keep rule is stochastic (``np.random.pareto(9) > 1 -
score``); a distributed filter must be reproducible under retries, so
``keep_mode="lottery"`` replaces the RNG draw with the inverse-CDF of
the SAME Pareto(alpha) law evaluated at a per-document uniform derived
from the Knuth multiplicative hash of ``id_col`` (the
``sampling.hash_sample`` kernel) — identical acceptance distribution,
deterministic per document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import _tokens_of
from .sampling import _hash_bucket
from .sketch import _hash64


class QualityModel:
    """Broadcast payload: the hashed-feature weight vector + bias."""

    __slots__ = ("w", "b", "dim")

    def __init__(self, w: np.ndarray, b: float):
        self.w, self.b, self.dim = w, float(b), len(w)


def _feature_arrays(batch_text, dim: int):
    """(doc_idx, bucket, value, n_docs): one hashed-BoW feature triple
    per token, tf-normalized per document — all vectorized."""
    tokens = _tokens_of(batch_text)
    lens = np.asarray(pc.list_value_length(tokens), dtype=np.int64)
    n_docs = len(lens)
    flat = pc.list_flatten(tokens)
    if not len(flat):
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), n_docs)
    bucket = (_hash64(flat) % np.uint64(dim)).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    val = 1.0 / np.maximum(lens, 1)[doc_idx]
    return doc_idx, bucket, val, n_docs


def _logits(model: QualityModel, doc_idx, bucket, val, n_docs) -> np.ndarray:
    z = np.full(n_docs, model.b)
    if len(doc_idx):
        z += np.bincount(doc_idx, weights=model.w[bucket] * val,
                         minlength=n_docs)
    return z


def train_quality_classifier(
    ds, label_col: str, id_col: str = "doc_id", text_col: str = "text",
    dim: int = 1 << 16, sample_k: int = 2048, iters: int = 300,
    lr: float = 1.0, l2: float = 1e-6,
) -> QualityModel:
    """Fit logistic regression on a deterministic bottom-k-by-id-hash
    sample per class (label 1 = reference/positive). The per-class
    bottom-k is mergeable, so the sample — hence the model — is
    independent of block count and arrival order. The optimizer is
    full-batch Adagrad (Duchi et al. '11): per-feature step scaling is
    what makes sparse hashed BoW converge in a few hundred passes
    where plain GD stalls near the class prior — and it stays RNG-free
    and order-deterministic, so weights are goldenable."""

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash64(batch.column(id_col))
        y = np.asarray(pc.cast(batch.column(label_col), pa.int64()),
                       dtype=np.int64)
        keep = np.zeros(len(h), bool)
        for cls in (0, 1):
            idx = np.flatnonzero(y == cls)
            if len(idx) > sample_k:
                idx = idx[np.argpartition(h[idx], sample_k)[:sample_k]]
            keep[idx] = True
        take = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({
            id_col: batch.column(id_col).take(take),
            text_col: batch.column(text_col).take(take),
            "_y": pa.array(y[keep], pa.int64()),
            "_h": pa.array(h[keep], pa.uint64()),
        })

    import ray

    tabs = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_columns and t.num_rows]
    if not tabs:
        raise ValueError("train_quality_classifier: empty input")
    sample = pa.concat_tables(tabs)
    y_all = np.asarray(sample.column("_y"), dtype=np.int64)
    h_all = np.asarray(sample.column("_h"))
    keep = np.zeros(len(y_all), bool)
    for cls in (0, 1):  # re-cut the merged partials to k per class
        idx = np.flatnonzero(y_all == cls)
        if len(idx) > sample_k:
            idx = idx[np.argpartition(h_all[idx], sample_k)[:sample_k]]
        keep[idx] = True
    sample = sample.filter(pa.array(keep)).sort_by(id_col)  # fixed order

    y = np.asarray(sample.column("_y"), dtype=np.float64)
    if y.min() == y.max():
        raise ValueError("train_quality_classifier: need both classes "
                         f"in the sample (got only label {int(y[0])})")
    doc_idx, bucket, val, n = _feature_arrays(sample.column(text_col), dim)

    w = np.zeros(dim)
    b = 0.0
    G = np.zeros(dim)
    Gb = 0.0
    for _ in range(iters):  # full-batch Adagrad — deterministic, no RNG
        z = np.full(n, b)
        if len(doc_idx):
            z += np.bincount(doc_idx, weights=w[bucket] * val, minlength=n)
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) / n
        gw = np.zeros(dim)
        np.add.at(gw, bucket, g[doc_idx] * val)
        gw += l2 * w
        gb = float(g.sum())
        G += gw * gw
        Gb += gb * gb
        w -= lr * gw / np.sqrt(G + 1e-10)
        b -= lr * gb / np.sqrt(Gb + 1e-10)
    return QualityModel(w, b)


def quality_classify(
    ds, label_col: str, id_col: str = "doc_id", text_col: str = "text",
    dim: int = 1 << 16, sample_k: int = 2048, iters: int = 300,
    lr: float = 1.0, l2: float = 1e-6, threshold: float = 0.5,
    keep_mode: str = "threshold", alpha: float = 9.0, digits: int = 6,
    model: QualityModel | None = None,
):
    """(id, score, keep) for every document. ``keep_mode="threshold"``
    keeps score ≥ threshold; ``"lottery"`` keeps docs winning the
    deterministic Pareto(alpha) draw (GPT-3 App. A rule,
    ``pareto_u > 1 - score`` with the draw derived from the id hash).
    Scores are rounded to ``digits`` for cross-engine goldenability.
    Pass a pre-trained ``model`` to skip the training pass (e.g. score
    a new corpus under a frozen classifier)."""
    if keep_mode not in ("threshold", "lottery"):
        raise ValueError(f"unknown keep_mode {keep_mode!r}")
    m = model or train_quality_classifier(
        ds, label_col, id_col, text_col, dim, sample_k, iters, lr, l2)

    def score(batch: pa.Table) -> pa.Table:
        feats = _feature_arrays(batch.column(text_col), dim)
        z = _logits(m, *feats)
        s = np.round(1.0 / (1.0 + np.exp(-z)), digits)
        if keep_mode == "threshold":
            keep = s >= threshold
        else:
            ids = np.asarray(
                pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
            u = _hash_bucket(ids, 0).astype(np.float64) / float(1 << 32)
            pareto = np.power(1.0 - np.minimum(u, 1.0 - 1e-12), -1.0 / alpha) - 1.0
            keep = pareto > 1.0 - s
        return pa.table({
            id_col: batch.column(id_col),
            "score": pa.array(s, pa.float64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
