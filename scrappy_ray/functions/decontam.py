"""Benchmark decontamination — flag or drop training documents that
share any word-level n-gram with an evaluation/benchmark set (the
GPT-3 appendix-C / PaLM 13-gram rule; Brown et al. 2020).

Scale shape: the benchmark side is small by construction (eval suites
are 10^3–10^6 docs; the corpus is the 100 TB side), so the right plan
is broadcast, not join — build the benchmark's distinct n-gram hash
set ONCE (per-batch partial unique keeps the driver gather
O(distinct benchmark n-grams)), ``ray.put`` the sorted uint64 array,
and decontaminate in ONE streaming ``map_batches`` over the corpus
with vectorized ``searchsorted`` membership. No shuffle, no join, no
driver state proportional to the corpus.

Matching is on 64-bit n-gram hashes (pandas siphash of each token,
Horner-combined over the window), identical on both sides, so a
false positive requires a 64-bit collision (~N^2 / 2^65 — negligible
below ~10^9 distinct benchmark n-grams; raise ``n`` or shard the
benchmark set before that).

Tokenization matches the engine's token_stats convention:
whitespace-split of trimmed text (DuckDB
``regexp_split_to_array(trim(text), '\\s+')``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _TOKEN_SPLIT

# odd multiplier (golden-ratio constant) for the Horner window fold;
# uint64 wraparound multiplication is the mix
_MULT = np.uint64(0x9E3779B97F4A7C15)


def _window_hashes(texts, n: int, return_starts: bool = False):
    """Vectorized word n-gram hashes for a column of texts.

    Returns ``(hashes, doc_idx, n_docs)``: one uint64 hash per valid
    in-document window (documents with fewer than ``n`` tokens
    contribute none), plus the row index each window belongs to.
    With ``return_starts=True``, appends the 0-based within-document
    token position of each window (for span-removal consumers —
    substr_dedup)."""
    import pandas as pd

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(pc.cast(texts, pa.string()))
    toks = pc.split_pattern_regex(trimmed, _TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_docs = len(toks)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    # one siphash call over the flat token array (deterministic fixed
    # key — the same kernel the fetch-store bucket hashing relies on)
    tok_h = pd.util.hash_array(np.asarray(flat, dtype=object))

    counts = np.maximum(lengths - n + 1, 0)
    total_windows = int(counts.sum())
    if total_windows == 0:
        empty = (np.empty(0, np.uint64), np.empty(0, np.int64), n_docs)
        return empty + (np.empty(0, np.int64),) if return_starts else empty

    # global window fold over the flat token array (Horner, n vector
    # ops), then select only starts whose full window stays inside one
    # document — cheaper than per-doc slicing and fully vectorized
    w_total = len(tok_h) - n + 1
    h = np.zeros(w_total, np.uint64)
    for j in range(n):
        h = h * _MULT + tok_h[j : j + w_total]

    offsets = np.concatenate(([0], np.cumsum(lengths)))
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    base = np.repeat(offsets[:-1], counts)
    within = np.arange(total_windows, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    starts = base + within
    if return_starts:
        return h[starts], doc_idx, n_docs, within
    return h[starts], doc_idx, n_docs


def benchmark_ngram_set(bench_ds, text_col: str = "text", n: int = 13) -> np.ndarray:
    """Distinct n-gram hashes of the benchmark set as a SORTED uint64
    array. Per-batch partial unique runs distributed; the driver merge
    is O(distinct benchmark n-grams) — small by the operator's
    contract (this is the eval suite, not the corpus)."""

    def uniq(batch: pa.Table) -> pa.Table:
        wh, _, _ = _window_hashes(batch.column(text_col), n)
        return pa.table({"h": pa.array(np.unique(wh), pa.uint64())})

    parts = bench_ds.map_batches(uniq, batch_format="pyarrow")
    chunks = [
        np.asarray(b.column("h"))
        for b in parts.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not chunks:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(chunks))


def decontaminate(
    docs_ds,
    bench_hashes: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    mode: str = "flag",
):
    """Flag (``mode='flag'``: adds int64 ``n_hits`` + 0/1
    ``contaminated`` columns) or drop (``mode='filter'``: keeps only
    hit-free rows, original schema) documents sharing any word
    ``n``-gram with the benchmark set.

    ``bench_hashes`` comes from :func:`benchmark_ngram_set` (same
    ``n``). It is broadcast via ``ray.put`` once; each task reads it
    zero-copy from the local object store."""
    import ray

    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be 'flag' or 'filter', got {mode!r}")
    bench_sorted = np.sort(np.asarray(bench_hashes, np.uint64))
    ref = ray.put(bench_sorted)

    def apply(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        wh, doc_idx, n_docs = _window_hashes(batch.column(text_col), n)
        if len(bench) and len(wh):
            pos = np.searchsorted(bench, wh)
            pos[pos == len(bench)] = 0  # out-of-range probes can't match
            hit = bench[pos] == wh
        else:
            hit = np.zeros(len(wh), bool)
        n_hits = np.bincount(doc_idx, weights=hit, minlength=n_docs).astype(np.int64)
        if mode == "filter":
            return batch.filter(pa.array(n_hits == 0))
        return batch.append_column(
            "n_hits", pa.array(n_hits, pa.int64())
        ).append_column(
            "contaminated", pa.array((n_hits > 0).astype(np.int64), pa.int64())
        )

    return docs_ds.map_batches(apply, batch_format="pyarrow")
