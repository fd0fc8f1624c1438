"""Exact duplicated-substring removal — the ExactSubstr rule of Lee et
al. '21 ("Deduplicating Training Data Makes Language Models Better",
public arXiv:2107.06499): any word span of ``n`` tokens that occurs
more than once ANYWHERE in the corpus (across documents or within one)
is removed from every occurrence.

The paper builds a corpus-wide suffix array; the Ray-Data-native
equivalent for a fixed window length exploits that a duplicated span
of length ≥ n is exactly a run of duplicated n-token windows:

1. **Count pass** — one streaming ``map_batches`` emits per-batch
   partial (window-hash, min/max occurrence-key) triples (the same
   vectorized Horner fold over one siphash call as decontam's
   ``_window_hashes``), reduced by the engine's EXTERNAL hash shuffle
   (``stages/shuffle.py`` — Ray 2.49's sort-based groupby measured
   ~10× slower on exactly this many-small-groups shape; 25 s → ~2 s
   on the sf0.1 bench corpus). A hash is duplicated iff its global
   min and max occurrence keys differ — min/max are
   DUPLICATE-INSENSITIVE, which the spill contract requires (a
   retried spill task leaves duplicate rows; a count-sum reducer
   would double-count them and promote singleton windows to
   "duplicated"). The occurrence key is ``doc_id·2³² + start``
   (unique while doc ids stay below 2³¹ and documents below 2³²
   tokens). This shuffle moves O(distinct windows × blocks)
   fixed-width rows — the operator's honest cost, the analogue of
   the paper's suffix-array sort.
2. **Dup set** — hashes with total count ≥ 2. Natural corpora
   duplicate a few percent of windows (the paper's measurement), so
   the set is gathered sorted to the driver and broadcast via
   ``ray.put``; ``max_broadcast`` guards the assumption — overflow
   raises with the measured size rather than silently OOMing the
   driver (shard by hash range and run per shard when a corpus
   exceeds it).
3. **Removal pass** — one streaming ``map_batches``: membership via
   vectorized ``searchsorted``, covered tokens via a per-batch
   difference-array cumsum (union of [start, start+n) spans), and the
   surviving tokens re-assembled per document with one Arrow
   ``binary_join`` — no Python per row.

Output text is whitespace-normalized (tokens re-joined with single
spaces) — the same convention as chunking/paragraph dedup, and what
makes the SQL oracle exactly reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .decontam import _window_hashes
from .textstats import _TOKEN_SPLIT


def duplicated_window_hashes(docs_ds, text_col: str = "text",
                             id_col: str = "doc_id", n: int = 50,
                             max_broadcast: int = 50_000_000,
                             num_buckets: int = 32,
                             tmp_dir: str | None = None) -> np.ndarray:
    """Sorted hashes (int64 view) of every word ``n``-gram occurring
    ≥ 2 times in the corpus (within- and cross-document occurrences
    both count, matching the paper). Reduced via the external hash
    shuffle with a duplicate-insensitive min/max-occurrence-key
    reducer — see the module docstring."""
    import shutil
    import tempfile

    from ..stages.shuffle import hash_partition_reduce

    def partial(batch: pa.Table) -> pa.Table:
        wh, doc_idx, _, starts = _window_hashes(
            batch.column(text_col), n, return_starts=True)
        # int64 REINTERPRETATION of the uint64 hashes: Arrow/Ray
        # aggregate paths pickle uint64 values past int64 max; equality
        # and sorted membership survive the view as long as every
        # consumer uses the same view
        h = wh.view(np.int64)
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()),
                         dtype=np.int64)
        k = ids[doc_idx] * (np.int64(1) << np.int64(32)) + starts
        t = pa.table({"h": pa.array(h, pa.int64()),
                      "k": pa.array(k, pa.int64())})
        return (t.group_by("h").aggregate([("k", "min"), ("k", "max")])
                .rename_columns(["h", "kmin", "kmax"]))

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (t.group_by("h").aggregate([("kmin", "min"), ("kmax", "max")])
                .rename_columns(["h", "kmin", "kmax"]))

    own_tmp = tmp_dir is None
    if own_tmp:
        tmp_dir = tempfile.mkdtemp(prefix="substr_dedup_")
    try:
        merged = hash_partition_reduce(
            docs_ds.map_batches(partial, batch_format="pyarrow"),
            ["h"], reduce_fn, tmp_dir, num_buckets=num_buckets,
            select=["h", "kmin", "kmax"])

        def dup_only(batch: pa.Table) -> pa.Table:
            keep = pc.not_equal(batch.column("kmin"), batch.column("kmax"))
            return pa.table({"h": batch.column("h").filter(keep)})

        chunks = [
            np.asarray(b.column("h"))
            for b in merged.map_batches(dup_only, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
    finally:
        if own_tmp:
            shutil.rmtree(tmp_dir, ignore_errors=True)
    total = sum(len(c) for c in chunks)
    if total > max_broadcast:
        raise ValueError(
            f"duplicated-window set has {total} entries > max_broadcast="
            f"{max_broadcast}; shard the corpus by hash range and dedup "
            f"per shard (or raise the limit)")
    if not chunks:
        return np.empty(0, np.int64)
    return np.sort(np.concatenate(chunks).astype(np.int64))


def dedup_substrings(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                     n: int = 50, dup_hashes: np.ndarray | None = None,
                     max_broadcast: int = 50_000_000,
                     replace_text: bool = False,
                     count_key: str | None = None):
    """(id, text_deduped, n_removed) per document: every token covered
    by a corpus-duplicated ``n``-token window is removed, survivors
    re-joined with single spaces. Pass a precomputed ``dup_hashes``
    (from :func:`duplicated_window_hashes`) to skip the count pass —
    e.g. when deduping several splits against one corpus-wide set.

    ``replace_text=True`` instead returns the INPUT schema with
    ``text_col`` rewritten in place (the pipeline-stage mode —
    clean_corpus uses it so later gates see the deduped text);
    ``count_key`` additionally fires the per-batch removed-token total
    into ``functions.counters`` under that key."""
    import ray

    if dup_hashes is None:
        dup_hashes = duplicated_window_hashes(
            docs_ds, text_col=text_col, id_col=id_col, n=n,
            max_broadcast=max_broadcast)
    ref = ray.put(np.asarray(dup_hashes, np.int64))

    def remove(batch: pa.Table) -> pa.Table:
        dup = ray.get(ref)
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(pc.cast(texts, pa.string()))
        toks = pc.split_pattern_regex(trimmed, _TOKEN_SPLIT)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(lengths)
        offsets = np.concatenate(([0], np.cumsum(lengths)))
        total_toks = int(offsets[-1])

        wh, doc_idx, _, starts = _window_hashes(texts, n, return_starts=True)
        wh = wh.view(np.int64)  # same reinterpretation as the count pass
        covered = np.zeros(total_toks, bool)
        if len(dup) and len(wh):
            pos = np.searchsorted(dup, wh)
            pos[pos == len(dup)] = 0
            hit = dup[pos] == wh
            if hit.any():
                # union of [start, start+n) spans via a difference array
                # over the FLAT token axis (spans never cross documents
                # by construction of the window starts)
                flat_start = offsets[doc_idx[hit]] + starts[hit]
                diff = np.zeros(total_toks + 1, np.int64)
                np.add.at(diff, flat_start, 1)
                np.add.at(diff, flat_start + n, -1)
                covered = np.cumsum(diff[:-1]) > 0

        keep_mask = ~covered
        flat = toks.flatten()
        kept_flat = flat.filter(pa.array(keep_mask))
        kept_per_doc = np.zeros(n_docs, np.int64)
        if total_toks:
            # reduceat quirks: a repeated index (zero-length doc) returns
            # the element AT the index, and an index == len is invalid —
            # clip, then zero the empty docs
            idx = np.minimum(offsets[:-1], total_toks - 1)
            kept_per_doc = np.add.reduceat(
                keep_mask.astype(np.int64), idx
            ) * (lengths > 0)
        new_offsets = np.concatenate(([0], np.cumsum(kept_per_doc))).astype(np.int32)
        rebuilt = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()),
                                           kept_flat)
        joined = pc.cast(pc.binary_join(rebuilt, " "), pa.string())
        n_removed = lengths - kept_per_doc
        if count_key is not None:
            from . import counters

            counters.incr(count_key, int(n_removed.sum()))
        if replace_text:
            i = batch.column_names.index(text_col)
            return batch.set_column(i, text_col, joined)
        return pa.table({
            id_col: batch.column(id_col),
            "text_deduped": joined,
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    return docs_ds.map_batches(remove, batch_format="pyarrow")
