"""Learned byte-pair-encoding tokenizer (Sennrich et al. '16, public).

The training-corpus-sized work is ONE distributed word-type count
(per-batch partial Arrow group_by → ``groupby("w").sum``, the exact
``lm.bigram_counts`` pattern); everything after runs on the
O(|word types|) distinct-word table, which Zipf keeps tiny relative to
the corpus (the ``min_count`` / ``max_types`` knobs bound it explicitly
— at 100 TB one would feed the table through ``sketch.heavy_hitters``
instead of an exact count; nothing downstream changes).

The merge-learning loop is fully vectorized: all word types live in one
flat int32 symbol array with a parallel word-id array, so each of the
``num_merges`` iterations is a handful of numpy kernels over the flat
array (pair keys → weighted bincount → argmax → masked rewrite), not a
Python loop over words. Ties break on the smallest (left_id, right_id)
pair key — deterministic because symbol ids are assigned in sorted
alphabet order and then merge order, so the learned merge table is
byte-identical across runs and block layouts (golden-oracle-able).

Encoding is a stateful actor-pool stage (``BPEEncoder``): the merge
ranks build once per actor in ``__init__``; per batch, the distinct
words are encoded once each through a per-actor cache (Zipf again: the
cache hit rate dominates) and per-document token counts come from one
``np.bincount`` over the flattened word→doc index. No per-token Python
on the hot path — per-WORD-TYPE Python only, on cache misses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _TOKEN_SPLIT

END = "</w>"  # end-of-word sentinel symbol (its own symbol, never merged away)


def _words_of(batch_text):
    text = pc.fill_null(pc.cast(batch_text, pa.string()), "")
    words = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _TOKEN_SPLIT)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    return words


def word_type_counts(ds, text_col: str = "text"):
    """Distributed exact word-type counts: Dataset of (w, c). The only
    corpus-sized pass in BPE training; the shuffle moves
    O(distinct words × blocks) partial-count rows, never O(tokens)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_words_of(batch.column(text_col)))
        t = pa.table({"w": flat})
        return t.group_by("w").aggregate([("w", "count")]).rename_columns(["w", "c"])

    return ds.map_batches(partial, batch_format="pyarrow").groupby("w").sum("c")


def learn_bpe(
    ds,
    num_merges: int = 200,
    text_col: str = "text",
    min_count: int = 2,
    max_types: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from a documents Dataset.
    Returns the ranked merge list [(left, right), ...] — deterministic
    and block-layout-independent (exact distributed counts; smallest-
    pair-key tie-break)."""
    # Prune INSIDE the groupby output before the driver gather: the
    # unfiltered word-type table is heavy-tailed (O(types) ~ tens of
    # millions at corpus scale) but min_count cuts the singleton tail
    # — typically >half the types — distributed. Dropped type/token
    # mass is counted, never silent.
    def prune(batch: pa.Table) -> pa.Table:
        from .counters import incr

        c = batch.column("sum(c)") if "sum(c)" in batch.column_names \
            else batch.column("c")
        keep = pc.greater_equal(c, min_count)
        n_drop = batch.num_rows - pc.sum(pc.cast(keep, pa.int64())).as_py()
        if n_drop:
            incr("bpe_types_dropped", n_drop)
            incr("bpe_token_mass_dropped",
                 int(pc.sum(pc.if_else(keep, pa.scalar(0, pa.int64()),
                                       pc.cast(c, pa.int64()))).as_py() or 0))
        return batch.filter(keep)

    wc = (word_type_counts(ds, text_col)
          .map_batches(prune, batch_format="pyarrow").to_pandas())
    if len(wc) == 0:
        return []
    wc = wc.rename(columns={"sum(c)": "c"})
    # bound the driver table: top max_types by (count desc, word asc)
    wc = wc.sort_values(["c", "w"], ascending=[False, True]).head(max_types)
    words = wc["w"].astype(str).to_numpy()
    counts = wc["c"].to_numpy(dtype=np.int64)
    if len(words) == 0:
        return []
    return _learn_from_types(words, counts, num_merges)


def _learn_from_types(
    words: np.ndarray, counts: np.ndarray, num_merges: int
) -> list[tuple[str, str]]:
    # --- build the flat symbol / word-id / weight arrays -------------
    # initial alphabet: every character in sorted order, then END
    chars = sorted(set("".join(words.tolist())))
    sym_strs: list[str] = list(chars) + [END]
    sym_id = {s: i for i, s in enumerate(sym_strs)}
    end_id = sym_id[END]

    lens = np.fromiter((len(w) for w in words), np.int64, len(words)) + 1
    total = int(lens.sum())
    syms = np.empty(total, np.int32)
    pos = 0
    for w in words:  # one-time build over word TYPES, not the corpus
        n = len(w)
        syms[pos : pos + n] = [sym_id[ch] for ch in w]
        syms[pos + n] = end_id
        pos += n + 1
    wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    wgt = np.repeat(counts, lens)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if len(syms) < 2:
            break
        valid = wid[:-1] == wid[1:]
        if not valid.any():
            break
        S = np.int64(len(sym_strs))
        keys = syms[:-1].astype(np.int64) * S + syms[1:].astype(np.int64)
        vkeys = keys[valid]
        vwgt = wgt[:-1][valid]
        uk, inv = np.unique(vkeys, return_inverse=True)
        cnt = np.bincount(inv, weights=vwgt)
        best = int(np.argmax(cnt))  # first max = smallest pair key (uk sorted)
        if cnt[best] < 2:  # no pair repeats: nothing left worth merging
            break
        a = int(uk[best] // S)
        b = int(uk[best] % S)
        new = sym_strs[a] + sym_strs[b]
        merges.append((sym_strs[a], sym_strs[b]))
        c = len(sym_strs)
        sym_strs.append(new)
        # positions where (a, b) occurs within a word
        hit = np.flatnonzero((syms[:-1] == a) & (syms[1:] == b) & valid)
        if a == b and len(hit) > 1:
            # overlapping runs (e.g. 'aaa'): keep leftmost of each run
            keep_mask = np.ones(len(hit), bool)
            prev_kept = hit[0]
            for j in range(1, len(hit)):
                if hit[j] == prev_kept + 1:
                    keep_mask[j] = False
                else:
                    prev_kept = hit[j]
            hit = hit[keep_mask]
        syms[hit] = c
        drop = np.ones(len(syms), bool)
        drop[hit + 1] = False
        syms = syms[drop]
        wid = wid[drop]
        wgt = wgt[drop]
    return merges


class BPEEncoder:
    """Actor-pool encoding stage: merge ranks built once per actor,
    per-actor word→length cache (Zipf: hits dominate), per-document
    counts via one ``np.bincount`` per batch. Emits
    (id_col, n_bpe_learned)."""

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text",
                 id_col: str = "doc_id"):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col, self.id_col = text_col, id_col
        self._cache: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        n = self._cache.get(word)
        if n is not None:
            return n
        parts = list(word) + [END]
        ranks = self.ranks
        while len(parts) > 1:
            best_rank, best_i = None, -1
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        n = len(parts)
        if len(self._cache) < 2_000_000:  # bound actor heap
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = _words_of(batch.column(self.text_col))
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if len(flat):
            uniq = pc.unique(flat)
            tok_lens = np.fromiter(
                (self._encode_len(w) for w in uniq.to_pylist()), np.int64, len(uniq)
            )
            code = np.asarray(pc.index_in(flat, value_set=uniq), dtype=np.int64)
            per_word = tok_lens[code]
            n_bpe = np.bincount(doc_idx, weights=per_word, minlength=len(lens)).astype(
                np.int64
            )
        else:
            n_bpe = np.zeros(len(lens), np.int64)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_bpe_learned": pa.array(n_bpe, pa.int64()),
            }
        )


def bpe_token_stats(ds, merges: list[tuple[str, str]], text_col: str = "text",
                    id_col: str = "doc_id", concurrency: int = 4,
                    batch_size: int = 1024):
    """(id, n_bpe_learned) under a learned merge table — the deployment
    pass; ``merges`` is closure-broadcast once per task graph."""
    return ds.map_batches(
        BPEEncoder,
        fn_constructor_args=(merges, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Freeze a learned merge table to parquet (rank-ordered) — the
    deployment artifact: train once, encode many corpora against the
    SAME tokenizer (the minhash_band_index frozen-reference pattern)."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
        }),
        path,
    )


def load_merges(path: str) -> list[tuple[str, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(path).sort_by([("rank", "ascending")])
    return list(zip(t.column("left").to_pylist(), t.column("right").to_pylist()))
