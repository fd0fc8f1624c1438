"""Text analysis over a documents table — language ID, quality
scoring, token counting, document fingerprinting. All vectorized with
pyarrow.compute / numpy inside map_batches (no per-row Python in the
counting paths)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# stopword lists for the n-gram/stopword langid heuristic (public,
# high-frequency function words)
_EN = frozenset(
    "the of and to in a is that it for on with as are was be at by this have from or an "
    "not but they his her she he you we their has had were which one all".split()
)
_ES = frozenset(
    "el la de que y a en un ser se no haber por con su para como estar tener le lo "
    "todo pero más hacer o poder decir este ir otro ese si me ya ver porque cuando "
    "muy sin sobre también hasta donde quien desde nos durante uno les ni contra".split()
)

# Arrow value sets for pc.is_in — token membership stays in C (one
# kernel call over the flattened token array, no Python iteration)
_EN_ARR = pa.array(sorted(_EN), pa.string())
_ES_ARR = pa.array(sorted(_ES), pa.string())
_STOP_ARR = pa.array(sorted(_EN | _ES), pa.string())

_TOKEN_SPLIT = r"\s+"
_PUNCT_RE = r"[.,;:!?]"
# BPE-ish word/number/punct tokenizer (GPT-2-style coarse classes)
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(ds, text_col="text", id_col="doc_id"):
    """(id, n_chars, n_tokens, n_bpe_tokens) — n_tokens is whitespace
    split of trimmed text (matches DuckDB
    len(regexp_split_to_array(trim(text),'\\s+')))."""

    def stats(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column(text_col), pa.string())
        trimmed = pc.utf8_trim_whitespace(text)
        n_chars = pc.utf8_length(text)
        n_tokens = pc.list_value_length(pc.split_pattern_regex(trimmed, _TOKEN_SPLIT))
        n_bpe = pc.count_substring_regex(text, _BPE_RE)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def quality_kernel(text) -> dict:
    """Batch kernel behind :func:`quality_scores` — takes a string
    array/chunked-array, returns the metric columns as a dict. Exposed
    so composed pipelines (corpus cleaning) can compute quality inline
    in their own map_batches without a second pass or an id gather."""
    text = pc.cast(text, pa.string())
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.float64())
    digits = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
    uppers = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.float64())
    tokens = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _TOKEN_SPLIT)
    n_tokens = pc.cast(pc.list_value_length(tokens), pa.float64())
    safe_tokens = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    mean_word_len = pc.divide(n_chars, safe_tokens)

    # stopword ratio: Arrow set membership over the flattened token
    # array — pc.is_in keeps the whole membership test in C
    flat = pc.list_flatten(pc.split_pattern_regex(pc.utf8_lower(pc.utf8_trim_whitespace(text)), _TOKEN_SPLIT))
    offsets = np.asarray(pc.list_value_length(tokens)).astype(np.int64)
    is_stop = pc.is_in(flat, value_set=_STOP_ARR).to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.repeat(np.arange(len(offsets)), offsets)
    stop_counts = np.bincount(idx, weights=is_stop, minlength=len(offsets))
    stop_ratio = stop_counts / np.maximum(np.asarray(safe_tokens, dtype=np.float64), 1.0)

    punct_ratio = pc.divide(punct, safe_chars)
    digit_ratio = pc.divide(digits, safe_chars)
    upper_ratio = pc.divide(uppers, safe_chars)
    # composite: long-enough, punctuated, not digit-heavy, stopwordy
    comp = (
        np.clip(np.asarray(n_tokens) / 20.0, 0, 1) * 0.3
        + np.clip(np.asarray(punct_ratio) * 20.0, 0, 1) * 0.2
        + (1.0 - np.clip(np.asarray(digit_ratio) * 5.0, 0, 1)) * 0.2
        + np.clip(stop_ratio * 3.0, 0, 1) * 0.3
    )
    return {
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "upper_ratio": upper_ratio,
        "mean_word_len": mean_word_len,
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
        "quality": pa.array(comp, pa.float64()),
    }


def lang_kernel(text) -> dict:
    """Batch kernel behind :func:`lang_id` — stopword-vote en/es/und
    prediction over a string array; see quality_kernel for why it is
    exposed separately."""
    text = pc.utf8_lower(pc.cast(text, pa.string()))
    tokens = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _TOKEN_SPLIT)
    offsets = np.asarray(pc.list_value_length(tokens)).astype(np.int64)
    flat = pc.list_flatten(tokens)
    en = pc.is_in(flat, value_set=_EN_ARR).to_numpy(zero_copy_only=False).astype(np.int64)
    es = pc.is_in(flat, value_set=_ES_ARR).to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.repeat(np.arange(len(offsets)), offsets)
    en_c = np.bincount(idx, weights=en, minlength=len(offsets))
    es_c = np.bincount(idx, weights=es, minlength=len(offsets))
    pred = np.where(en_c > es_c, "en", np.where(es_c > en_c, "es", "und"))
    return {
        "lang_pred": pa.array(pred.tolist(), pa.string()),
        "en_hits": pa.array(en_c.astype(np.int64), pa.int64()),
        "es_hits": pa.array(es_c.astype(np.int64), pa.int64()),
    }


def quality_scores(ds, text_col="text", id_col="doc_id"):
    """Quality heuristics: punct ratio, digit ratio, upper ratio, mean
    word length, stopword ratio, plus a composite [0,1] score."""

    def q(batch: pa.Table) -> pa.Table:
        cols = quality_kernel(batch.column(text_col))
        return pa.table({id_col: batch.column(id_col), **cols})

    return ds.map_batches(q, batch_format="pyarrow")


def lang_id(ds, text_col="text", id_col="doc_id"):
    """Stopword-vote language ID (en/es/unknown) — the n-gram-free
    heuristic; vectorized token membership via numpy."""

    def lid(batch: pa.Table) -> pa.Table:
        cols = lang_kernel(batch.column(text_col))
        return pa.table({id_col: batch.column(id_col), **cols})

    return ds.map_batches(lid, batch_format="pyarrow")


def _segment_max_sum(keys: np.ndarray, group_of: np.ndarray):
    """Per-group (max, sum) of multiplicities of ``keys``; ``group_of``
    maps each key to its group. Both O(n log n) with no Python loops:
    unique keys come back sorted, so groups are contiguous and
    reduceat does the per-group fold."""
    order = np.argsort(keys, kind="stable")
    sk, sg = keys[order], group_of[order]
    uniq_mask = np.empty(len(sk), dtype=bool)
    uniq_mask[0] = True
    np.not_equal(sk[1:], sk[:-1], out=uniq_mask[1:])
    starts = np.flatnonzero(uniq_mask)
    counts = np.diff(np.r_[starts, len(sk)])
    groups = sg[starts]
    gb = np.flatnonzero(np.r_[True, groups[1:] != groups[:-1]])
    return (
        groups[gb],
        np.maximum.reduceat(counts, gb),
        np.add.reduceat(counts, gb),
        np.add.reduceat(np.ones(len(counts), np.int64), gb),  # n distinct
    )


def repetition_kernel(text) -> dict:
    """Gopher-style repetition metrics (Rae et al. '21, public) over a
    string array: most-frequent-unigram fraction, most-frequent-bigram
    fraction, duplicate-line fraction. Tokens are whitespace splits of
    trimmed text (same convention as token_stats); everything is Arrow
    dictionary-encode + numpy segment reductions — no per-row Python."""
    text = pc.fill_null(pc.cast(text, pa.string()), "")
    tokens = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _TOKEN_SPLIT)
    lens = np.asarray(pc.list_value_length(tokens), dtype=np.int64)
    n_docs = len(lens)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    enc = pc.dictionary_encode(pc.list_flatten(tokens))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    vocab = len(enc.dictionary)

    top_uni = np.zeros(n_docs, np.float64)
    if len(codes):
        g, mx, tot, _ = _segment_max_sum(doc_idx * vocab + codes, doc_idx)
        top_uni[g] = mx / tot

    # bigrams: adjacent token pairs within a document (positions whose
    # successor is in the same doc)
    top_bi = np.zeros(n_docs, np.float64)
    if len(codes) > 1:
        within = doc_idx[1:] == doc_idx[:-1]
        if within.any():
            b1, b2 = codes[:-1][within], codes[1:][within]
            bdoc = doc_idx[:-1][within]
            _, binv = np.unique(b1 * vocab + b2, return_inverse=True)
            g, mx, tot, _ = _segment_max_sum(bdoc * len(binv) + binv, bdoc)
            top_bi[g] = mx / tot

    lines = pc.split_pattern(text, "\n")
    llens = np.asarray(pc.list_value_length(lines), dtype=np.int64)
    ldoc = np.repeat(np.arange(n_docs, dtype=np.int64), llens)
    lenc = pc.dictionary_encode(pc.list_flatten(lines))
    if isinstance(lenc, pa.ChunkedArray):
        lenc = lenc.combine_chunks()
    lcodes = np.asarray(lenc.indices, dtype=np.int64)
    dup_line = np.zeros(n_docs, np.float64)
    if len(lcodes):
        g, _, tot, ndis = _segment_max_sum(ldoc * len(lenc.dictionary) + lcodes, ldoc)
        dup_line[g] = 1.0 - ndis / tot
    return {
        "top_unigram_frac": pa.array(top_uni, pa.float64()),
        "top_bigram_frac": pa.array(top_bi, pa.float64()),
        "dup_line_frac": pa.array(dup_line, pa.float64()),
    }


def repetition_stats(ds, text_col="text", id_col="doc_id"):
    """Per-document repetition metrics for corpus filtering (the
    Gopher repetition rules): documents dominated by one token / one
    bigram / duplicated lines are low-quality boilerplate at web scale."""

    def rep(batch: pa.Table) -> pa.Table:
        cols = repetition_kernel(batch.column(text_col))
        return pa.table({id_col: batch.column(id_col), **cols})

    return ds.map_batches(rep, batch_format="pyarrow")


def compression_stats(ds, text_col="text", id_col="doc_id", level: int = 6,
                      digits: int = 6):
    """Per-document zlib compression ratio — the cheap
    information-density quality signal web-corpus pipelines use
    alongside the Gopher rules (highly compressible text is template
    boilerplate or repetition; near-incompressible "text" is often
    base64/binary junk). DEFLATE at a fixed level via the stdlib
    (bit-stable for a fixed zlib build — goldenable on the
    measurement host). Per-row work is the compressor over one
    payload — bounded, payload-dominated, the same per-item-codec
    shape as the multimodal decoders."""
    import zlib

    def comp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n_bytes, n_comp, ratio = [], [], []
        for t in texts:
            raw = (t or "").encode("utf-8", "ignore")
            c = len(zlib.compress(raw, level))
            n_bytes.append(len(raw))
            n_comp.append(c)
            ratio.append(round(c / max(len(raw), 1), digits))
        return pa.table({
            id_col: batch.column(id_col),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "n_compressed": pa.array(n_comp, pa.int64()),
            "compression_ratio": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(comp, batch_format="pyarrow")


def fingerprint(ds, text_col="text", id_col="doc_id", window: int = 8, keep: int = 8):
    """Winnowing-style document fingerprint (Schleimer et al. '03,
    public): rolling 8-gram hashes, keep the ``keep`` smallest, digest
    them. Rolling hash vectorized via numpy stride tricks."""

    def fp_one(t: str) -> str:
        b = np.frombuffer((t or "").encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < window:
            return hashlib.blake2b(bytes(b), digest_size=8).hexdigest()
        base = np.uint64(257)
        pows = base ** np.arange(window, dtype=np.uint64)
        w = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
        hashes = (w * pows[None, :]).sum(axis=1)  # mod 2^64 wraparound
        sel = np.sort(np.unique(hashes))[:keep]
        return hashlib.blake2b(sel.tobytes(), digest_size=8).hexdigest()

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fingerprint": pa.array(
                    [fp_one(t) for t in batch.column(text_col).to_pylist()], pa.string()
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def chunk_documents(ds, text_col="text", id_col="doc_id",
                    chunk_tokens: int = 128, overlap: int = 16):
    """Split documents into fixed-size token windows for training-data
    prep: chunk k covers tokens [k*stride, k*stride + chunk_tokens)
    with stride = chunk_tokens - overlap; a document emits
    ceil((n - chunk_tokens)/stride) + 1 chunks (one when n <= chunk),
    the last possibly short. Vectorized: the only Python loop is over
    CHUNK INDEX (bounded by the longest doc in the batch / stride);
    each iteration is whole-batch Arrow list_slice + binary_join."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        tokens = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _TOKEN_SPLIT)
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        lens = np.asarray(pc.list_value_length(tokens), dtype=np.int64)
        ids = batch.column(id_col)
        n_chunks = np.where(
            lens <= chunk_tokens, 1,
            ((lens - chunk_tokens + stride - 1) // stride) + 1,
        )
        ids_parts, cid_parts, text_parts, ntok_parts, pos_parts = [], [], [], [], []
        for k in range(int(n_chunks.max(initial=0))):
            mask = n_chunks > k
            pos = np.flatnonzero(mask)
            sub = tokens.take(pa.array(pos, pa.int64()))
            sl = pc.list_slice(sub, start=k * stride, stop=k * stride + chunk_tokens)
            ids_parts.append(ids.take(pa.array(pos, pa.int64())))
            cid_parts.append(np.full(len(pos), k, np.int64))
            text_parts.append(pc.binary_join(sl, " "))
            ntok_parts.append(np.asarray(pc.list_value_length(sl), np.int64))
            pos_parts.append(pos)
        if not ids_parts:
            return pa.table({id_col: ids.slice(0, 0),
                             "chunk_id": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        cid = np.concatenate(cid_parts)
        # restore (document, chunk) order within the batch
        order = np.lexsort((cid, np.concatenate(pos_parts)))
        take = pa.array(order, pa.int64())
        out_ids = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in ids_parts]
        ).take(take)
        out_text = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in text_parts]
        ).take(take)
        return pa.table({
            id_col: out_ids,
            "chunk_id": pa.array(cid[order], pa.int64()),
            "chunk_text": out_text,
            "n_tokens": pa.array(np.concatenate(ntok_parts)[order], pa.int64()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


# the 8 Gopher "required words" (Rae et al. '21 §A1.1.2, public) — a doc
# must contain >= 2 distinct ones
_GOPHER_REQ = ["the", "be", "to", "of", "and", "that", "have", "with"]
_GOPHER_REQ_ARRS = [pa.array([w], pa.string()) for w in _GOPHER_REQ]


def gopher_stats(ds, text_col="text", id_col="doc_id", min_words=50,
                 max_words=100_000, min_mean_wl=3.0, max_mean_wl=10.0,
                 max_symbol_ratio=0.1, min_alpha_frac=0.8, min_req_stops=2,
                 max_bullet_frac=0.9, max_ellipsis_frac=0.3, digits=4):
    """Gopher-style composite quality rules (Rae et al. '21): per-doc
    signals + one conjunctive ``keep`` verdict, all Arrow/numpy kernels
    in a single streaming pass (thresholds compare ROUNDED ratios so
    the verdict is reproducible across engines). Complements
    ``quality_scores`` (scores) with the published filter-rule set."""

    def stats(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        words = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _TOKEN_SPLIT)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = np.asarray(pc.list_value_length(words), dtype=np.int64)
        n = len(n_words)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_words)
        wl = np.asarray(pc.utf8_length(flat), dtype=np.float64)
        tot_wl = np.bincount(doc_idx, weights=wl, minlength=n)
        mean_wl = tot_wl / np.maximum(n_words, 1)
        alpha = np.asarray(
            pc.match_substring_regex(flat, "[A-Za-z]"), dtype=np.float64
        )
        alpha_frac = np.bincount(doc_idx, weights=alpha, minlength=n) / np.maximum(
            n_words, 1
        )
        # distinct required-word presence: 8 equality kernels, each
        # reduced per doc by a bincount of the hit mask
        req = np.zeros(n, np.int64)
        for arr in _GOPHER_REQ_ARRS:
            hit = np.asarray(pc.is_in(flat, value_set=arr), dtype=np.float64)
            req += (np.bincount(doc_idx, weights=hit, minlength=n) > 0).astype(np.int64)
        # symbol-to-word ratio: '#' + ellipsis occurrences per word
        n_sym = (
            np.asarray(pc.count_substring(text, "#"), dtype=np.float64)
            + np.asarray(pc.count_substring(text, "…"), dtype=np.float64)
            + np.asarray(pc.count_substring(text, "..."), dtype=np.float64)
        )
        symbol_ratio = n_sym / np.maximum(n_words, 1)
        # line-shape rules
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        n_lines = np.asarray(pc.list_value_length(lines), dtype=np.int64)
        lflat = pc.list_flatten(lines)
        if isinstance(lflat, pa.ChunkedArray):
            lflat = lflat.combine_chunks()
        l_idx = np.repeat(np.arange(n, dtype=np.int64), n_lines)
        bullet = np.asarray(
            pc.match_substring_regex(lflat, r"^\s*[-*•]"), dtype=np.float64
        )
        ellip = np.asarray(
            pc.match_substring_regex(lflat, r"(\.\.\.|…)\s*$"), dtype=np.float64
        )
        bullet_frac = np.bincount(l_idx, weights=bullet, minlength=n) / np.maximum(
            n_lines, 1
        )
        ellipsis_frac = np.bincount(l_idx, weights=ellip, minlength=n) / np.maximum(
            n_lines, 1
        )

        def r(x):  # DuckDB ROUND semantics (half away from zero)
            return np.asarray(
                pc.round(pa.array(x, pa.float64()), ndigits=digits,
                         round_mode="half_towards_infinity"),
                dtype=np.float64,
            )
        mean_wl, alpha_frac = r(mean_wl), r(alpha_frac)
        symbol_ratio, bullet_frac, ellipsis_frac = (
            r(symbol_ratio), r(bullet_frac), r(ellipsis_frac),
        )
        keep = (
            (n_words >= min_words) & (n_words <= max_words)
            & (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl)
            & (symbol_ratio <= max_symbol_ratio)
            & (alpha_frac >= min_alpha_frac)
            & (req >= min_req_stops)
            & (bullet_frac <= max_bullet_frac)
            & (ellipsis_frac <= max_ellipsis_frac)
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_words": pa.array(n_words, pa.int64()),
                "mean_word_len": pa.array(mean_wl, pa.float64()),
                "symbol_ratio": pa.array(symbol_ratio, pa.float64()),
                "alpha_word_frac": pa.array(alpha_frac, pa.float64()),
                "n_required_stops": pa.array(req, pa.int64()),
                "bullet_line_frac": pa.array(bullet_frac, pa.float64()),
                "ellipsis_line_frac": pa.array(ellipsis_frac, pa.float64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def readability(ds, text_col="text", id_col="doc_id", digits: int = 4):
    """Flesch reading-ease score per document (Flesch 1948 — a standard
    cheap quality/complexity feature in corpus filters):
    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)`` with
    sentences counted as ``[.!?]`` occurrences and syllables
    approximated by vowel groups — both via ONE RE2 count kernel per
    column (``pc.count_substring_regex``), the same regex engine the
    DuckDB oracle uses, so the counts match exactly. Sentence and
    syllable counts floor at 1 (a fragment is one sentence); scores
    round half-away so the oracle hash is float-noise-proof.
    One streaming Arrow pass, no shuffle.
    """

    def score(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        words = np.asarray(
            pc.count_substring_regex(text, pattern=r"\S+"), dtype=np.float64)
        sents = np.asarray(
            pc.count_substring_regex(text, pattern=r"[.!?]"), dtype=np.float64)
        syll = np.asarray(
            pc.count_substring_regex(text, pattern=r"[aeiouyAEIOUY]+"),
            dtype=np.float64)
        words = np.maximum(words, 1.0)
        sents = np.maximum(sents, 1.0)
        syll = np.maximum(syll, 1.0)
        flesch = 206.835 - 1.015 * (words / sents) - 84.6 * (syll / words)
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(words.astype(np.int64), pa.int64()),
            "n_sentences": pa.array(sents.astype(np.int64), pa.int64()),
            "n_syllables": pa.array(syll.astype(np.int64), pa.int64()),
            "flesch": pc.round(pa.array(flesch, pa.float64()), ndigits=digits,
                               round_mode="half_towards_infinity"),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# Script classes shared verbatim with the DuckDB oracle — both engines
# run RE2, so \p{Script} char-class semantics are identical by
# construction (verified: 'añoКи漢字abc 12' → latin 6 / digit 2 / ws 1
# in both).
_SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", r"[^\p{Latin}]"),
    ("digit", r"[^0-9]"),
    ("space", r"[^\s]"),
)


def script_mix(ds, text_col="text", id_col="doc_id", digits: int = 6):
    """Per-document Unicode script composition: the fraction of
    characters that are Latin script, decimal digits, whitespace, and
    everything else — the cheap multilingual-corpus audit that routes
    documents to script-specific pipelines (CJK tokenizers, RTL
    shapers) and flags mojibake (high ``other_ratio`` on a supposedly
    Latin corpus). Output ``(doc_id, n_chars, latin_ratio, digit_ratio,
    space_ratio, other_ratio)``; empty documents report null ratios.

    One RE2 strip + length per class per batch — all C kernels, no
    per-row Python; at 100 TB this is a pure streaming map with zero
    shuffle.
    """

    def mix(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(text_col), pa.string())
        total = np.asarray(pc.cast(pc.utf8_length(s), pa.float64()))
        cols = {id_col: batch.column(id_col),
                "n_chars": pc.cast(pc.utf8_length(s), pa.int64())}
        ok = total > 0  # empty/null docs → NULL ratios (real nulls,
        okarr = pa.array(ok)  # not NaN — the oracle hash distinguishes)
        null_f = pa.scalar(None, pa.float64())

        def ratio(x: np.ndarray) -> pa.Array:
            r = pc.round(pa.array(np.where(ok, x / np.where(ok, total, 1.0), 0.0),
                                  pa.float64()),
                         ndigits=digits, round_mode="half_towards_infinity")
            return pc.if_else(okarr, r, null_f)

        rest = total.copy()
        for name, strip_pat in _SCRIPT_CLASSES:
            kept = np.asarray(pc.cast(pc.utf8_length(
                pc.replace_substring_regex(s, pattern=strip_pat,
                                           replacement="")), pa.float64()))
            rest -= kept
            cols[f"{name}_ratio"] = ratio(kept)
        cols["other_ratio"] = ratio(rest)
        return pa.table(cols)

    return ds.map_batches(mix, batch_format="pyarrow")


def char_entropy(ds, text_col: str = "text", id_col: str = "doc_id",
                 digits: int = 6):
    """Per-document Shannon character entropy — low entropy flags
    keyboard-mash / repeated-filler / single-char-padding documents
    that length and punctuation ratios miss. Fully vectorized across
    the batch: all texts decode into ONE utf-32 codepoint buffer, each
    (doc, char) pair folds into a single uint64 key (doc index in the
    high bits), one np.unique(return_counts) yields every per-doc
    char count at once, and np.add.reduceat sums the -p·log2(p) terms
    per doc — no per-row Python, no shuffle (each batch's docs are
    whole). Zero-length docs emit no row (they have no distribution),
    matching the oracle's GROUP BY over zero char rows."""

    def ent(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = pc.cast(batch.column(text_col), pa.string()).to_pylist()
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        if lens.sum() == 0:
            return pa.table({id_col: ids.slice(0, 0),
                             "entropy": pa.array([], pa.float64())})
        chars = np.frombuffer("".join(texts).encode("utf-32-le"),
                              dtype=np.uint32).astype(np.uint64)
        doc_of = np.repeat(np.arange(len(texts), dtype=np.uint64), lens)
        keys = (doc_of << np.uint64(32)) | chars
        uniq, counts = np.unique(keys, return_counts=True)
        doc_idx = (uniq >> np.uint64(32)).astype(np.int64)
        tot = lens[doc_idx].astype(np.float64)
        p = counts / tot
        terms = p * np.log2(p)
        starts = np.flatnonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1]])
        ent_v = -np.add.reduceat(terms, starts)
        present = doc_idx[starts]
        out = pa.table({
            id_col: pc.take(ids, pa.array(present, pa.int64())),
            "entropy": pc.round(pa.array(ent_v, pa.float64()),
                                ndigits=digits,
                                round_mode="half_towards_infinity"),
        })
        return out

    return ds.map_batches(ent, batch_format="pyarrow")


def type_token_ratio(ds, text_col: str = "text", id_col: str = "doc_id",
                     digits: int = 6):
    """Per-document type-token ratio (distinct tokens / tokens) — the
    classic lexical-diversity signal; near-zero TTR marks repeated-
    phrase spam. Vectorized like char_entropy: tokens dictionary-encode
    once per batch, (doc, token-code) pairs fold into uint64 keys, one
    np.unique counts the types — no per-row Python."""

    def ttr(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column(text_col),
                                        pa.string()), " ")
        lens = np.asarray(pc.fill_null(pc.list_value_length(toks), 0),
                          dtype=np.int64)
        flat = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        codes = np.asarray(pc.dictionary_encode(flat.flatten()).indices,
                           dtype=np.uint64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.uint64), lens)
        keys = (doc_of << np.uint64(32)) | codes
        uniq = np.unique(keys)
        docs = (uniq >> np.uint64(32)).astype(np.int64)
        types = np.bincount(docs, minlength=len(lens)).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = types / lens
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(lens, pa.int64()),
            "n_types": pa.array(types, pa.int64()),
            "ttr": pc.round(pa.array(r, pa.float64(), mask=lens == 0),
                            ndigits=digits,
                            round_mode="half_towards_infinity"),
        })

    return ds.map_batches(ttr, batch_format="pyarrow")
