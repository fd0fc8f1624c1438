"""TF-IDF keyword extraction — the top-k most distinctive terms per
document (Sparck Jones '72; the classic corpus-analysis / retrieval
scoring), built from two Ray-Data-native passes:

1. **Document frequency** — one streaming ``map_batches`` emits
   per-batch PARTIAL (term, df) counts (per-document distinct terms
   via Arrow dictionary-encode + numpy unique), then a
   ``groupby('term').sum`` reduces them. The shuffle moves
   O(distinct terms × blocks) rows, never O(tokens).
2. **Score** — the DF table (sorted term array + aligned df counts)
   is broadcast once via ``ray.put``; scoring is one streaming
   ``map_batches`` per document: dictionary-encode, segment tf
   counts, ``searchsorted`` df lookup, ``tf·ln(N/df)``.

At 100 TB the broadcast model is the thing to bound: natural-language
vocabulary grows ~Heaps' law (≤10^8 distinct terms even at web
scale), so a driver-held DF array is fine; if the term universe is
adversarial (e.g. URLs as terms), swap step 2's lookup for a
distributed hash join on term — the DF pass is unchanged.

Scores are rounded half-away-from-zero (DuckDB ROUND semantics; all
scores are ≥ 0 since df ≤ N) BEFORE ranking so the per-document
ordering — rounded score desc, then term asc — is reproducible across
engines. Tokenization matches token_stats (whitespace split of
trimmed text)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import _tokens_of


def doc_frequencies(ds, text_col: str = "text"):
    """Dataset of (term, df) — the number of documents containing each
    term, exact, via partial per-batch counts + groupby sum."""

    def partial(batch: pa.Table) -> pa.Table:
        tokens = _tokens_of(batch.column(text_col))
        lens = np.asarray(pc.list_value_length(tokens), dtype=np.int64)
        enc = pc.dictionary_encode(pc.list_flatten(tokens))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        if len(enc) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        codes = np.asarray(enc.indices, dtype=np.int64)
        vocab = len(enc.dictionary)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        # distinct (doc, term) pairs, then docs-per-term within the batch
        pair = np.unique(doc_idx * vocab + codes)
        term_code, df = np.unique(pair % vocab, return_counts=True)
        return pa.table({
            "term": enc.dictionary.take(pa.array(term_code, pa.int64())),
            "df": pa.array(df, pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow").groupby("term").sum("df")


def _round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    s = 10.0 ** digits
    return np.floor(x * s + 0.5) / s  # all tf-idf scores are >= 0


def tfidf_topk(ds, text_col: str = "text", id_col: str = "doc_id",
               k: int = 3, round_digits: int = 4):
    """(id, term, score, rnk) — each document's ``k`` highest-TF-IDF
    terms, score = tf · ln(N/df), ranked by rounded score desc then
    term asc. ``ds`` is consumed twice (DF pass + score pass): pass a
    materialized/checkpointed dataset for large inputs."""
    import ray

    n_docs = ds.count()
    df_parts = [
        b for b in doc_frequencies(ds, text_col).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if df_parts:
        df_tab = pa.concat_tables(df_parts)
        terms_np = np.asarray(df_tab.column("term").to_pylist(), dtype=str)
        order = np.argsort(terms_np)
        terms_sorted = terms_np[order]
        df_sorted = np.asarray(df_tab.column("sum(df)"))[order].astype(np.float64)
    else:
        terms_sorted = np.empty(0, str)
        df_sorted = np.empty(0, np.float64)
    model = ray.put((terms_sorted, df_sorted))

    def score(batch: pa.Table) -> pa.Table:
        terms_s, df_s = ray.get(model)
        empty = pa.table({
            id_col: pa.array([], batch.schema.field(id_col).type),
            "term": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "rnk": pa.array([], pa.int64()),
        })
        tokens = _tokens_of(batch.column(text_col))
        lens = np.asarray(pc.list_value_length(tokens), dtype=np.int64)
        enc = pc.dictionary_encode(pc.list_flatten(tokens))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        if len(enc) == 0:
            return empty
        codes = np.asarray(enc.indices, dtype=np.int64)
        vocab = len(enc.dictionary)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pair, tf = np.unique(doc_idx * vocab + codes, return_counts=True)
        p_doc, p_code = pair // vocab, pair % vocab
        local_terms = np.asarray(enc.dictionary.to_pylist(), dtype=str)
        p_term = local_terms[p_code]
        pos = np.searchsorted(terms_s, p_term)
        pos = np.minimum(pos, max(len(terms_s) - 1, 0))
        df = df_s[pos] if len(df_s) else np.full(len(pair), np.nan)
        # every scored term came from the same corpus the DF pass saw
        sc = _round_half_away(tf * np.log(n_docs / df), round_digits)
        # rank: rounded score desc, term asc, within each document
        o = np.lexsort((p_term, -sc, p_doc))
        d_sorted = p_doc[o]
        starts = np.flatnonzero(np.r_[True, d_sorted[1:] != d_sorted[:-1]])
        counts = np.diff(np.r_[starts, len(d_sorted)])
        rnk = np.arange(len(d_sorted)) - np.repeat(starts, counts) + 1
        keep = rnk <= k
        ids = np.asarray(batch.column(id_col))[d_sorted[keep]]
        return pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            "term": pa.array(p_term[o][keep], pa.string()),
            "score": pa.array(sc[o][keep], pa.float64()),
            "rnk": pa.array(rnk[keep], pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
