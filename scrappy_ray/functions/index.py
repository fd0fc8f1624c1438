"""Inverted index build + boolean retrieval over a documents table.

Classic IR shapes, Ray-Data-first:

- **Build** (`build_inverted_index`): per-batch DISTINCT (token, doc)
  pairs (one Arrow group_by per batch — a doc's tokens all live in its
  own row, so within-batch dedup is globally exact) → ONE
  ``groupby(token).map_groups`` that folds each token's postings into a
  sorted ``list<int64>`` plus its document frequency. The exchange
  moves O(distinct token-doc pairs), never O(tokens); hot-token skew is
  the same skew every search engine's build has, and the postings stay
  distributed (one row per token — no driver gather).
- **Search** (`search_all_terms`): conjunctive (AND) term search does
  NOT need the index shuffle at all — term membership per document is
  one ``pc.is_in`` over the flattened token array + a distinct-per-doc
  reduction, i.e. a pure streaming filter over the corpus. Use it when
  the term set is ad-hoc; probe the prebuilt index when queries repeat.
- **Probe** (`lookup_postings`): point lookups into a built index —
  a broadcast ``pc.is_in`` filter (O(terms) rows come back).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _TOKEN_SPLIT


def _doc_tokens(batch: pa.Table, text_col: str):
    text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def token_doc_pairs(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Streaming DISTINCT (token, doc_id) pairs — the index's edge list."""

    def pairs(batch: pa.Table) -> pa.Table:
        toks = _doc_tokens(batch, text_col)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = pc.list_flatten(toks)
        ids = np.repeat(
            np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64), lens
        )
        t = pa.table({"token": flat, "doc_id": pa.array(ids, pa.int64())})
        # within-batch distinct is globally distinct: a doc is one row
        return t.group_by(["token", "doc_id"]).aggregate([])

    return ds.map_batches(pairs, batch_format="pyarrow")


def build_inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                         min_df: int = 1):
    """(token, df, postings list<int64> sorted asc) — one corpus-sized
    groupby; postings stay one-row-per-token in the Dataset (never a
    driver gather)."""

    def fold(g: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(g.column("doc_id"), dtype=np.int64))
        if len(ids) < min_df:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.large_list(pa.int64()))})
        return pa.table({
            "token": g.column("token").slice(0, 1),
            "df": pa.array([len(ids)], pa.int64()),
            "postings": pa.array([ids.tolist()], pa.large_list(pa.int64())),
        })

    return (
        token_doc_pairs(ds, text_col, id_col)
        .groupby("token")
        .map_groups(fold, batch_format="pyarrow")
    )


def lookup_postings(index_ds, terms: list[str]):
    """Point-probe a built index: O(terms) rows back, broadcast filter."""
    tset = pa.array(sorted(set(terms)), pa.string())

    def flt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("token"), value_set=tset))

    return index_ds.map_batches(flt, batch_format="pyarrow")


def search_all_terms(ds, terms: list[str], text_col: str = "text",
                     id_col: str = "doc_id"):
    """Conjunctive retrieval: documents containing EVERY term, plus the
    total match count (sum of the terms' tfs). Pure streaming pass —
    per doc, distinct matched terms come from one ``pc.index_in`` on
    the flattened tokens + an np.unique over (doc, term-slot) codes."""
    if not terms:
        raise ValueError("terms must be non-empty")
    tset = pa.array(sorted(set(terms)), pa.string())
    need = len(tset)

    def flt(batch: pa.Table) -> pa.Table:
        toks = _doc_tokens(batch, text_col)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = pc.list_flatten(toks)
        n = len(batch)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        slot = np.asarray(
            pc.fill_null(pc.index_in(flat, value_set=tset), -1).cast(pa.int64()),
            dtype=np.int64,
        )  # -1 for non-terms
        hit = slot >= 0
        d, s = doc_idx[hit], slot[hit]
        n_matches = np.bincount(d, minlength=n).astype(np.int64)
        distinct = np.unique(d * need + s)
        n_terms = np.bincount(distinct // need, minlength=n).astype(np.int64)
        out = batch.select([id_col]).append_column(
            "n_matches", pa.array(n_matches, pa.int64())
        )
        return out.filter(pa.array(n_terms == need))

    return ds.map_batches(flt, batch_format="pyarrow")
