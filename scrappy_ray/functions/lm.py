"""Self-trained bigram-LM perplexity scoring — the CCNet-style quality
filter (Wenzek et al. '19, public): score each document by the mean
add-one-smoothed bigram log-probability under a language model counted
from the corpus itself, P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V).

Two passes, both Ray-Data-native:

1. **Count** — one streaming ``map_batches`` emits per-batch PARTIAL
   unigram/bigram counts (Arrow dictionary-encode + numpy unique), then
   a ``groupby().sum()`` reduces them; the wide shuffle moves
   O(distinct n-grams x blocks) rows, never O(tokens).
2. **Score** — the model (a few arrays: sorted vocab, aligned unigram
   counts, sorted int64 bigram keys + counts) is broadcast ONCE into a
   scoring ``map_batches`` (closure capture over driver-materialized
   numpy arrays; Ray serializes them into the object store once per
   task graph, not per batch). Token->code is one ``pc.index_in``
   kernel; bigram lookup is one ``np.searchsorted`` per batch.

At 100 TB the model table is the thing to bound: pass ``min_count`` to
prune hapax n-grams before the broadcast (the standard KenLM pruning
knob); the count pass stays exact either way. Documents with fewer
than two tokens have no bigrams and are dropped (matching the SQL
oracle's inner join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _TOKEN_SPLIT


def _tokens_of(batch_text):
    text = pc.fill_null(pc.cast(batch_text, pa.string()), "")
    tokens = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _TOKEN_SPLIT)
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    return tokens


def bigram_counts(ds, text_col: str = "text"):
    """(unigram Dataset (w, c), bigram Dataset (w1, w2, c)) — exact
    corpus counts via partial-aggregate map_batches + groupby sum."""

    def partial_uni(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_tokens_of(batch.column(text_col)))
        t = pa.table({"w": flat})
        return t.group_by("w").aggregate([("w", "count")]).rename_columns(["w", "c"])

    def partial_bi(batch: pa.Table) -> pa.Table:
        tokens = _tokens_of(batch.column(text_col))
        lens = np.asarray(pc.list_value_length(tokens), dtype=np.int64)
        flat = pc.list_flatten(tokens)
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        within = doc_idx[1:] == doc_idx[:-1]
        t = pa.table({"w1": flat.slice(0, len(flat) - 1).filter(pa.array(within)),
                      "w2": flat.slice(1).filter(pa.array(within))})
        return (t.group_by(["w1", "w2"]).aggregate([("w1", "count")])
                 .rename_columns(["w1", "w2", "c"]))

    uni = ds.map_batches(partial_uni, batch_format="pyarrow").groupby("w").sum("c")
    bi = ds.map_batches(partial_bi, batch_format="pyarrow").groupby(["w1", "w2"]).sum("c")
    return uni, bi


class BigramModel:
    """The broadcast payload: sorted vocab + aligned unigram counts +
    sorted int64 bigram keys/counts. A handful of flat arrays — cheap
    to serialize into the object store once per task graph."""

    __slots__ = ("vocab", "c1", "bkeys", "bcounts", "V")

    def __init__(self, vocab, c1, bkeys, bcounts):
        self.vocab, self.c1, self.bkeys, self.bcounts = vocab, c1, bkeys, bcounts
        self.V = len(vocab)


def build_bigram_model(ds, text_col: str = "text", min_count: int = 1) -> BigramModel:
    """Count pass + driver-side model assembly. ``min_count`` > 1
    prunes rare bigrams from the broadcast model (their lookups then
    miss and score as unseen) — the scale knob; 1 = exact (oracle)
    mode. V (the smoothing denominator) is always the full vocabulary
    size."""
    uni_ds, bi_ds = bigram_counts(ds, text_col)
    import ray

    def _gather(d):
        # Ray's aggregate can emit schemaless empty blocks — drop them
        tabs = [t for t in ray.get(d.to_arrow_refs()) if t.num_columns and t.num_rows]
        return pa.concat_tables(tabs)

    uni_tbl = _gather(uni_ds)
    bi_tbl = _gather(bi_ds)

    vocab = pc.cast(uni_tbl.column("w"), pa.string()).combine_chunks()
    order = pc.sort_indices(vocab)
    vocab = vocab.take(order)
    c1 = np.asarray(uni_tbl.column("sum(c)").combine_chunks().take(order),
                    dtype=np.float64)
    V = len(vocab)

    bc = np.asarray(bi_tbl.column("sum(c)").combine_chunks(), dtype=np.int64)
    if min_count > 1:
        keep = bc >= min_count
        bi_tbl = bi_tbl.filter(pa.array(keep))
        bc = bc[keep]
    i1 = np.asarray(pc.index_in(bi_tbl.column("w1"), value_set=vocab),
                    dtype=np.int64)
    i2 = np.asarray(pc.index_in(bi_tbl.column("w2"), value_set=vocab),
                    dtype=np.int64)
    bkeys = i1 * V + i2
    korder = np.argsort(bkeys)
    return BigramModel(vocab, c1, bkeys[korder], bc[korder].astype(np.float64))


def bigram_logprob_kernel(model: BigramModel, batch_text):
    """Per-document (n_bigrams, avg_logprob, ppl) numpy arrays ALIGNED
    with the batch (NaN avg/ppl where a doc has no bigrams)."""
    tokens = _tokens_of(batch_text)
    lens = np.asarray(pc.list_value_length(tokens), dtype=np.int64)
    n_docs = len(lens)
    flat = pc.list_flatten(tokens)
    codes = np.asarray(
        pc.fill_null(pc.index_in(flat, value_set=model.vocab), -1).cast(pa.int64()),
        dtype=np.int64,
    )
    n_bi = np.zeros(n_docs, np.int64)
    avg = np.full(n_docs, np.nan)
    if len(codes) >= 2:
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        within = doc_idx[1:] == doc_idx[:-1]
        a, b = codes[:-1][within], codes[1:][within]
        bdoc = doc_idx[:-1][within]
        V, bkeys = model.V, model.bkeys
        # unseen tokens (possible only under min_count pruning or
        # scoring a different corpus) smooth as count 0
        known = (a >= 0) & (b >= 0)
        key = np.where(known, a * V + b, -1)
        pos = np.clip(np.searchsorted(bkeys, key), 0, max(len(bkeys) - 1, 0))
        c12 = np.where((len(bkeys) > 0) & (bkeys[pos] == key) & known,
                       model.bcounts[pos] if len(bkeys) else 0.0, 0.0)
        c1v = np.where(a >= 0, model.c1[np.maximum(a, 0)], 0.0)
        lp = np.log((c12 + 1.0) / (c1v + V))
        n_bi = np.bincount(bdoc, minlength=n_docs)
        sums = np.bincount(bdoc, weights=lp, minlength=n_docs)
        has = n_bi > 0
        avg[has] = sums[has] / n_bi[has]
    return n_bi, avg, np.exp(-avg)


def perplexity_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                      min_count: int = 1):
    """(id, n_bigrams, avg_logprob, ppl) per document under the
    self-trained add-one bigram model; documents without bigrams are
    dropped (matching the SQL oracle's inner join)."""
    model = build_bigram_model(ds, text_col, min_count)

    def score(batch: pa.Table) -> pa.Table:
        n_bi, avg, ppl = bigram_logprob_kernel(model, batch.column(text_col))
        has = n_bi > 0
        take = pa.array(np.flatnonzero(has), pa.int64())
        return pa.table({
            id_col: batch.column(id_col).take(take),
            "n_bigrams": pa.array(n_bi[has], pa.int64()),
            "avg_logprob": pa.array(avg[has], pa.float64()),
            "ppl": pa.array(ppl[has], pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def collocations(ds, text_col: str = "text", min_count: int = 5,
                 k: int = 20, digits: int = 6):
    """Top-``k`` word-pair collocations by pointwise mutual information
    (Church & Hanks 1990): pmi = ln((c12/T2) / ((c1/T1)(c2/T1))) over
    corpus bigram/unigram counts, keeping pairs seen >= ``min_count``
    times; ranked by (rounded pmi desc, w1, w2) so float ties are
    deterministic in both this engine and the DuckDB oracle.

    Scale shape (100 TB): counts come from ``bigram_counts`` (per-batch
    partial aggregates, the shuffle moves distinct n-grams only); the
    unigram counts attach via two distributed hash joins (the unigram
    side is O(vocab) — never driver-gathered); T1/T2 are two scalar
    aggregates; the final rank is a distributed sort of the
    post-``min_count`` pair table followed by limit(k).
    """
    from ..common import drop_empty_blocks

    uni, bi = bigram_counts(ds, text_col=text_col)  # cols: (w|w1,w2, sum(c))
    # materialize the count tables ONCE: uni feeds three consumers
    # (T1 + both joins) and bi two — lazily each would re-tokenize the
    # whole corpus; materialized they are O(vocab)/O(distinct bigrams)
    # object-store blocks, the right trade at any scale
    uni = uni.materialize()
    bi = bi.materialize()
    t1 = float(uni.sum("sum(c)"))
    t2 = float(bi.sum("sum(c)"))

    bi = bi.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("sum(c)"), min_count))
                   .rename_columns(["w1", "w2", "c"]),
        batch_format="pyarrow")

    def renamed(suffix):
        def r(t: pa.Table) -> pa.Table:
            return t.rename_columns([f"w{suffix}_", f"c{suffix}"])
        return r

    u1 = uni.map_batches(renamed(1), batch_format="pyarrow")
    u2 = uni.map_batches(renamed(2), batch_format="pyarrow")
    j = drop_empty_blocks(bi).join(drop_empty_blocks(u1), "inner", 8,
                                   on=("w1",), right_on=("w1_",))
    j = drop_empty_blocks(j).join(drop_empty_blocks(u2), "inner", 8,
                                  on=("w2",), right_on=("w2_",))

    def score(t: pa.Table) -> pa.Table:
        c = np.asarray(pc.cast(t.column("c"), pa.float64()))  # noqa: renamed above
        c1 = np.asarray(pc.cast(t.column("c1"), pa.float64()))
        c2 = np.asarray(pc.cast(t.column("c2"), pa.float64()))
        # evaluation order mirrors the oracle SQL expression exactly
        pmi = np.log((c / t2) / ((c1 / t1) * (c2 / t1)))
        pmi = pc.round(pa.array(pmi, pa.float64()), ndigits=digits,
                       round_mode="half_towards_infinity")
        return pa.table({
            "w1": t.column("w1"), "w2": t.column("w2"),
            "c": t.column("c"), "pmi": pmi,
        })

    return (j.map_batches(score, batch_format="pyarrow")
             .sort(["pmi", "w1", "w2"], descending=[True, False, False])
             .limit(k))
