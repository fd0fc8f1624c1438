"""End-to-end training-corpus cleaning pipeline — the composition a
100 TB pretraining-data run would actually execute, built entirely
from the engine's streaming operators:

    documents
      → exact dedup            (md5 hash-aggregate, keep min id)
      → near-dup dedup         (MinHash+LSH → jaccard verify →
                                connected components → keep min id)
      → language filter        (stopword-vote lang id)
      → quality filter         (composite score threshold)
      → token accounting       (per-doc counts + corpus totals)

Every stage is a Dataset transform; the only shuffles are the LSH
band groupby and the verify joins. The output is deterministic for a
fixed corpus (golden-oracle-able).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import (
    dedup_by_components,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_verify,
)
from ..functions.textstats import lang_kernel, quality_kernel, token_stats


def clean_corpus(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    lsh_concurrency: int = 2,
    lsh_max_bucket: int = 200,
    distributed_cc: bool | None = None,
    cc_endpoint_threshold: int = 5_000_000,
):
    """Returns (kept_docs_ds, stats_table). ``kept_docs_ds`` streams the
    surviving (id, text) rows; ``stats_table`` is a one-row funnel
    summary (input → after each stage) plus total kept tokens."""
    import ray.data  # noqa: F401  (Dataset ops below)

    from ..functions.counters import get_counters

    # counters are cluster-global + cumulative: snapshot before/after
    # so the stats row reports THIS run's truncations only
    c0 = get_counters()

    n_input = docs_ds.count()

    # 1. exact dedup (keep min id per md5(text) group)
    kept_exact = exact_dedup(docs_ds, text_col=text_col, id_col=id_col)
    kept_exact = kept_exact.materialize()  # consumed by LSH + verify + filter
    n_exact = kept_exact.count()

    # 2. near-dup dedup: LSH candidates → exact-jaccard verify → CC keep-set
    pairs = minhash_lsh_pairs(
        kept_exact, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, concurrency=lsh_concurrency, max_bucket=lsh_max_bucket,
    )
    verified = ngram_jaccard_verify(
        pairs, kept_exact, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    ).materialize()
    # components: driver union-find is O(pair endpoints); auto-switch
    # to the distributed min-label propagation when the verified pair
    # endpoints could outgrow driver memory (parity-tested equal).
    if distributed_cc is None:
        distributed_cc = 2 * verified.count() > cc_endpoint_threshold
    deduped = dedup_by_components(
        kept_exact, verified, id_col=id_col, distributed=distributed_cc
    ).materialize()
    n_neardup = deduped.count()

    # 3+4. language + quality filter — both metrics derive purely from
    # the text column, so this is ONE streaming map_batches over the
    # deduped corpus: no id gather to the driver, no broadcast set, no
    # second pass. At 100 TB this stage is embarrassingly parallel.
    keep_set = pa.array(list(keep_langs), pa.string())

    def lang_quality_filter(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        lang_ok = pc.is_in(lang_kernel(text)["lang_pred"], value_set=keep_set)
        q_ok = pc.greater_equal(quality_kernel(text)["quality"], min_quality)
        mask = pc.and_(pc.fill_null(lang_ok, False), pc.fill_null(q_ok, False))
        return batch.filter(mask)

    kept = deduped.map_batches(lang_quality_filter, batch_format="pyarrow").materialize()
    n_kept = kept.count()

    # 5. token accounting over the survivors
    from ray.data.aggregate import Sum

    toks = token_stats(kept, text_col=text_col, id_col=id_col)
    totals = toks.aggregate(Sum("n_tokens", alias_name="total_tokens"))
    # NO SILENT CAPS at the pipeline surface either: the LSH hot-bucket
    # truncation counters the dedup stages fired land in the funnel
    # stats a 100 TB operator actually reads (delta vs the pre-run
    # snapshot; incr is fire-and-forget, so drain the actor first).
    import time

    time.sleep(0.2)
    c1 = get_counters()
    trunc_buckets = c1.get("lsh_buckets_truncated", 0) - c0.get("lsh_buckets_truncated", 0)
    trunc_ids = c1.get("lsh_ids_truncated", 0) - c0.get("lsh_ids_truncated", 0)
    stats = pa.table(
        {
            "n_input": pa.array([n_input], pa.int64()),
            "n_after_exact": pa.array([n_exact], pa.int64()),
            "n_after_neardup": pa.array([n_neardup], pa.int64()),
            "n_kept": pa.array([n_kept], pa.int64()),
            "total_tokens": pa.array([int(totals["total_tokens"] or 0)], pa.int64()),
            "lsh_buckets_truncated": pa.array([trunc_buckets], pa.int64()),
            "lsh_ids_truncated": pa.array([trunc_ids], pa.int64()),
        }
    )
    return kept, stats
