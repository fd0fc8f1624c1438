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
    max_top_bigram_frac: float | None = None,
    max_dup_line_frac: float | None = None,
    max_ppl: float | None = None,
    ppl_min_count: int = 1,
    domain_col: str | None = None,
    min_domain_docs: int = 1,
    min_domain_quality: float = 0.0,
    domain_broadcast_max: int = 5_000_000,
    decontam_bench_ds=None,
    decontam_n: int = 13,
    substr_dedup_n: int | None = None,
    min_compression_ratio: float | None = None,
    max_compression_ratio: float | None = None,
    min_classifier_score: float | None = None,
    quality_model=None,
    classifier_label_quality: float = 0.55,
    classifier_dim: int = 1 << 14,
    classifier_sample_k: int = 512,
    classifier_iters: int = 300,
):
    """Returns (kept_docs_ds, stats_table). ``kept_docs_ds`` streams the
    surviving (id, text) rows; ``stats_table`` is a one-row funnel
    summary (input → after each stage) plus total kept tokens.

    Optional gates (all default OFF, preserving the golden output):
    - ``max_top_bigram_frac`` / ``max_dup_line_frac``: Gopher repetition
      rules, computed inline in the SAME single filter pass;
    - ``max_ppl``: CCNet perplexity under a bigram LM self-trained on
      the deduped corpus (adds one count pass; the model broadcasts
      into the same filter pass; ``ppl_min_count`` prunes the model);
    - ``domain_col`` + ``min_domain_docs``/``min_domain_quality``: drop
      documents from failing domains (adds one partial-aggregate pass;
      the passing-domain set broadcasts into the same filter pass);
    - ``decontam_bench_ds``: drop documents sharing any word
      ``decontam_n``-gram with this benchmark/eval dataset (GPT-3
      appendix-C rule; the bench hash set builds once and broadcasts
      into the same filter pass — see functions/decontam.py);
    - ``substr_dedup_n``: ExactSubstr span removal (Lee et al. '21) —
      after document-level near-dup dedup, every token covered by a
      corpus-duplicated ``n``-token window is removed from the
      surviving documents' text (whitespace-normalized rebuild; adds
      the window-count shuffle + one rewrite pass;
      ``corpus_substr_tokens_removed`` counts the removals);
    - ``min_compression_ratio`` / ``max_compression_ratio``: zlib
      information-density bounds (below = template boilerplate, above =
      base64/binary junk), computed inline in the same filter pass;
    - ``min_classifier_score``: GPT-3/CCNet-style learned quality gate
      (functions/classifier.py). Pass a pre-trained ``quality_model``
      to score under a frozen classifier; otherwise one is distilled
      from the heuristic gate (teacher label = composite quality ≥
      ``classifier_label_quality``) on a deterministic sample of the
      deduped corpus, then its weights broadcast into the same single
      filter pass.
    Per-gate rejection counts are surfaced in the stats row via the
    cluster counters — no silent drops."""
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

    # 2b (optional). ExactSubstr span removal over the survivors —
    # rewrites text_col in place (replace_text mode preserves the full
    # column layout) so every later gate sees the deduped text; the
    # removal count surfaces through the cluster counters.
    if substr_dedup_n is not None:
        from ..functions.substr_dedup import dedup_substrings

        deduped = dedup_substrings(
            deduped, text_col=text_col, id_col=id_col, n=substr_dedup_n,
            replace_text=True, count_key="corpus_substr_tokens_removed",
        ).materialize()

    # 3+4(+gates). language + quality (+ repetition + perplexity +
    # domain) filter — every metric derives from the text column (plus
    # broadcast small sides for ppl/domain), so this stays ONE streaming
    # map_batches over the deduped corpus: no id gather to the driver,
    # no second scan. At 100 TB this stage is embarrassingly parallel;
    # the optional model/keep-set builds each add one bounded pass.
    keep_set = pa.array(list(keep_langs), pa.string())

    ppl_model = None
    if max_ppl is not None:
        from ..functions.lm import build_bigram_model

        ppl_model = build_bigram_model(deduped, text_col=text_col,
                                       min_count=ppl_min_count)

    bench_ref = None
    if decontam_bench_ds is not None:
        import ray

        from ..functions.decontam import benchmark_ngram_set

        bench_ref = ray.put(benchmark_ngram_set(
            decontam_bench_ds, text_col=text_col, n=decontam_n))

    clf_model = quality_model
    if min_classifier_score is not None and clf_model is None:
        from ..functions.classifier import train_quality_classifier

        def _teacher_label(batch: pa.Table) -> pa.Table:
            import numpy as np

            q = np.asarray(quality_kernel(batch.column(text_col))["quality"])
            return batch.append_column(
                "_clf_label",
                pa.array((q >= classifier_label_quality).astype("int64"),
                         pa.int64()))

        clf_model = train_quality_classifier(
            deduped.map_batches(_teacher_label, batch_format="pyarrow"),
            "_clf_label", id_col=id_col, text_col=text_col,
            dim=classifier_dim, sample_k=classifier_sample_k,
            iters=classifier_iters)

    # domain gate: the passing-domain set is O(domains) — guarded the
    # same way as mirror_sources' survivor broadcast. Below the guard
    # it broadcasts into the fused filter pass; above it the gate runs
    # as a distributed semi-join AFTER the filter pass instead (no
    # O(domains) gather on the driver, same kept set).
    domain_keep = None
    domain_keep_ds = None
    if domain_col is not None:
        from ..functions.webtext import domain_stats

        def _passing(batch: pa.Table) -> pa.Table:
            ok = pc.and_(
                pc.greater_equal(batch.column("n_docs"), min_domain_docs),
                pc.greater_equal(batch.column("mean_quality"),
                                 min_domain_quality))
            return batch.filter(pc.fill_null(ok, False)).select([domain_col])

        keep_ds = domain_stats(
            deduped, domain_col=domain_col, text_col=text_col
        ).map_batches(_passing, batch_format="pyarrow").materialize()
        if keep_ds.count() > domain_broadcast_max:
            domain_keep_ds = keep_ds
        else:
            domain_keep = pa.array(
                sorted(r[domain_col] for r in keep_ds.take_all()),
                pa.string(),
            )

    def lang_quality_filter(batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.counters import incr

        text = batch.column(text_col)
        lang_ok = pc.fill_null(
            pc.is_in(lang_kernel(text)["lang_pred"], value_set=keep_set), False
        )
        q_ok = pc.fill_null(
            pc.greater_equal(quality_kernel(text)["quality"], min_quality), False
        )
        incr("corpus_rej_lang", len(text) - pc.sum(lang_ok).as_py())
        incr("corpus_rej_quality", len(text) - pc.sum(q_ok).as_py())
        mask = np.asarray(pc.and_(lang_ok, q_ok))
        if max_top_bigram_frac is not None or max_dup_line_frac is not None:
            from ..functions.textstats import repetition_kernel

            rep = repetition_kernel(text)
            if max_top_bigram_frac is not None:
                ok = np.asarray(rep["top_bigram_frac"]) <= max_top_bigram_frac
                incr("corpus_rej_repetition", int((~ok).sum()))
                mask &= ok
            if max_dup_line_frac is not None:
                ok = np.asarray(rep["dup_line_frac"]) <= max_dup_line_frac
                incr("corpus_rej_dup_lines", int((~ok).sum()))
                mask &= ok
        if ppl_model is not None:
            from ..functions.lm import bigram_logprob_kernel

            _, _, ppl = bigram_logprob_kernel(ppl_model, text)
            # NaN (no bigrams — degenerate doc) fails the gate
            ok = np.nan_to_num(ppl, nan=np.inf) <= max_ppl
            incr("corpus_rej_ppl", int((~ok).sum()))
            mask &= ok
        if bench_ref is not None:
            import ray

            from ..functions.decontam import _window_hashes

            bench = ray.get(bench_ref)
            wh, w_doc, n_docs = _window_hashes(text, decontam_n)
            hits = np.zeros(n_docs, bool)
            if len(bench) and len(wh):
                pos = np.searchsorted(bench, wh)
                pos[pos == len(bench)] = 0
                hits[w_doc[bench[pos] == wh]] = True
            incr("corpus_rej_contaminated", int(hits.sum()))
            mask &= ~hits
        if min_compression_ratio is not None or max_compression_ratio is not None:
            import zlib

            ratios = np.array([
                len(zlib.compress((t or "").encode("utf-8", "ignore"), 6))
                / max(len((t or "").encode("utf-8", "ignore")), 1)
                for t in text.to_pylist()
            ])
            ok = np.ones(len(ratios), bool)
            if min_compression_ratio is not None:
                ok &= ratios >= min_compression_ratio
            if max_compression_ratio is not None:
                ok &= ratios <= max_compression_ratio
            incr("corpus_rej_compression", int((~ok).sum()))
            mask &= ok
        if min_classifier_score is not None:
            from ..functions.classifier import _feature_arrays, _logits

            z = _logits(clf_model, *_feature_arrays(text, clf_model.dim))
            ok = 1.0 / (1.0 + np.exp(-z)) >= min_classifier_score
            incr("corpus_rej_classifier", int((~ok).sum()))
            mask &= ok
        if domain_keep is not None:
            ok = np.asarray(
                pc.fill_null(
                    pc.is_in(pc.cast(batch.column(domain_col), pa.string()),
                             value_set=domain_keep),
                    False,
                )
            )
            incr("corpus_rej_domain", int((~ok).sum()))
            mask &= ok
        return batch.filter(pa.array(mask))

    kept = deduped.map_batches(lang_quality_filter, batch_format="pyarrow").materialize()
    if domain_keep_ds is not None:
        from ..common import drop_empty_blocks
        from ..functions.counters import incr

        n_pre_domain = kept.count()
        kept = drop_empty_blocks(kept).join(
            drop_empty_blocks(domain_keep_ds), join_type="inner",
            num_partitions=8, on=(domain_col,)).materialize()
        incr("corpus_rej_domain", n_pre_domain - kept.count())
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

    def _delta(key: str) -> int:
        return c1.get(key, 0) - c0.get(key, 0)

    stats = pa.table(
        {
            "n_input": pa.array([n_input], pa.int64()),
            "n_after_exact": pa.array([n_exact], pa.int64()),
            "n_after_neardup": pa.array([n_neardup], pa.int64()),
            "n_kept": pa.array([n_kept], pa.int64()),
            "total_tokens": pa.array([int(totals["total_tokens"] or 0)], pa.int64()),
            "lsh_buckets_truncated": pa.array([trunc_buckets], pa.int64()),
            "lsh_ids_truncated": pa.array([trunc_ids], pa.int64()),
            # per-gate rejection counts (a doc failing several gates
            # counts in each; gates that are OFF report 0)
            "rej_lang": pa.array([_delta("corpus_rej_lang")], pa.int64()),
            "rej_quality": pa.array([_delta("corpus_rej_quality")], pa.int64()),
            "rej_repetition": pa.array([_delta("corpus_rej_repetition")], pa.int64()),
            "rej_dup_lines": pa.array([_delta("corpus_rej_dup_lines")], pa.int64()),
            "rej_ppl": pa.array([_delta("corpus_rej_ppl")], pa.int64()),
            "rej_domain": pa.array([_delta("corpus_rej_domain")], pa.int64()),
            "rej_classifier": pa.array(
                [_delta("corpus_rej_classifier")], pa.int64()),
            "rej_compression": pa.array(
                [_delta("corpus_rej_compression")], pa.int64()),
            "substr_tokens_removed": pa.array(
                [_delta("corpus_substr_tokens_removed")], pa.int64()),
            "rej_contaminated": pa.array(
                [_delta("corpus_rej_contaminated")], pa.int64()),
        }
    )
    return kept, stats
