"""Extraction-quality metrics: precision / recall / f-score.

Replicates /root/reference/lib/scrappy/learning/optimizer.rb:326-343::

    right = |correct| - |correct - extraction|     (multiset diff)
    precision = right/|extraction|   (1.0 if |extraction| = 0)
    recall    = right/|correct|      (1.0 if |correct| = 0)
    fscore    = 2PR/(P+R)            (0.0 if P+R = 0)

and the per-predicate/per-type rollup of
/root/reference/lib/scrappy/server/admin.rb:186-228 (missing =
correct − extraction, wrong = extraction − correct; both as set
anti-joins over (s,p,o) triple tables)."""

from __future__ import annotations

import pyarrow as pa


def prf(correct: set, extracted: set) -> dict:
    right = len(correct) - len(correct - extracted)
    precision = right / len(extracted) if extracted else 1.0
    recall = right / len(correct) if correct else 1.0
    fscore = (2 * precision * recall / (precision + recall)) if (precision + recall) > 0 else 0.0
    return {"precision": precision, "recall": recall, "fscore": fscore, "right": right}


def _triple_set(ds_or_table) -> set:
    if isinstance(ds_or_table, (set, frozenset, list)):
        return {(t[0], t[1], t[2]) for t in ds_or_table}
    if isinstance(ds_or_table, pa.Table):
        rows = ds_or_table.to_pylist()
    else:
        rows = [r for b in ds_or_table.iter_batches(batch_format="pyarrow") for r in b.to_pylist()]
    return {(r["s"], r["p"], r["o"]) for r in rows}


def extraction_metrics(correct, extracted) -> dict:
    """Overall P/R/F between two triple tables/Datasets (s,p,o cols)."""
    return prf(_triple_set(correct), _triple_set(extracted))


def per_predicate_metrics(correct, extracted) -> pa.Table:
    """admin.rb:186-209 rollup: P/R/F per predicate, plus missing/wrong
    counts."""
    cs, es = _triple_set(correct), _triple_set(extracted)
    preds = sorted({p for _, p, _ in cs} | {p for _, p, _ in es})
    rows = []
    for p in preds:
        cp = {t for t in cs if t[1] == p}
        ep = {t for t in es if t[1] == p}
        m = prf(cp, ep)
        rows.append(
            {
                "predicate": p,
                "precision": m["precision"],
                "recall": m["recall"],
                "fscore": m["fscore"],
                "missing": len(cp - ep),
                "wrong": len(ep - cp),
            }
        )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "predicate": pa.array([], pa.string()),
            "precision": pa.array([], pa.float64()),
            "recall": pa.array([], pa.float64()),
            "fscore": pa.array([], pa.float64()),
            "missing": pa.array([], pa.int64()),
            "wrong": pa.array([], pa.int64()),
        }
    )
