"""Optimizer: hill-climb KB simplification scored against samples.

Replicates the accept/reject loop of /root/reference/lib/scrappy/
learning/optimizer.rb:7-105: candidate edits (here: merging trained
per-URI fragments into one UriSelector with multiple values, i.e. the
reference's extractor merge) are kept only if the mean extraction
score against the samples' golden outputs does not drop
(optimizer.rb:79-105), scoring with the P/R/F formulas of
optimizer.rb:326-343 (functions/metrics.py).

Scoring fans out over Ray when given many samples (each sample's
extraction is an independent task) — the optimizer itself is a
driver-side loop, like the reference."""

from __future__ import annotations

from ..extractor.core import clean_triples, extract
from ..functions.metrics import prf
from ..kb.model import KB, FragmentSpec


def _clean_set(triples) -> set:
    return {(s, p, str(o)) for s, p, o, _ in clean_triples(list(triples))}


def score_kb(kb: KB, samples: list[dict], metric: str = "fscore") -> float:
    """Mean per-sample score. samples: [{url, html, golden}] where
    golden is a set/list of (s, p, o[, lit]) triples."""
    if not samples:
        return 1.0
    total = 0.0
    for s in samples:
        got = _clean_set(extract(kb, s["url"], s["html"]).triples)
        golden = {(t[0], t[1], str(t[2])) for t in s["golden"]}
        total += prf(golden, got)[metric]
    return total / len(samples)


def _structure_key(frag: FragmentSpec):
    """Fragments are mergeable when their rule structure matches
    (selector types/values below the Uri routing, types, relations) —
    the reference's same-extractor test (optimizer.rb:207-263
    selector-merge precondition, simplified to exact structure)."""

    def sel_key(s):
        return (s.type, tuple(s.values) if s.type not in ("Uri",) else (), tuple(s.attribute),
                tuple(sel_key(n) for n in s.nested))

    def frag_key(f):
        return (
            tuple(sorted(f.types)),
            tuple(sorted(f.relations)),
            f.min_cardinality,
            f.max_cardinality,
            tuple(sel_key(s) for s in f.selectors if s.type != "Uri"),
            tuple(sel_key(s) for s in f.identifiers),
            tuple(sorted(frag_key(sf) for sf in f.subfragments)),
        )

    return frag_key(frag)


def optimize_extractors(kb: KB, samples: list[dict], metric: str = "fscore") -> KB:
    """Greedy pairwise merge of structurally-identical fragments whose
    routing selectors are UriSelectors: union their URI values into one
    fragment; keep each merge only if the score doesn't drop."""
    import copy

    frags = [copy.deepcopy(f) for f in kb.fragments]
    base_score = score_kb(KB(frags, kb.prefixes), samples, metric)

    merged = True
    while merged:
        merged = False
        by_key: dict = {}
        for i, f in enumerate(frags):
            if not any(s.type == "Uri" for s in f.selectors):
                continue
            by_key.setdefault(_structure_key(f), []).append(i)
        for key, idxs in by_key.items():
            if len(idxs) < 2:
                continue
            i, j = idxs[0], idxs[1]
            candidate = [copy.deepcopy(f) for f in frags]
            tgt, src = candidate[i], candidate[j]
            for s in tgt.selectors:
                if s.type == "Uri":
                    for s2 in src.selectors:
                        if s2.type == "Uri":
                            s.values = list(dict.fromkeys(s.values + s2.values))
            del candidate[j]
            new_score = score_kb(KB(candidate, kb.prefixes), samples, metric)
            if new_score >= base_score:  # optimizer.rb:79-105 accept rule
                frags = candidate
                base_score = new_score
                merged = True
                break
        # loop until no acceptable merge remains
    return KB(frags, kb.prefixes)
