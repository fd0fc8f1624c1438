"""Optimizer: hill-climb KB simplification scored against samples.

Replicates /root/reference/lib/scrappy/learning/optimizer.rb:

- the accept/reject loop (optimizer.rb:60-105): candidate merges are
  kept only if the mean extraction score against the samples' golden
  outputs does not drop, scoring with the P/R/F formulas of
  optimizer.rb:326-343 (functions/metrics.py);
- ``optimize_extractors`` (optimizer.rb:7-41): collect the subfragments
  of URI-routed root fragments, optimize them, and wrap the result
  under ONE common superfragment with a UriSelector over the sample
  URIs + BaseUri identifier;
- ``optimize_patterns`` (optimizer.rb:45-53): same loop over root
  fragments directly (visual patterns);
- fragment ``signature`` equality gate (optimizer.rb:198-205),
  pairwise ``distance``/``selector_distance`` candidate ordering
  (optimizer.rb:265-311), ``group``/``mix`` fragment merging with
  sibling cardinality summing (optimizer.rb:128-180), and selector
  ``merge`` with value generalization — per-position XPath tag
  union → ``*``, condition intersection, index retention
  (optimizer.rb:207-236) and visual min/max widening
  (optimizer.rb:238-263).

The optimizer itself is a driver-side loop, like the reference;
scoring extraction fans out over samples.
"""

from __future__ import annotations

import copy
import re

from ..extractor.core import clean_triples, extract
from ..functions.metrics import prf
from ..kb.model import KB, FragmentSpec, SelectorSpec


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


# ---------------------------------------------------------------- signature


def signature(frag: FragmentSpec):
    """optimizer.rb:198-205: fragments are groupable only when their
    type/relation/superclass/sameas sets, identifier presence, and the
    multiset of subfragment signatures all match."""
    return (
        frozenset(frag.types),
        frozenset(frag.relations),
        frozenset(frag.superclasses),
        frozenset(frag.sameas),
        not frag.identifiers,
        frozenset(signature(sf) for sf in frag.subfragments),
    )


# ----------------------------------------------------------------- distance

_VISUAL_NUM_FIELDS = [
    ("min_relative_x", 1), ("max_relative_x", 1),
    ("min_relative_y", 1), ("max_relative_y", 1),
    ("min_x", 1), ("max_x", 1), ("min_y", 1), ("max_y", 1),
    ("min_width", 1), ("max_width", 1),
    ("min_height", 1), ("max_height", 1),
    ("min_font_size", 100), ("max_font_size", 100),
    ("min_font_weight", 1), ("max_font_weight", 1),
]


def selector_distance(s1: SelectorSpec | None, s2: SelectorSpec | None) -> float:
    """optimizer.rb:292-311 (visual-constraint L1 distance; nil → 0)."""
    if s1 is None or s2 is None:
        return 0.0
    d = 0.0
    for f, w in _VISUAL_NUM_FIELDS:
        d += abs((getattr(s1, f) or 0) - (getattr(s2, f) or 0)) * w
    if s1.font_family != s2.font_family:
        d += 100
    if sorted(s1.tag) != sorted(s2.tag):
        d += 500
    return d


def distance(f1: FragmentSpec, f2: FragmentSpec, _memo=None) -> float:
    """optimizer.rb:265-290: selector + identifier distance plus
    signature-aligned subfragment distances (500 per unmatched sub)."""
    if signature(f1) != signature(f2):
        return float("inf")
    d = selector_distance(
        f1.selectors[0] if f1.selectors else None, f2.selectors[0] if f2.selectors else None
    )
    if f1.identifiers:
        d += selector_distance(
            f1.identifiers[0], f2.identifiers[0] if f2.identifiers else None
        )
    subs2 = list(f2.subfragments)
    for sub1 in f1.subfragments:
        match = next((s for s in subs2 if signature(sub1) == signature(s)), None)
        if match is None:
            d += 500.0
        else:
            subs2.remove(match)
            d += distance(sub1, match)
    d += len(subs2) * 500.0
    return d


# -------------------------------------------------------------------- merge

_XP_STEP_RE = re.compile(r"/([\w*-]+|\*)((?:\[[^\]]+\])*)")
_XP_PRED_RE = re.compile(r"\[([^\]]+)\]")


def _xpath_terms(value: str) -> list[dict] | None:
    """xpath → [{tag, conditions, index}] (trainer.rb emits one
    condition bracket then an optional positional bracket)."""
    v = value.strip()
    if v.startswith("."):
        v = v[1:]
    terms, pos = [], 0
    for m in _XP_STEP_RE.finditer(v):
        if m.start() != pos:
            return None
        pos = m.end()
        conds, index = [], None
        for pm in _XP_PRED_RE.finditer(m.group(2) or ""):
            body = pm.group(1).strip()
            if body.isdigit():
                index = int(body)
            else:
                conds.extend(c.strip() for c in _split_conditions(body))
        terms.append({"tag": m.group(1), "conditions": conds, "index": index})
    return terms if pos == len(v) and terms else None


def _split_conditions(body: str) -> list[str]:
    from ..htmldom.xpath import _split_and

    return _split_and(body)


def _xpath_expression(terms: list[dict]) -> str:
    out = []
    for t in terms:
        seg = f"/{t['tag']}"
        if t["conditions"]:
            seg += f"[{' and '.join(t['conditions'])}]"
        if t["index"] is not None:
            seg += f"[{t['index']}]"
        out.append(seg)
    return "." + "".join(out)


def merge_selectors(selectors: list[SelectorSpec]) -> SelectorSpec | None:
    """optimizer.rb:207-263 ``merge``: a new, more general selector.

    XPath: identical values pass through; equal-length paths merge
    per-position (tag union → ``*``, condition intersection, index kept
    only when unanimous); anything else fails the merge (→ None).
    Visual: min/max fields widen; font_family/tag/attribute only kept
    when unanimous."""
    if not selectors:
        return None
    first = selectors[0]
    out = SelectorSpec(type=first.type)
    if first.type == "XPath":
        out.attribute = list(first.attribute)
        all_values = [tuple(s.values) for s in selectors]
        if len(set(all_values)) == 1:
            out.values = list(first.values)
            return out
        termlists = [_xpath_terms(s.values[0]) for s in selectors if s.values]
        if any(t is None for t in termlists) or len({len(t) for t in termlists}) != 1:
            return None
        merged = []
        for i in range(len(termlists[0])):
            terms = [tl[i] for tl in termlists]
            tags = sorted({t["tag"] for t in terms})
            indexes = {t["index"] for t in terms}
            conds = list(terms[0]["conditions"])
            for t in terms[1:]:
                conds = [c for c in conds if c in t["conditions"]]
            merged.append(
                {
                    "tag": tags[0] if len(tags) == 1 else "*",
                    "conditions": conds,
                    "index": next(iter(indexes)) if len(indexes) == 1 else None,
                }
            )
        out.values = [_xpath_expression(merged)]
        return out
    if first.type == "Visual":
        for f, _ in _VISUAL_NUM_FIELDS:
            vals = [getattr(s, f) for s in selectors]
            if f.startswith("min_font") or f.startswith("max_font"):
                if any(v is None for v in vals):
                    continue  # reference: font bounds only when all present
            vals = [v for v in vals if v is not None]
            if vals:
                setattr(out, f, min(vals) if f.startswith("min") else max(vals))
        if len({s.font_family for s in selectors}) == 1:
            out.font_family = first.font_family
        if len({tuple(sorted(s.tag)) for s in selectors}) == 1:
            out.tag = list(first.tag)
        if len({tuple(sorted(s.attribute)) for s in selectors}) == 1:
            out.attribute = list(first.attribute)
        return out
    if first.type in ("Root", "BaseUri"):
        return copy.deepcopy(first)
    return None


# -------------------------------------------------------------------- group


def group(f1: FragmentSpec, f2: FragmentSpec, siblings: bool = True) -> FragmentSpec | None:
    """optimizer.rb:128-180: merge two signature-equal fragments.
    Sibling grouping SUMS cardinalities (the two rules fired on
    disjoint nodes of one page); non-sibling (aligned subfragments)
    takes min/max."""
    if signature(f1) != signature(f2):
        return None
    out = FragmentSpec(
        types=list(f1.types),
        relations=list(f1.relations),
        superclasses=list(f1.superclasses),
        sameas=list(f1.sameas),
        name=f1.name or f2.name,
    )
    if f1.min_cardinality is not None and f2.min_cardinality is not None:
        out.min_cardinality = (
            f1.min_cardinality + f2.min_cardinality if siblings else min(f1.min_cardinality, f2.min_cardinality)
        )
    if f1.max_cardinality is not None and f2.max_cardinality is not None:
        out.max_cardinality = (
            f1.max_cardinality + f2.max_cardinality if siblings else max(f1.max_cardinality, f2.max_cardinality)
        )
    sel = merge_selectors(f1.selectors + f2.selectors)
    if sel is None:
        return None
    out.selectors = [sel]
    if f1.identifiers:
        ident = merge_selectors(f1.identifiers + f2.identifiers)
        if ident is None:
            return None
        out.identifiers = [ident]
    subs = _mix(f1.subfragments, f2.subfragments)
    if subs is None:
        return None
    out.subfragments = subs
    return out


def _mix(subs1: list[FragmentSpec], subs2: list[FragmentSpec]) -> list[FragmentSpec] | None:
    """optimizer.rb:182-196: align two subfragment lists by signature
    and group each pair (non-sibling)."""
    if len(subs1) != len(subs2):
        return None
    used: list[int] = []
    out = []
    for s1 in subs1:
        m = next(
            (i for i, s2 in enumerate(subs2) if i not in used and signature(s1) == signature(s2)),
            None,
        )
        if m is None:
            return None
        used.append(m)
        g = group(s1, subs2[m], siblings=False)
        if g is None:
            return None
        out.append(g)
    return out


# ------------------------------------------------------------ optimize loop


def _optimize_all(fragments: list[FragmentSpec], score_of, metric: str = "fscore"):
    """optimizer.rb:60-126: repeat { try the closest untried pair →
    group → keep iff score does not drop } until no pair merges."""
    fragments = [copy.deepcopy(f) for f in fragments]
    best = score_of(fragments)
    tried: set = set()
    # `tried` is keyed on id() pairs; keep every fragment that ever
    # entered the pool alive so a merged-away fragment's id can't be
    # recycled by a new object and spuriously mask an untried pair.
    retained: list = list(fragments)
    while True:
        candidate = None
        pairs = []
        for i, f1 in enumerate(fragments):
            for j in range(i):
                d = distance(f1, fragments[j])
                if d != float("inf"):
                    pairs.append((d, i, j))
        pairs.sort(key=lambda t: t[0])
        for d, i, j in pairs:
            key = (id(fragments[i]), id(fragments[j]))
            if key in tried:
                continue
            tried.add(key)
            merged = group(fragments[i], fragments[j])
            if merged is not None:
                retained.append(merged)
                candidate = (i, j, merged)
                break
        if candidate is None:
            return fragments, best
        i, j, merged = candidate
        new_fragments = [f for k, f in enumerate(fragments) if k not in (i, j)] + [merged]
        new_score = score_of(new_fragments)
        if new_score >= best:  # optimizer.rb:79-88 accept rule
            fragments, best = new_fragments, new_score
        # rejected merges stay in `tried` and are never retried


def _uri_superfragment(subfragments: list[FragmentSpec], uris: list[str]) -> FragmentSpec:
    """optimizer.rb:21-37: one URI-routed superfragment over the
    optimized fragments (+ BaseUri identifier)."""
    return FragmentSpec(
        selectors=[SelectorSpec(type="Uri", values=list(dict.fromkeys(uris)))],
        identifiers=[SelectorSpec(type="BaseUri")],
        types=["sc:Index"],
        subfragments=subfragments,
        name="optimized",
    )


def optimize_extractors(kb: KB, samples: list[dict], metric: str = "recall") -> KB:
    """optimizer.rb:7-41: take the URI-routed root fragments that match
    some sample, optimize their subfragments (distance-ordered grouping
    with selector generalization, score-gated), and wrap the result
    under one common UriSelector superfragment.

    Default metric is recall to match optimizer.rb doc_score
    (optimizer.rb:323 — fscore only for :patterns): extractor merges
    that trade precision for coverage must be judged as the reference
    judges them."""
    sample_uris = [s["url"] for s in samples]
    roots = [
        f
        for f in kb.fragments
        if any(
            s.type in ("Uri", "UriPattern") and any(u in s.values or not samples for u in sample_uris)
            for s in f.selectors
        )
    ]
    if not roots:
        roots = [f for f in kb.fragments if any(s.type in ("Uri", "UriPattern") for s in f.selectors)]
    others = [f for f in kb.fragments if f not in roots]
    subs = [sf for r in roots for sf in r.subfragments]

    def score_of(frags):
        return score_kb(KB(others + [_uri_superfragment(frags, sample_uris)], kb.prefixes), samples, metric)

    optimized, _ = _optimize_all(subs, score_of, metric)
    return KB(others + [_uri_superfragment(optimized, sample_uris)], kb.prefixes)


def optimize_patterns(kb: KB, samples: list[dict], metric: str = "fscore") -> KB:
    """optimizer.rb:45-53: optimize the root fragments directly (the
    visual-pattern KB has no URI routing)."""

    def score_of(frags):
        return score_kb(KB(frags, kb.prefixes), samples, metric)

    optimized, _ = _optimize_all(kb.fragments, score_of, metric)
    return KB(optimized, kb.prefixes)
