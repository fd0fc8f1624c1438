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


def test_optimizer_merges_same_structure():
    base = load_kb(VISUAL_KB)
    pages = {f"http://t.test/p{i}": PAGE for i in (1, 2, 3)}
    trained = KB(
        [f for url, html in pages.items() for f in train_from_samples(base, [{"url": url, "html": html}]).fragments],
        base.prefixes,
    )
    samples = [
        {
            "url": url,
            "html": html,
            "golden": {(s, p, str(o)) for s, p, o, lit in clean_triples(extract(base, url, html).triples)},
        }
        for url, html in pages.items()
    ]
    assert len(trained.fragments) == 3
    before = score_kb(trained, samples)
    optimized = optimize_extractors(trained, samples)
    after = score_kb(optimized, samples)
    assert len(optimized.fragments) == 1  # merged into one multi-URI rule
    assert after >= before
    uri_sel = [s for s in optimized.fragments[0].selectors if s.type == "Uri"][0]
    assert sorted(uri_sel.values) == [f"http://t.test/p{i}" for i in (1, 2, 3)]


def test_score_kb_edge_cases():
    base = load_kb(VISUAL_KB)
    assert score_kb(base, []) == 1.0
    s = [{"url": "http://t.test/p", "html": PAGE, "golden": set()}]
    # empty golden: recall 1.0; precision depends on extraction
    assert 0.0 <= score_kb(base, s) <= 1.0
