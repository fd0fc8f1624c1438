"""Frozen-golden regression (FIXTURES.md §4): the goldens in
tests/golden/ were produced ONCE by the reference-semantics simulator
on the 3×12 synthetic web (hand-verified — see the golden extraction
assertions in tests/test_extractor.py) and committed. Simulator and
engine share the extraction code, so this guards against BOTH drifting
together: any semantic change to selectors/formats/clean/link
discovery breaks these byte-exact comparisons and must be a conscious
decision (regenerate via the script in the file's git history)."""

import pyarrow.parquet as pq

from scrappy_ray.crawl.simulator import lookup_from_config, superstep_crawl_sim
from scrappy_ray.kb import load_kb
from scrappy_ray.sources.testgen import SynthWebConfig, seed_urls, synth_kb_yaml

import os

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _sim():
    cfg = SynthWebConfig(n_hosts=3, pages_per_host=12)
    kb = load_kb(synth_kb_yaml())
    return superstep_crawl_sim(lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1)


def test_frozen_schedule():
    sim = _sim()
    t = pq.read_table(os.path.join(GOLD, "crawl_schedule.parquet"))
    got = [(r["seq"], r["url"], r["depth"], r["round"]) for r in
           ({"seq": s["seq"], "url": s["url"], "depth": s["depth"], "round": s["round"]} for s in sim.schedule)]
    want = list(zip(t["seq"].to_pylist(), t["url"].to_pylist(), t["depth"].to_pylist(), t["round"].to_pylist()))
    assert got == want


def test_frozen_triples():
    sim = _sim()
    t = pq.read_table(os.path.join(GOLD, "triples.parquet"))
    want = set(zip(t["s"].to_pylist(), t["p"].to_pylist(), t["o"].to_pylist(), t["lit"].to_pylist()))
    got = {(s, p, str(o), bool(lit)) for s, p, o, lit in sim.triples}
    assert got == want


def test_frozen_text_byte_exact():
    sim = _sim()
    t = pq.read_table(os.path.join(GOLD, "extracted_text.parquet"))
    want = dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))
    for url, text in sim.texts.items():
        if text:
            assert text.encode() == want[url], f"text drift for {url}"
    assert len(want) == sum(1 for v in sim.texts.values() if v)
