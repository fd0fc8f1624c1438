"""Serializers, Dumper sink, repository read-through, observe loop."""

import pytest

from scrappy_ray.sources.serializers import (
    dump_per_url,
    expand,
    serialize,
    triples_to_json,
    triples_to_ntriples,
    triples_to_yarf,
)
from scrappy_ray.state.repository import ExtractionRepository, observe


TRIPLES = [
    ("http://a.test/x", "rdf:type", "sioc:Post", False),
    ("http://a.test/x", "dc:title", 'He said "hi"\nbye', True),
    ("_:abc_1", "rdf:label", "Madrid", True),
]


def test_expand_curies():
    assert expand("rdf:type") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert expand("http://x.test/") == "http://x.test/"
    assert expand("_:b1") == "_:b1"


def test_ntriples():
    nt = triples_to_ntriples(TRIPLES)
    lines = nt.strip().split("\n")
    assert lines[0] == (
        "<http://a.test/x> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://rdfs.org/sioc/ns#Post> ."
    )
    assert '"He said \\"hi\\"\\nbye"' in lines[1]
    assert lines[2].startswith("_:abc_1 ")


def test_json_and_yarf():
    import json

    j = json.loads(triples_to_json(TRIPLES))
    assert j["http://a.test/x"]["rdf:type"] == ["sioc:Post"]
    y = triples_to_yarf(TRIPLES)
    assert "http://a.test/x:" in y and '  dc:title: "He said' in y
    with pytest.raises(ValueError):
        serialize(TRIPLES, "png")


def test_dumper_filenames(tmp_path):
    rows = [
        {
            "url": "http://a.test/art/1?x=1&y=2",
            "triples": [{"s": "s", "p": "p", "o": "o", "lit": True}],
        }
    ]
    paths = dump_per_url(rows, str(tmp_path), "ntriples")
    # dumper.rb mangling: strip scheme, /→-, .→_, ?&→+
    assert paths[0].endswith("a_test-art-1+x=1+y=2.ntriples")


def test_repository_read_through(tmp_path):
    repo = ExtractionRepository(str(tmp_path), window_s=900)
    calls = []

    def extract_fn(url):
        calls.append(url)
        return [(url, "dc:title", "T", True)]

    t1 = repo.get_or_extract("http://a.test/", extract_fn, now=1000)
    t2 = repo.get_or_extract("http://a.test/", extract_fn, now=1500)  # within window
    assert calls == ["http://a.test/"]  # second call reused
    assert t1 == t2
    t3 = repo.get_or_extract("http://a.test/", extract_fn, now=3000)  # expired
    assert len(calls) == 2
    assert t3 == t1


def test_repository_empty_marker(tmp_path):
    repo = ExtractionRepository(str(tmp_path), window_s=900)
    repo.get_or_extract("http://b.test/", lambda u: [], now=100)
    # context exists (sc:Empty marker) → no re-extraction, empty result
    got = repo.fetch("http://b.test/", now=200)
    assert got == []


def test_observe_loop():
    clock = {"t": 0.0}
    sleeps = []

    def fake_clock():
        return clock["t"]

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    def req(uri):
        clock["t"] += 1.0

    log = observe(["u1", "u2"], req, period_s=10, iterations=3, sleep_fn=fake_sleep, clock=fake_clock)
    assert len(log) == 6
    assert sleeps == [8.0, 8.0]  # period minus 2s work
