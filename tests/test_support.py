"""Unit tests for string/URI helpers (reference: support.rb, agent.rb,
fragment.rb — see docstrings in scrappy_ray.support)."""

from scrappy_ray.support import (
    canonicalize,
    clean,
    complete_uri,
    four_chunk_base,
    host_of,
    parse_uri,
    strip_query,
    underscore,
    wikify,
)


def test_clean_nbsp_and_strip():
    assert clean("  hola\xa0mundo  ") == "hola mundo"
    assert clean(None) == ""
    assert clean("\xa0\xa0") == ""


def test_wikify():
    # support.rb:26-28: capitalize word starts, strip whitespace
    assert wikify("hello world") == "HelloWorld"
    assert wikify("Tag red") == "TagRed"
    assert wikify("already Caps") == "AlreadyCaps"


def test_underscore():
    # support.rb:29-35
    assert underscore("CamelCase") == "camel_case"
    assert underscore("Tag red") == "tag_red"
    assert underscore("HTTPServer") == "http_server"
    assert underscore("a-b c") == "a_b_c"


def test_complete_uri():
    # agent.rb:154-158
    assert complete_uri("google") == "http://google.com"
    assert complete_uri("example.org") == "http://example.org"
    assert complete_uri("http://x.test/") == "http://x.test/"
    assert complete_uri("sioc:Post") == "sioc:Post"  # has scheme-ish prefix


def test_four_chunk_base_and_parse_uri():
    # fragment.rb:127-135: base = scheme://host/first-path-seg
    assert four_chunk_base("http://h.test/a/b/c") == "http://h.test/a"
    assert parse_uri("http://h.test/a/b", "/x") == "http://h.test/x"
    assert parse_uri("http://h.test/a/b", "x") == "http://h.test/x"
    assert parse_uri("http://h.test/", "http://other.test/p") == "http://other.test/p"
    assert parse_uri("http://h.test/", None) is None


def test_strip_query_and_canonicalize():
    assert strip_query("http://a.test/p?x=1&y=2") == "http://a.test/p"
    assert canonicalize("a.test/p#frag") == "http://a.test/p"
    assert host_of("http://A.Test/p") == "a.test"
