"""Per-selector unit tests (P1-P17 of SURVEY.md §2.2), each against
hand-computed expectations from the reference's Ruby semantics."""

import pytest

from scrappy_ray.extractor.fragment import ExtractionContext
from scrappy_ray.extractor.selectors import ruby_split, ruby_to_f, ruby_to_i, select
from scrappy_ray.htmldom import parse_html
from scrappy_ray.kb.loader import _sel_from_dict


def S(**kw):
    return _sel_from_dict(kw, [0])


def doc_for(html, uri="http://h.test/p"):
    return {
        "uri": uri,
        "content": parse_html(html),
        "value": None,
        "attribute": None,
        "nofollow": False,
    }


def ctx_for(uri="http://h.test/p"):
    return ExtractionContext(uri)


def vals(results):
    return [r["value"] for r in results]


def test_ruby_coercions():
    assert ruby_to_i("12px") == 12 and ruby_to_i(None) == 0 and ruby_to_i("x") == 0
    assert ruby_to_f("3.5abc") == 3.5 and ruby_to_f("") == 0.0
    assert ruby_split("a|b|", "|") == ["a", "b"]  # Ruby drops trailing empties
    assert ruby_split("", "|") == []


def test_base_uri_selector():
    d = doc_for("<p>x</p>")
    assert vals(select(S(type="BaseUri"), d, ctx_for())) == ["http://h.test/p"]


def test_uri_selector_strips_query():
    # uri.rb:5
    d = doc_for("<p>x</p>", uri="http://h.test/p?a=1")
    assert len(select(S(type="Uri", value="http://h.test/p"), d, ctx_for())) == 1
    assert select(S(type="Uri", value="http://h.test/q"), d, ctx_for()) == []


def test_uri_pattern_glob():
    # uri_pattern.rb: '*'→'.+' (one-or-more!), '.'→'\.', anchored
    d = doc_for("<p>x</p>", uri="http://h.test/art/5")
    assert len(select(S(type="UriPattern", value="http://h.test/art/*"), d, ctx_for())) == 1
    # '*' is one-or-more: no match on empty remainder
    d2 = doc_for("<p>x</p>", uri="http://h.test/art/")
    assert select(S(type="UriPattern", value="http://h.test/art/*"), d2, ctx_for()) == []


def test_css_selector_with_attribute_and_index():
    html = '<div><a href="/x">one</a><a href="/y">two</a></div>'
    d = doc_for(html)
    assert vals(select(S(type="Css", value="a", attribute="href"), d, ctx_for())) == ["/x", "/y"]
    assert vals(select(S(type="Css", value="a", index=1), d, ctx_for())) == ["two"]


def test_css_keyword_filter():
    # xpath.rb:13: keyword match on node.text.clean.downcase, exact
    html = "<div><span>Yes</span><span>Other</span></div>"
    d = doc_for(html)
    assert vals(select(S(type="Css", value="span", keyword="yes"), d, ctx_for())) == ["Yes"]


def test_slice_selector():
    # slice.rb: split by literal, pick indexes, strip, drop empty
    d = doc_for("<p>x</p>")
    d["value"] = "a | b | c"
    assert vals(select(S(type="Slice", value="|", index=1), d, ctx_for())) == ["b"]
    assert vals(select(S(type="Slice", value="|", index=[0, 2]), d, ctx_for())) == ["a", "c"]
    assert vals(select(S(type="Slice", value="|", index=9), d, ctx_for())) == []


def test_section_selector():
    html = (
        "<div><h4>refs</h4><p>one</p><p>two</p><h4>other</h4><p>no</p></div>"
    )
    d = doc_for(html)
    out = select(S(type="Section", value="refs"), d, ctx_for())
    assert vals(out) == ["one\n\ntwo"]  # stops at next same-tag heading


def test_section_stops_at_div():
    html = "<div><h4>refs</h4><p>one</p><div>stop</div><p>no</p></div>"
    d = doc_for(html)
    assert vals(select(S(type="Section", value="refs"), d, ctx_for())) == ["one"]


def test_new_uri_wikify_downcase_sequence():
    d = doc_for("<p>x</p>")
    d["value"] = "hello world"
    ctx = ctx_for()
    out = select(S(type="NewUri", prefix="http://t.test/"), d, ctx)
    assert vals(out) == ["http://t.test/HelloWorld"]
    assert out[0]["nofollow"] is True
    out = select(S(type="NewUri", prefix="http://t.test/", downcase="true"), d, ctx)
    assert vals(out) == ["http://t.test/hello_world"]
    seq = S(type="NewUri", prefix="http://t.test/", sequence="true", follow="true")
    assert vals(select(seq, d, ctx)) == ["http://t.test/1"]
    assert vals(select(seq, d, ctx)) == ["http://t.test/2"]  # per-doc counter
    ctx2 = ctx_for()
    assert vals(select(seq, d, ctx2)) == ["http://t.test/1"]  # reset per doc


def test_new_uri_absolute_value_and_relative_prefix():
    d = doc_for("<p>x</p>", uri="http://h.test/a/b")
    d["value"] = "http://abs.test/q"
    out = select(S(type="NewUri", suffix="#f"), d, ctx_for())
    assert vals(out) == ["http://abs.test/q#f"]
    d["value"] = "z"
    out = select(S(type="NewUri", prefix="#"), d, ctx_for())
    assert vals(out) == ["http://h.test/a/b#Z"]


def test_boolean_pipeline():
    # selector.rb:24-40: yes/true→"true", no/none/false/-/--→"false", else drop
    html = "<div><i>yes</i><i>no</i><i>whatever</i><i>--</i></div>"
    d = doc_for(html)
    out = select(S(type="Css", value="i", boolean="true"), d, ctx_for())
    assert vals(out) == ["true", "false", "false"]


def test_normalize_pipeline():
    html = "<div><i>50</i><i>150</i></div>"
    d = doc_for(html)
    out = select(
        S(type="Css", value="i", normalize_min=0, normalize_max=100, normalize_in_range="true"),
        d,
        ctx_for(),
    )
    assert vals(out) == ["0.5"]


def test_nonempty_and_nested_composition():
    html = "<div><i>a|b</i><i></i></div>"
    d = doc_for(html)
    spec = S(type="Css", value="i", nonempty="true", selector={"type": "Slice", "value": "|", "index": [0, 1]})
    assert vals(select(spec, d, ctx_for())) == ["a", "b"]


def test_visual_selector():
    html = (
        '<div vx="0" vy="0">'
        '<h1 vx="5" vy="5" vsize="30" vweight="700" vfont="Georgia">big</h1>'
        '<p vx="5" vy="50" vsize="12" vweight="400" vfont="Arial">small</p>'
        "</div>"
    )
    d = doc_for(html)
    out = select(S(type="Visual", min_font_size=20), d, ctx_for())
    assert vals(out) == ["big"]
    out = select(S(type="Visual", font_family="Arial"), d, ctx_for())
    assert vals(out) == ["small"]
    out = select(S(type="Visual", min_relative_y=40), d, ctx_for())
    assert vals(out) == ["small"]


def test_root_selector_attribute():
    doc = parse_html('<a href="/x">t</a>')
    a = doc.search("a")[0]
    d = {"uri": "http://h.test/", "content": a, "value": "t", "attribute": None, "nofollow": False}
    assert vals(select(S(type="Root", attribute="href"), d, ctx_for())) == ["/x"]


def test_unknown_selector_type_raises():
    d = doc_for("<p>x</p>")
    with pytest.raises(ValueError):
        select(S(type="Bogus"), d, ctx_for())
