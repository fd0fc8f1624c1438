"""Format tests: plain / sc:Html / sc:WikiText (formats.rb)."""

from scrappy_ray.extractor.formats import format_value
from scrappy_ray.htmldom import parse_fragment


def node_of(html, css):
    return parse_fragment(html).search(css)[0]


def test_plain_format_cleans():
    n = node_of("<div><p> a\xa0b </p></div>", "p")
    assert format_value(n, None, "http://u.test/") == "a b"
    assert format_value("  str\xa0x ", None, "http://u.test/") == "str x"
    assert format_value(None, None, "http://u.test/") == ""


def test_html_format():
    n = node_of("<div><p>a<b>c</b></p></div>", "p")
    assert format_value(n, "html", "http://u.test/") == "<p>a<b>c</b></p>"


def test_wikitext_headings_bold_links():
    n = node_of(
        '<div><h1>T</h1><p>see <a href="/x">link</a></p><b>bb</b></div>', "div"
    )
    out = format_value(n, "wikitext", "http://u.test/a/b")
    assert "= T =" in out
    assert "http://u.test/x" in out  # a → absolute href text (urljoin full uri)
    assert "'''bb'''" in out


def test_wikitext_lists_and_pre():
    n = node_of("<div><ul><li>a<ul><li>b</li></ul></li></ul><pre> p </pre></div>", "div")
    out = format_value(n, "wikitext", "http://u.test/")
    assert "** b" in out
    assert "* a" in out
    assert "<pre> p </pre>" in out  # pre keeps inner text unstripped


def test_wikitext_table():
    n = node_of("<div><table><tr><td>c</td></tr></table></div>", "div")
    out = format_value(n, "wikitext", "http://u.test/")
    assert out == "<table><tr><td>c</td></tr></table>"


def test_clone_for_reparse_equals_roundtrip():
    """_clone_for_reparse must be observationally identical to the
    serialize+clean+re-parse it replaces, including the tricky legs:
    NBSP in text and attrs, bare attributes, script CDATA content,
    entity-bearing text."""
    from scrappy_ray.extractor.formats import _clone_for_reparse, _wikitext
    from scrappy_ray.htmldom.dom import parse_fragment
    from scrappy_ray.support import clean

    cases = [
        '<div><a href="/x">link</a> and <b>bold\xa0text</b></div>',
        '<div><script>if (a < b && c > d) { go("&amp;"); }</script>tail</div>',
        '<ul><li>one<ul><li>two</li></ul></li></ul>',
        '<p data-x>bare attr</p>',
        '<td>cell\xa0</td>',
        '<div>&lt;escaped&gt; &amp; entities</div>',
        '<pre>  spaced  </pre>',
        '<h2> Head\xa0line </h2>',
        '<table><tr><td>a</td><td>b</td></tr></table>',
    ]
    uri = "http://e.test/base/page"
    for src in cases:
        el = parse_fragment(src).children[0]
        via_clone = _wikitext(_clone_for_reparse(el), uri)
        via_roundtrip = _wikitext(parse_fragment(clean(el.to_html())), uri)
        assert via_clone == via_roundtrip, src
