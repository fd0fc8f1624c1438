"""DOM / CSS / XPath engine tests."""

from scrappy_ray.htmldom import parse_fragment, parse_html


HTML = """
<html><head><title>t</title></head><body>
<div class="a" id="top"><h2>Head<span> er</span></h2>
  <p class="b">one</p><p class="b c">two</p></div>
<div class="a"><p>three</p></div>
<ul><li>x<ul><li>y</li></ul></li></ul>
</body></html>
"""


def test_parse_and_text():
    doc = parse_html(HTML)
    h2 = doc.search("h2")[0]
    assert h2.text == "Head er"


def test_css_class_and_descendant():
    doc = parse_html(HTML)
    assert len(doc.search(".a")) == 2
    assert [n.text for n in doc.search(".a p")] == ["one", "two", "three"]
    assert [n.text for n in doc.search("p.b.c")] == ["two"]
    assert [n.text for n in doc.search("#top p")] == ["one", "two"]
    assert len(doc.search("p, h2")) == 4  # document order, dedup


def test_css_child_combinator_and_nested():
    doc = parse_html(HTML)
    assert [n.text for n in doc.search("div > h2")] == ["Head er"]
    assert len(doc.search("li li")) == 1
    assert doc.search("li li")[0].text == "y"


def test_scoped_search_excludes_self():
    doc = parse_html(HTML)
    top = doc.search("#top")[0]
    # Nokogiri search scopes to descendants; ancestors outside the scope
    # must not satisfy ancestor requirements
    assert [n.text for n in top.search("p")] == ["one", "two"]
    assert top.search("div p") == []  # no div strictly inside #top


def test_attrs_and_path():
    doc = parse_html('<html><body><div><p a="1">x</p><p>y</p></div></body></html>')
    p1, p2 = doc.search("p")
    assert p1["a"] == "1" and p2["a"] is None
    assert p1.path == "/html/body/div/p[1]"
    assert p2.path == "/html/body/div/p[2]"


def test_xpath_subset():
    doc = parse_html(HTML)
    assert len(doc.search("//p")) == 3
    assert [n.text for n in doc.search("//div/p")] == ["one", "two", "three"]
    assert [n.text for n in doc.search('//p[@class="b"]')] == ["one"]
    assert doc.search("/html/body/div")[0]["id"] == "top"
    assert [n.text for n in doc.search("//div[1]/p[2]")] == ["two"]


def test_mutation_replace():
    from scrappy_ray.htmldom.dom import TEXT, Node

    doc = parse_fragment("<div><b>bold</b> tail</div>")
    b = doc.search("b")[0]
    b.replace(Node(TEXT, data="'''bold'''"))
    assert doc.text == "'''bold''' tail"


def test_serialize_roundtrip():
    doc = parse_fragment('<div a="v&quot;"><br><i>x &amp; y</i></div>')
    assert doc.to_html() == '<div a="v&quot;"><br><i>x &amp; y</i></div>'


def test_body_normalization():
    doc = parse_html("<p>loose</p>")
    assert doc.search("body p")[0].text == "loose"


def test_css_attribute_selectors():
    doc = parse_html('<div><a rel="next" href="/n">n</a><a href="/p">p</a></div>')
    assert [n.text for n in doc.search("a[rel]")] == ["n"]
    assert [n.text for n in doc.search('a[rel="next"]')] == ["n"]
    assert [n.text for n in doc.search("a[rel=next]")] == ["n"]
    assert doc.search('a[rel="prev"]') == []


def test_css_multi_class_and_id_compound():
    doc = parse_html('<p class="x y" id="k">a</p><p class="x">b</p>')
    assert [n.text for n in doc.search("p.x.y")] == ["a"]
    assert [n.text for n in doc.search("p#k.x")] == ["a"]


def test_xpath_trainer_condition_forms():
    """The reference trainer's learned predicates (trainer.rb:139-164):
    class-token contains, not(@attr), contains(@id,...), `and` chains."""
    from scrappy_ray.htmldom import parse_html
    from scrappy_ray.htmldom.xpath import xpath_search

    doc = parse_html(
        '<html><body>'
        '<div class="story featured" id="main-1"><p>a</p></div>'
        '<div class="story" id="x2"><p>b</p></div>'
        '<div><p>c</p></div>'
        "</body></html>"
    )

    def texts(pat):
        return ["".join(t.data for t in n.descendants() if t.is_text()) for n in xpath_search(doc, pat)]

    tok = "contains(concat(' ',normalize-space(@class),' '),concat(' ','featured',' '))"
    assert texts(f".//div[{tok}]") == ["a"]
    tok2 = "contains(concat(' ',normalize-space(@class),' '),' story ')"
    assert texts(f".//div[{tok2}]") == ["a", "b"]
    assert texts(".//div[not(@class)]") == ["c"]
    assert texts(".//div[contains(@id,'main')]") == ["a"]
    both = f".//div[{tok2} and contains(@id,'x2')]"
    assert texts(both) == ["b"]
    assert texts(".//div[not(@class) and not(@id)]") == ["c"]
    # positional suffix after a condition bracket
    assert texts(f".//div[{tok2}][2]") == ["b"]
