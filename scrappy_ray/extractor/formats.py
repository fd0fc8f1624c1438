"""Value formats: plain / sc:Html / sc:WikiText.

Replicates /root/reference/lib/scrappy/extractor/formats.rb exactly:
- plain (no sc:format): node.text.clean (formats.rb:33-39)
- html: node.to_html.clean (formats.rb:27-32)
- wikitext: serialize subtree, re-parse, rewrite a/h1-h5/b/td/tr/table/
  li-nesting/ul/pre/code/p in that order, then doc.text.strip
  (formats.rb:5-26). Rewrites mutate the tree in sequence, so later
  passes see earlier replacements — order is semantic.
"""

from __future__ import annotations

from urllib.parse import urljoin

from ..htmldom.css import compile_css
from ..htmldom.dom import DOCUMENT, TEXT, Node, build_index, index_of, parse_fragment
from ..htmldom.serialize import _esc_text
from ..support import _NBSP, clean


def _clone_for_reparse(el: Node) -> Node:
    """parse_fragment(clean(el.to_html())) for an ELEMENT node without
    the serialize + re-parse round trip (it was ~35% of extraction CPU).
    The round trip's observable effects, reproduced directly:
    - clean(): NBSP→space in every text node and attribute value (the
      UTF-8//IGNORE leg is a no-op on str; strip() is a no-op because an
      element's serialization starts '<' and ends '>');
    - bare attributes (value None) re-parse as "";
    - script/style content re-parses in CDATA mode, so the serializer's
      &/</> escaping is NOT undone there — apply it;
    - a fresh un-indexed root DOCUMENT wrapper, like parse_fragment.
    Adjacent text nodes (comment-split) merge in a real round trip but
    are indistinguishable to the rewrites (element search + .text)."""
    root = Node(DOCUMENT)
    root.append(_clone_rec(el, False))
    return root


def _clone_rec(n: Node, in_cdata: bool) -> Node:
    if n.is_text():
        data = _esc_text(n.data) if in_cdata else n.data
        return Node(TEXT, data=data.replace(_NBSP, " "))
    new = Node(
        n.name,
        {k: ("" if v is None else v.replace(_NBSP, " ")) for k, v in n.attrs.items()},
    )
    cdata = in_cdata or n.name in ("script", "style")
    for c in n.children:
        new.append(_clone_rec(c, cdata))
    return new


def format_value(node, fmt: str | None, uri: str) -> str:
    if fmt == "wikitext":
        # the reference always re-serializes + re-parses (formats.rb:7)
        if isinstance(node, Node) and not node.is_text() and node.name != DOCUMENT:
            return _wikitext(_clone_for_reparse(node), uri)
        src = node.to_html() if isinstance(node, Node) else str(node or "")
        return _wikitext(parse_fragment(clean(src)), uri)
    if fmt == "html":
        if isinstance(node, Node):
            return clean(node.to_html())
        return clean("" if node is None else str(node))
    # plain
    if isinstance(node, Node):
        return clean(node.text)
    return clean("" if node is None else str(node))


def _chain_possible(chain, tags: dict) -> bool:
    # a chain can only match if every tag it names exists in the doc
    return all(s.tag is None or s.tag in tags for _, s in chain.steps)


def _replace_all(doc: Node, css: str, make_text) -> None:
    # each rewrite pass searches the post-mutation tree. Rewrites only
    # ever REMOVE elements (matches become TEXT nodes), so the
    # last-built tag map — even one invalidated by a later mutation —
    # is a superset of the live tags: a pass whose tags are absent
    # there cannot match and is skipped without touching the tree
    # (typical fragments hit 4 of these 18 passes). Re-indexing (one
    # fast walk, so the search is a tag-list scan not a tree walk)
    # happens only when an earlier pass actually mutated. The search
    # list is materialized BEFORE any replacement below, so within-pass
    # semantics are unchanged.
    chains = compile_css(css)
    stale = doc._idx
    if stale is not None and not any(_chain_possible(c, stale.tags) for c in chains):
        return
    if index_of(doc) is None:
        build_index(doc)
        if not any(_chain_possible(c, doc._idx.tags) for c in chains):
            return
    for n in doc.search(css):
        if n.parent is None:  # already detached by an earlier rewrite
            continue
        n.replace(Node(TEXT, data=make_text(n)))


def _wikitext(doc: Node, uri: str) -> str:
    _replace_all(doc, "a", lambda n: urljoin(uri, n.attrs.get("href") or ""))
    for level in range(1, 6):
        eq = "=" * level
        _replace_all(doc, f"h{level}", lambda n, eq=eq: f"{eq} {n.text.strip()} {eq}")
    _replace_all(doc, "b", lambda n: f"'''{n.text.strip()}'''")
    _replace_all(doc, "td", lambda n: f"<td>{n.text.strip()}</td>")
    _replace_all(doc, "tr", lambda n: f"<tr>{n.text.strip()}</tr>")
    _replace_all(doc, "table", lambda n: f"<table>{n.text.strip()}</table>")
    for depth in range(5, 1, -1):
        stars = "*" * depth
        _replace_all(doc, " ".join(["li"] * depth), lambda n, s=stars: f"{s} {n.text.strip()}")
    _replace_all(doc, "li", lambda n: f"* {n.text.strip()}")
    _replace_all(doc, "ul", lambda n: n.text.strip())
    _replace_all(doc, "pre, code", lambda n: f"<pre>{n.text}</pre>")
    _replace_all(doc, "p", lambda n: f"{n.text.strip()}\n")
    return doc.text.strip()
