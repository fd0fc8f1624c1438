"""Minimal pure-Python HTML DOM + CSS/XPath-subset selector engine.

The container has no lxml/selectolax/bs4, so the engine ships its own
DOM built on stdlib ``html.parser``. It implements exactly the surface
the reference's selectors need (Nokogiri usage in
/root/reference/lib/scrappy/extractor/): ``search`` (CSS + XPath
subset), ``text``, ``to_html``, attribute access, ``parent``/
``children``, ``path``, and in-place ``replace`` (for the WikiText
format's rewrite passes, formats.rb:5-26).
"""

from .dom import Node, parse_html, parse_fragment, node_search, node_text, node_attr, node_name
from .serialize import to_html

__all__ = [
    "Node",
    "parse_html",
    "parse_fragment",
    "node_search",
    "node_text",
    "node_attr",
    "node_name",
    "to_html",
]
