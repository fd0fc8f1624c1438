"""HTML serialization (Node#to_html) for the sc:Html / sc:WikiText
formats (/root/reference/lib/scrappy/extractor/formats.rb:7,28).

Deterministic minimal serialization: attributes in parse order,
double-quoted, text/attr escaping of & < > (plus " in attributes).
Goldens are frozen from this serializer (see FIXTURES.md §4).
"""

from __future__ import annotations

from .dom import DOCUMENT, VOID_ELEMENTS


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return _esc_text(s).replace('"', "&quot;")


def to_html(node) -> str:
    out: list[str] = []
    _write(node, out)
    return "".join(out)


def _write(node, out: list[str]) -> None:
    if node.is_text():
        out.append(_esc_text(node.data))
        return
    if node.name == DOCUMENT:
        for c in node.children:
            _write(c, out)
        return
    attrs = "".join(f' {k}="{_esc_attr(v if v is not None else "")}"' for k, v in node.attrs.items())
    if node.name in VOID_ELEMENTS and not node.children:
        out.append(f"<{node.name}{attrs}>")
        return
    out.append(f"<{node.name}{attrs}>")
    for c in node.children:
        _write(c, out)
    out.append(f"</{node.name}>")
