"""Boilerplate removal / main-content extraction over the pages table —
a jusText/trafilatura-style (Pomikálek '11; both public) link-density
segmenter built on the engine's own DOM:

1. segment the page into OUTERMOST block elements (p, h1–h6, li, pre,
   td — a block nested inside another candidate, e.g. li within li,
   merges into its ancestor);
2. score each block: cleaned text length + link density (fraction of
   the block's characters under <a> descendants);
3. keep blocks with enough text and low link density; the document's
   main content is the kept blocks' cleaned text joined by blank
   lines, in document order.

Deterministic for a fixed page, so golden-oracle-able like
extract_text. Runs as a plain (stateless) ``map_batches`` stage — the
per-document work is DOM-bound Python, the same execution shape as the
extraction stage (stages/extract_stage.py).
"""

from __future__ import annotations

import pyarrow as pa

from ..htmldom.dom import parse_html
from ..support import clean, decode_html

BLOCK_TAGS = ("p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "td")
_BLOCK_SET = frozenset(BLOCK_TAGS)
_BLOCK_CSS = ", ".join(BLOCK_TAGS)


def main_content(html, min_chars: int = 10, max_link_density: float = 0.4) -> str:
    """The main text of one page (see module docstring)."""
    doc = parse_html(decode_html(html))
    blocks = doc.search(_BLOCK_CSS)
    if not blocks:
        return ""
    ids = {id(b) for b in blocks}
    out: list[str] = []
    for b in blocks:
        # outermost-only: an ancestor that is itself a candidate block
        # already carries this text
        p, nested = b.parent, False
        while p is not None:
            if id(p) in ids and p.name in _BLOCK_SET:
                nested = True
                break
            p = p.parent
        if nested:
            continue
        txt = clean(b.text)
        if len(txt) < min_chars:
            continue
        link_chars = sum(len(clean(a.text)) for a in b.search("a"))
        if link_chars / len(txt) > max_link_density:
            continue
        out.append(txt)
    return "\n\n".join(out)


def extract_main_content(ds, html_col: str = "html", url_col: str = "url",
                         min_chars: int = 10, max_link_density: float = 0.4):
    """(url, main_text) per page — the corpus-prep stage that turns
    crawled HTML into training text with nav/byline/footer boilerplate
    dropped."""

    def run(batch: pa.Table) -> pa.Table:
        texts = [
            main_content(h, min_chars=min_chars, max_link_density=max_link_density)
            for h in batch.column(html_col).to_pylist()
        ]
        return pa.table({
            url_col: batch.column(url_col),
            "main_text": pa.array(texts, pa.string()),
        })

    return ds.map_batches(run, batch_format="pyarrow")
