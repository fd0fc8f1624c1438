"""Per-document extraction entry point.

Replicates /root/reference/lib/scrappy/extractor/extractor.rb:
``extract`` (rb:10-30), ``fragments_for`` KB routing (rb:33-52) and
``extract_graph`` (rb:55-59), plus the agent-level ``clean`` triple
filter (/root/reference/lib/scrappy/agent/agent.rb:160-162) and link
discovery (agent.rb:64-82).

This function is pure Python — it is the body of the Ray
``map_batches`` extraction stage (stages/extract_stage.py) AND of the
single-threaded reference-semantics simulator (crawl/simulator.py), so
both paths share byte-identical per-document behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..htmldom.dom import parse_html
from ..kb.model import KB
from ..support import decode_html
from .fragment import ExtractionContext, RNode, all_mappings, is_bnode
from .selectors import raw_filter

Triple = tuple  # (s, p, o, o_is_literal)


@dataclass
class ExtractResult:
    url: str
    triples: list = field(default_factory=list)  # raw triples (pre-clean)
    fetched: bool = True

    @property
    def clean_triples(self) -> list:
        return clean_triples(self.triples)

    @property
    def text(self) -> str:
        """The extracted-text channel: literal objects of the cleaned
        triples in extraction order, newline-joined. This is the
        byte-identical per-row invariant (BASELINE.json input_hint)."""
        return "\n".join(str(o) for (_s, _p, o, lit) in self.clean_triples if lit)


def clean_triples(triples: list) -> list:
    """agent.rb:160-162: uniq + drop rdf:type triples whose object is
    sc:Index / sc:Page / sc:NewUri. Order-preserving first-wins uniq."""
    seen = set()
    out = []
    for t in triples:
        if t[1] == "rdf:type" and t[2] in ("sc:Index", "sc:Page", "sc:NewUri"):
            continue
        if t in seen:
            continue
        seen.add(t)
        out.append(t)
    return out


def fragments_for(kb: KB, uri: str, ctx: ExtractionContext):
    """extractor.rb:33-52: root fragments whose Uri/UriPattern selector
    matches the URI (filter() only — no select pipeline), plus every
    fragment with a Visual selector, in (uri, visual) order."""
    uri_frags = []
    visual_frags = []
    routing_doc = {"uri": uri, "content": None, "value": None, "attribute": None, "nofollow": False}
    for sel, frag in kb.root_selectors():
        if sel.type in ("Uri", "UriPattern"):
            if raw_filter(sel, routing_doc, ctx):
                uri_frags.append(frag)
        elif sel.type == "Visual":
            visual_frags.append(frag)
    # preserve KB order within each class, uri selectors first (rb:51)
    out = []
    for f in uri_frags + visual_frags:
        if f not in out:
            out.append(f)
    return out


def extract(kb: KB, uri: str, html: bytes | str, referenceable: bool = False) -> ExtractResult:
    """extractor.rb:10-30. Returns the raw (pre-clean) triples, like the
    reference's Extractor#extract returning output.triples."""
    ctx = ExtractionContext(uri, referenceable)
    content = parse_html(decode_html(html))
    base_doc = {"uri": uri, "content": content, "value": None, "attribute": None, "nofollow": False}

    triples: list = []
    emitted = set()
    for frag in fragments_for(kb, uri, ctx):
        for mapping in all_mappings(frag, base_doc, ctx):
            obj = mapping["obj"]
            if isinstance(obj, RNode):
                # output << node merges the node's graph (RDF::Graph
                # dedups statements); order-preserving first-wins uniq
                for t in obj.triples:
                    if t not in emitted:
                        emitted.add(t)
                        triples.append(t)
    return ExtractResult(url=uri, triples=triples)


def discover_links(triples: list, self_uri: str, depth: int) -> list[dict]:
    """Link discovery (agent.rb:64-82). Returns ordered frontier items
    [{url, depth}]: sc:Page subjects first (depth NOT decremented),
    then every other node minus self/pages/nofollow (depth-1, floor -1),
    uniq on (url, depth), bnodes dropped."""
    pages = []
    page_seen = set()
    nofollow = set()
    for s, p, o, lit in triples:
        if p == "rdf:type" and not lit:
            if o == "sc:Page" and s not in page_seen:
                page_seen.add(s)
                pages.append(s)
            elif o == "sc:NewUri":
                nofollow.add(s)

    uris = []
    if depth != 0:
        for s, p, o, lit in triples:
            for n, n_lit in ((s, False), (o, lit)):
                if n_lit or n == self_uri or n in page_seen:
                    continue
                uris.append(n)

    items = []
    item_seen = set()
    for u in pages:
        if u in nofollow:
            continue
        item = (u, max(-1, depth))
        if item not in item_seen and not is_bnode(u):
            item_seen.add(item)
            items.append({"url": u, "depth": item[1]})
    for u in uris:
        if u in nofollow:
            continue
        item = (u, max(-1, depth - 1))
        if item not in item_seen and not is_bnode(u):
            item_seen.add(item)
            items.append({"url": u, "depth": item[1]})
    return items


def extract_record(kb: KB, uri: str, html, depth: int, referenceable: bool = False) -> dict:
    """One frontier item → full per-document record: the unit produced
    by the Ray extraction stage AND by the simulator (shared code ⇒
    identical behavior, including error handling). ``html=None`` means
    the fetch missed (non-HTML → empty triples, agent.rb:231-237).

    A page whose extraction raises yields an empty record with the
    error recorded instead of killing the job — a deliberate upgrade
    over the reference, where any exception aborts the whole crawl
    (SURVEY.md §4 "Retries"); at corpus scale one malformed page must
    not kill a run."""
    if html is None:
        return {
            "url": uri,
            "fetched": False,
            "triples": [],
            "clean_triples": [],
            "text": "",
            "links": [],
        }
    try:
        res = extract(kb, uri, html, referenceable)
    except Exception as e:  # noqa: BLE001 — any per-page failure is data, not fate
        return {
            "url": uri,
            "fetched": True,
            "triples": [],
            "clean_triples": [],
            "text": "",
            "links": [],
            "error": f"{type(e).__name__}: {e}",
        }
    ct = res.clean_triples
    return {
        "url": uri,
        "fetched": True,
        "triples": res.triples,
        "clean_triples": ct,
        "text": "\n".join(str(o) for (_s, _p, o, lit) in ct if lit),
        "links": discover_links(res.triples, uri, depth),
    }
