"""Fragment tree walk — the structured "query" of the engine.

Replicates /root/reference/lib/scrappy/extractor/fragment.rb:
``mappings`` (rb:52-100), ``all_mappings`` (rb:13-48, including the
min/max-cardinality consistency check), ``build_node`` (rb:104-125) and
``reference`` provenance (rb:138-171).

Triples are ``(s, p, o, o_is_literal)`` tuples of CURIE/URI strings;
bnodes are deterministic ``_:{md5(url)[:10]}_{n}`` (the reference uses
a global RDF::ID counter, bin/scrappy:275; per-document numbering makes
output order-independent and byte-stable across parallel runs).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from ..htmldom.dom import Node
from ..kb.model import FragmentSpec
from ..support import parse_uri
from .selectors import select


class ExtractionContext:
    """Per-document state (the reference resets it by re-instantiating
    the KB graph per extraction, extractor.rb:17)."""

    __slots__ = ("uri", "bnode_prefix", "bnode_count", "seq_counters", "visual_memo", "referenceable")

    def __init__(self, uri: str, referenceable: bool = False):
        self.uri = uri
        self.bnode_prefix = hashlib.md5(uri.encode("utf-8", "ignore")).hexdigest()[:10]
        self.bnode_count = 0
        self.seq_counters: dict = {}
        self.visual_memo: dict = {}
        self.referenceable = referenceable

    def bnode(self) -> str:
        self.bnode_count += 1
        return f"_:{self.bnode_prefix}_{self.bnode_count}"


def is_bnode(node_id: str) -> bool:
    return node_id.startswith("_:")


@dataclass
class RNode:
    """An RDF node plus the triples accumulated about it (the
    reference's RDF::Node with its own graph)."""

    id: str
    triples: list = field(default_factory=list)

    def add(self, p: str, o, o_is_literal: bool):
        self.triples.append((self.id, p, o, o_is_literal))

    def merge(self, other: "RNode"):
        self.triples.extend(other.triples)


def build_node(frag: FragmentSpec, doc: dict, ctx: ExtractionContext) -> RNode | None:
    """fragment.rb:104-125."""
    if not frag.identifiers:
        return RNode(ctx.bnode())
    docs = []
    for ident in frag.identifiers:
        docs.extend(select(ident, doc, ctx))
    if not docs:
        return None
    d = docs[0]  # the reference builds all then takes .first (rb:124)
    uri = parse_uri(d["uri"], d["value"])
    node = RNode(uri if uri is not None else ctx.bnode())
    if ctx.referenceable:
        uri_node = RNode(ctx.bnode())
        source = _reference(d, ctx)
        uri_node.merge(source)
        uri_node.add("rdf:value", node.id, True)
        uri_node.add("sc:source", source.id, False)
        node.merge(uri_node)
        node.add("sc:uri", uri_node.id, False)
    if d.get("nofollow"):
        node.add("rdf:type", "sc:NewUri", False)
    return node


def mappings(frag: FragmentSpec, doc: dict, ctx: ExtractionContext) -> list[dict]:
    """fragment.rb:52-100. Returns [{obj, subfragments, doc}] where obj
    is an RNode or a literal string."""
    docs = []
    for sel in frag.selectors:
        docs.extend(select(sel, doc, ctx))

    out = []
    for d in docs:
        node = build_node(frag, d, ctx)
        if node is None:
            continue

        if "rdf:Literal" in frag.types:
            if ctx.referenceable:
                node.add("rdf:value", str(d["value"]), True)
                node.add("rdf:type", "rdf:Literal", False)
                obj = node
            else:
                obj = str(d["value"])  # plain literal; node discarded
        else:
            for t in frag.types:
                if t != "rdf:Resource":
                    node.add("rdf:type", t, False)
            for sc in frag.superclasses:
                node.add("rdfs:subClassOf", sc, False)
            for sa in frag.sameas:
                node.add("owl:sameAs", sa, False)
            obj = node

        if ctx.referenceable and isinstance(obj, RNode) and obj.triples:
            source = _reference(d, ctx)
            for t in frag.types:
                source.add("sc:type", t, False)
            for sc in frag.superclasses:
                source.add("sc:superclass", sc, False)
            for sa in frag.sameas:
                source.add("sc:sameas", sa, False)
            for rel in frag.relations:
                source.add("sc:relation", rel, False)
            obj.merge(source)
            obj.add("sc:source", source.id, False)

        out.append({"obj": obj, "subfragments": frag.subfragments, "doc": d})
    return out


def all_mappings(frag: FragmentSpec, doc: dict, ctx: ExtractionContext) -> list[dict]:
    """fragment.rb:13-48 — recurse into subfragments within the matched
    scope, attach sc:relation triples, enforce cardinality."""
    results = []
    for mapping in mappings(frag, doc, ctx):
        obj = mapping["obj"]
        scoped_doc = mapping["doc"]

        consistent = True
        for subfrag in mapping["subfragments"]:
            submappings = all_mappings(subfrag, scoped_doc, ctx)
            for sub in submappings:
                subobj = sub["obj"]
                if isinstance(obj, RNode):
                    if isinstance(subobj, RNode):
                        obj.merge(subobj)
                        for rel in subfrag.relations:
                            obj.add(rel, subobj.id, False)
                    else:
                        for rel in subfrag.relations:
                            obj.add(rel, subobj, True)
            if subfrag.min_cardinality is not None and len(submappings) < subfrag.min_cardinality:
                consistent = False
            if subfrag.max_cardinality is not None and len(submappings) > subfrag.max_cardinality:
                consistent = False

        if not consistent:
            continue
        results.append(mapping)
    return results


def _reference(doc: dict, ctx: ExtractionContext) -> RNode:
    """Provenance reference (fragment.rb:138-171)."""
    content = doc["content"]
    node = content[0].parent if isinstance(content, list) and content else content
    if isinstance(content, list) and not content:
        node = None

    source = RNode(ctx.bnode())
    selector = RNode(ctx.bnode())

    selector.add("rdf:type", "sc:UnivocalSelector", False)
    path = node.path if isinstance(node, Node) else "/"
    selector.add("sc:path", path, True)
    selector.add("sc:document", doc["uri"], True)
    if doc.get("attribute"):
        selector.add("sc:attribute", doc["attribute"], True)
    source.merge(selector)
    source.add("sc:selector", selector.id, False)

    if path != "/" and isinstance(node, Node):
        selector.triples.append((selector.id, "sc:tag", node.name, True))
        presentation = RNode(ctx.bnode())
        for vattr, prop in (
            ("vx", "sc:x"), ("vy", "sc:y"), ("vw", "sc:width"), ("vh", "sc:height"),
            ("vsize", "sc:font_size"), ("vfont", "sc:font_family"), ("vweight", "sc:font_weight"),
        ):
            if node.attrs.get(vattr):
                presentation.add(prop, node.attrs[vattr], True)
        presentation.add("sc:text", node.text.strip(), True)
        source.merge(presentation)
        source.add("sc:presentation", presentation.id, False)
    return source
