"""YARF knowledge-base parser.

The reference stores extraction rules as YARF files — an indentation-
based RDF text format (see /root/reference/extractors/elmundo.yarf,
/root/reference/extra/scraping.yarf for the shape; the reference reads
them via the lightrdf gem, bin/scrappy:254-267). This is a from-scratch
parser for the subset those KB files use::

    prefix: http://...            # prefix declarations (unindented)
    _:name:                       # subject block (bnode or CURIE)
      rdf:type: sc:Fragment       # property: value
      sc:selector:                # property with nested node(s)
        *:                        #   anonymous child node
          rdf:value: "literal"    #   quoted → literal, bare → node ref

yielding triples, plus a converter to the compiled FragmentSpec model
(the reference materializes the same graph into Sc::Fragment proxies,
fragment.rb:2-4). A user of the reference can point this engine at
their existing ~/.scrappy/extractors/*.yarf files unchanged."""

from __future__ import annotations

import re

from .model import KB, FragmentSpec, SelectorSpec

_PREFIX_RE = re.compile(r"^([A-Za-z][\w-]*):\s+(\S+)\s*$")
_LINE_RE = re.compile(r"^(\s*)(\S.*?):(?:\s+(.*?))?\s*$")


def parse_yarf(text: str):
    """→ (triples [(s,p,o,lit)], prefixes {pfx: uri}). Node ids stay in
    CURIE / bnode / URI form, unexpanded (the engine's convention)."""
    prefixes: dict[str, str] = {}
    triples: list = []
    bnode_count = [0]

    def fresh_bnode() -> str:
        bnode_count[0] += 1
        return f"_:yarf{bnode_count[0]}"

    # stack of (indent, subject); pending predicate for nested blocks
    stack: list[tuple[int, str]] = []
    pending: list[tuple[int, str, str]] = []  # (indent, subject, predicate)

    for raw in text.splitlines():
        if not raw.strip() or raw.lstrip().startswith("#"):
            continue
        m = _LINE_RE.match(raw)
        if not m:
            continue
        indent = len(m.group(1))
        key = m.group(2).strip()
        value = m.group(3)

        if indent == 0:
            pm = _PREFIX_RE.match(raw)
            if pm and "://" in (pm.group(2) or "") and not raw.rstrip().endswith(":"):
                prefixes[pm.group(1)] = pm.group(2)
                continue
            # new top-level subject
            stack = [(0, key)]
            pending = []
            continue

        # drop frames deeper than this line
        stack = [f for f in stack if f[0] < indent]
        pending = [p for p in pending if p[0] < indent]

        if value is None or value == "":
            if key == "*":
                # anonymous node under the nearest pending predicate
                node = fresh_bnode()
                if pending:
                    pi, ps, pp = pending[-1]
                    triples.append((ps, pp, node, False))
                stack.append((indent, node))
            else:
                # property that introduces nested node block(s)
                if stack:
                    pending.append((indent, stack[-1][1], key))
        else:
            subject = stack[-1][1] if stack else None
            if subject is None:
                continue
            if value.startswith('"') and value.endswith('"') and len(value) >= 2:
                triples.append((subject, key, value[1:-1], True))
            else:
                triples.append((subject, key, value, False))

    return triples, prefixes


_SEL_TYPES = {
    "sc:UriSelector": "Uri",
    "sc:UriPatternSelector": "UriPattern",
    "sc:BaseUriSelector": "BaseUri",
    "sc:CssSelector": "Css",
    "sc:XPathSelector": "XPath",
    "sc:SliceSelector": "Slice",
    "sc:SectionSelector": "Section",
    "sc:NewUriSelector": "NewUri",
    "sc:RootSelector": "Root",
    "sc:VisualSelector": "Visual",
}

_VISUAL_INTS = (
    "min_relative_x max_relative_x min_relative_y max_relative_y min_x max_x "
    "min_y max_y min_width max_width min_height max_height min_font_size "
    "max_font_size min_font_weight max_font_weight"
).split()


def _index(triples):
    by_s: dict = {}
    for s, p, o, lit in triples:
        by_s.setdefault(s, {}).setdefault(p, []).append((o, lit))
    return by_s


def _vals(by_s, s, p):
    return [o for o, _ in by_s.get(s, {}).get(p, [])]


def _selector_spec(by_s, node, counter) -> SelectorSpec:
    types = _vals(by_s, node, "rdf:type")
    sel_type = next((_SEL_TYPES[t] for t in types if t in _SEL_TYPES), "Root")
    spec = SelectorSpec(type=sel_type, sid=counter[0])
    counter[0] += 1
    spec.values = [str(v) for v in _vals(by_s, node, "rdf:value")]
    spec.attribute = [str(v) for v in _vals(by_s, node, "sc:attribute")]
    spec.indexes = [int(v) for v in _vals(by_s, node, "sc:index")]
    spec.keyword = [str(v) for v in _vals(by_s, node, "sc:keyword")]
    fmt = _vals(by_s, node, "sc:format")
    if fmt:
        spec.format = str(fmt[0]).removeprefix("sc:").lower()
    for flag in ("boolean", "nonempty", "sequence", "downcase", "follow", "normalize_in_range"):
        if _vals(by_s, node, f"sc:{flag}") == ["true"]:
            setattr(spec, flag, True)
    for num in ("normalize_min", "normalize_max"):
        v = _vals(by_s, node, f"sc:{num}")
        if v:
            setattr(spec, num, float(v[0]))
    spec.tag = [str(v) for v in _vals(by_s, node, "sc:tag")]
    ff = _vals(by_s, node, "sc:font_family")
    if ff:
        spec.font_family = str(ff[0])
    for num in _VISUAL_INTS:
        v = _vals(by_s, node, f"sc:{num}")
        if v:
            setattr(spec, num, int(v[0]))
    pre = _vals(by_s, node, "sc:prefix")
    if pre:
        spec.prefix = str(pre[0])
    suf = _vals(by_s, node, "sc:suffix")
    if suf:
        spec.suffix = str(suf[0])
    spec.nested = [_selector_spec(by_s, n, counter) for n in _vals(by_s, node, "sc:selector")]
    return spec


def _fragment_spec(by_s, node, counter, name="") -> FragmentSpec:
    f = FragmentSpec(name=name or str(node))
    f.selectors = [_selector_spec(by_s, n, counter) for n in _vals(by_s, node, "sc:selector")]
    f.identifiers = [_selector_spec(by_s, n, counter) for n in _vals(by_s, node, "sc:identifier")]
    f.types = [str(t) for t in _vals(by_s, node, "sc:type")]
    f.relations = [str(r) for r in _vals(by_s, node, "sc:relation")]
    f.superclasses = [str(s) for s in _vals(by_s, node, "sc:superclass")]
    f.sameas = [str(s) for s in _vals(by_s, node, "sc:sameas")]
    mc = _vals(by_s, node, "sc:min_cardinality")
    if mc:
        f.min_cardinality = int(mc[0])
    xc = _vals(by_s, node, "sc:max_cardinality")
    if xc:
        f.max_cardinality = int(xc[0])
    f.subfragments = [_fragment_spec(by_s, n, counter) for n in _vals(by_s, node, "sc:subfragment")]
    return f


def yarf_to_kb(text: str) -> KB:
    """Load a YARF KB file: root fragments = nodes typed sc:Fragment
    that are not any sc:subfragment object (extractor.rb:35)."""
    triples, prefixes = parse_yarf(text)
    by_s = _index(triples)
    fragment_nodes = [s for s, p, o, lit in triples if p == "rdf:type" and o == "sc:Fragment" and not lit]
    sub_objects = {o for s, p, o, lit in triples if p == "sc:subfragment" and not lit}
    roots = [n for n in dict.fromkeys(fragment_nodes) if n not in sub_objects]
    counter = [0]
    frags = [_fragment_spec(by_s, n, counter, name=str(n)) for n in roots]
    from .loader import _DEFAULT_PREFIXES

    pfx = dict(_DEFAULT_PREFIXES)
    pfx.update(prefixes)
    return KB(fragments=frags, prefixes=pfx)
