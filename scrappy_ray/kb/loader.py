"""YAML/JSON/dict KB loader (FIXTURES.md §3 schema).

The reference loads RDF (yarf) KB files into a graph and proxies nodes
into Sc::Fragment objects (/root/reference/bin/scrappy:254-267,
fragment.rb:2-4). We load a YAML document of the same information
content::

    prefixes: {sc: "...", dc: "..."}
    fragments:
      - selector: {type: Uri, value: "http://site0.test/"}
        identifier: {type: BaseUri}
        subfragments:
          - type: sioc:Post
            relation: dc:title
            selector: {type: Css, value: ".noticia h2"}

Scalar-or-list is accepted for value/attribute/keyword/relation/type/
superclass/sameas and for selector/identifier/subfragments.
"""

from __future__ import annotations

import json
from pathlib import Path

import yaml

from .model import KB, FragmentSpec, SelectorSpec

_DEFAULT_PREFIXES = {
    "sc": "http://lab.gsi.dit.upm.es/scraping.rdf#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "dc": "http://purl.org/dc/elements/1.1/",
    "sioc": "http://rdfs.org/sioc/ns#",
}


def _as_list(v):
    if v is None:
        return []
    if isinstance(v, list):
        return [x for x in v]
    return [v]


def _as_bool(v) -> bool:
    # the ontology stores booleans as the string "true" (selector.rb:24)
    return v is True or v == "true"


def _sel_from_dict(d: dict, counter: list[int]) -> SelectorSpec:
    sid = counter[0]
    counter[0] += 1
    s = SelectorSpec(
        type=str(d.get("type", "Root")).removeprefix("sc:").removesuffix("Selector"),
        values=[str(v) for v in _as_list(d.get("value"))],
        attribute=[str(v) for v in _as_list(d.get("attribute"))],
        indexes=[int(v) for v in _as_list(d.get("index"))],
        keyword=[str(v) for v in _as_list(d.get("keyword"))],
        format=(str(d["format"]).removeprefix("sc:").lower() if d.get("format") else None),
        boolean=_as_bool(d.get("boolean")),
        normalize_min=float(d["normalize_min"]) if d.get("normalize_min") is not None else None,
        normalize_max=float(d["normalize_max"]) if d.get("normalize_max") is not None else None,
        normalize_in_range=_as_bool(d.get("normalize_in_range")),
        nonempty=_as_bool(d.get("nonempty")),
        prefix=str(d.get("prefix", "")),
        suffix=str(d.get("suffix", "")),
        sequence=_as_bool(d.get("sequence")),
        downcase=_as_bool(d.get("downcase")),
        follow=_as_bool(d.get("follow")),
        tag=[str(v) for v in _as_list(d.get("tag"))],
        font_family=d.get("font_family"),
        sid=sid,
    )
    for k in (
        "min_relative_x max_relative_x min_relative_y max_relative_y "
        "min_x max_x min_y max_y min_width max_width min_height max_height "
        "min_font_size max_font_size min_font_weight max_font_weight"
    ).split():
        if d.get(k) is not None:
            setattr(s, k, int(d[k]))
    s.nested = [_sel_from_dict(n, counter) for n in _as_list(d.get("selector"))]
    return s


def _frag_from_dict(d: dict, counter: list[int], name: str = "") -> FragmentSpec:
    return FragmentSpec(
        selectors=[_sel_from_dict(s, counter) for s in _as_list(d.get("selector"))],
        identifiers=[_sel_from_dict(s, counter) for s in _as_list(d.get("identifier"))],
        types=[str(t) for t in _as_list(d.get("type"))],
        relations=[str(r) for r in _as_list(d.get("relation"))],
        superclasses=[str(s) for s in _as_list(d.get("superclass"))],
        sameas=[str(s) for s in _as_list(d.get("sameas"))],
        min_cardinality=int(d["min_cardinality"]) if d.get("min_cardinality") is not None else None,
        max_cardinality=int(d["max_cardinality"]) if d.get("max_cardinality") is not None else None,
        subfragments=[_frag_from_dict(sf, counter) for sf in _as_list(d.get("subfragments"))],
        name=name or str(d.get("name", "")),
    )


def kb_from_dict(data: dict) -> KB:
    counter = [0]
    prefixes = dict(_DEFAULT_PREFIXES)
    prefixes.update(data.get("prefixes") or {})
    frags = [
        _frag_from_dict(f, counter, name=f.get("name", f"fragment{i}"))
        for i, f in enumerate(_as_list(data.get("fragments")))
    ]
    return KB(fragments=frags, prefixes=prefixes)


def load_kb(text: str) -> KB:
    return kb_from_dict(yaml.safe_load(text))


def load_kb_file(path: str | Path) -> KB:
    path = Path(path)
    if path.suffix == ".json":
        return kb_from_dict(json.loads(path.read_text()))
    if path.suffix == ".yarf":
        from .yarf import yarf_to_kb

        return yarf_to_kb(path.read_text())
    return load_kb(path.read_text())
