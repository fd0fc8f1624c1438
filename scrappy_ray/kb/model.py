"""Compiled extraction-rule model.

The reference expresses rules as RDF data — sc:Fragment nodes with
sc:selector / sc:identifier / sc:subfragment / sc:type / sc:relation /
sc:superclass / sc:sameas / sc:min_cardinality / sc:max_cardinality
properties, materialized as NodeProxy objects
(/root/reference/lib/scrappy/extractor/fragment.rb:2-4,
/root/reference/extra/scraping.yarf). Here rules are plain frozen-ish
dataclasses compiled once on the driver and shipped to extraction
actors via constructor args (broadcast once per worker, not per batch).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SelectorSpec:
    """One sc:*Selector node. ``type`` is the short class name:
    Uri | UriPattern | BaseUri | Css | XPath | Slice | Section |
    NewUri | Root | Visual. Property names mirror the sc: ontology."""

    type: str = "Root"
    values: list[str] = field(default_factory=list)  # rdf:value
    attribute: list[str] = field(default_factory=list)  # sc:attribute
    indexes: list[int] = field(default_factory=list)  # sc:index (multi for Slice, slice.rb:7; first for XPath, xpath.rb:5)
    keyword: list[str] = field(default_factory=list)  # sc:keyword
    format: str | None = None  # sc:format → "wikitext"|"html"|None(plain)
    boolean: bool = False  # sc:boolean (selector.rb:24-40)
    normalize_min: float | None = None
    normalize_max: float | None = None
    normalize_in_range: bool = False
    nonempty: bool = False  # sc:nonempty (selector.rb:53-55)
    # NewUriSelector (new_uri.rb)
    prefix: str = ""
    suffix: str = ""
    sequence: bool = False
    downcase: bool = False
    follow: bool = False
    # VisualSelector (visual.rb) — 17 bbox/font constraints + tag list
    tag: list[str] = field(default_factory=list)
    min_relative_x: int | None = None
    max_relative_x: int | None = None
    min_relative_y: int | None = None
    max_relative_y: int | None = None
    min_x: int | None = None
    max_x: int | None = None
    min_y: int | None = None
    max_y: int | None = None
    min_width: int | None = None
    max_width: int | None = None
    min_height: int | None = None
    max_height: int | None = None
    min_font_size: int | None = None
    max_font_size: int | None = None
    min_font_weight: int | None = None
    max_font_weight: int | None = None
    font_family: str | None = None
    # nested selectors (selector.rb:69-75 composition)
    nested: list["SelectorSpec"] = field(default_factory=list)
    # stable id for per-document sequence-counter state (new_uri.rb:11)
    sid: int = -1


@dataclass
class FragmentSpec:
    """One sc:Fragment node (fragment.rb)."""

    selectors: list[SelectorSpec] = field(default_factory=list)
    identifiers: list[SelectorSpec] = field(default_factory=list)
    types: list[str] = field(default_factory=list)  # sc:type (CURIEs)
    relations: list[str] = field(default_factory=list)  # sc:relation
    superclasses: list[str] = field(default_factory=list)
    sameas: list[str] = field(default_factory=list)
    min_cardinality: int | None = None
    max_cardinality: int | None = None
    subfragments: list["FragmentSpec"] = field(default_factory=list)
    name: str = ""


@dataclass
class KB:
    """A compiled knowledge base: the root fragments (= fragments that
    are not any fragment's subfragment, extractor.rb:35) plus the
    prefix map for CURIE expansion."""

    fragments: list[FragmentSpec] = field(default_factory=list)
    prefixes: dict[str, str] = field(default_factory=dict)

    def root_selectors(self):
        """(selector, fragment) pairs for KB routing (extractor.rb:37-44)."""
        for frag in self.fragments:
            for sel in frag.selectors:
                yield sel, frag
