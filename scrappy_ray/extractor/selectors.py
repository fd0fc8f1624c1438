"""The selector algebra: per-record flat-maps over "doc" records.

A doc is ``{uri, content, value, attribute, nofollow}`` — the unit of
the reference's extraction dataflow
(/root/reference/lib/scrappy/extractor/extractor.rb:23). Each selector
implements ``filter(spec, doc, ctx) → [doc]``; ``select`` wraps it with
the shared post-processing pipeline of Sc::Selector#select
(/root/reference/lib/scrappy/extractor/selector.rb:20-76): boolean
mapping → min-max normalization → nonempty filter → nested-selector
flat-map composition, in that order.

These never cross Ray block boundaries — the whole algebra runs inside
the extraction UDF (one document at a time), which is why it is plain
Python, not Dataset ops.
"""

from __future__ import annotations

import re

from ..htmldom.dom import Node, node_attr, node_name, node_search
from ..kb.model import SelectorSpec
from ..support import clean, strip_query, underscore, wikify
from .formats import format_value


_TO_I_RE = re.compile(r"\s*([+-]?\d+)")
_TO_F_RE = re.compile(r"\s*([+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)")


def ruby_to_i(v) -> int:
    """Ruby String#to_i: leading integer or 0."""
    if v is None:
        return 0
    try:  # fast path: plain integer attribute values (the common case)
        return int(v)
    except (TypeError, ValueError):
        pass
    m = _TO_I_RE.match(str(v))
    return int(m.group(1)) if m else 0


def ruby_to_f(v) -> float:
    """Ruby String#to_f: leading float or 0.0."""
    m = _TO_F_RE.match(str(v or ""))
    return float(m.group(1)) if m else 0.0


def ruby_num_str(x: float) -> str:
    """Ruby Float#to_s-compatible rendering for normalized values."""
    if x != x or x in (float("inf"), float("-inf")):
        return {float("inf"): "Infinity", float("-inf"): "-Infinity"}.get(x, "NaN")
    r = repr(x)
    return r


def ruby_split(s: str, sep: str) -> list[str]:
    """Ruby String#split(str): drops trailing empty fields."""
    if s == "":
        return []
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _doc(uri, content, value, attribute=None, nofollow=False):
    return {
        "uri": uri,
        "content": content,
        "value": value,
        "attribute": attribute,
        "nofollow": nofollow,
    }


# ---------------------------------------------------------------------
# per-type filters (file ↔ /root/reference/lib/scrappy/extractor/selectors/)


def _filter_uri(spec, doc, ctx):
    # uri.rb:3-11 — match with query string stripped
    if strip_query(doc["uri"]) in spec.values:
        return [
            _doc(doc["uri"], doc["content"], format_value(doc["value"], spec.format, doc["uri"]))
        ]
    return []


def _filter_uri_pattern(spec, doc, ctx):
    # uri_pattern.rb:3-11 — glob: '.'→'\.', '*'→'.+', '?'→'\?', anchored
    for v in spec.values:
        pat = v.replace(".", r"\.").replace("*", ".+").replace("?", r"\?")
        if re.match(r"\A" + pat + r"\Z", doc["uri"]):
            return [
                _doc(doc["uri"], doc["content"], format_value(doc["value"], spec.format, doc["uri"]))
            ]
    return []


def _filter_base_uri(spec, doc, ctx):
    # base_uri.rb:3-6
    return [_doc(doc["uri"], doc["content"], doc["uri"])]


def _filter_root(spec, doc, ctx):
    # root.rb:3-10
    if spec.attribute:
        return [
            _doc(doc["uri"], doc["content"], node_attr(doc["content"], a), a)
            for a in spec.attribute
        ]
    return [_doc(doc["uri"], doc["content"], format_value(doc["value"], spec.format, doc["uri"]))]


def _filter_xpath(spec, doc, ctx):
    # xpath.rb:3-24 (CssSelector is the same class, css.rb:3-5)
    out = []
    for pattern in spec.values:
        nodes = node_search(doc["content"], pattern)
        if spec.indexes:
            i = spec.indexes[0]
            nodes = nodes[i : i + 1] if 0 <= i < len(nodes) else []
        if spec.keyword:
            nodes = [n for n in nodes if clean(n.text).lower() in spec.keyword]
        for n in nodes:
            if spec.attribute:
                for a in spec.attribute:
                    out.append(_doc(doc["uri"], n, clean(n.attrs.get(a) or ""), a))
            else:
                out.append(_doc(doc["uri"], n, format_value(n, spec.format, doc["uri"])))
    return out


def _filter_slice(spec, doc, ctx):
    # slice.rb:3-11
    out = []
    for sep in spec.values:
        slices = ruby_split(str(doc["value"] or ""), sep)
        for i in spec.indexes:
            try:
                v = slices[i]  # Ruby negative indexes work from the end too
            except IndexError:
                v = None
            v = ("" if v is None else str(v)).strip()
            if v != "":
                out.append(_doc(doc["uri"], doc["content"], v, doc["attribute"]))
    return out


def _filter_section(spec, doc, ctx):
    # section.rb:3-13
    out = []
    for pattern in spec.values:
        headings = [
            n
            for n in node_search(doc["content"], "h1, h2, h3, h4, h5, h6, h7, h8, h9, h10")
            if n.parent is not None
            and n.parent.name != "script"
            and n.text.lower().strip() == pattern
        ]
        for node in headings:
            sibs = node.parent.children
            idx = sibs.index(node)
            content = []
            for n in sibs[idx + 1 :]:
                nm = "text" if n.is_text() else n.name
                if nm == node.name or nm == "div":
                    break
                content.append(n)
            value = "\n\n".join(
                t
                for t in (format_value(n, spec.format, doc["uri"]) for n in content)
                if str(t).strip() != ""
            )
            out.append(_doc(doc["uri"], content, value))
    return out


def _filter_new_uri(spec, doc, ctx):
    # new_uri.rb:3-39
    from urllib.parse import urljoin

    if spec.attribute:
        contents = [(node_attr(doc["content"], a), a) for a in spec.attribute]
    else:
        contents = [(doc["value"], None)]

    prefix = spec.prefix
    if prefix not in ("http://", "https://"):
        if prefix.startswith("http:") or prefix.startswith("https:"):
            prefix = urljoin(doc["uri"], prefix)
        else:
            prefix = f"{doc['uri']}{prefix}"
    suffix = spec.suffix
    nofollow = not spec.follow

    out = []
    for content, attribute in contents:
        c = "" if content is None else str(content)
        if c.startswith("http:") or c.startswith("https:"):
            new_uri = f"{c}{suffix}"
        else:
            if spec.sequence:
                # per-document per-prefix counter; the reference resets
                # state per extraction by rebuilding the KB graph
                # (extractor.rb:17, new_uri.rb:11)
                key = (spec.sid, prefix)
                ctx.seq_counters[key] = ctx.seq_counters.get(key, 0) + 1
                variable = str(ctx.seq_counters[key])
            elif spec.downcase:
                variable = underscore(c)
            else:
                variable = wikify(c)
            new_uri = f"{prefix}{variable}{suffix}"
        out.append(_doc(new_uri, doc["content"], new_uri, attribute, nofollow))
    return out


_VISUAL_LIMITS = [
    # (spec attr, node vattr, is_min)
    ("min_x", "vx", True), ("max_x", "vx", False),
    ("min_y", "vy", True), ("max_y", "vy", False),
    ("min_width", "vw", True), ("max_width", "vw", False),
    ("min_height", "vh", True), ("max_height", "vh", False),
    ("min_font_size", "vsize", True), ("max_font_size", "vsize", False),
    ("min_font_weight", "vweight", True), ("max_font_weight", "vweight", False),
]


def _filter_visual(spec, doc, ctx):
    # visual.rb:9-71; per-document memo keyed by (selector, scope node)
    memo_key = (spec.sid, id(doc["content"]))
    if memo_key in ctx.visual_memo:
        return ctx.visual_memo[memo_key]

    content = doc["content"]
    scope = content[0] if isinstance(content, list) and content else content
    tags = [t for t in spec.tag if t != "text"]
    elements = node_search(content, tags[0] if tags else "*")
    if isinstance(scope, Node) and node_name(content) in spec.tag:
        elements = elements + [scope]

    base_x = ruby_to_i(scope.attrs.get("vx")) if isinstance(scope, Node) else 0
    base_y = ruby_to_i(scope.attrs.get("vy")) if isinstance(scope, Node) else 0

    selected = []
    for n in elements:
        if n.is_text():
            continue
        if not ((n.attrs.get("vfont") and n.name not in ("a", "img")) or "text" not in spec.tag):
            continue
        rx = ruby_to_i(n.attrs.get("vx")) - base_x
        ry = ruby_to_i(n.attrs.get("vy")) - base_y
        if spec.min_relative_x is not None and rx < spec.min_relative_x:
            continue
        if spec.max_relative_x is not None and rx > spec.max_relative_x:
            continue
        if spec.min_relative_y is not None and ry < spec.min_relative_y:
            continue
        if spec.max_relative_y is not None and ry > spec.max_relative_y:
            continue
        ok = True
        for attr, vattr, is_min in _VISUAL_LIMITS:
            lim = getattr(spec, attr)
            if lim is None:
                continue
            v = ruby_to_i(n.attrs.get(vattr))
            if (is_min and v < lim) or (not is_min and v > lim):
                ok = False
                break
        if not ok:
            continue
        if spec.font_family is not None and n.attrs.get("vfont") != spec.font_family:
            continue
        selected.append(n)

    out = []
    for n in selected:
        if spec.attribute:
            for a in spec.attribute:
                out.append(_doc(doc["uri"], n, clean(n.attrs.get(a) or ""), a))
        else:
            out.append(_doc(doc["uri"], n, format_value(n, spec.format, doc["uri"])))
    ctx.visual_memo[memo_key] = out
    return out


_FILTERS = {
    "Uri": _filter_uri,
    "UriPattern": _filter_uri_pattern,
    "BaseUri": _filter_base_uri,
    "Root": _filter_root,
    "Xpath": _filter_xpath,
    "XPath": _filter_xpath,
    "Css": _filter_xpath,
    "Slice": _filter_slice,
    "Section": _filter_section,
    "NewUri": _filter_new_uri,
    "Visual": _filter_visual,
}

_AFFIRMATIONS = frozenset(["yes", "true"])
_NEGATIONS = frozenset(["no", "none", "false", "-", "--"])


def raw_filter(spec: SelectorSpec, doc: dict, ctx) -> list[dict]:
    """Subclass filter only — used by KB routing (extractor.rb:45-46
    calls .filter directly, skipping the select pipeline)."""
    try:
        fn = _FILTERS[spec.type]
    except KeyError:
        raise ValueError(f"unknown selector type: {spec.type!r}") from None
    return fn(spec, doc, ctx)


def select(spec: SelectorSpec, doc: dict, ctx) -> list[dict]:
    """Sc::Selector#select (selector.rb:7-77)."""
    results = raw_filter(spec, doc, ctx)

    if spec.boolean:
        mapped = []
        for r in results:
            v = str(r["value"]).lower()
            if v in _NEGATIONS:
                mapped.append({**r, "value": "false"})
            elif v in _AFFIRMATIONS:
                mapped.append({**r, "value": "true"})
        results = mapped

    if spec.normalize_max is not None:
        mx = spec.normalize_max
        mn = spec.normalize_min or 0.0
        for r in results:
            r["value"] = ruby_num_str((ruby_to_f(r["value"]) - mn) / (mx - mn))
        if spec.normalize_in_range:
            results = [r for r in results if 0.0 <= ruby_to_f(r["value"]) <= 1.0]

    if spec.nonempty:
        results = [r for r in results if r["value"] != ""]

    if not spec.nested:
        return results

    out = []
    for r in results:
        for nested in spec.nested:
            out.extend(select(nested, r, ctx))
    return out
