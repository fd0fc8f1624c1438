"""XPath subset for sc:XPathSelector rules.

Supported (documented subset — KBs must stay within it):
- ``//tag``, ``//*`` anywhere-descendant steps
- ``.//tag`` (same as //tag when searching from a scope node)
- ``/a/b/c`` absolute child paths (evaluated from the scope node)
- predicates: ``[@attr='v']``, ``[@attr="v"]``, ``[@attr]``, ``[n]``
  (1-based position among the nodes selected at that step per parent),
  plus the reference trainer's learned-condition forms
  (/root/reference/lib/scrappy/learning/trainer.rb:139-164):
  ``[not(@attr)]``, ``[contains(@id,'x')]``,
  ``[contains(concat(' ',normalize-space(@class),' '),concat(' ','c',' '))]``
  (class-TOKEN membership — matches multi-class attributes), and
  several conditions joined with `` and `` inside one bracket.
"""

from __future__ import annotations

import re


def is_xpath(pattern: str) -> bool:
    p = pattern.strip()
    return p.startswith("/") or p.startswith("./") or p.startswith(".//")


_STEP_RE = re.compile(r"(/{1,2})([\w*-]+|\*)((?:\[[^\]]+\])*)")
_PRED_RE = re.compile(r"\[([^\]]+)\]")


from functools import lru_cache


@lru_cache(maxsize=1024)
def _parse(pattern: str):
    p = pattern.strip()
    if p.startswith("."):
        p = p[1:]
    steps = []
    pos = 0
    for m in _STEP_RE.finditer(p):
        if m.start() != pos:
            raise ValueError(f"unsupported XPath: {pattern!r}")
        pos = m.end()
        axis = "descendant" if m.group(1) == "//" else "child"
        name = m.group(2)
        preds = []
        for pm in _PRED_RE.finditer(m.group(3) or ""):
            for body in _split_and(pm.group(1).strip()):
                preds.append(_parse_condition(body, pattern))
        steps.append((axis, name, preds))
    if pos != len(p) or not steps:
        raise ValueError(f"unsupported XPath: {pattern!r}")
    return steps


def _split_and(body: str) -> list[str]:
    """Split a predicate body on top-level `` and `` (outside quotes)."""
    parts, buf, q = [], [], None
    i = 0
    while i < len(body):
        ch = body[i]
        if q:
            if ch == q:
                q = None
            buf.append(ch)
        elif ch in "'\"":
            q = ch
            buf.append(ch)
        elif ch == " " and body[i : i + 5] == " and ":
            parts.append("".join(buf).strip())
            buf = []
            i += 4
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


# trainer.rb:146 class-token condition, both the concat() form the
# reference emits and the simpler literal form
_TOKEN_RE = re.compile(
    r"contains\(concat\(' ',normalize-space\(@([\w-]+)\),' '\),"
    r"(?:concat\(' ','([^']*)',' '\)|' ([^']*) ')\)"
)


def _parse_condition(body: str, pattern: str):
    am = re.fullmatch(r"@([\w-]+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")", body)
    if am:
        return ("attr_eq", am.group(1), am.group(2) if am.group(2) is not None else am.group(3))
    am = re.fullmatch(r"@([\w-]+)", body)
    if am:
        return ("attr", am.group(1), None)
    if body.isdigit():
        return ("pos", int(body), None)
    am = re.fullmatch(r"not\(@([\w-]+)\)", body)
    if am:
        return ("not_attr", am.group(1), None)
    am = _TOKEN_RE.fullmatch(body)
    if am:
        return ("attr_token", am.group(1), am.group(2) if am.group(2) is not None else am.group(3))
    am = re.fullmatch(r"contains\(@([\w-]+)\s*,\s*'([^']*)'\)", body)
    if am:
        return ("attr_contains", am.group(1), am.group(2))
    raise ValueError(f"unsupported XPath predicate: {body!r} in {pattern!r}")


def _name_matches(node, name: str) -> bool:
    if node.is_text():
        return name == "text()"
    return name == "*" or node.name == name


def _apply_preds(nodes, preds):
    for kind, a, b in preds:
        if kind == "attr_eq":
            nodes = [n for n in nodes if n.attrs.get(a) == b]
        elif kind == "attr":
            nodes = [n for n in nodes if a in n.attrs]
        elif kind == "not_attr":
            nodes = [n for n in nodes if a not in n.attrs]
        elif kind == "attr_token":
            nodes = [n for n in nodes if b in (n.attrs.get(a) or "").split()]
        elif kind == "attr_contains":
            nodes = [n for n in nodes if b in (n.attrs.get(a) or "")]
        else:  # positional, 1-based within current candidate list per parent
            by_parent: dict[int, int] = {}
            kept = []
            for n in nodes:
                pid = id(n.parent)
                by_parent[pid] = by_parent.get(pid, 0) + 1
                if by_parent[pid] == a:
                    kept.append(n)
            nodes = kept
    return nodes


def xpath_search(scope, pattern: str) -> list:
    from .dom import index_of

    steps = _parse(pattern)
    current = [scope]
    for axis, name, preds in steps:
        nxt = []
        seen = set()
        for node in current:
            if axis == "child":
                cands = [c for c in node.children if _name_matches(c, name)]
            elif name not in ("*", "text()") and (idx := index_of(node)) is not None:
                # tag-named descendant step over an indexed document:
                # one tag-list interval scan instead of a tree walk
                tagged = idx.tags.get(name)
                if tagged:
                    lo, hi = node._pre, node._end
                    cands = (list(tagged) if lo == 0 and hi >= tagged[-1]._pre
                             else [d for d in tagged if lo < d._pre <= hi])
                else:
                    cands = []
            else:
                cands = [d for d in node.descendants() if _name_matches(d, name)]
            cands = _apply_preds(cands, preds)
            for c in cands:
                if id(c) not in seen:
                    seen.add(id(c))
                    nxt.append(c)
        current = nxt
    return current
