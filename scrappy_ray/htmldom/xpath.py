"""XPath subset for sc:XPathSelector rules.

Supported (documented subset — KBs must stay within it):
- ``//tag``, ``//*`` anywhere-descendant steps
- ``.//tag`` (same as //tag when searching from a scope node)
- ``/a/b/c`` absolute child paths (evaluated from the scope node)
- predicates: ``[@attr='v']``, ``[@attr="v"]``, ``[@attr]``, ``[n]``
  (1-based position among the nodes selected at that step per parent)

Reference XPath usage: learned XPaths from the trainer
(/root/reference/lib/scrappy/learning/trainer.rb:139-164) are of the
shape /html/body/div[2]/span — covered here.
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
            body = pm.group(1).strip()
            am = re.fullmatch(r"@([\w-]+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")", body)
            if am:
                preds.append(("attr_eq", am.group(1), am.group(2) if am.group(2) is not None else am.group(3)))
                continue
            am = re.fullmatch(r"@([\w-]+)", body)
            if am:
                preds.append(("attr", am.group(1), None))
                continue
            if body.isdigit():
                preds.append(("pos", int(body), None))
                continue
            raise ValueError(f"unsupported XPath predicate: {body!r}")
        steps.append((axis, name, preds))
    if pos != len(p) or not steps:
        raise ValueError(f"unsupported XPath: {pattern!r}")
    return steps


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
    steps = _parse(pattern)
    current = [scope]
    for axis, name, preds in steps:
        nxt = []
        seen = set()
        for node in current:
            if axis == "child":
                cands = [c for c in node.children if _name_matches(c, name)]
            else:
                cands = [d for d in node.descendants() if _name_matches(d, name)]
            cands = _apply_preds(cands, preds)
            for c in cands:
                if id(c) not in seen:
                    seen.add(id(c))
                    nxt.append(c)
        current = nxt
    return current
