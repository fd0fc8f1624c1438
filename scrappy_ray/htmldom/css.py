"""CSS selector subset for the extraction KB.

Supports what the reference's KBs use (e.g.
/root/reference/extractors/elmundo.yarf: ".noticia h2, .noticia h3",
"a", ".firma em") plus the WikiText format's needs ("li li li",
"pre, code", formats.rb:5-26):

- comma-separated groups
- compound simple selectors: tag, *, .class, #id, [attr], [attr=val]
  (combinable, e.g. div.noticia[data-x=1])
- combinators: descendant (whitespace) and child (>)

Results are in document order (preorder DFS), deduplicated.
"""

from __future__ import annotations

import re
from bisect import bisect_right

from .dom import TEXT as _TEXT

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)?
    (?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)
    """,
    re.VERBOSE,
)
_PART_RE = re.compile(r"([.#])([\w-]+)|\[([^\]=\s]+)(?:=(?:\"([^\"]*)\"|'([^']*)'|([^\]]*)))?\]")


class Simple:
    __slots__ = ("tag", "classes", "ids", "attrs")

    def __init__(self, token: str):
        m = _SIMPLE_RE.match(token)
        if not m or (m.end() != len(token)):
            raise ValueError(f"unsupported CSS simple selector: {token!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.classes: list[str] = []
        self.ids: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        for pm in _PART_RE.finditer(m.group("rest") or ""):
            if pm.group(1) == ".":
                self.classes.append(pm.group(2))
            elif pm.group(1) == "#":
                self.ids.append(pm.group(2))
            else:
                val = pm.group(4) or pm.group(5) or pm.group(6)
                self.attrs.append((pm.group(3), val))

    def matches(self, node) -> bool:
        if node.name == _TEXT:
            return False
        if self.tag is not None and node.name != self.tag:
            return False
        nattrs = node.attrs
        if self.classes:
            cls = (nattrs.get("class") or "").split()
            for c in self.classes:
                if c not in cls:
                    return False
        if self.ids:
            nid = nattrs.get("id")
            for i in self.ids:
                if nid != i:
                    return False
        if self.attrs:
            for name, val in self.attrs:
                got = nattrs.get(name)
                if got is None or (val is not None and got != val):
                    return False
        return True


class Chain:
    """A compound chain like ``.noticia > h2`` / ``li li``."""

    __slots__ = ("steps",)

    def __init__(self, text: str):
        # normalize '>' spacing then tokenize
        text = re.sub(r"\s*>\s*", " > ", text.strip())
        tokens = text.split()
        self.steps: list[tuple[str, Simple]] = []  # (combinator, simple)
        comb = " "
        for tok in tokens:
            if tok == ">":
                comb = ">"
                continue
            self.steps.append((comb, Simple(tok)))
            comb = " "
        if not self.steps:
            raise ValueError(f"empty CSS selector in {text!r}")

    def matches(self, node, scope) -> bool:
        """Does ``node`` match, with all ancestor requirements satisfied
        strictly inside ``scope`` (exclusive)?"""
        if not self.steps[-1][1].matches(node):
            return False
        return self._match_up(node, len(self.steps) - 2, scope)

    def _match_up(self, node, step_idx: int, scope) -> bool:
        if step_idx < 0:
            return True
        comb_here = self.steps[step_idx + 1][0]
        simple = self.steps[step_idx][1]
        if comb_here == ">":
            p = node.parent
            if p is None or p is scope or not simple.matches(p):
                return False
            return self._match_up(p, step_idx - 1, scope)
        p = node.parent
        while p is not None and p is not scope:
            if simple.matches(p) and self._match_up(p, step_idx - 1, scope):
                return True
            p = p.parent
        return False


from functools import lru_cache


@lru_cache(maxsize=1024)
def compile_css(selector: str) -> tuple:
    return tuple(Chain(part) for part in selector.split(",") if part.strip())


def _is_bare_tag(c: Chain) -> bool:
    s = c.steps[0][1]
    return (len(c.steps) == 1 and s.tag is not None
            and not s.classes and not s.ids and not s.attrs)


def _pre_of(n) -> int:
    return n._pre


def _interval(cands: list, scope) -> list:
    """Nodes of sorted-by-_pre ``cands`` strictly inside ``scope``:
    two bisects + one slice (O(log n + hits)), no list scan."""
    lo, hi = scope._pre, scope._end
    if lo == 0 and hi >= cands[-1]._pre:  # scope is the whole document
        return list(cands)
    i = bisect_right(cands, lo, key=_pre_of)
    j = bisect_right(cands, hi, lo=i, key=_pre_of)
    return cands[i:j]


def _idx_tag_nodes(scope, idx, tag: str) -> list:
    """Strict descendants of ``scope`` named ``tag``, from the
    document index."""
    cands = idx.tags.get(tag)
    if not cands:
        return []
    return _interval(cands, scope)


def _idx_cands(scope, idx, last) -> list:
    """Candidate nodes for a chain's last simple step: the tag list
    when it names a tag, else every element in scope (class-only /
    ``*`` last steps)."""
    if last.tag is not None:
        return _idx_tag_nodes(scope, idx, last.tag)
    cands = idx.elements
    if not cands:
        return []
    return _interval(cands, scope)


def _is_bare_star(c: Chain) -> bool:
    s = c.steps[0][1]
    return (len(c.steps) == 1 and s.tag is None
            and not s.classes and not s.ids and not s.attrs)


def css_search(scope, selector: str) -> list:
    """Descendants of ``scope`` (exclusive) matching any group of the
    selector, in document order. Compilation is cached (hot path: the
    same KB selectors run on every document)."""
    from .dom import index_of

    chains = compile_css(selector)
    idx = index_of(scope)
    # index path: candidates for each chain come from the per-document
    # index — the tag list when the last step names one, the all-elements
    # list otherwise (class-only / ``*``) — interval-filtered to the
    # scope; only the full chain match is verified per candidate.
    if idx is not None:
        if len(chains) == 1:
            c = chains[0]
            cands = _idx_cands(scope, idx, c.steps[-1][1])
            if _is_bare_tag(c) or _is_bare_star(c):
                return cands
            return [n for n in cands if c.matches(n, scope)]
        out = []
        for c in chains:
            cands = _idx_cands(scope, idx, c.steps[-1][1])
            if _is_bare_tag(c) or _is_bare_star(c):
                out.extend(cands)
            else:
                out.extend(n for n in cands if c.matches(n, scope))
        if len(chains) > 1:  # restore document order, dedupe
            seen: set[int] = set()
            uniq = []
            for n in sorted(out, key=lambda n: n._pre):
                if id(n) not in seen:
                    seen.add(id(n))
                    uniq.append(n)
            out = uniq
        return out
    # fast path: single bare-tag chain (the overwhelmingly common case:
    # 'a', 'h1', 'li', ...) — plain name scan, no matcher dispatch
    if len(chains) == 1 and len(chains[0].steps) == 1:
        simple = chains[0].steps[0][1]
        if simple.tag is not None and not simple.classes and not simple.ids and not simple.attrs:
            tag = simple.tag
            return [n for n in scope.descendants() if n.name == tag]
        return [n for n in scope.descendants() if simple.matches(n)]
    # fast path: every chain is a single bare tag ('h1, h2, h3, ...')
    if all(_is_bare_tag(c) for c in chains):
        tags = {c.steps[0][1].tag for c in chains}
        return [n for n in scope.descendants() if n.name in tags]
    out = []
    if len(chains) == 1:
        c = chains[0]
        last = c.steps[-1][1]
        # pre-filter by the last step's tag before the full ancestor match
        if last.tag is not None:
            tag = last.tag
            for node in scope.descendants():
                if node.name == tag and c.matches(node, scope):
                    out.append(node)
            return out
        for node in scope.descendants():
            if not node.is_text() and c.matches(node, scope):
                out.append(node)
        return out
    for node in scope.descendants():
        if node.is_text():
            continue
        for c in chains:
            if c.matches(node, scope):
                out.append(node)
                break
    return out
