"""DOM tree + parser (stdlib html.parser) for the extraction core.

Semantics mirrored from Nokogiri as used by the reference:
- ``Node#text``: concatenation of all descendant text
- ``Node#search``: descendants matching a CSS selector or XPath
  (Nokogiri dispatches both through ``search``; we sniff the syntax)
- ``Node#path``: /html/body/div[2]-style location (fragment.rb:152)
- ``NodeSet`` is a plain Python list of Nodes (section.rb builds one)
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

TEXT = "#text"
DOCUMENT = "document"  # Nokogiri's Document#name is "document"


class _TagIndex:
    """Per-document search index: every element node gets a preorder
    position (``_pre``) and subtree-end position (``_end``), and the
    index maps tag name → elements in document order. "n is a strict
    descendant of s" ⇔ ``s._pre < n._pre <= s._end``, so a scoped
    tag search is one list scan instead of a tree walk. Built once
    per parsed page (``parse_html``); any later tree mutation flips
    ``valid`` and searches fall back to walking (WikiText rewrites
    run on un-indexed ``parse_fragment`` trees anyway)."""

    __slots__ = ("tags", "elements", "valid")

    def __init__(self):
        self.tags: dict[str, list] = {}
        self.elements: list = []  # all elements, document order
        self.valid = True


class Node:
    __slots__ = ("name", "attrs", "children", "parent", "data",
                 "_idx", "_pre", "_end")

    def __init__(self, name, attrs=None, data=""):
        self.name = name
        self.attrs = attrs if attrs is not None else {}
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.data = data  # text payload for #text nodes
        self._idx: _TagIndex | None = None

    # -- tree ops -------------------------------------------------------
    def append(self, child: "Node") -> None:
        if self._idx is not None:
            self._idx.valid = False
        child.parent = self
        self.children.append(child)

    def replace(self, new: "Node") -> None:
        """Replace self with ``new`` in the parent's child list
        (Nokogiri Node#replace, used by WikiText rewrites)."""
        if self.parent is None:
            return
        tree_idx = self._idx or self.parent._idx
        if tree_idx is not None:
            tree_idx.valid = False
        sibs = self.parent.children
        idx = sibs.index(self)
        new.parent = self.parent
        sibs[idx] = new
        self.parent = None

    # -- accessors ------------------------------------------------------
    def is_text(self) -> bool:
        return self.name == TEXT

    @property
    def text(self) -> str:
        """All descendant text, in document order (Nokogiri Node#text)."""
        if self.is_text():
            return self.data
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.is_text():
                out.append(n.data)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def __getitem__(self, attr: str) -> str | None:
        return self.attrs.get(attr)

    def get(self, attr: str, default=None):
        return self.attrs.get(attr, default)

    def descendants(self):
        """All element + text descendants, preorder (excluding self)."""
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            yield n
            c = n.children
            if c:
                stack.extend(reversed(c))

    def element_descendants(self):
        for n in self.descendants():
            if not n.is_text():
                yield n

    def ancestors(self):
        n = self.parent
        while n is not None:
            yield n
            n = n.parent

    @property
    def path(self) -> str:
        """Nokogiri-style path: /html/body/div[2]; '/' for the document
        node; [i] only when same-name siblings are ambiguous."""
        if self.name == DOCUMENT:
            return "/"
        parts: list[str] = []
        node: Node | None = self
        while node is not None and node.name != DOCUMENT:
            parent = node.parent
            label = "text()" if node.is_text() else node.name
            if parent is not None:
                same = [
                    c
                    for c in parent.children
                    if (c.is_text() and node.is_text())
                    or (not c.is_text() and c.name == node.name)
                ]
                if len(same) > 1:
                    label += f"[{same.index(node) + 1}]"
            parts.append(label)
            node = parent
        return "/" + "/".join(reversed(parts))

    def search(self, pattern: str) -> list["Node"]:
        """CSS or XPath search over descendants (Nokogiri's search)."""
        from .css import css_search
        from .xpath import is_xpath, xpath_search

        if is_xpath(pattern):
            return xpath_search(self, pattern)
        return css_search(self, pattern)

    def to_html(self) -> str:
        from .serialize import to_html

        return to_html(self)

    def __repr__(self):  # pragma: no cover
        if self.is_text():
            return f"#text({self.data!r})"
        return f"<{self.name} {self.attrs}>({len(self.children)} children)"


# -- NodeSet helpers (content may be a Node or a list of Nodes) ---------

def node_search(content, pattern: str) -> list[Node]:
    if isinstance(content, list):
        seen: set[int] = set()
        out: list[Node] = []
        for node in content:
            for m in node.search(pattern):
                if id(m) not in seen:
                    seen.add(id(m))
                    out.append(m)
        return out
    return content.search(pattern)


def node_text(content) -> str:
    if isinstance(content, list):
        return "".join(n.text for n in content)
    return content.text


def node_attr(content, attr: str):
    if isinstance(content, list):
        return content[0].attrs.get(attr) if content else None
    return content.attrs.get(attr)


def node_name(content) -> str:
    if isinstance(content, list):
        return content[0].name if content else ""
    return content.name


def build_index(root: Node) -> _TagIndex:
    """Assign preorder/subtree-end positions to every element under
    ``root`` and build the tag→nodes map. Call only on a tree that is
    done mutating (mutation invalidates the index)."""
    idx = _TagIndex()
    tags = idx.tags
    elements = idx.elements
    root._idx = idx
    root._pre = 0
    counter = 0
    stack = [(root, iter(root.children))]
    while stack:
        node, it = stack[-1]
        child = next(it, None)
        if child is None:
            node._end = counter
            stack.pop()
            continue
        if child.name != TEXT:
            counter += 1
            child._pre = counter
            child._idx = idx
            elements.append(child)
            lst = tags.get(child.name)
            if lst is None:
                tags[child.name] = [child]
            else:
                lst.append(child)
            stack.append((child, iter(child.children)))
    return idx


def index_of(scope: Node) -> _TagIndex | None:
    """The scope's live tag index, or None (un-indexed fragment tree,
    text node, or a tree mutated since indexing)."""
    idx = scope._idx
    return idx if idx is not None and idx.valid else None


# -- parser -------------------------------------------------------------


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(DOCUMENT)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # pop to the matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Node(TEXT, data=data))


def parse_fragment(html: str) -> Node:
    """Parse without html/body normalization (the WikiText format's
    Nokogiri::XML re-parse of a subtree, formats.rb:7)."""
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


def parse_html(html: str) -> Node:
    """Parse a full page, normalizing to document>html>body like
    Nokogiri::HTML (extractor.rb:20)."""
    root = parse_fragment(html)
    html_el = next((c for c in root.children if c.name == "html"), None)
    if html_el is None:
        html_el = Node("html")
        body = Node("body")
        for c in root.children:
            body.append(c)
        html_el.append(body)
        root.children = []
        root.append(html_el)
    elif not any(c.name == "body" for c in html_el.children):
        body = Node("body")
        head_children = [c for c in html_el.children if c.name == "head"]
        others = [c for c in html_el.children if c.name != "head"]
        for c in others:
            body.append(c)
        html_el.children = []
        for h in head_children:
            html_el.append(h)
        html_el.append(body)
    build_index(root)
    return root
