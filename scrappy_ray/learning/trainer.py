"""Trainer: generate extraction fragments from annotated samples.

Replicates the shape of /root/reference/lib/scrappy/learning/
trainer.rb: extract a sample WITH provenance using a base KB (e.g. the
visual-patterns KB), take the root typed nodes, and invert each node's
``sc:source → sc:selector → sc:path`` provenance into a new
FragmentSpec — an XPath selector generalized with class/id conditions
(trainer.rb:139-164 ``path_for``), literal children becoming
subfragments with relation + min/max cardinality 1
(trainer.rb:76-81), wrapped under a ``sc:UriSelector`` superfragment
scoped to the sample URI (trainer.rb:27-37).

Emits the reference's exact learned-condition forms
(trainer.rb:139-164 ``path_for``): one
``contains(concat(' ',normalize-space(@class),' '),concat(' ','c',' '))``
per class TOKEN (so multi-class attributes match), ``not(@class)`` /
``not(@id)`` when absent, ``contains(@id,'x')`` when present, all
joined with `` and `` in one bracket, with a positional suffix when
several siblings match. ``./.`` (self-scoped) selectors become
RootSelector.
"""

from __future__ import annotations

from ..extractor.core import extract
from ..htmldom import parse_html
from ..htmldom.xpath import xpath_search
from ..kb.model import KB, FragmentSpec, SelectorSpec
from ..support import decode_html


def _index(triples):
    """subject → predicate → [objects] with literal flags."""
    by_s: dict = {}
    objects = set()
    for s, p, o, lit in triples:
        by_s.setdefault(s, {}).setdefault(p, []).append((o, lit))
        if not lit:
            objects.add(o)
    return by_s, objects


def _first(by_s, s, p):
    vals = by_s.get(s, {}).get(p)
    return vals[0][0] if vals else None


def _node_path(by_s, node) -> str | None:
    src = _first(by_s, node, "sc:source")
    if src is None:
        return None
    sel = _first(by_s, src, "sc:selector")
    return _first(by_s, sel, "sc:path") if sel else None


def _generalized_path(path: str, content, parent_path: str | None) -> str:
    """trainer.rb:139-164 path_for: per-segment tag + the reference's
    exact condition forms (class-token contains / not(@class) /
    contains(@id) / not(@id), `` and ``-joined) + positional suffix
    when ambiguous among matched siblings."""
    if path == parent_path:
        return "./."
    if path in ("", "/", "/html", "/html/body"):
        return path or "/"
    nodes = content.search(path)
    if not nodes:
        return path  # fall back to the literal path
    node = nodes[0]
    conds = []
    if node.attrs.get("class"):
        conds += [
            f"contains(concat(' ',normalize-space(@class),' '),concat(' ','{c.strip()}',' '))"
            for c in node.attrs["class"].split()
        ]
    else:
        conds.append("not(@class)")
    if node.attrs.get("id"):
        conds.append(f"contains(@id,'{node.attrs['id'].strip()}')")
    else:
        conds.append("not(@id)")
    seg = f"/{node.name}[{' and '.join(conds)}]"
    # positional disambiguation: run the learned segment against the
    # parent with our own engine, exactly like path_for's
    # node.parent.search("./"+selector)
    parent = node.parent
    matches = xpath_search(parent, "." + seg) if parent is not None else [node]
    suffix = f"[{matches.index(node) + 1}]" if len(matches) > 1 else ""
    prev = "/".join(path.split("/")[:-1])
    return _generalized_path(prev, content, parent_path) + seg + suffix


def _selector_for(by_s, node, content, parent_path) -> SelectorSpec:
    src = _first(by_s, node, "sc:source")
    sel = _first(by_s, src, "sc:selector") if src else None
    path = _first(by_s, sel, "sc:path") if sel else None
    attr = _first(by_s, sel, "sc:attribute") if sel else None
    gen = _generalized_path(path, content, parent_path) if path else "./."
    if gen == "./.":
        spec = SelectorSpec(type="Root")
    else:
        spec = SelectorSpec(type="XPath", values=["." + gen if gen.startswith("/") else gen])
    if attr:
        spec.attribute = [attr]
    return spec


def _fragment_for(by_s, node, content, parent_path=None) -> FragmentSpec:
    frag = FragmentSpec()
    node_path = _node_path(by_s, node)
    frag.selectors = [_selector_for(by_s, node, content, parent_path)]
    for p, objs in by_s.get(node, {}).items():
        if p in ("sc:source", "sc:uri"):
            continue
        if p == "rdf:type":
            frag.types = [o for o, lit in objs if o != "rdf:Literal"] or ["rdf:Literal"]
            continue
        # relations to literal/sub nodes
        done = set()
        for o, lit in objs:
            if lit or o not in by_s:
                continue
            sub_path = _node_path(by_s, o)
            if sub_path in done:
                continue
            done.add(sub_path)
            sub = _fragment_for(by_s, o, content, node_path)
            sub.relations = [p]
            sub.min_cardinality = 1
            sub.max_cardinality = 1
            frag.subfragments.append(sub)
    if not frag.types:
        frag.types = []
    return frag


def train(base_kb: KB, url: str, html: bytes | str) -> list[FragmentSpec]:
    """Train fragments from one sample. Returns the root fragment(s)
    wrapped under a UriSelector superfragment scoped to the sample url
    (trainer.rb:27-48)."""
    res = extract(base_kb, url, html, referenceable=True)
    by_s, objects = _index(res.triples)
    content = parse_html(decode_html(html))

    # root nodes: typed subjects that are not objects of other triples
    roots = [s for s in by_s if "rdf:type" in by_s[s] and s not in objects]
    if not roots:
        return []

    counter = [0]

    def renumber(spec: SelectorSpec):
        spec.sid = counter[0]
        counter[0] += 1
        for n in spec.nested:
            renumber(n)

    frags = []
    for root in roots:
        frag = _fragment_for(by_s, root, content)
        frags.append(frag)

    superfragment = FragmentSpec(
        selectors=[SelectorSpec(type="Uri", values=[url])],
        identifiers=[SelectorSpec(type="BaseUri")],
        types=["sc:Index"],
        subfragments=frags,
        name=f"trained:{url}",
    )
    for f in [superfragment]:
        stack = [f]
        while stack:
            fr = stack.pop()
            for s in fr.selectors + fr.identifiers:
                renumber(s)
            stack.extend(fr.subfragments)
    return [superfragment]


def train_from_samples(base_kb: KB, samples: list[dict]) -> KB:
    """samples: [{url, html}] → a new KB of trained fragments."""
    frags = []
    for s in samples:
        frags.extend(train(base_kb, s["url"], s["html"]))
    return KB(fragments=frags, prefixes=dict(base_kb.prefixes))
