"""Output serializers for the triples table.

The reference serializes graphs to yarf / rdfxml / ntriples / json /
ejson / png (/root/reference/lib/scrappy/agent/agent.rb:11-13 via
lightrdf). Here: N-Triples (canonical interchange), RDF/XML (the
interchange format RDF consumers request — with a round-trip parser),
JSON (s→p→[o]), ejson (RDF/JSON-shaped: expanded URIs + typed object
terms), YARF-style compact text, graphviz DOT (the graph source behind
the reference's png), and ``png`` itself — rasterized by
``sources/pngraph.py`` (pure stdlib + numpy; graphviz is absent here).
Parquet is the canonical sink (SURVEY.md §1.5).

``write_ntriples`` is a partitioned, task-parallel text sink (one .nt
shard per input block — resumable layout, never one giant file).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

DEFAULT_PREFIXES = {
    "sc": "http://lab.gsi.dit.upm.es/scraping.rdf#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "dc": "http://purl.org/dc/elements/1.1/",
    "sioc": "http://rdfs.org/sioc/ns#",
    "loc": "http://www.daml.org/experiment/ontology/location-ont#",
}


def expand(curie: str, prefixes: dict | None = None) -> str:
    prefixes = prefixes or DEFAULT_PREFIXES
    if curie.startswith("_:") or "://" in curie:
        return curie
    if ":" in curie:
        pfx, local = curie.split(":", 1)
        if pfx in prefixes:
            return prefixes[pfx] + local
    return curie


def _nt_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")


def _nt_term(term: str, is_literal: bool, prefixes) -> str:
    if is_literal:
        return f'"{_nt_escape(term)}"'
    full = expand(term, prefixes)
    if full.startswith("_:"):
        # bnode labels: keep deterministic, strip non-alnum for NT validity
        return "_:" + "".join(ch if ch.isalnum() else "_" for ch in full[2:])
    return f"<{full}>"


def triples_to_ntriples(rows, prefixes: dict | None = None) -> str:
    """rows: iterable of (s, p, o, lit) tuples or dicts."""
    out = []
    for r in rows:
        s, p, o, lit = (r["s"], r["p"], r["o"], r["lit"]) if isinstance(r, dict) else r
        out.append(
            f"{_nt_term(s, False, prefixes)} {_nt_term(p, False, prefixes)} {_nt_term(str(o), lit, prefixes)} ."
        )
    return "\n".join(out) + ("\n" if out else "")


def triples_to_json(rows) -> str:
    """lightrdf-style nested json: {s: {p: [o, ...]}}."""
    g: dict = {}
    for r in rows:
        s, p, o, lit = (r["s"], r["p"], r["o"], r["lit"]) if isinstance(r, dict) else r
        g.setdefault(s, {}).setdefault(p, []).append(str(o))
    return json.dumps(g, indent=1, sort_keys=True)


def triples_to_yarf(rows, header: bool = True, prefixes: dict | None = None) -> str:
    """Compact YARF-ish text: subject blocks with indented predicates
    (shape of /root/reference/extractors/elmundo.yarf)."""
    prefixes = prefixes or DEFAULT_PREFIXES
    g: dict = {}
    for r in rows:
        s, p, o, lit = (r["s"], r["p"], r["o"], r["lit"]) if isinstance(r, dict) else r
        g.setdefault(s, []).append((p, str(o), lit))
    out = []
    if header:
        for pfx in sorted(prefixes):
            out.append(f"{pfx}: {prefixes[pfx]}")
        out.append("")
    for s in sorted(g):
        out.append(f"{s}:")
        for p, o, lit in g[s]:
            out.append(f'  {p}: "{o}"' if lit else f"  {p}: {o}")
    return "\n".join(out) + "\n"


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _split_uri(uri: str) -> tuple[str, str]:
    """namespace/local split at the last '#' or '/' (QName rule)."""
    for sep in ("#", "/"):
        i = uri.rfind(sep)
        if i > 0 and i + 1 < len(uri):
            local = uri[i + 1 :]
            if local and (local[0].isalpha() or local[0] == "_"):
                return uri[: i + 1], local
    return "urn:local:", uri


def _norm_term(term: str, prefixes) -> tuple[str, str]:
    """→ (kind, value): kind ∈ uri|bnode; CURIEs expanded."""
    full = expand(term, prefixes)
    if full.startswith("_:"):
        return "bnode", "".join(ch if ch.isalnum() else "_" for ch in full[2:])
    return "uri", full


def triples_to_rdfxml(rows, prefixes: dict | None = None) -> str:
    """RDF/XML (W3C standard syntax): subject-grouped rdf:Description
    blocks, rdf:about / rdf:nodeID subjects, rdf:resource objects,
    literal text nodes. Matches the reference's :rdfxml / :rdf output
    role (agent.rb:12-13 — content type application/rdf+xml)."""
    from xml.sax.saxutils import escape, quoteattr

    prefixes = dict(prefixes or DEFAULT_PREFIXES)
    # collect per-subject, assigning namespace prefixes for predicates
    ns_of: dict[str, str] = {_RDF_NS: "rdf"}
    for pfx, ns in prefixes.items():
        ns_of.setdefault(ns, pfx)
    subjects: dict[tuple[str, str], list] = {}
    preds = []
    for r in rows:
        s, p, o, lit = (r["s"], r["p"], r["o"], r["lit"]) if isinstance(r, dict) else r
        skey = _norm_term(s, prefixes)
        p_full = expand(p, prefixes)
        ns, local = _split_uri(p_full)
        if ns not in ns_of:
            ns_of[ns] = f"ns{len(ns_of)}"
        preds.append((skey, ns_of[ns], local))
        subjects.setdefault(skey, []).append((ns_of[ns], local, str(o), bool(lit)))
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    decls = " ".join(f'xmlns:{pfx}={quoteattr(ns)}' for ns, pfx in sorted(ns_of.items(), key=lambda kv: kv[1]))
    out.append(f"<rdf:RDF {decls}>")
    for (kind, sval), po in subjects.items():
        attr = f"rdf:about={quoteattr(sval)}" if kind == "uri" else f"rdf:nodeID={quoteattr(sval)}"
        out.append(f"  <rdf:Description {attr}>")
        for pfx, local, o, lit in po:
            if lit:
                out.append(f"    <{pfx}:{local}>{escape(o)}</{pfx}:{local}>")
            else:
                okind, oval = _norm_term(o, prefixes)
                oattr = "rdf:resource" if okind == "uri" else "rdf:nodeID"
                out.append(f"    <{pfx}:{local} {oattr}={quoteattr(oval)}/>")
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out) + "\n"


def parse_rdfxml(text: str) -> list[tuple[str, str, str, bool]]:
    """Parse the RDF/XML subset emitted above back to (s, p, o, lit)
    rows with fully-expanded URIs (bnodes as ``_:label``) — the
    round-trip check for the rdfxml sink."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    out = []
    for desc in root:
        s = desc.attrib.get(f"{{{_RDF_NS}}}about")
        if s is None:
            s = "_:" + desc.attrib.get(f"{{{_RDF_NS}}}nodeID", "")
        for child in desc:
            # tag is {namespace}local
            p = child.tag[1:].replace("}", "", 1) if child.tag.startswith("{") else child.tag
            res = child.attrib.get(f"{{{_RDF_NS}}}resource")
            nid = child.attrib.get(f"{{{_RDF_NS}}}nodeID")
            if res is not None:
                out.append((s, p, res, False))
            elif nid is not None:
                out.append((s, p, "_:" + nid, False))
            else:
                out.append((s, p, child.text or "", True))
    return out


def triples_to_ejson(rows, prefixes: dict | None = None) -> str:
    """ejson: RDF/JSON-shaped expanded serialization —
    {subject: {predicate: [{"value":…, "type": "uri"|"literal"|"bnode"}]}}
    with all CURIEs expanded (the 'expanded json' role of the
    reference's lightrdf ejson format, bin/scrappy:199)."""
    g: dict = {}
    for r in rows:
        s, p, o, lit = (r["s"], r["p"], r["o"], r["lit"]) if isinstance(r, dict) else r
        skind, sval = _norm_term(s, prefixes)
        skey = ("_:" + sval) if skind == "bnode" else sval
        p_full = expand(p, prefixes)
        if lit:
            term = {"type": "literal", "value": str(o)}
        else:
            okind, oval = _norm_term(o, prefixes)
            term = {"type": "bnode", "value": "_:" + oval} if okind == "bnode" else {"type": "uri", "value": oval}
        g.setdefault(skey, {}).setdefault(p_full, []).append(term)
    return json.dumps(g, indent=1, sort_keys=True)


def triples_to_dot(rows, prefixes: dict | None = None) -> str:
    """Graphviz DOT source for the triples graph — the graph the
    reference renders to png (agent.rb:12 ContentTypes[:png] via
    lightrdf→graphviz). One node per term (literals boxed), one
    labeled edge per triple; deterministic node ids + ordering."""
    nodes: dict[str, tuple[str, bool]] = {}  # id -> (label, is_literal)
    edges = []

    def node_id(label: str, lit: bool) -> str:
        key = ("L:" if lit else "R:") + label
        if key not in nodes:
            nodes[key] = (f"n{len(nodes)}", lit)
        return nodes[key][0]

    for r in rows:
        s, p, o, lit = (r["s"], r["p"], r["o"], r["lit"]) if isinstance(r, dict) else r
        edges.append((node_id(s, False), node_id(str(o), lit), p))
    out = ["digraph G {", "  rankdir=LR;"]
    for key, (nid, lit) in nodes.items():
        label = _nt_escape(key[2:])
        shape = ' shape=box' if lit else ""
        out.append(f'  {nid} [label="{label}"{shape}];')
    for a, b, p in edges:
        out.append(f'  {a} -> {b} [label="{_nt_escape(p)}"];')
    out.append("}")
    return "\n".join(out) + "\n"


def triples_to_png(rows) -> bytes:
    """Raster of the same graph ``triples_to_dot`` describes (reference
    agent.rb:12 renders the DOT via graphviz; absent here, so
    sources/pngraph.py rasterizes it directly — pure stdlib + numpy).
    Returns PNG bytes; graphs beyond pngraph.MAX_TRIPLES are truncated
    (an interactive raster, not a corpus sink — use ntriples/parquet
    for data)."""
    from .pngraph import MAX_TRIPLES, render_graph_png

    nodes: dict[str, int] = {}
    labels: list[tuple[str, bool]] = []
    edges = []

    def node_idx(label: str, lit: bool) -> int:
        key = ("L:" if lit else "R:") + label
        if key not in nodes:
            nodes[key] = len(labels)
            labels.append((label, lit))
        return nodes[key]

    for r in list(rows)[:MAX_TRIPLES]:
        s, p, o, lit = (r["s"], r["p"], r["o"], r["lit"]) if isinstance(r, dict) else r
        edges.append((node_idx(s, False), node_idx(str(o), bool(lit)), p))
    return render_graph_png(labels, edges)


SERIALIZERS = {
    "ntriples": triples_to_ntriples,
    "json": lambda rows: triples_to_json(rows),
    "ejson": lambda rows: triples_to_ejson(rows),
    "yarf": lambda rows: triples_to_yarf(rows),
    "rdfxml": lambda rows: triples_to_rdfxml(rows),
    "rdf": lambda rows: triples_to_rdfxml(rows),
    "dot": lambda rows: triples_to_dot(rows),
    "png": triples_to_png,  # the one serializer returning bytes
}


def serialize(rows, fmt: str = "ntriples") -> str | bytes:
    try:
        return SERIALIZERS[fmt](rows)
    except KeyError:
        raise ValueError(f"unsupported format {fmt!r}; supported: {sorted(SERIALIZERS)}") from None


def write_ntriples(triples_ds, out_dir: str, prefixes: dict | None = None) -> int:
    """Partitioned N-Triples sink: each batch writes its own shard file
    (task-parallel; resumable layout)."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        rows = zip(
            batch.column("s").to_pylist(),
            batch.column("p").to_pylist(),
            batch.column("o").to_pylist(),
            batch.column("lit").to_pylist(),
        )
        name = f"part-{uuid.uuid4().hex[:12]}.nt"
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(triples_to_ntriples(rows, prefixes))
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    counts = triples_ds.map_batches(write_shard, batch_format="pyarrow").to_pandas()
    return int(counts["rows"].sum()) if len(counts) else 0


def _nt_unescape(s: str) -> str:
    out = []
    i = 0
    esc = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(esc.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def parse_ntriples(text: str) -> list[tuple[str, str, str, bool]]:
    """Parse the N-Triples subset emitted by :func:`triples_to_ntriples`
    back to (s, p, o, lit) rows with fully-expanded URIs (bnodes as
    ``_:label``) — the round-trip check for the ntriples sink and the
    line format :func:`read_ntriples` consumes."""
    import re

    line_re = re.compile(r"^(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+(.+?)\s*\.\s*$")

    def term(tok: str) -> tuple[str, bool]:
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1], False
        if tok.startswith("_:"):
            return tok, False
        if tok.startswith('"') and tok.endswith('"'):
            return _nt_unescape(tok[1:-1]), True
        raise ValueError(f"unparseable N-Triples term: {tok!r}")

    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = line_re.match(line)
        if not m:
            raise ValueError(f"unparseable N-Triples line: {line!r}")
        s, _ = term(m.group(1))
        p, _ = term(m.group(2))
        o, lit = term(m.group(3))
        out.append((s, p, o, lit))
    return out


def read_ntriples(nt_dir: str):
    """N-Triples SOURCE: the partitioned ``write_ntriples`` layout read
    back as a Dataset of (s, p, o, lit) rows — ray.data.read_text
    streams the shard lines (one read task per file at scale), and the
    parse is a per-batch map. Together with ``write_ntriples`` this
    makes the ntriples sink a full round-trippable format."""
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(nt_dir, "*.nt")))
    lines = ray.data.read_text(files)

    def parse_batch(batch: pa.Table) -> pa.Table:
        rows = parse_ntriples("\n".join(batch.column("text").to_pylist()))
        return pa.table(
            {
                "s": pa.array([r[0] for r in rows], pa.string()),
                "p": pa.array([r[1] for r in rows], pa.string()),
                "o": pa.array([r[2] for r in rows], pa.string()),
                "lit": pa.array([r[3] for r in rows], pa.bool_()),
            }
        )

    return lines.map_batches(parse_batch, batch_format="pyarrow")


def dump_per_url(extraction_rows, dump_dir: str, fmt: str = "ntriples") -> list[str]:
    """The Dumper sink (agent/dumper.rb:5-11): one serialized file per
    url, reference filename mangling (http:// stripped, '/'→'-',
    '.'→'_', '?'/'&'→'+')."""
    os.makedirs(dump_dir, exist_ok=True)
    written = []
    for row in extraction_rows:
        url, triples = row["url"], row["triples"]
        name = (
            url.replace("http://", "").replace("https://", "")
            .replace("/", "-").replace(".", "_").replace("?", "+").replace("&", "+")
        ) + f".{fmt}"
        path = os.path.join(dump_dir, name)
        out = serialize([(t["s"], t["p"], t["o"], t["lit"]) for t in triples], fmt)
        with open(path, "wb" if isinstance(out, bytes) else "w") as f:
            f.write(out)
        written.append(path)
    return written
