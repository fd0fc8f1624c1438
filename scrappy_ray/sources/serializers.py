"""Output serializers for the triples table.

The reference serializes graphs to yarf / rdfxml / ntriples / json /
ejson / png (/root/reference/lib/scrappy/agent/agent.rb:11-13,119-131
via lightrdf). Here: N-Triples (canonical interchange), JSON
(s→p→[o]), and YARF-style compact text. rdfxml/png are intentionally
out of scope (no consumer in this environment); Parquet is the
canonical sink (SURVEY.md §1.5).

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


SERIALIZERS = {
    "ntriples": triples_to_ntriples,
    "json": lambda rows: triples_to_json(rows),
    "yarf": lambda rows: triples_to_yarf(rows),
}


def serialize(rows, fmt: str = "ntriples") -> str:
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
        with open(path, "w") as f:
            f.write(serialize([(t["s"], t["p"], t["o"], t["lit"]) for t in triples], fmt))
        written.append(path)
    return written
