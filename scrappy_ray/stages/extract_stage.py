"""The extraction stage: an actor-pool ``map_batches`` over Arrow
batches of fetched pages.

Stateful setup — KB compile + selector registry — happens once per
actor in ``__init__`` (the reference re-instantiates the KB graph per
DOCUMENT to reset selector state, extractor.rb:17; we keep the
compiled KB immutable per actor and give each document a fresh
ExtractionContext, which is the same semantics without the rebuild
cost). Per-batch work is row-wise by necessity (HTML parsing is
inherently per-document) but all batch I/O stays Arrow: html comes in
zero-copy as ``binary``, outputs are list<struct> columns built once
per batch.

The html column is DROPPED on output (project early — wide binary rows
must not flow further than extraction, SURVEY.md §7)."""

from __future__ import annotations

import pyarrow as pa

from ..extractor.core import extract_record
from ..kb.loader import kb_from_dict, load_kb

TRIPLE_TYPE = pa.struct(
    [("s", pa.string()), ("p", pa.string()), ("o", pa.string()), ("lit", pa.bool_())]
)
LINK_TYPE = pa.struct([("url", pa.string()), ("depth", pa.int32())])

EXTRACTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("curl", pa.string()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("round", pa.int32()),
        ("fetched", pa.bool_()),
        ("triples", pa.list_(TRIPLE_TYPE)),
        ("links", pa.list_(LINK_TYPE)),
        ("text", pa.string()),
        ("error", pa.string()),
    ]
)


_KB_CACHE: dict = {}


def compiled_kb(kb_yaml: str):
    """Process-level compiled-KB cache: Ray worker processes persist
    across Dataset jobs, so task-based extraction stages compile the KB
    once per worker for the whole crawl — cheaper than an actor pool
    that respawns every round (actor startup ≫ KB compile)."""
    kb = _KB_CACHE.get(kb_yaml)
    if kb is None:
        kb = load_kb(kb_yaml)
        _KB_CACHE[kb_yaml] = kb
    return kb


class ExtractPages:
    """Callable class for ``map_batches(ExtractPages, concurrency=N,
    fn_constructor_kwargs=dict(kb_yaml=...), batch_format='pyarrow',
    zero_copy_batch=True)``."""

    def __init__(self, kb_yaml: str | None = None, kb_dict: dict | None = None, referenceable: bool = False):
        self.kb = kb_from_dict(kb_dict) if kb_dict is not None else load_kb(kb_yaml)
        self.referenceable = referenceable

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, self.kb, self.referenceable)


def make_extract_fn(kb_yaml: str, referenceable: bool = False):
    """Task-based extraction stage fn (process-cached KB). Preferred in
    the superstep crawl, where a fresh actor pool per round would pay
    actor-launch latency every superstep."""

    def extract_pages(batch: pa.Table) -> pa.Table:
        return extract_batch(batch, compiled_kb(kb_yaml), referenceable)

    return extract_pages


def extract_batch(batch: pa.Table, kb, referenceable: bool = False) -> pa.Table:
        urls = batch.column("url").to_pylist()
        curls = batch.column("curl").to_pylist() if "curl" in batch.column_names else urls
        depths = batch.column("depth").to_pylist() if "depth" in batch.column_names else [-1] * len(urls)
        seqs = batch.column("seq").to_pylist() if "seq" in batch.column_names else list(range(len(urls)))
        rounds = batch.column("round").to_pylist() if "round" in batch.column_names else [0] * len(urls)
        htmls = batch.column("html").to_pylist()

        out = {k: [] for k in ("url", "curl", "depth", "seq", "round", "fetched", "triples", "links", "text", "error")}
        for url, curl, depth, seq, rnd, html in zip(urls, curls, depths, seqs, rounds, htmls):
            rec = extract_record(kb, curl, html, depth, referenceable)
            out["url"].append(url)
            out["curl"].append(curl)
            out["depth"].append(depth)
            out["seq"].append(seq)
            out["round"].append(rnd)
            out["fetched"].append(rec["fetched"])
            out["triples"].append(
                [{"s": s, "p": p, "o": str(o), "lit": bool(lit)} for (s, p, o, lit) in rec["triples"]]
            )
            out["links"].append(rec["links"])
            out["text"].append(rec["text"])
            out["error"].append(rec.get("error"))

        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "curl": pa.array(out["curl"], pa.string()),
                "depth": pa.array(out["depth"], pa.int32()),
                "seq": pa.array(out["seq"], pa.int64()),
                "round": pa.array(out["round"], pa.int32()),
                "fetched": pa.array(out["fetched"], pa.bool_()),
                "triples": pa.array(out["triples"], pa.list_(TRIPLE_TYPE)),
                "links": pa.array(out["links"], pa.list_(LINK_TYPE)),
                "text": pa.array(out["text"], pa.string()),
                "error": pa.array(out["error"], pa.string()),
            }
        )
