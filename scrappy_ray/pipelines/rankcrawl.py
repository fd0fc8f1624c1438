"""PageRank-driven crawl prioritization — the focused-recrawl loop.

A production crawler re-prioritizes its frontier from the authority
signal of the PREVIOUS crawl: build the host-level link graph from the
crawled pages, run PageRank over it, freeze (host, score) to parquet,
and schedule the next crawl with ``priority_fn="host_rank:<path>"``
(crawl/priority.py) so politeness grants and the round budget pop
high-authority hosts first.

Scale notes: the edge pass is one streaming extraction (links already
come out of the extraction stage); host-graph PageRank runs on the
distributed ``functions/graph.py::pagerank`` (quantized mode →
deterministic, goldenable). The host→id dictionary IS gathered to the
driver — O(hosts), not O(urls); hosts run ~10^7–10^8 at 100 TB (a few
GB of strings), at which point the dict-encode moves to a sorted
groupby index and the final score table stays a Dataset. The frozen
score parquet itself is what the priority fn broadcasts, one load per
worker process.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..crawl.priority import _HOST_RE
from .crawl_pipeline import extract_all


def host_edges(pages_path: str, kb_yaml: str | None = None, **kw):
    """Distinct (src_host, dst_host) link edges from a crawled page
    set — one streaming pass over the extraction output, per-batch
    distinct, global distinct via one groupby."""
    from ..functions.dedup import _distinct

    ex = extract_all(pages_path, kb_yaml, **kw)

    def explode(batch: pa.Table) -> pa.Table:
        links = batch.column("links")
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        lens = np.asarray(pc.list_value_length(links), dtype=np.int64)
        src_h = pc.fill_null(
            pc.struct_field(
                pc.extract_regex(pc.cast(batch.column("url"), pa.string()), _HOST_RE),
                "host",
            ),
            "",
        )
        src = src_h.take(pa.array(np.repeat(np.arange(len(lens)), lens), pa.int64()))
        dst_urls = pc.struct_field(pc.list_flatten(links), "url")
        dst = pc.fill_null(
            pc.struct_field(pc.extract_regex(pc.cast(dst_urls, pa.string()), _HOST_RE), "host"),
            "",
        )
        t = pa.table({"src_host": src, "dst_host": dst})
        t = t.filter(
            pc.and_(
                pc.not_equal(t.column("src_host"), ""),
                pc.not_equal(t.column("dst_host"), ""),
            )
        )
        return t.group_by(["src_host", "dst_host"]).aggregate([])

    edges = ex.map_batches(explode, batch_format="pyarrow")
    return _distinct(edges, ["src_host", "dst_host"])


def host_rank_table(pages_path: str, out_path: str, kb_yaml: str | None = None,
                    damping: float = 0.85, iters: int = 10,
                    iter_round: int | None = 9, **kw) -> pa.Table:
    """Host-level PageRank of the crawled link graph, frozen to a
    (host, score) parquet consumable by ``priority_fn="host_rank:..."``.
    Returns the table (sorted by host) for convenience."""
    import pyarrow.parquet as pq

    from ..functions.graph import pagerank

    etbl = pa.concat_tables(
        host_edges(pages_path, kb_yaml, **kw).iter_batches(batch_format="pyarrow")
    ).combine_chunks()
    # host→id dictionary (driver-side, O(hosts) — see module docstring;
    # the distinct HOST edge list is orders of magnitude under the url
    # edge list, so this gather is the small side by construction)
    both = pa.concat_arrays(
        etbl.column("src_host").cast(pa.string()).chunks
        + etbl.column("dst_host").cast(pa.string()).chunks
    )
    hosts = pc.unique(both)
    hosts = hosts.take(pc.sort_indices(hosts))
    import ray.data

    src_i = pc.index_in(etbl.column("src_host"), value_set=hosts).cast(pa.int64())
    dst_i = pc.index_in(etbl.column("dst_host"), value_set=hosts).cast(pa.int64())
    edges_ds = ray.data.from_arrow(pa.table({"src": src_i, "dst": dst_i}))
    pr = pagerank(edges_ds, damping=damping, iters=iters, iter_round=iter_round)
    prt = pa.concat_tables(pr.iter_batches(batch_format="pyarrow")).combine_chunks()
    node = np.asarray(pc.cast(prt.column("node"), pa.int64()), dtype=np.int64)
    rank = np.asarray(pc.cast(prt.column("rank"), pa.float64()), dtype=np.float64)
    scores = np.zeros(len(hosts), np.float64)
    scores[node] = rank
    out = pa.table({"host": hosts, "score": pa.array(scores, pa.float64())})
    pq.write_table(out, out_path)
    return out
