"""Sitemap (sitemaps.org XML) source — crawl-seed ingestion.

A production crawl seeds its frontier from sitemaps; this parses a
column of sitemap XML payloads into (url, lastmod) rows, streaming.
Both `<urlset>` entries and `<sitemapindex>` children are emitted (the
``kind`` column says which — an index row's url is ANOTHER sitemap to
fetch, i.e. frontier recursion, exactly like link discovery).

Parsing is per-row regex scanning (payload-bounded, the WARC-reader
precedent — a sitemap is ≤50k urls by spec); patterns compile once per
actor. No third-party XML lib: sitemap structure is flat and the spec
pins the element grammar, so anchored regexes are exact for
well-formed files and tolerant of the truncated/mis-nested tails real
crawls see.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_URL_BLOCK = re.compile(r"<url>(.*?)</url>", re.S)
_SM_BLOCK = re.compile(r"<sitemap>(.*?)</sitemap>", re.S)
_LOC = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.S)
_LASTMOD = re.compile(r"<lastmod>\s*(.*?)\s*</lastmod>", re.S)


class SitemapParser:
    """map_batches stage: (xml) → exploded (url, lastmod, kind) rows."""

    def __init__(self, xml_col: str = "xml"):
        self.xml_col = xml_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        xmls = pc.fill_null(
            pc.cast(batch.column(self.xml_col), pa.string()), ""
        ).to_pylist()
        urls, mods, kinds = [], [], []
        for x in xmls:
            for kind, block_re in (("url", _URL_BLOCK), ("sitemap", _SM_BLOCK)):
                for block in block_re.findall(x):
                    loc = _LOC.search(block)
                    if not loc:
                        continue
                    lm = _LASTMOD.search(block)
                    urls.append(loc.group(1))
                    mods.append(lm.group(1) if lm else None)
                    kinds.append(kind)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "lastmod": pa.array(mods, pa.string()),
            "kind": pa.array(kinds, pa.string()),
        })


def parse_sitemaps(ds, xml_col: str = "xml", concurrency: int = 4,
                   batch_size: int = 64):
    """Parse a Dataset with a sitemap-XML column into (url, lastmod,
    kind) rows — small batches: payloads can be MBs each."""
    return ds.map_batches(
        SitemapParser,
        fn_constructor_args=(xml_col,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
