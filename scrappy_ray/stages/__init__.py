from .fetch import build_page_store, fetch_frontier, lookup_urls, url_bucket
from .extract_stage import ExtractPages, TRIPLE_TYPE, LINK_TYPE
from .seq import add_global_seq

__all__ = [
    "build_page_store",
    "fetch_frontier",
    "lookup_urls",
    "url_bucket",
    "ExtractPages",
    "TRIPLE_TYPE",
    "LINK_TYPE",
    "add_global_seq",
]
