"""Large-scale training-data operations (first-class components beside
the crawl engine): deduplication, similarity search, text analysis,
multimodal plumbing, extraction quality metrics."""

from . import (
    bpe,
    dedup,
    fuzzy,
    graph,
    index,
    metrics,
    multimodal,
    sampling,
    similarity,
    spans,
    textstats,
    webtext,
)

__all__ = [
    "bpe",
    "dedup",
    "fuzzy",
    "graph",
    "index",
    "metrics",
    "multimodal",
    "sampling",
    "similarity",
    "spans",
    "textstats",
    "webtext",
]
