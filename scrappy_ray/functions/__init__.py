"""Large-scale training-data operations (first-class components beside
the crawl engine): deduplication, similarity search, text analysis,
multimodal plumbing, extraction quality metrics."""

from . import dedup, metrics, multimodal, similarity, textstats

__all__ = ["dedup", "similarity", "textstats", "multimodal", "metrics"]
