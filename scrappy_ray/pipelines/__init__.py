from . import relational, crawl_pipeline

__all__ = ["relational", "crawl_pipeline"]
