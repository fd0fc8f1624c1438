from . import analytics, corpus, crawl_pipeline, export, rankcrawl, relational

__all__ = ["analytics", "corpus", "crawl_pipeline", "export", "rankcrawl",
           "relational"]
