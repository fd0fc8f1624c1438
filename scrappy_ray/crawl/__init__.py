from .simulator import fifo_reference_crawl, superstep_crawl_sim, SimResult
from .driver import CrawlConfig, run_crawl

__all__ = ["fifo_reference_crawl", "superstep_crawl_sim", "SimResult", "CrawlConfig", "run_crawl"]
