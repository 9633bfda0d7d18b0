from .detect import DetectResult, detect_engine
from .superstep import (CrawlConfig, CrawlResult, recrawl_reopen, resume_crawl,
                        run_crawl, run_crawl_multi, run_crawl_shared)

__all__ = [
    "DetectResult",
    "detect_engine",
    "CrawlConfig",
    "CrawlResult",
    "run_crawl",
    "run_crawl_multi",
    "run_crawl_shared",
    "resume_crawl",
    "recrawl_reopen",
]
