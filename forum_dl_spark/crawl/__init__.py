from .detect import DetectResult, detect_engine
from .superstep import CrawlConfig, CrawlResult, resume_crawl, run_crawl

__all__ = [
    "DetectResult",
    "detect_engine",
    "CrawlConfig",
    "CrawlResult",
    "run_crawl",
    "resume_crawl",
]
