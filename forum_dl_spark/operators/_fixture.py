"""Session-memoized fixture crawls for the crawl-consuming gate queries.

``crawl_discourse_spans``, ``crawl_corpus_quality`` and ``pagerank_crawl``
all consume the SAME deterministic fixture crawl (SyntheticDiscourse seed=7,
1 cat, 1 subcat, 2 topics, <=25 posts). Running it three times in one
driver/bench session tripled the most expensive fixed cost in the
correctness pass (~10 s per run — round-4 CORRECTNESS budget lesson), so
the finished CrawlResult is memoized per (SparkSession, params) exactly
like dedup._SHINGLE_MEMO: the crawl is deterministic and its checkpoint
directory immutable once finished, so the handle never goes stale;
stale-session entries are dropped on the next session's first call.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import SparkSession

_CRAWL_MEMO: dict[str, object] = {}


def fixture_discourse_crawl(spark: SparkSession):
    """The shared tiny Discourse fixture crawl (CrawlResult)."""
    key = spark.sparkContext.applicationId
    memo = _CRAWL_MEMO.get(key)
    if memo is not None:
        return memo
    from ..crawl import CrawlConfig, run_crawl
    from ..fixtures import SyntheticDiscourse

    srv = SyntheticDiscourse(
        seed=7, n_cats=1, n_subcats=1, n_topics=2, max_posts=25,
        topics_per_page=2, duplicate_topic=False,
    )
    wd = tempfile.mkdtemp(prefix="crawl_fixture_")
    res = run_crawl(spark, srv, "https://forum.example/", wd, CrawlConfig())
    for old_key in [k for k in _CRAWL_MEMO if k != key]:
        del _CRAWL_MEMO[old_key]
    _CRAWL_MEMO[key] = res
    return res
