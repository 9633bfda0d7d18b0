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
_RECRAWL_MEMO: dict[str, object] = {}
_HK_MEMO: dict[str, object] = {}


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


def fixture_hyperkitty_crawl(spark: SparkSession):
    """The shared tiny HyperKitty fixture crawl (CrawlResult) — the
    threaded-MAIL counterpart of the Discourse fixture: root posts have
    empty subpaths and replies carry stack-replay subpath chains, so this
    is the crawl the tree-shaped conversation pairing consumes."""
    key = spark.sparkContext.applicationId
    memo = _HK_MEMO.get(key)
    if memo is not None:
        return memo
    from ..crawl import CrawlConfig, run_crawl
    from ..fixtures.hyperkitty import SyntheticHyperkitty

    srv = SyntheticHyperkitty(seed=42)
    wd = tempfile.mkdtemp(prefix="crawl_fixture_hk_")
    res = run_crawl(
        spark, srv, "https://hk.example/list/mylist.example/", wd,
        CrawlConfig(),
    )
    for old_key in [k for k in _HK_MEMO if k != key]:
        del _HK_MEMO[old_key]
    _HK_MEMO[key] = res
    return res


def fixture_recrawl_pair(spark: SparkSession):
    """A finished fixture crawl, then ONE post edited and its thread page
    re-opened via ``recrawl_reopen`` — returns ``(result, k1, k2)`` where
    ``k1``/``k2`` are the pre-/post-recrawl snapshot steps.

    Deliberately NOT the shared ``fixture_discourse_crawl``: a recrawl
    APPENDS supersteps to the workdir, which would mutate the snapshot the
    other crawl-consuming queries read. Smaller fixture (1 topic) so the
    two crawls stay cheap in the correctness pass; memoized like the
    others (both crawls are deterministic, the edit is a fixed constant).
    """
    key = spark.sparkContext.applicationId
    memo = _RECRAWL_MEMO.get(key)
    if memo is not None:
        return memo
    from ..crawl import CrawlConfig, recrawl_reopen, run_crawl
    from ..fixtures import SyntheticDiscourse

    srv = SyntheticDiscourse(
        seed=7, n_cats=1, n_subcats=1, n_topics=1, max_posts=10,
        topics_per_page=2, duplicate_topic=False,
    )
    wd = tempfile.mkdtemp(prefix="crawl_recrawl_")
    res1 = run_crawl(spark, srv, "https://forum.example/", wd, CrawlConfig())
    k1 = res1.supersteps - 1
    tid = 101001  # board 101, topic 1 (same id scheme as the fixture tests)
    srv.edited_posts[tid * 100 + 1] = "<p>edited content, recrawl revision</p>"
    res2 = recrawl_reopen(
        spark, srv, wd, [f"https://forum.example/t/topic-{tid}/{tid}.json"]
    )
    out = (res2, k1, res2.supersteps - 1)
    for old_key in [k for k in _RECRAWL_MEMO if k != key]:
        del _RECRAWL_MEMO[old_key]
    _RECRAWL_MEMO[key] = out
    return out
