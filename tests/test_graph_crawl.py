"""PageRank over the crawl's REAL link graph (round-4 verdict ask #4).

Pins, against the sequential reference simulation on the same fixture:

1. ``CrawlResult.link_edges()`` == the refsim's discovered-link set —
   every (discovering page -> discovered URL) pair, seen-key keyed,
   recorded BEFORE the URL-seen gate on both sides (discovery happens
   whether or not the fetch is then suppressed);
2. ``pagerank_crawl`` == a pure-Python integer PageRank over that oracle
   edge set (same 10^6-scaled 0.15/0.85 integer recipe as pagerank_topk).
"""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures import SyntheticDiscourse
from forum_dl_spark.oracle import run_reference_discourse

SEED_URL = "https://forum.example/"

# the SAME fixture params as operators/_fixture.py (the memoized crawl the
# registered pagerank_crawl query ranks)
FIXTURE_KW = dict(
    seed=7, n_cats=1, n_subcats=1, n_topics=2, max_posts=25,
    topics_per_page=2, duplicate_topic=False,
)


@pytest.fixture(scope="module")
def server():
    return SyntheticDiscourse(**FIXTURE_KW)


@pytest.fixture(scope="module")
def oracle(server):
    return run_reference_discourse(server, SEED_URL)


@pytest.fixture(scope="module")
def crawl(spark, server, tmp_path_factory):
    wd = tmp_path_factory.mktemp("crawl_linkgraph")
    return run_crawl(spark, server, SEED_URL, str(wd / "run"), CrawlConfig())


def test_link_edges_equal_refsim_discovered_links(crawl, oracle):
    got = {(r["src_key"], r["dst_key"]) for r in crawl.link_edges().collect()}
    want = set(oracle.links)
    assert got == want
    assert len(want) > 5  # non-vacuous: boards, threads, post chunks


def _python_pagerank(edges: set[tuple[str, str]], topk: int):
    """Independent integer PageRank over an explicit edge set."""
    from forum_dl_spark.operators.graph import _PR_INIT, _PR_ITERS

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {n: _PR_INIT for n in nodes}
    for _ in range(_PR_ITERS):
        s = {n: 0 for n in nodes}
        for src, dst in edges:
            s[dst] += r[src] // out[src]
        r = {n: 150_000 + (17 * s[n]) // 20 for n in nodes}
    return sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]


def test_pagerank_crawl_matches_python_sim(spark, oracle):
    from forum_dl_spark.operators.graph import _PR_TOPK, pagerank_crawl

    got = [
        (r["url_key"], r["rank_score"])
        for r in pagerank_crawl(spark, "unused").collect()
    ]
    want = _python_pagerank(set(oracle.links), _PR_TOPK)
    assert got == want


def test_pagerank_crawl_ranks_hub_pages_high(spark):
    from forum_dl_spark.operators.graph import pagerank_crawl

    rows = pagerank_crawl(spark, "unused").collect()
    # every ranked node is a fixture URL; scores are positive and sorted
    assert all(r["url_key"].startswith("https://forum.example/") for r in rows)
    scores = [r["rank_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 150_000  # the top node actually received mass
