"""End-to-end: Pipermail crawls vs the sequential reference simulation."""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.pipermail import SyntheticPipermail
from forum_dl_spark.oracle.refsim_pipermail import run_reference_pipermail


@pytest.fixture(scope="module")
def server():
    return SyntheticPipermail(seed=42)


def _assert_match(crawl, oracle):
    got_trace = [
        (r["url"], r["params"] or "")
        for r in crawl.pages().orderBy("ord", "attempt").collect()
    ]
    assert got_trace == oracle.trace
    got_seen = {(r["seen_key"], r["status"]) for r in crawl.seen().collect()}
    assert got_seen == set(oracle.seen.items())
    rows = crawl.items().orderBy("ord").collect()
    assert len(rows) == len(oracle.items)
    for got, want in zip(rows, oracle.items):
        assert (got["type"], tuple(got["path"]), tuple(got["subpath"] or ())) == (
            want.type, want.path, want.subpath,
        )
        assert got["url"] == want.url
        assert got["title"] == want.title
        assert got["author"] == want.author
        assert got["creation_time"] == want.creation_time
        assert got["content"] == want.content


def test_board_mode_zero_posts(spark, server, tmp_path):
    seed = "https://pm.example/pipermail/mylist"
    oracle = run_reference_pipermail(server, seed)
    crawl = run_crawl(spark, server, seed, str(tmp_path / "pm_board"), CrawlConfig())
    _assert_match(crawl, oracle)
    # posts fetch = the already-visited period page → zero posts (quirk)
    assert crawl.items().filter("type='post'").count() == 0
    assert crawl.items().filter("type='thread'").count() > 0


def test_thread_mode_longid_replay(spark, server, tmp_path):
    seed = "https://pm.example/pipermail/mylist/2021-January/1001.html"
    oracle = run_reference_pipermail(server, seed)
    crawl = run_crawl(spark, server, seed, str(tmp_path / "pm_thread"), CrawlConfig())
    _assert_match(crawl, oracle)
    posts = [i for i in oracle.items if i.type == "post"]
    assert posts and posts[0].subpath == ("1001",)  # root subpath quirk
    # the quote-strip substitution ran (pipermail.py:332)
    assert all("<i>" not in (p.content or "") for p in posts)
