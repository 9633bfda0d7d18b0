"""End-to-end: Spark XenForo crawl vs the sequential reference simulation.

Exercises the subforum-only prefetch quirk, dual post layouts, and the
shared HtmlExtractor file pipeline."""

from __future__ import annotations

from datetime import timezone

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.xenforo import SyntheticXenforo
from forum_dl_spark.oracle.refsim_xenforo import run_reference_xenforo

SEED_URL = "https://xen.example/"


@pytest.fixture(scope="module")
def server():
    return SyntheticXenforo(seed=42, n_cats=2, n_subs=2, n_topics=3, max_posts=5)


@pytest.fixture(scope="module")
def oracle(server):
    return run_reference_xenforo(server, SEED_URL)


@pytest.fixture(scope="module")
def crawl(spark, server, tmp_path_factory):
    wd = tmp_path_factory.mktemp("crawl_xenforo")
    return run_crawl(spark, server, SEED_URL, str(wd / "run"), CrawlConfig())


def _norm_time(dt):
    if dt is None:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def test_crawl_order_exact(crawl, oracle):
    got = [
        (r["url"], r["params"] or "")
        for r in crawl.pages().orderBy("ord", "attempt").collect()
    ]
    assert got == oracle.trace


def test_seen_set_exact(crawl, oracle):
    got = {(r["seen_key"], r["status"]) for r in crawl.seen().collect()}
    assert got == set(oracle.seen.items())


def test_items_order_and_fields(crawl, oracle):
    rows = crawl.items().orderBy("ord").collect()
    assert len(rows) == len(oracle.items)
    for got, want in zip(rows, oracle.items):
        assert (got["type"], tuple(got["path"]), tuple(got["subpath"] or ())) == (
            want.type, want.path, want.subpath,
        )
        assert got["url"] == want.url
        assert got["title"] == want.title
        assert got["author"] == want.author
        assert _norm_time(got["creation_time"]) == _norm_time(want.creation_time)
        assert got["content"] == want.content
        if want.type == "file":
            assert bytes(got["content_bytes"] or b"") == (want.content_bytes or b"")


def test_both_layouts_exercised(server, oracle):
    layouts = {server.card_layout(int(i.path[-1])) for i in oracle.items if i.type == "thread"}
    assert layouts == {True, False}
    assert any(i.type == "post" for i in oracle.items)
