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


# --- subtree seeding: node_from_url semantics (xenforo.py:394-440) ----------


def _tables(res):
    pages = [
        (r["url"], r["params"] or "")
        for r in res.pages().orderBy("ord", "attempt").collect()
    ]
    seen = {(r["seen_key"], r["status"]) for r in res.seen().collect()}
    items = [
        (r["type"], tuple(r["path"]), tuple(r["subpath"] or ()), r["url"],
         r["origin"], r["title"], r["content"])
        for r in res.items().orderBy("ord").collect()
    ]
    return pages, seen, items


def _oracle_tables(o):
    items = [
        (i.type, i.path, i.subpath, i.url, i.origin, i.title, i.content)
        for i in o.items
    ]
    return o.trace, set(o.seen.items()), items


@pytest.mark.parametrize("rel,root_path", [
    ("categories/cat-2/", ("2",)),       # category page seed (og:url match)
    ("forums/sub-11/", ("1", "11")),     # subforum page seed
])
def test_board_seed_crawls_only_subtree(spark, server, tmp_path, rel, root_path):
    """A board-page seed (resolved via its og:url meta) writes only that
    subtree; every subforum is still prefetched and unconsumed prefetches
    stay in the final seen set."""
    seed = f"https://xen.example/{rel}"
    oracle = run_reference_xenforo(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / "sub"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    paths = {tuple(r["path"]) for r in res.items().collect()}
    assert paths and all(p[: len(root_path)] == root_path for p in paths)


@pytest.mark.parametrize("t,path", [
    ("t-1101", ("1", "11", "1101")),   # thread in a subforum
    ("t-201", ("2", "201")),           # thread directly in a category
])
def test_thread_seed_crawls_only_thread(spark, server, tmp_path, t, path):
    """A thread-page seed (article/MessageCard + data-lb-id + breadcrumb
    board anchor) writes just that thread; its page 1 is consumed from the
    probe cache -> evicted from the final seen set."""
    seed = f"https://xen.example/threads/{t}/"
    oracle = run_reference_xenforo(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / t), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    items = res.items().orderBy("ord").collect()
    assert items[0]["type"] == "thread"
    assert tuple(items[0]["path"]) == path
    assert not any(r["type"] == "board" for r in items)
    assert not any(r["seen_key"] == seed for r in res.seen().collect())
