"""End-to-end: Spark phpBB crawl vs the sequential reference simulation.

Exercises the HtmlExtractor path: board-page prefetch quirk, interleaved
post+file emission, writer-driven file downloads with URL dedup, inline
SVG files, pagination, and span-sequence equality.
"""

from __future__ import annotations

from datetime import timezone

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb
from forum_dl_spark.oracle.refsim_phpbb import run_reference_phpbb
from forum_dl_spark.spans import extract_spans

SEED_URL = "https://phpbb.example/"


@pytest.fixture(scope="module")
def server():
    return SyntheticPhpbb(seed=42, n_cats=2, n_subs=2, n_topics=4, max_posts=7)


@pytest.fixture(scope="module")
def oracle(server):
    return run_reference_phpbb(server, SEED_URL)


@pytest.fixture(scope="module")
def crawl(spark, server, tmp_path_factory):
    wd = tmp_path_factory.mktemp("crawl_phpbb")
    return run_crawl(spark, server, SEED_URL, str(wd / "run"), CrawlConfig())


def test_crawl_order_exact(crawl, oracle):
    got = [
        (r["url"], r["params"] or "")
        for r in crawl.pages().orderBy("ord", "attempt").collect()
    ]
    assert got == oracle.trace


def test_seen_set_exact(crawl, oracle):
    got = {(r["seen_key"], r["status"]) for r in crawl.seen().collect()}
    assert got == set(oracle.seen.items())


def _norm_time(dt):
    if dt is None:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def test_items_order_and_fields(crawl, oracle):
    rows = crawl.items().orderBy("ord").collect()
    assert len(rows) == len(oracle.items)
    for got, want in zip(rows, oracle.items):
        assert (got["type"], tuple(got["path"])) == (want.type, want.path)
        assert tuple(got["subpath"] or ()) == want.subpath
        assert got["url"] == want.url
        assert got["origin"] == want.origin
        assert got["title"] == want.title
        assert got["author"] == want.author
        assert _norm_time(got["creation_time"]) == _norm_time(want.creation_time)
        assert got["content"] == want.content
        if want.type == "file":
            assert got["content_type"] == want.content_type, want.url
            assert bytes(got["content_bytes"] or b"") == (want.content_bytes or b""), want.url


def test_file_download_dedup(crawl, oracle):
    # the shared banner appears in many posts but is fetched exactly once
    pages = crawl.pages().filter("url like '%shared_banner%'").collect()
    n_trace = sum(1 for u, _ in oracle.trace if "shared_banner" in u)
    assert len(pages) == n_trace <= 1 or len(pages) == n_trace


def test_span_sequence_equality(crawl, oracle):
    got = {}
    for r in crawl.documents().collect():
        got[r["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
    posts = [i for i in oracle.items if i.type == "post"]
    assert len(got) == len(posts)
    for p in posts:
        want = [
            (s.kind, s.text, s.media_ref, s.offset)
            for s in extract_spans(p.content or "", p.origin)
        ]
        assert got[".".join(p.path + p.subpath)] == want


# --- subtree seeding: node_from_url semantics (phpbb.py:379-428) ------------


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


@pytest.mark.parametrize("rel", [
    "viewforum.php?f=2",    # top-level category
    "viewforum.php?f=12",   # subforum
    "viewforum.php",        # no f -> root (full crawl via the home row)
])
def test_viewforum_seed_crawls_only_subtree(spark, server, tmp_path, rel):
    """A viewforum seed writes only that board's subtree; every board page
    is still PREFETCHED (the reference's _fetch_lower_boards trace), and
    unconsumed prefetches stay in the final seen set."""
    seed = f"https://phpbb.example/{rel}"
    oracle = run_reference_phpbb(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / "sub"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    if "f=" in rel:
        f = rel.split("f=")[1]
        paths = {tuple(r["path"]) for r in res.items().collect()}
        assert paths and all(f in p[:2] for p in paths)


def test_viewtopic_seed_crawls_only_thread(spark, server, tmp_path):
    """A viewtopic seed resolves its board path from the page breadcrumbs
    and writes just that thread (+posts/files); the seed page itself is
    consumed from the probe cache -> evicted from the final seen set."""
    seed = "https://phpbb.example/viewtopic.php?t=1201"
    oracle = run_reference_phpbb(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / "tseed"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    items = res.items().orderBy("ord").collect()
    assert items[0]["type"] == "thread"
    assert tuple(items[0]["path"]) == ("1", "12", "1201")
    assert {r["type"] for r in items} <= {"thread", "post", "file"}
    assert not any(
        r["seen_key"] == seed for r in res.seen().collect()
    )
