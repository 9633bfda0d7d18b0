"""End-to-end: vBulletin and Invision crawls vs reference simulations."""

from __future__ import annotations

from datetime import timezone

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.invision import SyntheticInvision
from forum_dl_spark.fixtures.vbulletin import SyntheticVbulletin
from forum_dl_spark.oracle.refsim_vb_inv import (
    run_reference_invision,
    run_reference_vbulletin,
)


def _norm_time(dt):
    if dt is None:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


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
        assert _norm_time(got["creation_time"]) == _norm_time(want.creation_time)
        assert got["content"] == want.content
        if want.type == "file":
            assert bytes(got["content_bytes"] or b"") == (want.content_bytes or b"")


def test_vbulletin(spark, tmp_path):
    srv = SyntheticVbulletin(seed=42)
    oracle = run_reference_vbulletin(srv, "https://vb.example/")
    crawl = run_crawl(spark, srv, "https://vb.example/", str(tmp_path / "vb"), CrawlConfig())
    _assert_match(crawl, oracle)
    # the skipped comment row never becomes a post
    assert not any("999" in (i.subpath or ()) for i in oracle.items)


def test_invision(spark, tmp_path):
    srv = SyntheticInvision(seed=42)
    oracle = run_reference_invision(srv, "https://inv.example/")
    crawl = run_crawl(spark, srv, "https://inv.example/", str(tmp_path / "inv"), CrawlConfig())
    _assert_match(crawl, oracle)
    # board titles are the corrected (own) titles, not the category's
    boards = [i for i in oracle.items if i.type == "board" and len(i.path) == 2]
    assert all(b.title.startswith("Forum") for b in boards)


# --- subtree seeding: node_from_url (vbulletin.py:294-330, invision.py:154-185)


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
    ("forum/cat-2", ("2",)),            # board matched by crumb TITLE
    ("forum/board-12", ("1", "12")),
])
def test_vb_board_seed_crawls_only_subtree(spark, tmp_path, rel, root_path):
    srv = SyntheticVbulletin(seed=42)
    seed = f"https://vb.example/{rel}"
    oracle = run_reference_vbulletin(srv, seed)
    res = run_crawl(spark, srv, seed, str(tmp_path / "sub"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    paths = {tuple(r["path"]) for r in res.items().collect()}
    assert paths and all(p[: len(root_path)] == root_path for p in paths)
    # vB has NO board prefetch: board pages outside the subtree are never
    # fetched (unlike xenforo/invision)
    sub_boards = {root_path[-1]} | {
        p[-1] for p, in ((tuple(r["path"]),) for r in res.items().collect())
        if len(p) >= 1
    }
    for u, _ in _tables(res)[0]:
        if "/forum/board-" in u:
            assert u.rsplit("board-", 1)[1].split("?")[0] in sub_boards


def test_vb_thread_seed_crawls_only_thread(spark, tmp_path):
    srv = SyntheticVbulletin(seed=42)
    seed = "https://vb.example/forum/topic-1201"
    oracle = run_reference_vbulletin(srv, seed)
    res = run_crawl(spark, srv, seed, str(tmp_path / "vbts"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    items = res.items().orderBy("ord").collect()
    assert items[0]["type"] == "thread"
    assert tuple(items[0]["path"]) == ("1", "12", "1201")
    assert not any(r["seen_key"] == seed for r in res.seen().collect())


@pytest.mark.parametrize("rel,root_path", [
    ("forums/cat-2/", ("2",)),
    ("forums/forum-12/", ("1", "12")),
])
def test_inv_board_seed_crawls_only_subtree(spark, tmp_path, rel, root_path):
    srv = SyntheticInvision(seed=42)
    seed = f"https://inv.example/{rel}"
    oracle = run_reference_invision(srv, seed)
    res = run_crawl(spark, srv, seed, str(tmp_path / "isub"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    paths = {tuple(r["path"]) for r in res.items().collect()}
    assert paths and all(p[: len(root_path)] == root_path for p in paths)


def test_inv_thread_seed_crawls_only_thread(spark, tmp_path):
    srv = SyntheticInvision(seed=42)
    seed = "https://inv.example/topic/1201-x/"
    oracle = run_reference_invision(srv, seed)
    res = run_crawl(spark, srv, seed, str(tmp_path / "its"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    items = res.items().orderBy("ord").collect()
    assert items[0]["type"] == "thread"
    assert tuple(items[0]["path"]) == ("1", "12", "1201")
    # every board is still prefetched (Invision prefetches cats too) but
    # none is consumed -> all stay in the final seen set
    assert any(
        "forums/forum-" in r["seen_key"] for r in res.seen().collect()
    )
    assert not any(r["seen_key"] == seed for r in res.seen().collect())
