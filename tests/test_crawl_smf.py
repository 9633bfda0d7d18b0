"""End-to-end: Spark Simple Machines crawl vs the sequential reference."""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.simplemachines import SyntheticSimplemachines
from forum_dl_spark.oracle.refsim_smf import run_reference_smf

SEED_URL = "https://smf.example/"


@pytest.fixture(scope="module")
def server():
    return SyntheticSimplemachines(seed=42, n_cats=2, n_boards=2, n_topics=3)


@pytest.fixture(scope="module")
def oracle(server):
    return run_reference_smf(server, SEED_URL)


@pytest.fixture(scope="module")
def crawl(spark, server, tmp_path_factory):
    wd = tmp_path_factory.mktemp("crawl_smf")
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
        assert got["creation_time"] == want.creation_time
        assert got["content"] == want.content
        if want.type == "file":
            assert bytes(got["content_bytes"] or b"") == (want.content_bytes or b"")


def test_month_name_dates_parsed(oracle):
    posts = [i for i in oracle.items if i.type == "post"]
    assert posts and all(p.creation_time is not None for p in posts)
    assert {p.creation_time.year for p in posts} == {2019}


# --- subtree seeding: node_from_url (simplemachines.py:343-381) -------------


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
    ("index.php?board=12.0", ("1", "12")),   # board page seed
    ("index.php?board=21.0", ("2", "21")),
])
def test_board_seed_crawls_only_subtree(spark, server, tmp_path, rel, root_path):
    """A ?board= seed writes only that board's subtree; every depth-2 board
    is still prefetched, unconsumed prefetches stay in the final seen set."""
    seed = f"https://smf.example/{rel}"
    oracle = run_reference_smf(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / "sub"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    paths = {tuple(r["path"]) for r in res.items().collect()}
    assert paths and all(p[: len(root_path)] == root_path for p in paths)


def test_topic_seed_crawls_only_thread(spark, server, tmp_path):
    """A ?topic= seed resolves its board from the linktree breadcrumbs and
    writes just that thread; page 1 is consumed from the probe cache."""
    seed = "https://smf.example/index.php?topic=1201.0"
    oracle = run_reference_smf(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / "tseed"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    items = res.items().orderBy("ord").collect()
    assert items[0]["type"] == "thread"
    assert tuple(items[0]["path"]) == ("1", "12", "1201")
    assert not any(r["type"] == "board" for r in items)
    assert not any(r["seen_key"] == seed for r in res.seen().collect())


def test_category_fragment_seed_degrades_to_root(spark, server, tmp_path):
    """An index.php#cN category seed normalizes to the base URL inside the
    reference's fetching resolver, so it crawls the WHOLE site (quirk); the
    category page itself is consumed from the raw-seed probe entry."""
    seed = "https://smf.example/index.php#c2"
    oracle = run_reference_smf(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / "frag"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    paths = {tuple(r["path"]) for r in res.items().collect()}
    assert ("1",) in paths and ("2",) in paths  # full site
    assert not any(r["seen_key"] == seed for r in res.seen().collect())
