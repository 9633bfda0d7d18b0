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
