"""End-to-end: HyperKitty crawl vs the sequential reference simulation."""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.hyperkitty import SyntheticHyperkitty
from forum_dl_spark.oracle.refsim_hyperkitty import run_reference_hyperkitty

SEED_URL = "https://hk.example/list/mylist.example/"


def test_hyperkitty(spark, tmp_path):
    srv = SyntheticHyperkitty(seed=42)
    oracle = run_reference_hyperkitty(srv, SEED_URL)
    crawl = run_crawl(spark, srv, SEED_URL, str(tmp_path / "hk"), CrawlConfig())

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
        assert got["origin"] == want.origin
        assert got["title"] == want.title
        assert got["author"] == want.author
        assert got["creation_time"] == want.creation_time
        assert got["content"] == want.content

    # root posts have empty subpaths; the chunk-shared time/link bug is
    # exercised (replies in one chunk share the first one's url)
    posts = [i for i in oracle.items if i.type == "post"]
    assert any(p.subpath == () for p in posts)
    chunk_urls = [p.url for p in posts if p.subpath]
    assert len(set(chunk_urls)) < len(chunk_urls)


def test_postorius_variant_detects_and_matches(spark, tmp_path):
    """Postorius front-end (reference detect_postorius,
    hyperkitty.py:93-106): detection resolves the same archive base from the
    second a.nav-link and the crawl is identical to the plain variant."""
    from forum_dl_spark.crawl.detect import detect_engine

    plain = SyntheticHyperkitty(seed=42)
    post = SyntheticHyperkitty(seed=42, postorius=True)
    det = detect_engine(post, SEED_URL)
    assert det is not None and det.engine == "hyperkitty"
    assert det.base_url == detect_engine(plain, SEED_URL).base_url

    ref = run_crawl(spark, plain, SEED_URL, str(tmp_path / "plain"), CrawlConfig())
    got = run_crawl(spark, post, SEED_URL, str(tmp_path / "post"), CrawlConfig())
    trace = lambda c: [
        (r["url"], r["params"] or "")
        for r in c.pages().orderBy("ord", "attempt").collect()
    ]
    assert trace(got) == trace(ref)
    items = lambda c: [
        (r["ord"], r["type"], r["url"], r["content"])
        for r in c.items().orderBy("ord").collect()
    ]
    assert items(got) == items(ref)
