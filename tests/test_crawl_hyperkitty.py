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
        assert got["origin"] == want.origin
        assert got["title"] == want.title
        assert got["author"] == want.author
        assert got["creation_time"] == want.creation_time
        assert got["content"] == want.content


def test_root_seed_crawls_all_lists(spark, tmp_path):
    """A base-URL seed resolves to the root board: the reference walks the
    paginated archive index (_fetch_lazy_subboards, hyperkitty.py:182-201),
    registering every list (a real list/<id> fetch each), then writes every
    board in registration order. All registration fetches precede all
    board-crawl fetches in the trace."""
    srv = SyntheticHyperkitty(
        seed=42, lists=("alpha.example", "beta.example", "gamma.example"),
        lists_per_page=2, n_threads=2,
    )
    seed = "https://hk.example/"
    oracle = run_reference_hyperkitty(srv, seed)
    crawl = run_crawl(spark, srv, seed, str(tmp_path / "hk_root"), CrawlConfig())
    _assert_match(crawl, oracle)

    # shape: root board item + one board item per list, in index order
    boards = [i for i in oracle.items if i.type == "board"]
    assert [b.path for b in boards] == [
        (), ("alpha.example",), ("beta.example",), ("gamma.example",)
    ]
    # the index walk (2 pages for 3 lists) + every list page precede every
    # latest/thread fetch in the trace
    latest_at = min(i for i, (u, _) in enumerate(oracle.trace) if "latest" in u)
    reg_urls = [u for u, _ in oracle.trace[:latest_at]]
    assert "https://hk.example/?page=2" in reg_urls
    assert sum("list/" in u for u in reg_urls) == 3


def test_thread_seed_crawls_only_thread(spark, tmp_path):
    """A /list/<b>/thread/<t>/ seed resolves to a Thread node
    (hyperkitty.py:138-153): only that thread's posts are written, no board
    objects; the node fetch's cache entry is consumed one-shot by the posts
    crawl (session.py:105-111), so the thread URL is traced but absent
    from the final seen set."""
    srv = SyntheticHyperkitty(seed=42)
    seed = "https://hk.example/list/mylist.example/thread/T2/"
    oracle = run_reference_hyperkitty(srv, seed)
    crawl = run_crawl(spark, srv, seed, str(tmp_path / "hk_thread"), CrawlConfig())
    _assert_match(crawl, oracle)

    types = [i.type for i in oracle.items]
    assert types[0] == "thread" and "board" not in types
    assert all(i.path == ("mylist.example", "T2") for i in oracle.items)
    # node fetch traced but evicted from seen by the one-shot consume
    assert any(u == seed for u, _ in oracle.trace)
    assert seed not in {k for k, _ in oracle.seen.items()}
    assert not any(r["seen_key"] == seed for r in crawl.seen().collect())


def test_thread_seed_no_trailing_slash(spark, tmp_path):
    """Without the trailing slash the node fetch IS the detection probe's
    cache key (normalize_url(append_slash=False)) — a should_cache hit, no
    second trace row — and the posts crawl's slash-normalized URL is a real
    fetch instead."""
    srv = SyntheticHyperkitty(seed=42)
    seed = "https://hk.example/list/mylist.example/thread/T1"
    oracle = run_reference_hyperkitty(srv, seed)
    crawl = run_crawl(spark, srv, seed, str(tmp_path / "hk_thread_ns"), CrawlConfig())
    _assert_match(crawl, oracle)
    # exactly one trace row for the probe key, one for the normalized URL
    assert [u for u, _ in oracle.trace if u == seed] == [seed]
    assert f"{seed}/" in [u for u, _ in oracle.trace]


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
