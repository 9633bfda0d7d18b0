"""End-to-end: ProBoards crawl vs the sequential reference simulation."""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.proboards import SyntheticProboards
from forum_dl_spark.oracle.refsim_proboards import run_reference_proboards

SEED_URL = "https://synth.proboards.com/"


def test_proboards(spark, tmp_path):
    srv = SyntheticProboards(seed=42)
    oracle = run_reference_proboards(srv, SEED_URL)
    crawl = run_crawl(spark, srv, SEED_URL, str(tmp_path / "pb"), CrawlConfig())

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
        if want.type == "file":
            assert bytes(got["content_bytes"] or b"") == (want.content_bytes or b"")

    # missing-author fallback exercised ("" author, proboards.py:355-358)
    assert any(i.author == "" for i in oracle.items if i.type == "post")
    # the /threads/recent link never becomes a thread
    assert not any(i.path[-1] == "0" for i in oracle.items if i.type == "thread")


def test_subtree_seed_unsupported(spark, tmp_path):
    """The reference cannot resolve proboards board/thread seed URLs
    (node_from_url, proboards.py:283-322): only the root and category
    stubs are registered when it runs, so the thread branch's board-URL
    match never succeeds and the board branch compares path[-1] against
    the literal 'board' (crashing on root's empty path). A non-root seed
    must fail loudly, not silently crawl the whole site."""
    import pytest as _pytest

    from forum_dl_spark.fixtures.proboards import SyntheticProboards

    srv = SyntheticProboards(seed=42)
    with _pytest.raises(ValueError, match="only root seeds"):
        run_crawl(spark, srv, "https://synth.proboards.com/thread/1/x",
                  str(tmp_path / "pb_thread"), CrawlConfig())
    with _pytest.raises(ValueError, match="only root seeds"):
        run_crawl(spark, srv, "https://synth.proboards.com/board/2/general",
                  str(tmp_path / "pb_board"), CrawlConfig())
