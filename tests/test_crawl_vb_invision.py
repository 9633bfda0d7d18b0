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
