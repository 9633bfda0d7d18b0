"""End-to-end: Spark Hypermail crawl vs the sequential reference.

Covers both entry modes and the reference's quirks: base-join thread URLs
(zero posts in board mode), detection-cache one-shot hits, and the
indentation stack-replay subpaths in thread mode."""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.hypermail import SyntheticHypermail
from forum_dl_spark.oracle.refsim_hypermail import run_reference_hypermail
from forum_dl_spark.spans import extract_spans


@pytest.fixture(scope="module")
def server():
    return SyntheticHypermail(seed=42, n_periods=2, n_threads=3, max_replies=6)


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
        assert got["content"] == want.content


def test_board_mode_zero_posts_quirk(spark, server, tmp_path):
    seed = "https://mail.example/archive/01/index.html"
    oracle = run_reference_hypermail(server, seed)
    crawl = run_crawl(spark, server, seed, str(tmp_path / "hm_board"), CrawlConfig())
    _assert_match(crawl, oracle)
    # thread URLs are joined against the base (hypermail.py:152) so every
    # posts fetch dies on the already-visited index: zero posts
    assert crawl.items().filter("type='post'").count() == 0
    assert crawl.items().filter("type='thread'").count() > 0


def test_thread_mode_stack_replay(spark, server, tmp_path):
    seed = "https://mail.example/archive/01/1001.html"
    oracle = run_reference_hypermail(server, seed)
    crawl = run_crawl(spark, server, seed, str(tmp_path / "hm_thread"), CrawlConfig())
    _assert_match(crawl, oracle)
    posts = [i for i in oracle.items if i.type == "post"]
    assert len(posts) > 2
    # span-sequence equality on the mail bodies
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in crawl.documents().collect()
    }
    for p in posts:
        want = [
            (s.kind, s.text, s.media_ref, s.offset)
            for s in extract_spans(p.content or "", p.origin)
        ]
        assert got[".".join(p.path + p.subpath)] == want
