"""Incremental recrawl + snapshot diff (round-4 verdict ask #6).

``recrawl_reopen`` re-opens already-seen URLs on a finished crawl and
appends supersteps; ``CrawlResult.diff(a, b)`` is the Iceberg-style
incremental read between two snapshots. The pin: re-crawling a fixture
where exactly ONE post of ONE thread was edited yields exactly that post
row in the diff — nothing else — and every pre-recrawl snapshot stays
bit-identical under ``as_of``.
"""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import CrawlConfig, recrawl_reopen, run_crawl
from forum_dl_spark.fixtures import SyntheticDiscourse

SEED_URL = "https://forum.example/"
FIXTURE_KW = dict(
    seed=7, n_cats=1, n_subcats=1, n_topics=2, max_posts=25,
    topics_per_page=2, duplicate_topic=False,
)
TID = 101001  # board 101, topic 1
EDIT_PID = TID * 100 + 1  # post_number 1 — embedded in the thread page body
THREAD_KEY = f"https://forum.example/t/topic-{TID}/{TID}.json"


@pytest.fixture(scope="module")
def recrawled(spark, tmp_path_factory):
    srv = SyntheticDiscourse(**FIXTURE_KW)
    wd = str(tmp_path_factory.mktemp("recrawl") / "run")
    res1 = run_crawl(spark, srv, SEED_URL, wd, CrawlConfig())
    k1 = res1.supersteps - 1
    srv.edited_posts[EDIT_PID] = (  # the ONLY change between the crawls
        "<p>edited content, post-recrawl revision</p>"
    )
    res2 = recrawl_reopen(spark, srv, wd, [THREAD_KEY])
    k2 = res2.supersteps - 1
    return res1, k1, res2, k2


def test_diff_is_exactly_the_edited_post(recrawled):
    _, k1, res2, k2 = recrawled
    rows = res2.diff(k1, k2).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["change"] == "changed"
    assert r["type"] == "post"
    assert r["url"] == f"https://forum.example/t/topic-{TID}/{TID}/1"
    assert r["superstep_b"] > r["superstep_a"]


def test_diff_same_snapshot_is_empty(recrawled):
    _, k1, res2, _ = recrawled
    assert res2.diff(k1, k1).count() == 0


def test_pre_recrawl_snapshot_unchanged(recrawled):
    res1, k1, res2, _ = recrawled
    old = res2.as_of(k1)
    assert old.pages().count() == res1.as_of(k1).pages().count()
    assert {tuple(r) for r in old.seen().collect()} == {
        tuple(r) for r in res1.as_of(k1).seen().collect()
    }


def test_unchanged_children_not_refetched(recrawled):
    # the re-opened thread page re-emits its post-chunk candidates; their
    # seen keys are unchanged, so the gate must drop them — the recrawl
    # fetches exactly ONE page (the reopened thread page)
    _, k1, res2, _ = recrawled
    new_pages = res2.pages().filter(f"superstep > {k1}").collect()
    assert [p["url"] for p in new_pages] == [THREAD_KEY]


def test_reopen_unknown_key_raises(spark, tmp_path):
    srv = SyntheticDiscourse(**FIXTURE_KW)
    wd = str(tmp_path / "run")
    run_crawl(spark, srv, SEED_URL, wd, CrawlConfig())
    with pytest.raises(ValueError, match="never appeared"):
        recrawl_reopen(spark, srv, wd, ["https://forum.example/nope.json"])
