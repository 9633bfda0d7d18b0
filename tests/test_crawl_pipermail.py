"""End-to-end: Pipermail crawls vs the sequential reference simulation."""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures.pipermail import SyntheticPipermail
from forum_dl_spark.oracle.refsim_pipermail import run_reference_pipermail


@pytest.fixture(scope="module")
def server():
    return SyntheticPipermail(seed=42)


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
        assert got["creation_time"] == want.creation_time
        assert got["content"] == want.content


def test_board_mode_zero_posts(spark, server, tmp_path):
    seed = "https://pm.example/pipermail/mylist"
    oracle = run_reference_pipermail(server, seed)
    crawl = run_crawl(spark, server, seed, str(tmp_path / "pm_board"), CrawlConfig())
    _assert_match(crawl, oracle)
    # posts fetch = the already-visited period page → zero posts (quirk)
    assert crawl.items().filter("type='post'").count() == 0
    assert crawl.items().filter("type='thread'").count() > 0


def test_root_seed_crawls_all_lists(spark, tmp_path):
    """A /mailman/listinfo seed falls through node_from_url to the root
    (pipermail.py:162): the registration walk fetches the listinfo registry
    plus one listinfo page per list (pipermail.py:186-197), then every
    board is written in registration order (each with the zero-posts
    quirk)."""
    srv = SyntheticPipermail(seed=42, lists=("alpha", "mylist"))
    seed = "https://pm.example/mailman/listinfo"
    oracle = run_reference_pipermail(srv, seed)
    crawl = run_crawl(spark, srv, seed, str(tmp_path / "pm_root"), CrawlConfig())
    _assert_match(crawl, oracle)
    boards = [i for i in oracle.items if i.type == "board"]
    assert [b.path for b in boards] == [(), ("alpha",), ("mylist",)]
    assert not any(i.type == "post" for i in oracle.items)
    # registration fetches (registry + 2 listinfo pages) precede every
    # archive-index fetch in the trace
    first_idx = min(
        i for i, (u, _) in enumerate(oracle.trace) if "/pipermail/" in u
    )
    assert sum("listinfo" in u for u, _ in oracle.trace[:first_idx]) >= 3


def test_listinfo_list_seed_is_undetectable(spark, server, tmp_path):
    """/mailman/listinfo/<list> matches NO pipermail _detect branch
    (pipermail.py:66-112 checks only the last/penultimate path segments
    for 'pipermail'/'mailman'; here they are 'listinfo'/'<list>') — the
    reference raises ExtractorNotFoundError before node_from_url's
    listinfo branch (pipermail.py:152-157) can ever run. That branch is
    reachable only through a redirect-resolved URL."""
    seed = "https://pm.example/mailman/listinfo/mylist"
    with pytest.raises(ValueError, match="no engine detected"):
        run_crawl(spark, server, seed, str(tmp_path / "pm_li"), CrawlConfig())


def test_period_url_seed_crawls_board(spark, server, tmp_path):
    """A /pipermail/<list>/<period> seed resolves to the BOARD
    (pipermail.py:149-150 — parts[-3]=='pipermail' → find_board of
    parts[-2]); the whole board is crawled, not just that period."""
    seed = "https://pm.example/pipermail/mylist/2021-January"
    oracle = run_reference_pipermail(server, seed)
    crawl = run_crawl(spark, server, seed, str(tmp_path / "pm_period"), CrawlConfig())
    _assert_match(crawl, oracle)
    assert len({i.path for i in oracle.items if i.type == "thread"}) > 2


def test_threadhtml_seed_first_thread_posts_quirk(spark, server, tmp_path):
    """A thread.html seed resolves to the board (pipermail.py:146-147).
    The probed period page is one-shot CONSUMED by the board crawl
    (deleted from the cache without entering past_requests,
    session.py:105-111 vs 145-148) — so the FIRST thread's posts read
    re-fetches it for real and that thread alone gets posts; every later
    thread hits AlreadyVisitedError (zero posts, the board-mode quirk)."""
    seed = "https://pm.example/pipermail/mylist/2021-January/thread.html"
    oracle = run_reference_pipermail(server, seed)
    crawl = run_crawl(spark, server, seed, str(tmp_path / "pm_th"), CrawlConfig())
    _assert_match(crawl, oracle)
    # the period page appears TWICE in the trace: detection probe +
    # the first thread's posts re-fetch
    assert [u for u, _ in oracle.trace].count(seed) == 2
    posts = [i for i in oracle.items if i.type == "post"]
    assert posts, "first thread must have posts"
    first_thread = next(i for i in oracle.items if i.type == "thread")
    assert {p.path for p in posts} == {first_thread.path}


def test_thread_mode_longid_replay(spark, server, tmp_path):
    seed = "https://pm.example/pipermail/mylist/2021-January/1001.html"
    oracle = run_reference_pipermail(server, seed)
    crawl = run_crawl(spark, server, seed, str(tmp_path / "pm_thread"), CrawlConfig())
    _assert_match(crawl, oracle)
    posts = [i for i in oracle.items if i.type == "post"]
    assert posts and posts[0].subpath == ("1001",)  # root subpath quirk
    # the quote-strip substitution ran (pipermail.py:332)
    assert all("<i>" not in (p.content or "") for p in posts)


def test_threadhtml_seed_resume_bit_identical(spark, server, tmp_path):
    """Kill-and-resume across the evict-aware gate: a thread.html-seeded
    crawl stopped after its first superstep resumes to EXACTLY the
    uninterrupted run (the step-0 seen delta persists the probe's evict
    flag, so the first thread's one-shot refetch still happens)."""
    seed = "https://pm.example/pipermail/mylist/2021-January/thread.html"
    full = run_crawl(spark, server, seed, str(tmp_path / "pm_full"), CrawlConfig())
    part = run_crawl(spark, server, seed, str(tmp_path / "pm_part"),
                     CrawlConfig(max_supersteps=2))
    from forum_dl_spark.crawl import resume_crawl

    res = resume_crawl(spark, server, str(tmp_path / "pm_part"))
    trace = lambda c: [
        (r["url"], r["params"] or "")
        for r in c.pages().orderBy("ord", "attempt").collect()
    ]
    assert trace(res) == trace(full)
    assert {(r["seen_key"], r["status"]) for r in res.seen().collect()} == {
        (r["seen_key"], r["status"]) for r in full.seen().collect()
    }
