"""Multi-seed crawls.

Two modes:
- run_crawl_multi: reference semantics — a fresh session (fresh seen set)
  per seed URL (forumdl.py:15–31);
- run_crawl_shared: beyond-reference scale mode — ONE frontier + ONE seen
  set over all seeds, per-host politeness fairness, per-seed ord prefix
  so each seed's subtree ordering matches its standalone run."""

from __future__ import annotations

import pytest

from forum_dl_spark.crawl import (CrawlConfig, run_crawl, run_crawl_multi,
                                  run_crawl_shared)
from forum_dl_spark.fixtures.discourse import SyntheticDiscourse
from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb
from forum_dl_spark.fixtures.remap import MultiHost as _MultiHost


def _trace(res):
    return [
        (r["url"], r["params"] or "")
        for r in res.pages().orderBy("ord", "attempt").collect()
    ]


def test_multi_seed_equals_independent_runs(spark, tmp_path):
    phpbb = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    disc = SyntheticDiscourse(seed=42, n_cats=1, n_subcats=1, n_topics=2,
                              max_posts=10)
    srv = _MultiHost(phpbb, disc)
    seeds = ["https://phpbb.example/", "https://forum.example/"]
    multi = run_crawl_multi(spark, srv, seeds, str(tmp_path / "multi"),
                            CrawlConfig())
    assert [m.engine for m in multi] == ["phpbb", "discourse"]
    for i, seed in enumerate(seeds):
        solo = run_crawl(spark, srv, seed, str(tmp_path / f"solo{i}"),
                         CrawlConfig())
        assert _trace(multi[i]) == _trace(solo)
        assert multi[i].seen().count() == solo.seen().count()


def test_same_seed_twice_gets_fresh_seen_set(spark, tmp_path):
    srv = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    seeds = ["https://phpbb.example/"] * 2
    multi = run_crawl_multi(spark, srv, seeds, str(tmp_path / "twice"),
                            CrawlConfig())
    # fresh seen set per seed: the second crawl refetches everything
    assert _trace(multi[0]) == _trace(multi[1])
    assert multi[0].pages().count() > 0


# --- shared-frontier mode ---------------------------------------------------


def _seed_items(res, strip_prefix: bool):
    """(type, path, url, content, per-seed ord) keyed by 8-hex seed index."""
    out: dict[str, list] = {}
    for r in res.items().orderBy("ord").collect():
        o = r["ord"]
        seed, rest = (o[:8], o[8:]) if strip_prefix else ("-", o)
        out.setdefault(seed, []).append(
            (r["type"], tuple(r["path"] or ()), r["url"], r["content"], rest)
        )
    return out


def test_shared_frontier_matches_per_seed_runs(spark, tmp_path):
    """Disjoint hosts: the shared crawl's items, split by seed prefix and
    with the prefix stripped, are EXACTLY each standalone run's items —
    same content, same per-seed DFS order."""
    phpbb = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    disc = SyntheticDiscourse(seed=42, n_cats=1, n_subcats=1, n_topics=2,
                              max_posts=10)
    srv = _MultiHost(phpbb, disc)
    seeds = ["https://phpbb.example/", "https://forum.example/"]
    shared = run_crawl_shared(spark, srv, seeds, str(tmp_path / "shared"))
    got = _seed_items(shared, strip_prefix=True)
    assert sorted(got) == ["00000000", "00000001"]
    for i, seed in enumerate(seeds):
        solo = run_crawl(spark, srv, seed, str(tmp_path / f"ssolo{i}"),
                         CrawlConfig())
        assert got[f"{i:08x}"] == _seed_items(solo, strip_prefix=False)["-"]
    # one shared seen set: no URL fetched twice across seeds
    fetched = [
        (r["url"], r["params"] or "")
        for r in shared.pages().filter("kind != 'probe'").collect()
    ]
    assert len(fetched) == len(set(fetched))


def test_shared_frontier_dedups_duplicate_seed(spark, tmp_path):
    """The same seed twice collapses at seeding time: one crawl's worth of
    fetches and items (contrast run_crawl_multi, which refetches)."""
    srv = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    seeds = ["https://phpbb.example/"] * 2
    shared = run_crawl_shared(spark, srv, seeds, str(tmp_path / "sdup"))
    solo = run_crawl(spark, srv, seeds[0], str(tmp_path / "sdup_solo"),
                     CrawlConfig())
    assert _trace(shared) == _trace(solo)
    assert (_seed_items(shared, strip_prefix=True)["00000000"]
            == _seed_items(solo, strip_prefix=False)["-"])


def test_shared_frontier_per_host_fairness(spark, tmp_path):
    """A per-host budget caps EACH host per wave — one big host cannot
    starve the other seed's host out of a shared wave."""
    phpbb = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    disc = SyntheticDiscourse(seed=42, n_cats=1, n_subcats=1, n_topics=2,
                              max_posts=10)
    srv = _MultiHost(phpbb, disc)
    seeds = ["https://phpbb.example/", "https://forum.example/"]
    shared = run_crawl_shared(
        spark, srv, seeds, str(tmp_path / "fair"), CrawlConfig(host_budget=2)
    )
    from urllib.parse import urlparse
    from collections import Counter

    per_wave_host = Counter(
        (r["superstep"], urlparse(r["url"]).netloc)
        for r in shared.pages().filter("kind != 'probe'").collect()
    )
    assert max(per_wave_host.values()) <= 2
    # both hosts appear in the earliest shared wave
    first_wave = min(s for s, _ in per_wave_host)
    hosts_in_first = {h for s, h in per_wave_host if s == first_wave}
    assert hosts_in_first == {"phpbb.example", "forum.example"}


def test_shared_frontier_with_hackernews_hooked_engine(spark, tmp_path):
    """Round-4 ask: hooked engines join the shared frontier. A phpBB seed
    and a full-scan HN seed share one frontier/seen set; HN's driver-hook
    waves (descending id scan via post_wave_shared) and trace
    reconstruction (finalize_shared) carry the seed's ord prefix, so each
    seed's subtree — items AND fetch trace — is bit-identical to its
    standalone run."""
    from forum_dl_spark.fixtures.hackernews import SyntheticHackerNews

    phpbb = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    hn = SyntheticHackerNews(seed=42, n_items=60)
    srv = _MultiHost(phpbb, hn)
    seeds = ["https://phpbb.example/", "https://news.ycombinator.com/"]
    shared = run_crawl_shared(spark, srv, seeds, str(tmp_path / "hn_shared"))
    got = _seed_items(shared, strip_prefix=True)
    assert sorted(got) == ["00000000", "00000001"]
    shared_pages = [
        (r["ord"][:8], r["ord"][8:], r["url"], r["params"] or "")
        for r in shared.pages().orderBy("ord", "attempt").collect()
    ]
    for i, seed in enumerate(seeds):
        solo = run_crawl(spark, srv, seed, str(tmp_path / f"hsolo{i}"),
                         CrawlConfig())
        assert got[f"{i:08x}"] == _seed_items(solo, strip_prefix=False)["-"]
        want_trace = [
            (r["ord"], r["url"], r["params"] or "")
            for r in solo.pages().orderBy("ord", "attempt").collect()
        ]
        got_trace = [
            (o, u, p) for pre, o, u, p in shared_pages if pre == f"{i:08x}"
        ]
        assert got_trace == want_trace
        # shared seen set covers the solo run's (HN walk evictions incl.)
        solo_seen = {(r["seen_key"], r["status"]) for r in solo.seen().collect()}
        shared_seen = {(r["seen_key"], r["status"]) for r in shared.seen().collect()}
        assert solo_seen <= shared_seen


def test_shared_frontier_hackernews_resume(spark, tmp_path):
    """Kill-and-resume holds for hooked shared crawls: a shared phpBB+HN
    crawl killed mid-scan resumes bit-identical (the per-seed hook
    contexts travel in meta.json, the per-seed scan state in its own
    file, and finalize runs once on the completed run)."""
    import dataclasses

    from forum_dl_spark.crawl import resume_crawl
    from forum_dl_spark.fixtures.hackernews import SyntheticHackerNews

    phpbb = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    hn = SyntheticHackerNews(seed=42, n_items=40)
    srv = _MultiHost(phpbb, hn)
    seeds = ["https://phpbb.example/", "https://news.ycombinator.com/"]
    full = run_crawl_shared(spark, srv, seeds, str(tmp_path / "hr_full"))
    kill_wd = str(tmp_path / "hr_kill")
    run_crawl_shared(spark, srv, seeds, kill_wd,
                     CrawlConfig(max_supersteps=4))
    resumed = resume_crawl(spark, srv, kill_wd)

    def _tables(res):
        trace = [(r["ord"], r["url"], r["params"] or "")
                 for r in res.pages().orderBy("ord", "attempt").collect()]
        seen = {(r["seen_key"], r["status"]) for r in res.seen().collect()}
        items = _seed_items(res, strip_prefix=True)
        return trace, seen, items

    assert _tables(resumed) == _tables(full)


def test_shared_frontier_hackernews_null_abort(spark, tmp_path):
    """The HN null-abort quirk (a deleted item ends the scan) survives the
    shared frontier: the shared run's HN subtree equals the standalone
    aborted run, and the phpBB seed is untouched by the truncation."""
    from forum_dl_spark.fixtures.hackernews import SyntheticHackerNews

    phpbb = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    hn = SyntheticHackerNews(seed=42, n_items=60, allow_nulls=True)
    srv = _MultiHost(phpbb, hn)
    seeds = ["https://news.ycombinator.com/", "https://phpbb.example/"]
    shared = run_crawl_shared(spark, srv, seeds, str(tmp_path / "hn_null"))
    got = _seed_items(shared, strip_prefix=True)
    for i, seed in enumerate(seeds):
        solo = run_crawl(spark, srv, seed, str(tmp_path / f"nsolo{i}"),
                         CrawlConfig())
        assert got[f"{i:08x}"] == _seed_items(solo, strip_prefix=False)["-"]


def test_cli_shared_frontier_flag(spark, tmp_path):
    """--shared-frontier routes a multi-URL invocation through ONE shared
    crawl and writes one combined, ord-sorted export."""
    import json

    from forum_dl_spark.cli import build_parser, download

    phpbb = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    disc = SyntheticDiscourse(seed=42, n_cats=1, n_subcats=1, n_topics=2,
                              max_posts=10)
    srv = _MultiHost(phpbb, disc)
    out = str(tmp_path / "combined.jsonl")
    args = build_parser().parse_args(
        ["https://phpbb.example/", "https://forum.example/",
         "--shared-frontier", "-f", "jsonl", "-o", out,
         "--workdir", str(tmp_path / "wd")]
    )
    written = download(args.urls, args, server=srv, spark=spark)
    assert written == [out]
    lines = [json.loads(r["value"]) for r in spark.read.text(out).collect()]
    hosts = {
        l["item"]["url"].split("/")[2]
        for l in lines
        if (l["item"]["url"] or "").startswith("http")
    }
    assert {"phpbb.example", "forum.example"} <= hosts


def test_shared_frontier_mail_engines_root_seeds(spark, tmp_path):
    """Mixed MAIL engines under one shared frontier: a HyperKitty root seed
    (the archive-index registration walk) and a Pipermail root seed (the
    listinfo registration walk) interleave in one frontier/seen set, and
    each seed's items equal its standalone run — the new root-seed modes
    compose with shared mode unchanged."""
    from forum_dl_spark.fixtures.hyperkitty import SyntheticHyperkitty
    from forum_dl_spark.fixtures.pipermail import SyntheticPipermail

    hk = SyntheticHyperkitty(seed=42, lists=("alpha.example", "beta.example"),
                             lists_per_page=2, n_threads=2)
    pm = SyntheticPipermail(seed=42, lists=("alpha", "mylist"))
    srv = _MultiHost(hk, pm)
    seeds = ["https://hk.example/", "https://pm.example/mailman/listinfo"]
    shared = run_crawl_shared(spark, srv, seeds, str(tmp_path / "mshared"))
    got = _seed_items(shared, strip_prefix=True)
    assert sorted(got) == ["00000000", "00000001"]
    for i, seed in enumerate(seeds):
        solo = run_crawl(spark, srv, seed, str(tmp_path / f"msolo{i}"),
                         CrawlConfig())
        assert got[f"{i:08x}"] == _seed_items(solo, strip_prefix=False)["-"]
    fetched = [
        (r["url"], r["params"] or "")
        for r in shared.pages().filter("kind != 'probe'").collect()
    ]
    assert len(fetched) == len(set(fetched))


def test_shared_frontier_three_engine_families(spark, tmp_path):
    """Round-4 verdict ask #7: ONE shared frontier across all three engine
    families at once — phpBB (generic CSS scan), Hacker News (hooked
    driver-wave JSON scan) and HyperKitty (mail archive-index walk) — and
    each seed's subtree is bit-identical to its standalone run on items
    AND fetch trace, with the shared seen set covering each solo set."""
    from forum_dl_spark.fixtures.hackernews import SyntheticHackerNews
    from forum_dl_spark.fixtures.hyperkitty import SyntheticHyperkitty

    phpbb = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    hn = SyntheticHackerNews(seed=42, n_items=60)
    hk = SyntheticHyperkitty(seed=42, lists=("alpha.example",),
                             lists_per_page=2, n_threads=2)
    srv = _MultiHost(phpbb, hn, hk)
    seeds = [
        "https://phpbb.example/",
        "https://news.ycombinator.com/",
        "https://hk.example/",
    ]
    shared = run_crawl_shared(spark, srv, seeds, str(tmp_path / "tri"))
    got = _seed_items(shared, strip_prefix=True)
    assert sorted(got) == ["00000000", "00000001", "00000002"]
    shared_pages = [
        (r["ord"][:8], r["ord"][8:], r["url"], r["params"] or "")
        for r in shared.pages().orderBy("ord", "attempt").collect()
    ]
    shared_seen = {(r["seen_key"], r["status"]) for r in shared.seen().collect()}
    for i, seed in enumerate(seeds):
        solo = run_crawl(spark, srv, seed, str(tmp_path / f"tsolo{i}"),
                         CrawlConfig())
        assert got[f"{i:08x}"] == _seed_items(solo, strip_prefix=False)["-"]
        want_trace = [
            (r["ord"], r["url"], r["params"] or "")
            for r in solo.pages().orderBy("ord", "attempt").collect()
        ]
        got_trace = [
            (o, u, p) for pre, o, u, p in shared_pages if pre == f"{i:08x}"
        ]
        assert got_trace == want_trace
        solo_seen = {(r["seen_key"], r["status"]) for r in solo.seen().collect()}
        assert solo_seen <= shared_seen
