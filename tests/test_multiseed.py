"""Multi-seed crawls: reference semantics — a fresh session (fresh seen
set) per seed URL (forumdl.py:15–31)."""

from __future__ import annotations

from forum_dl_spark.crawl import CrawlConfig, run_crawl, run_crawl_multi
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
