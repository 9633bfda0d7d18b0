"""Politeness budgets, robots gates, bloom prefilter, and kill-resume.

Politeness/robots are north-rule additions (absent in the reference —
SURVEY.md §4); the key invariant is schedule-invariance: budgets change
WHEN pages are fetched, never the ord-sorted final tables."""

from __future__ import annotations

import numpy as np
import pytest

from forum_dl_spark.crawl import CrawlConfig, resume_crawl, run_crawl
from forum_dl_spark.fixtures import SyntheticDiscourse
from forum_dl_spark.oracle import run_reference_discourse

SEED_URL = "https://forum.example/"


@pytest.fixture(scope="module")
def server():
    return SyntheticDiscourse(seed=42, n_cats=2, n_subcats=1, n_topics=2, max_posts=25)


@pytest.fixture(scope="module")
def baseline(spark, server, tmp_path_factory):
    wd = tmp_path_factory.mktemp("pol") / "base"
    return run_crawl(spark, server, SEED_URL, str(wd), CrawlConfig())


def _tables(res):
    pages = sorted(
        (r["url"], r["params"] or "", r["ord"]) for r in res.pages().collect()
    )
    items = sorted((r["ord"], r["type"], r["url"]) for r in res.items().collect())
    seen = sorted((r["seen_key"], r["status"]) for r in res.seen().collect())
    return pages, items, seen


def test_budget_is_schedule_invariant(spark, server, baseline, tmp_path):
    """A tight per-host budget stretches the crawl over more supersteps but
    yields bit-identical final tables (ord is data, not scheduling)."""
    res = run_crawl(
        spark, server, SEED_URL, str(tmp_path / "budget"),
        CrawlConfig(host_budget=3),
    )
    assert res.supersteps > baseline.supersteps
    assert _tables(res) == _tables(baseline)


def test_host_budgets_table_and_robots(spark, server, tmp_path):
    """Robots prefixes drop candidates before they enter the frontier."""
    cfg = CrawlConfig(
        host_budgets=[
            {
                "host": "forum.example",
                "max_fetches_per_superstep": 100,
                "robots_disallow": ["/t/"],  # block all thread pages
            }
        ]
    )
    res = run_crawl(spark, server, SEED_URL, str(tmp_path / "robots"), cfg)
    urls = [r["url"] for r in res.pages().collect()]
    # board listings crawled, thread JSON pages never fetched
    assert any("/c/" in u for u in urls)
    assert not any("/t/" in u for u in urls)
    assert res.items().filter("type = 'post'").count() == 0
    assert res.items().filter("type = 'thread'").count() > 0


def test_bloom_prefilter_equivalent(spark, server, baseline, tmp_path):
    res = run_crawl(
        spark, server, SEED_URL, str(tmp_path / "bloom"),
        CrawlConfig(use_bloom=True),
    )
    assert _tables(res) == _tables(baseline)


def test_bloom_no_false_negatives_property():
    from forum_dl_spark.crawl.bloom import K_HASHES, _positions, bits_for

    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    n_bits = bits_for(len(keys))
    bits = np.zeros(n_bits, dtype=bool)
    for pos in _positions(keys, n_bits):
        bits[pos] = True
    # every inserted key must hit (no false negatives)
    hit = np.ones(len(keys), dtype=bool)
    for pos in _positions(keys, n_bits):
        hit &= bits[pos]
    assert hit.all()
    # false-positive rate on fresh keys stays near the analytic bound
    fresh = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    fp = np.ones(len(fresh), dtype=bool)
    for pos in _positions(fresh, n_bits):
        fp &= bits[pos]
    from forum_dl_spark.crawl.bloom import expected_fp_rate

    assert fp.mean() < max(4 * expected_fp_rate(len(keys), n_bits), 0.02)


def test_kill_and_resume_bit_identical(spark, server, baseline, tmp_path):
    """north_rule: a killed run resumes to bit-identical final tables."""
    wd = str(tmp_path / "killed")
    run_crawl(spark, server, SEED_URL, wd, CrawlConfig(max_supersteps=3))
    res = resume_crawl(spark, server, wd)
    assert _tables(res) == _tables(baseline)


def test_oracle_still_matches_under_budget(spark, server, tmp_path):
    """Budgeted crawl still matches the reference after the ord sort."""
    oracle = run_reference_discourse(server, SEED_URL)
    res = run_crawl(
        spark, server, SEED_URL, str(tmp_path / "ob"),
        CrawlConfig(host_budget=4),
    )
    got = [
        (r["url"], r["params"] or "")
        for r in res.pages().orderBy("ord", "attempt").collect()
    ]
    assert got == oracle.trace


def test_invalid_config_rejected(spark, server, tmp_path):
    with pytest.raises(ValueError, match="host_budget"):
        run_crawl(spark, server, SEED_URL, str(tmp_path / "bad"),
                  CrawlConfig(host_budget=0))
    with pytest.raises(ValueError, match="max_fetches_per_superstep"):
        run_crawl(
            spark, server, SEED_URL, str(tmp_path / "bad2"),
            CrawlConfig(host_budgets=[
                {"host": "forum.example", "max_fetches_per_superstep": 0,
                 "robots_disallow": []}
            ]),
        )


def test_resume_without_checkpoint_is_clear_error(spark, server, tmp_path):
    import json
    from pathlib import Path

    wd = tmp_path / "empty"
    (wd / "steps").mkdir(parents=True)
    (wd / "meta.json").write_text(json.dumps(
        {"seed_url": SEED_URL, "base_url": SEED_URL, "engine": "discourse",
         "config": {}}))
    with pytest.raises(ValueError, match="_COMPLETE"):
        resume_crawl(spark, server, str(wd))


def test_resume_restores_full_config(spark, server, tmp_path):
    """Robots rules persist through meta.json: a bare resume must not
    enqueue previously-disallowed URLs."""
    cfg = CrawlConfig(
        max_supersteps=2,
        host_budgets=[{"host": "forum.example",
                       "max_fetches_per_superstep": 100,
                       "robots_disallow": ["/t/"]}],
    )
    wd = str(tmp_path / "rr")
    run_crawl(spark, server, SEED_URL, wd, cfg)
    res = resume_crawl(spark, server, wd)  # no explicit config
    urls = [r["url"] for r in res.pages().collect()]
    assert not any("/t/" in u for u in urls)


def _long_server():
    from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb

    # deep sequential board pagination: 1 topic per page -> the page chain
    # alone is ~n_topics supersteps
    return SyntheticPhpbb(seed=7, n_cats=1, n_subs=0, n_topics=30,
                          max_posts=1, topics_per_page=1, posts_per_page=5)


def test_long_crawl_compaction_bounded_and_identical(spark, tmp_path):
    from forum_dl_spark.crawl.superstep import _seen_paths_sofar

    srv = _long_server()
    seed = "https://phpbb.example/"
    plain = run_crawl(spark, srv, seed, str(tmp_path / "plain"),
                      CrawlConfig(compact_every=0))
    comp = run_crawl(spark, srv, seed, str(tmp_path / "comp"),
                     CrawlConfig(compact_every=5))
    assert comp.supersteps > 20, "fixture must produce a long crawl"
    assert _tables(comp) == _tables(plain)
    # the anti-join read set is bounded by the compaction interval...
    from pathlib import Path

    n_paths = len(_seen_paths_sofar(Path(comp.workdir), comp.supersteps))
    assert n_paths <= 5 + 1
    # ...while the uncompacted run reads one delta per step
    assert len(_seen_paths_sofar(Path(plain.workdir), plain.supersteps)) > 20


def test_resume_on_compacted_run_bit_identical(spark, tmp_path):
    srv = _long_server()
    seed = "https://phpbb.example/"
    full = run_crawl(spark, srv, seed, str(tmp_path / "full"),
                     CrawlConfig(compact_every=5))
    wd = str(tmp_path / "killed")
    run_crawl(spark, srv, seed, wd,
              CrawlConfig(compact_every=5, max_supersteps=12))
    res = resume_crawl(spark, srv, wd)
    assert _tables(res) == _tables(full)


def test_incremental_bloom_long_crawl_identical(spark, tmp_path):
    srv = _long_server()
    seed = "https://phpbb.example/"
    plain = run_crawl(spark, srv, seed, str(tmp_path / "nb"),
                      CrawlConfig(compact_every=5))
    bloomed = run_crawl(spark, srv, seed, str(tmp_path / "wb"),
                        CrawlConfig(compact_every=5, use_bloom=True))
    assert _tables(bloomed) == _tables(plain)


def test_fetch_robots_gates_crawl(spark, server, tmp_path):
    """fetch_robots=True pulls /robots.txt at crawl start and its Disallow
    prefixes gate the frontier like explicit host_budgets."""
    from forum_dl_spark.fixtures.remap import WithRobots

    srv = WithRobots(
        server,
        "User-agent: other\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /t/\nCrawl-delay: 0.5\n",
    )
    res = run_crawl(spark, srv, SEED_URL, str(tmp_path / "robots_auto"),
                    CrawlConfig(fetch_robots=True))
    urls = [r["url"] for r in res.pages().collect()]
    assert any("/c/" in u for u in urls)
    assert not any("/t/" in u for u in urls)
    # persisted into meta.json -> bare resume keeps the gate
    import json as _json
    from pathlib import Path as _Path

    meta = _json.loads((_Path(res.workdir) / "meta.json").read_text())
    hbs = meta["config"]["host_budgets"]
    assert any("/t/" in p for hb in hbs for p in hb["robots_disallow"])


def test_fetch_robots_absent_means_unrestricted(spark, server, baseline,
                                                tmp_path):
    """No robots.txt (fixture 404s it) -> identical crawl to baseline."""
    res = run_crawl(spark, server, SEED_URL, str(tmp_path / "robots_404"),
                    CrawlConfig(fetch_robots=True))
    assert _tables(res) == _tables(baseline)


def test_fetch_robots_parser():
    from forum_dl_spark.crawl.politeness import fetch_robots

    class _Srv:
        def get(self, url, params=None, attempt=0):
            assert url == "https://h.example/robots.txt"
            return 200, "text/plain", (
                b"# comment\nUser-agent: SpecialBot\nDisallow: /private/\n\n"
                b"User-agent: *\nDisallow: /a/\nDisallow: /b/\nCrawl-delay: 10\n"
            )

    rows = fetch_robots(_Srv(), ["h.example", "h.example"])
    assert rows == [{
        "host": "h.example",
        "max_fetches_per_superstep": 2**31 - 1,  # paced by crawl_delay
        "robots_disallow": ["/a/", "/b/"],
        "crawl_delay": 10.0,
    }]


def test_fetch_robots_agent_groups():
    """Group selection + agent matching follow urllib.robotparser: a group
    naming this crawler wins over '*'; the robots token must be a substring
    of the UA PRODUCT token (before '/'), so 'other-bot' never over-matches;
    consecutive User-agent lines share one rule group."""
    from forum_dl_spark.crawl.politeness import fetch_robots

    body = (
        b"User-agent: other-bot\nDisallow: /all/\n\n"
        b"User-agent: GoodBot\nUser-agent: forum-dl\nDisallow: /mine/\n"
        b"Crawl-delay: 2\n\n"
        b"User-agent: *\nDisallow: /star/\n"
    )

    class _Srv:
        def get(self, url, params=None, attempt=0):
            return 200, "text/plain", body

    named = fetch_robots(_Srv(), ["h"], user_agent="Forum-dl/0.3.0 (spark)")
    assert named[0]["robots_disallow"] == ["/mine/"]
    assert named[0]["crawl_delay"] == 2.0
    star = fetch_robots(_Srv(), ["h"], user_agent="SomethingElse/1.0")
    assert star[0]["robots_disallow"] == ["/star/"]
    assert star[0]["crawl_delay"] == 0.0


def test_effective_budgets_scaling():
    """Crawl-delay hosts get floor(measured_wall / delay) fetches per wave
    (min 1), capped by any explicit max_fetches_per_superstep."""
    from forum_dl_spark.crawl.politeness import effective_budgets

    hb = [{"host": "h", "max_fetches_per_superstep": 2**31 - 1,
           "robots_disallow": [], "crawl_delay": 10.0}]
    assert effective_budgets(hb, None)[0]["max_fetches_per_superstep"] == 1
    assert effective_budgets(hb, 35.0)[0]["max_fetches_per_superstep"] == 3
    capped = [{**hb[0], "max_fetches_per_superstep": 2}]
    assert effective_budgets(capped, 99.0)[0]["max_fetches_per_superstep"] == 2
    plain = [{"host": "h"}]  # defaults filled
    row = effective_budgets(plain, 1.0)[0]
    assert row["max_fetches_per_superstep"] == 2**31 - 1
    assert row["robots_disallow"] == [] and row["crawl_delay"] == 0.0


def test_effective_budgets_normalizes_and_merges_hosts():
    """Rows are keyed by the canonical port-stripped host (matching the
    frontier's parse_url HOST column) and duplicate-host rows merge to the
    strictest: min budget, union of disallow prefixes, max crawl-delay —
    http:// + https:// robots fetches of one host must not duplicate
    popped rows through budgeted_pop's join."""
    from forum_dl_spark.crawl.politeness import effective_budgets, host_key

    assert host_key("localhost:8765") == "localhost"
    assert host_key("user:pw@h.example:443") == "h.example"
    assert host_key("[::1]:8080") == "[::1]"
    assert host_key("h.example") == "h.example"

    rows = effective_budgets(
        [
            {"host": "h.example:443", "max_fetches_per_superstep": 5,
             "robots_disallow": ["/a/"], "crawl_delay": 0.0},
            {"host": "h.example", "max_fetches_per_superstep": 3,
             "robots_disallow": ["/a/", "/b/"], "crawl_delay": 10.0},
        ],
        35.0,
    )
    assert len(rows) == 1
    row = rows[0]
    assert row["host"] == "h.example"
    # delay budget floor(35/10)=3 equals the explicit min(5,3)
    assert row["max_fetches_per_superstep"] == 3
    assert row["robots_disallow"] == ["/a/", "/b/"]
    assert row["crawl_delay"] == 10.0


def test_crawl_delay_paces_waves(spark, server, baseline, tmp_path):
    """With Crawl-delay D, a host fetched k times in a wave must not see
    the next wave before k*D elapsed — so total wall >= D * fetches; the
    final tables stay bit-identical (pacing is scheduling, not data)."""
    import time as _time

    delay = 0.2
    cfg = CrawlConfig(host_budgets=[{
        "host": "forum.example", "robots_disallow": [], "crawl_delay": delay,
    }])
    t0 = _time.time()
    res = run_crawl(spark, server, SEED_URL, str(tmp_path / "paced"), cfg)
    elapsed = _time.time() - t0
    fetched = res.pages().filter("kind != 'probe'").count()
    assert elapsed >= delay * fetched - 0.1
    assert _tables(res) == _tables(baseline)
