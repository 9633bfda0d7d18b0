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
