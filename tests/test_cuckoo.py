"""Cuckoo-filter seen sketch: filter invariants (no false negatives,
deletion, load/rebuild) and crawl-level bit-identity with the exact
anti-join and with the bloom path."""

from __future__ import annotations

import numpy as np
import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.crawl.cuckoo import (
    SLOTS,
    _Filter,
    buckets_for,
)
from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb


def _hashes(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_filter_no_false_negatives_and_low_fp():
    keys = _hashes(10_000, seed=1)
    f = _Filter(buckets_for(2 * len(keys)))
    for h in keys:
        assert f.insert(int(h))
    # every inserted key answers present
    assert f.contains_many(keys).all()
    # false-positive rate on fresh keys stays near the 16-bit-fp bound
    probe = _hashes(50_000, seed=2)
    fp_rate = f.contains_many(probe).mean()
    assert fp_rate < 0.002, fp_rate


def test_filter_delete_removes_membership():
    keys = _hashes(2_000, seed=3)
    f = _Filter(buckets_for(2 * len(keys)))
    for h in keys:
        assert f.insert(int(h))
    victims = keys[:500]
    for h in victims:
        assert f.delete(int(h))
    survivors = keys[500:]
    assert f.contains_many(survivors).all()  # untouched keys still present
    # deleted keys mostly gone (a few fp-collision survivals allowed)
    assert f.contains_many(victims).mean() < 0.05


def test_filter_fills_and_reports_load():
    n_buckets = 64
    f = _Filter(n_buckets)
    inserted = 0
    for h in _hashes(n_buckets * SLOTS, seed=4):
        if not f.insert(int(h)):
            break
        inserted += 1
    # a 4-slot table accepts high occupancy before the kick limit
    assert inserted / (n_buckets * SLOTS) > 0.8
    assert 0.8 < f.load() <= 1.0


def _tables(res):
    trace = [(r["url"], r["params"] or "", r["status_code"])
             for r in res.pages().orderBy("ord", "attempt").collect()]
    seen = {(r["seen_key"], r["status"]) for r in res.seen().collect()}
    items = [(r["type"], tuple(r["path"] or ()), r["url"], r["content"])
             for r in res.items().orderBy("ord").collect()]
    return trace, seen, items


def _long_server():
    return SyntheticPhpbb(seed=42, n_cats=2, n_subs=2, n_topics=3, max_posts=5)


def test_cuckoo_crawl_identical_to_exact_and_bloom(spark, tmp_path):
    """The cuckoo prefilter path produces bit-identical crawl tables to
    the plain exact anti-join AND to the bloom path — on a fixture with
    one-shot evictions in play (phpBB probe cache) so the
    gating-set-only insert policy is actually exercised."""
    srv = _long_server()
    seed = "https://phpbb.example/"
    plain = run_crawl(spark, srv, seed, str(tmp_path / "plain"),
                      CrawlConfig(compact_every=5))
    bloom = run_crawl(spark, srv, seed, str(tmp_path / "bloom"),
                      CrawlConfig(compact_every=5, use_bloom=True))
    cuckoo = run_crawl(spark, srv, seed, str(tmp_path / "cuckoo"),
                       CrawlConfig(compact_every=5, use_bloom=True,
                                   sketch="cuckoo"))
    assert _tables(cuckoo) == _tables(plain)
    assert _tables(cuckoo) == _tables(bloom)
