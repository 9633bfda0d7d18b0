"""Time-travel reads over the crawl checkpoint (Iceberg `VERSION AS OF`
semantics on the step-dir snapshot log): ``as_of(k)`` on a finished crawl
must equal the tables of a run actually killed after superstep k."""

from __future__ import annotations

import pytest


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    from forum_dl_spark.crawl import CrawlConfig, run_crawl
    from forum_dl_spark.fixtures import SyntheticDiscourse

    base = tmp_path_factory.mktemp("ttrav")
    srv = SyntheticDiscourse()
    full = run_crawl(
        spark, srv, "https://forum.example/", str(base / "full"), CrawlConfig()
    )
    killed = run_crawl(
        spark,
        srv,
        "https://forum.example/",
        str(base / "killed"),
        CrawlConfig(max_supersteps=3),
    )
    return full, killed


def test_as_of_equals_killed_run(runs):
    full, killed = runs
    snap = full.as_of(killed.supersteps - 1)
    assert snap.supersteps == killed.supersteps
    page_cols = ["url", "ord", "attempt", "status_code", "kind"]
    assert _rows(snap.pages(), page_cols) == _rows(killed.pages(), page_cols)
    seen_cols = ["seen_key", "evict"]
    assert _rows(snap.seen_all(), seen_cols) == _rows(killed.seen_all(), seen_cols)
    item_cols = ["url", "type"]
    assert _rows(snap.items(), item_cols) == _rows(killed.items(), item_cols)
    # the snapshot is a strict prefix, not the whole crawl
    assert snap.pages().count() < full.pages().count()
    assert len(snap.metrics()) == len(killed.metrics())


def test_as_of_latest_is_identity(runs):
    full, _ = runs
    snap = full.as_of(full.supersteps - 1)
    assert snap.pages().count() == full.pages().count()
    assert snap.seen().count() == full.seen().count()


def test_as_of_before_first_step_raises(runs):
    full, _ = runs
    with pytest.raises(ValueError):
        full.as_of(-1)


def test_as_of_after_last_step_raises(runs):
    # Iceberg VERSION AS OF symmetry (round-4 ADVICE): a FUTURE step is an
    # unknown snapshot and must raise, not silently return the latest view
    full, _ = runs
    with pytest.raises(ValueError):
        full.as_of(full.supersteps + 100)
