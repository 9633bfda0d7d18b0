"""Long-crawl soak guards: flat per-wave wall + bounded seen-file reads.

The default-scale test (~30k pages, ~20 budgeted waves, forced bloom)
runs in the normal suite; the full 10^6-page / 100+-wave soak is gated
behind SPARK_GRAFT_SOAK=1 (≈10 min) — its latest recorded run lives in
BENCH/SOAK.md."""

from __future__ import annotations

import os

import pytest

from forum_dl_spark.soak import run_soak


def test_soak_small_flat_and_bounded(spark, tmp_path):
    out = run_soak(
        spark, n_pages=30_000, budget=1_500, workdir=str(tmp_path / "soak"),
        compact_every=8, use_bloom=True,
    )
    assert out["pages"] >= 30_000
    assert out["supersteps"] >= 15
    assert out["steady_waves"] >= 10
    # anti-join never reads more than compact_every+1 seen files
    assert out["max_seen_files_read"] <= 9
    # per-wave wall must not grow with crawl age: second half of the
    # steady-state waves within 1.5x of the first half (generous for
    # single-box jitter; an O(history) regression shows up as 3-10x)
    assert out["steady_flatness_ratio"] <= 1.5, out["wall_per_wave"]


def test_soak_resume_bit_identical_and_bounded(spark, tmp_path):
    """Resume-under-soak (round-4 ask): a crawl killed mid-soak — well past
    the first seen compaction and with bloom forced on — resumes to tables
    bit-identical to the uninterrupted run, and the resumed half keeps the
    anti-join's seen-file reads O(compact_every) (no compaction reset on
    resume)."""
    import dataclasses

    from forum_dl_spark.crawl import CrawlConfig, resume_crawl, run_crawl
    from forum_dl_spark.crawl.superstep import _seen_paths_sofar
    from forum_dl_spark.soak import BASE, soak_server
    from pathlib import Path

    srv = soak_server(10_000)
    cfg = CrawlConfig(host_budget=700, keep_bodies=False, compact_every=4,
                      use_bloom=True)
    full = run_crawl(spark, srv, BASE, str(tmp_path / "full"), cfg)
    kill_wd = str(tmp_path / "killed")
    run_crawl(spark, srv, BASE, kill_wd,
              dataclasses.replace(cfg, max_supersteps=9))
    resumed = resume_crawl(spark, srv, kill_wd)

    def _tables(res):
        trace = [(r["url"], r["params"] or "", r["status_code"])
                 for r in res.pages().orderBy("ord", "attempt").collect()]
        seen = {(r["seen_key"], r["status"]) for r in res.seen().collect()}
        return trace, seen, res.items().count()

    assert _tables(resumed) == _tables(full)
    # the resumed run compacted past the kill point: every wave's anti-join
    # read set stays O(compact_every) files
    metrics = [m for m in resumed.metrics() if m.get("superstep", 0) >= 1]
    reads = [len(_seen_paths_sofar(Path(kill_wd), m["superstep"]))
             for m in metrics]
    assert metrics[-1]["superstep"] > 9  # it actually resumed past the kill
    assert max(reads) <= cfg.compact_every + 1, reads


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SOAK") != "1",
    reason="full 10^6-page soak (~10 min): set SPARK_GRAFT_SOAK=1",
)
def test_soak_million_pages(spark, tmp_path):
    out = run_soak(
        spark, n_pages=1_000_000, budget=9_000,
        workdir=str(tmp_path / "soak1m"),
    )
    assert out["pages"] >= 1_000_000
    assert out["supersteps"] >= 100
    assert out["max_seen_files_read"] <= 17  # compact_every=16 default
    assert out["steady_flatness_ratio"] <= 1.5, out["wall_per_wave"]
    assert out["final_seen_size"] >= 1_000_000
