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
