"""Long-crawl soak: drive the REAL superstep loop for 100+ budgeted waves
and prove the per-wave cost stays flat as the seen set grows.

What it guards (the two ways a frontier crawler silently degrades):
- per-superstep wall time creeping up with crawl age — would mean the
  seen anti-join (or its file layout) scales with TOTAL crawl history
  instead of with the wave;
- the number of parquet files the anti-join reads growing O(steps) —
  bounded O(compact_every) by the periodic seen compaction.

The soak is a plain ``run_crawl`` over a synthetic Discourse forum sized
to ``n_cats * n_topics`` thread pages, throttled by ``host_budget`` so the
crawl stretches over many supersteps — exactly how a politeness-bounded
production crawl behaves. Bloom stays on AUTO (CrawlConfig default): the
run crosses BLOOM_AUTO_KEYS mid-flight and switches the prefilter on, so
the soak also exercises the incremental sketch path.

Usage:
    python -m forum_dl_spark.soak --pages 1000000 --budget 9000
prints one JSON line with per-wave walls, steady-state flatness ratio,
least-squares slope, and the max seen-file count any wave read.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

from .crawl import CrawlConfig, run_crawl
from .crawl.superstep import _seen_paths_sofar
from .fixtures import SyntheticDiscourse
from .session import get_spark

BASE = "https://forum.example/"
TOPICS_PER_CAT = 999


def soak_server(n_pages: int) -> SyntheticDiscourse:
    """The soak fixture: a Discourse forum sized to ~n_pages thread pages
    (shared with the resume-under-soak test, which needs the same server
    for its killed + resumed runs)."""
    n_cats = max(1, (n_pages + TOPICS_PER_CAT - 1) // TOPICS_PER_CAT)
    return SyntheticDiscourse(
        seed=7,
        n_cats=n_cats,
        n_subcats=0,
        n_topics=TOPICS_PER_CAT,
        max_posts=3,
        topics_per_page=50,
        duplicate_topic=False,
    )


def run_soak(
    spark,
    n_pages: int,
    budget: int,
    workdir: str,
    compact_every: int = 16,
    use_bloom: bool | None = None,
    sketch: str = "bloom",
    salt_pop: int = 0,
) -> dict:
    srv = soak_server(n_pages)
    t0 = time.time()
    res = run_crawl(
        spark,
        srv,
        BASE,
        workdir,
        CrawlConfig(
            host_budget=budget,
            keep_bodies=False,
            compact_every=compact_every,
            use_bloom=use_bloom,
            sketch=sketch,
            salt_pop=salt_pop,
        ),
    )
    total_wall = time.time() - t0
    metrics = [m for m in res.metrics() if m.get("superstep", 0) >= 1]
    pages = res.pages().count()

    # steady-state waves: full-budget pops (ramp-up and the tail wave pop
    # less and would fake a downward slope)
    steady = [m for m in metrics if m["popped"] >= int(budget * 0.9)]
    walls = [m["wall_sec"] for m in steady]
    half = len(walls) // 2
    flatness = (
        (sum(walls[half:]) / len(walls[half:]))
        / (sum(walls[:half]) / max(len(walls[:half]), 1))
        if half
        else 1.0
    )
    # least-squares slope in sec/superstep over steady-state waves
    n = len(walls)
    if n >= 2:
        xs = range(n)
        mx = (n - 1) / 2
        my = sum(walls) / n
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, walls)) / sum(
            (x - mx) ** 2 for x in xs
        )
    else:
        slope = 0.0

    # files the seen anti-join read at each step (recomputable post-hoc:
    # compaction artifacts persist) — must stay O(compact_every)
    wd = Path(workdir)
    seen_files = [
        len(_seen_paths_sofar(wd, m["superstep"])) for m in metrics
    ]

    return {
        "pages": int(pages),
        "supersteps": len(metrics),
        "steady_waves": len(steady),
        "total_wall_sec": round(total_wall, 1),
        "pages_per_sec": round(pages / total_wall, 1),
        "wall_per_wave": walls,
        "steady_flatness_ratio": round(flatness, 3),
        "steady_slope_sec_per_wave": round(slope, 4),
        "max_seen_files_read": max(seen_files) if seen_files else 0,
        "final_seen_size": metrics[-1]["seen_size"] if metrics else 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--budget", type=int, default=9_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--sketch", choices=("bloom", "cuckoo"), default="bloom")
    ap.add_argument("--salt-pop", type=int, default=0)
    args = ap.parse_args()
    spark = get_spark(
        app_name="soak",
        master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
    )
    wd = args.workdir or tempfile.mkdtemp(prefix="soak_")
    print(json.dumps(run_soak(spark, args.pages, args.budget, wd,
                              sketch=args.sketch, salt_pop=args.salt_pop)))


if __name__ == "__main__":
    main()
