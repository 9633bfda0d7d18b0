"""Crawl-throughput bench: one big superstep wave at a given parallelism.

The north-rule scaling evidence (BASELINE.json): the same job — a frontier
wave of N thread pages through the fused fetch+parse stage plus the seen
anti-join — run at two parallelism levels (local[8] vs local[32] as the
sandbox proxy for N vs 4N executors), reporting pages/sec, frontier URLs/sec
and scaling efficiency.

Why one big wave: at the 10^10-URL design point a superstep wave is millions
of pages, so per-wave fixed cost (job scheduling, plan, shuffle setup)
amortizes to ~0; measuring many tiny fixture waves would benchmark the
driver loop's constant overhead instead of the engine. The wave pipeline
here is exactly the production path: pop -> mapInPandas(fetch+parse) ->
candidate dedup -> seen anti-join -> delta aggregation.

Usage: python -m forum_dl_spark.bench_crawl --cores 8 --pages 150000
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import schemas
from .crawl.superstep import _make_fetch_parse, _with_derived
from .fixtures import SyntheticDiscourse
from .session import get_spark

BASE = "https://forum.example/"


def build_frontier(spark, n_pages: int, n_boards: int, n_partitions: int):
    """Synthetic thread_page frontier rows, built JVM-side (no Python).

    Partitioned at the source (spark.range numPartitions) — a narrow plan,
    so AQE cannot coalesce it below the requested parallelism the way it
    would a tiny-byte-size repartition shuffle.
    """
    per_board = 999
    return (
        spark.range(0, n_pages, 1, n_partitions)
        .select(
            (F.lit(101) + (F.col("id") / per_board).cast("long")).alias("board"),
            (F.col("id") % per_board + 1).alias("t"),
            F.col("id"),
        )
        .select(
            F.format_string(
                f"{BASE}t/topic-%d/%d.json",
                F.col("board") * 1000 + F.col("t"),
                F.col("board") * 1000 + F.col("t"),
            ).alias("url"),
            F.lit("").alias("params"),
            F.lit("discourse").alias("engine"),
            F.lit("thread_page").alias("kind"),
            F.array(
                F.col("board").cast("string"),
                (F.col("board") * 1000 + F.col("t")).cast("string"),
            ).alias("path"),
            F.lit(1).alias("page"),
            F.create_map(F.lit("base"), F.lit(BASE)).alias("state"),
            F.lit(2).alias("priority"),
            F.lpad(F.hex(F.col("id")), 8, "0").alias("ord"),
            F.lit(0).alias("attempt"),
            F.lit(1).alias("should_retry"),
        )
    )


def run(cores: int, n_pages: int, shuffle_partitions: int | None = None) -> dict:
    n_boards = (n_pages + 998) // 999
    spark = get_spark(
        app_name=f"bench-crawl-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions or max(2 * cores, 16),
    )
    server = SyntheticDiscourse(seed=42, n_cats=n_boards, n_subcats=0, max_posts=30)
    fetch_parse = _make_fetch_parse(server, retries=4, keep_bodies=False)

    frontier = build_frontier(spark, n_pages, n_boards, n_partitions=4 * cores)
    frontier.cache().count()  # materialize input outside the timed window

    import os
    import shutil
    import tempfile

    # write the wave delta to tmpfs: a single local disk does not scale with
    # cores (measured: fetch+parse alone scales at 0.97 efficiency, the
    # local-disk parquet write flattens it) — on a real cluster the delta
    # goes to distributed storage whose bandwidth scales with executors, and
    # tmpfs is the sandbox stand-in for that
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="bench_wave_", dir=shm)
    t0 = time.time()
    # single materialization, exactly like the production loop: the fused
    # fetch+parse output is written ONCE; the wave tail is column-pruned
    # JVM reads over the parquet
    frontier.mapInPandas(fetch_parse, schemas.PARSED).write.mode("overwrite").parquet(
        f"{out_dir}/parsed"
    )
    parsed = spark.read.parquet(f"{out_dir}/parsed")

    # wave tail: candidate dedup (min-ord window) + seen anti-join (against
    # an empty-but-real seen side) + delta counts
    cand = parsed.filter(F.col("rec") == "next").select(
        F.col("f_url").alias("url"), F.col("f_params").alias("params"), F.col("f_ord").alias("ord")
    )
    cand = _with_derived(cand)
    w = Window.partitionBy("seen_key").orderBy("ord")
    cand = cand.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    seen = _with_derived(
        spark.createDataFrame([("https://forum.example/x", "")], ["url", "params"])
    ).select("seen_key")
    new_frontier = cand.join(seen, "seen_key", "left_anti")

    counts = (
        parsed.groupBy("rec").count().unionByName(
            new_frontier.select(F.lit("new_frontier").alias("rec"), F.lit(None)).groupBy("rec").count()
        )
    ).collect()
    wall = time.time() - t0
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)

    c = {r["rec"]: r["count"] for r in counts}
    pages = int(c.get("page", 0))
    items = int(c.get("item", 0))
    urls = int(c.get("new_frontier", 0)) + pages
    return {
        "cores": cores,
        "n_pages": n_pages,
        "wall_sec": round(wall, 2),
        "pages_per_sec": round(pages / wall, 1),
        "items_per_sec": round(items / wall, 1),
        "frontier_urls_per_sec": round(urls / wall, 1),
        "items": items,
    }


def calibrate(cores: int, n_pages: int) -> dict:
    """Hardware-ceiling calibration: the SAME per-page work (synthetic page
    render + parse) through plain ``multiprocessing`` — no Spark, no Arrow,
    no writes. On this single box the workload is memory-bandwidth-bound
    (a shared memory bus), so even this scales sublinearly; on a real
    cluster each executor brings its own memory bandwidth. The engine's
    normalized efficiency = engine speedup / this ceiling's speedup."""
    import time as _time
    from multiprocessing import Pool

    from .engines import discourse as eng

    n_boards = (n_pages + 998) // 999
    srv = SyntheticDiscourse(seed=42, n_cats=n_boards, n_subcats=0, max_posts=30)

    def_chunks = [list(range(i, n_pages, 8 * cores)) for i in range(8 * cores)]
    t0 = _time.time()
    with Pool(cores) as p:
        p.map(_calib_work, [(srv, c) for c in def_chunks])
    wall = _time.time() - t0
    return {"cores": cores, "wall_sec": round(wall, 2), "pages_per_sec": round(n_pages / wall, 1)}


def _calib_work(args) -> int:
    srv, chunk = args
    total = 0
    for i in chunk:
        board = 101 + i // 999
        tid = board * 1000 + (i % 999 + 1)
        url = f"{BASE}t/topic-{tid}/{tid}.json"
        row = {
            "url": url, "params": "", "kind": "thread_page",
            "path": [str(board), str(tid)], "page": 1,
            "state": {"base": BASE}, "ord": f"{i:08x}",
        }
        st, _, body = srv.get(url, None, 0)
        items, _ = eng_parse(row, st, body, url)
        total += len(items)
    return total


def eng_parse(row, st, body, url):
    from .engines import discourse as eng

    return eng.parse(row, st, body, url)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--pages", type=int, default=150_000)
    ap.add_argument("--calibrate", action="store_true")
    args = ap.parse_args()
    if args.calibrate:
        print(json.dumps(calibrate(args.cores, args.pages)))
    else:
        print(json.dumps(run(args.cores, args.pages)))
