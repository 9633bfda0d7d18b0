"""Benchmark harness (driver contract: prints ONE JSON line).

Two parts:

1. Headline analytics queries at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] — per-query wall
   seconds in "queries", total in "value".
2. Crawl-engine throughput (the north-star metric): one big superstep wave
   via forum_dl_spark.bench_crawl, run at N and 4N cores in subprocesses
   (fresh JVMs), reporting pages/sec + frontier URLs/sec + scaling
   efficiency. N defaults to 2 (so 4N=8): on this box raw CPU frequency
   scaling already caps 8->32-core speedup at ~2.3x (measured, see
   BENCH/BASELINE.md), so 2->8 is the honest N->4N proxy.

Results also land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "top_customers_per_nation",
    "events_hourly",
    "events_sessionize",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "spans_interleave",
    "cosine_topk_bruteforce",
    "ann_lsh_buckets",
    "embedding_neardup_cosine",
    "media_features",
]
CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "30000"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_BENCH_N", "2"))


def run_queries() -> dict[str, float]:
    from forum_dl_spark.operators import all_queries
    from forum_dl_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    qs = all_queries()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    spark.stop()
    return out


def run_crawl_scaling() -> dict:
    def _sub(extra: list[str]) -> dict:
        p = subprocess.run(
            [sys.executable, "-m", "forum_dl_spark.bench_crawl",
             "--pages", str(CRAWL_PAGES), *extra],
            capture_output=True, text=True, cwd=str(REPO), timeout=3600,
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    res = {c: _sub(["--cores", str(c)]) for c in (SCALE_N, SCALE_N * 4)}
    cal = {c: _sub(["--cores", str(c), "--calibrate"]) for c in (SCALE_N, SCALE_N * 4)}
    lo, hi = res[SCALE_N], res[SCALE_N * 4]
    speedup = hi["pages_per_sec"] / lo["pages_per_sec"]
    hw_speedup = cal[SCALE_N * 4]["pages_per_sec"] / cal[SCALE_N]["pages_per_sec"]
    return {
        "n_cores": SCALE_N,
        "pages": CRAWL_PAGES,
        "pages_per_sec_N": lo["pages_per_sec"],
        "pages_per_sec_4N": hi["pages_per_sec"],
        "frontier_urls_per_sec_N": lo["frontier_urls_per_sec"],
        "frontier_urls_per_sec_4N": hi["frontier_urls_per_sec"],
        "items_per_sec_4N": hi["items_per_sec"],
        "scaling_efficiency": round(speedup / 4, 3),
        # same per-page work via plain multiprocessing — this box's memory-
        # bandwidth ceiling for N->4N (real clusters add bandwidth per node)
        "hw_ceiling_speedup": round(hw_speedup, 2),
        "hw_ceiling_pages_per_sec_4N": cal[SCALE_N * 4]["pages_per_sec"],
        "normalized_efficiency": round(speedup / hw_speedup, 3),
    }


def write_baseline_md(queries: dict, crawl: dict) -> None:
    lines = [
        "# BENCH results (latest run)",
        "",
        f"- sf dir: `{SF_DIR}`, analytics on local[{CPUS}]",
        f"- crawl wave: {crawl['pages']} pages, local[{crawl['n_cores']}] vs "
        f"local[{crawl['n_cores'] * 4}]",
        "",
        "## Crawl engine (north-star metric)",
        "",
        f"| cores | pages/sec | frontier URLs/sec |",
        f"|---|---|---|",
        f"| {crawl['n_cores']} | {crawl['pages_per_sec_N']} | {crawl['frontier_urls_per_sec_N']} |",
        f"| {crawl['n_cores'] * 4} | {crawl['pages_per_sec_4N']} | {crawl['frontier_urls_per_sec_4N']} |",
        "",
        f"**Scaling efficiency (N->4N): {crawl['scaling_efficiency']}; "
        f"normalized to this box's measured memory-bandwidth ceiling "
        f"(plain-multiprocessing speedup {crawl['hw_ceiling_speedup']}x): "
        f"{crawl['normalized_efficiency']}** "
        "(reference is strictly sequential: ~1 page/RTT, forum_dl/session.py:171-187)",
        "",
        "## Analytics queries (seconds)",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in queries.items()]
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "RESULTS.md").write_text("\n".join(lines) + "\n")


def main() -> None:
    queries = run_queries()
    crawl = run_crawl_scaling()
    write_baseline_md(queries, crawl)
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "analytics_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(SF_DIR.rstrip("/").split("sf")[-1]),
                "crawl": crawl,
            }
        )
    )


if __name__ == "__main__":
    main()
