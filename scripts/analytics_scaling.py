#!/usr/bin/env python
"""Analytics-side scaling evidence: run a heavy slice of the pipeline
registry at two parallelism levels (local[N] and local[4N], N=2 — the
same two levels as bench.py's crawl pairs) on the SAME input and report
wall time plus scaling efficiency.

This is the pipeline-side ANNEX to the north rule's two-cluster-size
criterion; the authoritative instrument is bench.py's crawl pairs. The
protocol here was arrived at by explicit diagnosis (ledgered in
BENCH/ANALYTICS_SCALING.md):

- **Scaled corpus**: at sf0.1 every registry query finishes in 1-5 s
  and fixed overhead dominates — a probe at that scale measures JVM
  scheduling, not scaling. So documents.parquet is replicated REPLICAS×
  with the replica index appended to doc_id AND text (ids stay unique,
  term/shingle keys are not degenerate copies), giving minute-scale
  jobs at local[2].
- **Queries**: linear-shaped heavy ones only (per-doc scoring, per-term
  aggregation). Pair-join dedup queries are excluded because a
  replicated corpus distorts their semantics (every doc gains
  REPLICAS-1 near-dups).
- **Matched 32g heaps**: with the default 8g heap the 4N leg loses
  ~25% to memory pressure (105 s -> 82 s on the winnow probe when
  raised); both legs get the same large heap.
- **2 MB scan splits**: 64× sf0.1 compresses to ~38 MB of parquet, and
  the default 128 MB maxPartitionBytes bins that into ~8 scan splits —
  one wave at local[8], no load balancing. On a real cluster the scan
  has thousands of splits; 2 MB restores that granularity.
- **JIT warm, data cold**: each child first runs the SAME query at
  sf0.01 (different memo key), so codegen/JIT are warm but the measured
  run still does all data work.

Efficiency per query = (t_N / t_4N) / 4.

Usage: python scripts/analytics_scaling.py [sf_dir]  (default sf0.1)
Prints one JSON line; per-query lines go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# linear-shaped heavy queries (replication-safe: no candidate-pair joins)
HEAVY = [
    "bm25_topk",
    "tfidf_top_terms",
    "winnow_fingerprints",
    "lm_bigram_ppl",
]
N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "64"))
WARM_SF = "/root/testdata/sf0.01"

_BUILD = r"""
import sys
sys.path.insert(0, {repo!r})
from forum_dl_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="ascale-build", master="local[{cores}]",
                  shuffle_partitions=64)
d = spark.read.parquet({sf!r} + "/documents.parquet")
reps = spark.range({replicas}).select(F.col("id").alias("_r"))
scaled = (
    d.crossJoin(reps)
    .select(
        (F.col("doc_id") * {replicas} + F.col("_r")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" r"), F.col("_r")).alias("text"),
        "lang", "source", "n_chars",
    )
)
scaled.repartition(128).write.mode("overwrite").parquet(
    {out!r} + "/documents.parquet")
print(spark.read.parquet({out!r} + "/documents.parquet").count())
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from forum_dl_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark(app_name="ascale", master="local[{cores}]",
                  shuffle_partitions=2 * {cores},
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m"}})
q = e.queries()[{query!r}]
q(spark, {warm!r}).count()  # JIT/codegen warm; memo key differs, data cold
t0 = time.time()
n = q(spark, {sf!r}).count()
print(json.dumps({{"t": time.time() - t0, "rows": n}}))
"""


def _sub(code: str, timeout: int = 3600) -> str:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="32g")
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout, env=env)
    if p.returncode != 0 or not p.stdout.strip():
        raise RuntimeError(
            f"child rc={p.returncode}\nstderr tail: {p.stderr[-2000:]}")
    return p.stdout.strip().splitlines()[-1]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/ascale_x{REPLICAS}_" + os.path.basename(sf.rstrip("/"))
    n_docs = int(_sub(_BUILD.format(repo=REPO, cores=4 * N, sf=sf,
                                    out=out_dir, replicas=REPLICAS)))
    print(f"  scaled corpus: {n_docs} docs at {out_dir}", file=sys.stderr)

    out = {"sf_dir": sf, "replicas": REPLICAS, "n_docs": n_docs,
           "n_cores": N, "driver_mem": "32g", "queries": {}}
    effs = []
    for q in HEAVY:
        t_n = json.loads(_sub(_CHILD.format(
            repo=REPO, cores=N, query=q, sf=out_dir, warm=WARM_SF)))
        t_4n = json.loads(_sub(_CHILD.format(
            repo=REPO, cores=4 * N, query=q, sf=out_dir, warm=WARM_SF)))
        eff = (t_n["t"] / t_4n["t"]) / 4.0
        rec = {"t_N": round(t_n["t"], 2), "t_4N": round(t_4n["t"], 2),
               "rows": t_n["rows"], "eff": round(eff, 3)}
        out["queries"][q] = rec
        effs.append(rec["eff"])
        print(f"  {q}: {rec['t_N']}s -> {rec['t_4N']}s  eff {rec['eff']}",
              file=sys.stderr)
    effs.sort()
    out["eff_median"] = effs[len(effs) // 2]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
