"""Per-query isolation bench (guide §1.4): times selected queries with the
noop sink so the computation is measured, not the sink, and optionally dumps
``.explain("formatted")`` to a file per query.

This is a SEPARATE instrument from the frozen ``bench.py`` (which the driver
runs); its numbers are cited in OPTIMIZATION_r06.md.

Usage:
    python scripts/bench_extra.py [--plans DIR] [--suffix _before] \
        [--reps 1] [--count] query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> int:
    import importlib.util

    from forum_dl_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="", help="plan file suffix, e.g. _before")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--count", action="store_true",
                    help="time df.count() (bench.py methodology) instead of noop")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location("entry", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()

    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    # warmup (mirror bench.py): JIT/Arrow outside the timed window
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").groupBy("l_returnflag").count().collect()

    out = {}
    for name in args.queries:
        if name not in q:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = q[name](spark, SF_DIR)
            if args.count:
                n = df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = min(times)
        print(f"  {name}: {times} (rows={n})", file=sys.stderr)
        if args.plans:
            import contextlib
            import io

            plans = Path(args.plans)
            plans.mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                q[name](spark, SF_DIR).explain("formatted")
            (plans / f"{name}{args.suffix}.txt").write_text(buf.getvalue())
    print(json.dumps({"sf_dir": SF_DIR, "times": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
