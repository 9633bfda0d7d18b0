"""Snapshot every registered query's EXACT output for equivalence proofs.

Optimization rounds must not change what any declared query computes. This
tool collects each query's rows and writes a canonical, bit-exact digest
(floats via struct-packed hex, not printf rounding) plus the full canonical
row text to ``--out DIR/<query>.txt``. Run once at round start (baseline)
and after every change; ``diff -r`` of the two dirs is the proof.

Usage:
    python scripts/snapshot_outputs.py --out /tmp/snap_base [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
"""
from __future__ import annotations

import hashlib
import os
import struct
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _cell(v) -> str:
    if isinstance(v, float):
        # bit-exact: any change in double arithmetic shows up here
        return "f:" + struct.pack(">d", v).hex()
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if hasattr(v, "asDict"):  # Row (nested struct)
        return "{" + ",".join(f"{k}={_cell(x)}" for k, x in v.asDict().items()) + "}"
    return repr(v)


def main() -> int:
    import argparse
    import importlib.util

    from forum_dl_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    spec = importlib.util.spec_from_file_location("entry", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()
    only = set(args.queries)

    spark = get_spark()
    rc = 0
    for name, fn in q.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            lines = sorted(
                "\x1f".join(_cell(v) for v in row) for row in df.collect()
            )
        except Exception as e:  # noqa: BLE001
            (out_dir / f"{name}.txt").write_text(f"ERROR {e}\n")
            print(f"{name:28s} ERROR {e}")
            rc = 1
            continue
        body = "cols:" + ",".join(cols) + "\n" + "\n".join(lines) + "\n"
        digest = hashlib.md5(body.encode()).hexdigest()
        (out_dir / f"{name}.txt").write_text(f"md5:{digest}\n" + body)
        print(f"{name:28s} {time.time()-t0:6.1f}s rows={len(lines):6d} {digest}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
