"""Gate mimic: run every ``queries()`` entry at sf0.01 and compare against
its ``oracle_sql()`` via DuckDB, timing each — a local stand-in for the
driver's CORRECTNESS pass so we can verify the WHOLE registry fits a sane
budget (round-4 verdict ask #2: 13/63 entries had no driver row because the
pass appears budget-bound).

Prints one line per query: name, spark wall, oracle wall, verdict; then a
total. Exit code 1 on any mismatch.
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(rows, cols):
    cols_sorted = sorted(cols)
    idx = [cols.index(c) for c in cols_sorted]
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            elif isinstance(v, bytes):
                v = v.hex()
            elif isinstance(v, (list, tuple)):
                v = json.dumps(
                    [f"{x:.6g}" if isinstance(x, float) else x for x in v]
                )
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.md5("\x1e".join(out).encode()).hexdigest()


def main() -> int:
    import duckdb
    import importlib.util

    from forum_dl_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "entry", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()
    o = mod.oracle_sql()

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    only = set(sys.argv[1:])
    failures = []
    t_all = time.time()
    for name, fn in q.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERROR {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in o:
            print(
                f"{name:28s} spark={t_spark:6.1f}s rows={len(rows):6d} "
                f"[rows-only]"
            )
            continue
        t1 = time.time()
        try:
            res = con.execute(o[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE-ERROR {e}")
            failures.append(name)
            continue
        t_oracle = time.time() - t1
        ok = (
            len(rows) == len(orows)
            and sorted(cols) == sorted(ocols)
            and _canon(rows, cols) == _canon(orows, ocols)
        )
        # r6 (round-5 verdict ask #3): the driver fetches the oracle via
        # pandas, where DuckDB HUGEINT (any sum()) lands as float64 and
        # renders "5.0" against Spark's integer "5" — a bug class this
        # mimic's fetchall() path (Python ints) cannot see. Audit the
        # DTYPE MAPPING instead of re-fetching data: a LIMIT-0 pandas
        # fetch exposes each column's pandas dtype; flag any column the
        # Spark side types integral but the oracle delivers as float
        # (or vice versa, e.g. dedup_prefix's deliberate double columns).
        dtype_bad = []
        try:
            pdt = con.execute(
                f"SELECT * FROM ({o[name]}) _q LIMIT 0"
            ).df().dtypes
            sk = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            for c, dt in pdt.items():
                s_int = sk.get(c, "") in ("tinyint", "smallint", "int", "bigint")
                s_flt = sk.get(c, "") in ("float", "double")
                if (s_int and dt.kind == "f") or (s_flt and dt.kind == "i"):
                    dtype_bad.append(f"{c}: spark={sk.get(c)} oracle_pd={dt}")
        except Exception as e:  # noqa: BLE001
            dtype_bad.append(f"dtype-audit-error: {e}")
        if dtype_bad:
            ok = False
            failures.append(name)
            print(f"{name:28s} DTYPE-MISMATCH {dtype_bad}")
            continue
        if not ok:
            failures.append(name)
        print(
            f"{name:28s} spark={t_spark:6.1f}s oracle={t_oracle:5.1f}s "
            f"rows={len(rows):6d} {'OK' if ok else 'MISMATCH'}"
        )
    print(f"TOTAL {time.time() - t_all:.0f}s  failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
