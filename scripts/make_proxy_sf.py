#!/usr/bin/env python
"""Generate a PROXY scale-factor dataset for local measurement only.

The driver's round-end bench may run at a larger, driver-generated sf (e.g.
sf1.0, see BENCH_r05.json "sf": 1.0) whose generator we do not have. This
script synthesizes a dataset with the same schema and the same *measured*
marginal distributions as /root/testdata/sf0.1 (vocab, doc-length, planted
" dup" near-duplicates at 5%, unit-norm 64-d embeddings with 10 labels,
TPC-H-ish key ranges scaled linearly) so that optimization work can be
timed at the driver's measurement scale.

NOT used by bench.py, tests, or any query path — measurement tooling only.
Writes to /root/testdata_proxy/sf<scale> (never touches /root/testdata).

Usage: python scripts/make_proxy_sf.py [scale]   (default 1.0)
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.150, 0.149, 0.148, 0.141]
PART_WORDS = ["anvil", "blue", "bolt", "cold", "gear", "gizmo", "hot",
              "large", "new", "old", "plate", "red", "ring", "rod", "small",
              "widget"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet",
                   row_group_size=20_000_000, compression="snappy")
    print(f"  {name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    texts: list[str] = []
    n_dup = int(0.05 * n)
    dup_at = set(rng.choice(np.arange(n // 10, n), size=n_dup, replace=False))
    for i in range(n):
        if i in dup_at and texts:
            base = texts[int(rng.integers(0, i))]
            texts.append(base + " dup")
        else:
            k = int(rng.integers(10, 101))
            texts.append(" ".join(rng.choice(VOCAB, size=k)))
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array([f"src{i % max(1, n // 250)}" for i in range(n)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int32()),
    })


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    V = rng.standard_normal((n, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })


def _days(rng, n, lo="1995-01-01", hi="2001-11-01"):
    lo_d = np.datetime64(lo)
    span = int((np.datetime64(hi) - lo_d) / np.timedelta64(1, "D"))
    return (lo_d + rng.integers(0, span, size=n).astype("timedelta64[D]")
            ).astype("datetime64[us]")


def main() -> int:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    m = scale / 0.1  # multiplier vs sf0.1 row counts
    out = Path(f"/root/testdata_proxy/sf{scale}")
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(4242)

    n_docs = int(5000 * m)
    n_emb = int(2000 * m)
    n_li = int(600_000 * m)
    n_ord = int(150_000 * m)
    n_cust = int(15_000 * m)
    n_part = int(20_000 * m)
    n_supp = int(1_000 * m)
    n_ev = int(100_000 * m)

    _write(out, "documents", gen_documents(rng, n_docs))
    _write(out, "embeddings", gen_embeddings(rng, n_emb))

    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(float)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(1000, 100_000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(rng.choice(["N", "R", "A"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": pa.array(_days(rng, n_li)),
    }))
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["P", "O", "F"], n_ord)),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500_000, n_ord), 2)),
        "o_orderdate": pa.array(_days(rng, n_ord, hi="2001-08-01")),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_ord)),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(0, 10_000, n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
    }))
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([
            f"{a} {b}" for a, b in zip(rng.choice(PART_WORDS, n_part),
                                       rng.choice(PART_WORDS, n_part))]),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             rng.integers(0, 25, n_part)]),
        "p_type": pa.array(rng.choice(
            ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"],
            n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 1)),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(0, 10_000, n_supp), 2)),
    }))
    for t in ["nation", "region"]:
        src = pq.read_table(f"/root/testdata/sf0.1/{t}.parquet")
        _write(out, t, src)

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(rng.integers(0, 30 * 86_400 * 1_000_000, n_ev))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts0 + offs.astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, int(1500 * m), n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, n_ev)),
        "value": pa.array(np.round(rng.uniform(0, 200, n_ev), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, n_ev)]),
    }))
    (out / "_DONE").write_text("")
    print(f"proxy sf{scale} written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
