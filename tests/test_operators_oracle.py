"""Mimics the driver's correctness gate: run every registered query in
Spark AND its DuckDB oracle SQL on the same parquet, compare row count,
schema (column names), and order-insensitive values exactly."""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    # Dtype-strict like the driver's value hash: an int and a float of equal
    # value must NOT compare equal (5 vs 5.0 is a real hash mismatch), so
    # numeric cells are tagged with their kind.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # collapse float noise at the driver-hash scale
        return ("f", round(v, 9))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def _pairs():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from forum_dl_spark.operators import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.sql(sql)
    d_cols = res.columns
    # r6: driver-faithful oracle typing — the driver fetches via
    # pandas/arrow, where DuckDB HUGEINT (any sum()) lands as float64;
    # fetchall() gives Python ints instead and hid the round-5
    # dedup_prefix red. Coerce HUGEINT columns to float so the dtype-
    # strict comparison below sees exactly what the driver hashes.
    huge = [i for i, t in enumerate(res.types)
            if str(t).upper() in ("HUGEINT", "UHUGEINT")]
    d_rows = res.fetchall()
    if huge:
        d_rows = [
            tuple(
                float(v) if i in huge and v is not None else v
                for i, v in enumerate(r)
            )
            for r in d_rows
        ]

    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    assert sr == dr, f"{name}: value mismatch (first diff: "
    f"{next(((a, b) for a, b in zip(sr, dr) if a != b), None)})"


def test_rows_only_queries_run(spark):
    """Queries without oracles must still execute and return rows."""
    from forum_dl_spark.operators import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    for name in sorted(set(q) - set(o)):
        df = q[name](spark, SF_DIR)
        assert df.count() > 0, name


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multiprobe candidates are a superset of single-probe candidates
    (the own bucket is always probed), so recall@k is per-query monotone —
    and on the isotropic fixture the lift is strict in aggregate."""
    from forum_dl_spark.operators.similarity import (ann_multiprobe_recall,
                                                     ann_recall_at_k)

    single = {r["query_id"]: r["recall"]
              for r in ann_recall_at_k(spark, SF_DIR).collect()}
    multi = {r["query_id"]: r["recall"]
             for r in ann_multiprobe_recall(spark, SF_DIR).collect()}
    assert set(single) == set(multi)
    assert all(multi[q] >= single[q] for q in single)
    assert sum(multi.values()) > sum(single.values())


def test_lsh_verified_subset_of_exact_jaccard(spark):
    """Two-stage dedup invariant: every LSH-verified pair is an exact
    all-pairs Jaccard pair with the SAME jaccard value (the verify stage
    computes the same statistic on a candidate subset)."""
    from forum_dl_spark.operators.dedup import (dedup_lsh_verified,
                                                dedup_ngram_jaccard)

    verified = {tuple(r) for r in dedup_lsh_verified(spark, SF_DIR).collect()}
    exact = {tuple(r) for r in dedup_ngram_jaccard(spark, SF_DIR).collect()}
    assert verified and verified <= exact
