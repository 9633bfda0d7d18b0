"""Graph-analytics operators: integer-exact PageRank vs a pure-Python
reference simulation, plan-shape guards, and the decontaminate /
datasheet EMIT semantics (planted fixtures where the shared testdata is
legitimately vacuous)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _python_pagerank_topk(sf_dir: str):
    """Independent reference: same integer recipe, plain dicts."""
    from forum_dl_spark.operators.graph import (
        _PR_INIT, _PR_ITERS, _PR_OUT, _PR_TOPK)

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    n = len(ids)
    edges = [(i, _h32(f"edge:{i}:{j}") % n) for i in ids for j in range(_PR_OUT)]
    r = {i: _PR_INIT for i in ids}
    for _ in range(_PR_ITERS):
        s = {i: 0 for i in ids}
        for src, dst in edges:
            s[dst] += r[src] // _PR_OUT
        r = {i: 150_000 + (17 * s[i]) // 20 for i in ids}
    ranked = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:_PR_TOPK]
    return ranked


def test_pagerank_matches_python_reference(spark):
    from forum_dl_spark.operators.graph import pagerank_topk

    got = [
        (row.doc_id, row.rank_score)
        for row in pagerank_topk(spark, SF).collect()
    ]
    assert got == _python_pagerank_topk(SF)
    # non-vacuous: ranks must actually differ (a graph where every node
    # ends at the teleport floor would pass equality while testing nothing)
    assert len({v for _, v in got}) > 1


def test_hits_matches_python_reference(spark):
    from forum_dl_spark.operators.graph import (
        _HITS_ITERS, _PR_INIT, _PR_OUT, _PR_TOPK, hits_topk)

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    n = len(ids)
    edges = [(i, _h32(f"edge:{i}:{j}") % n) for i in ids for j in range(_PR_OUT)]
    h = {i: _PR_INIT for i in ids}
    a: dict[int, int] = {}
    for _ in range(_HITS_ITERS):
        a = {i: 0 for i in ids}
        for src, dst in edges:
            a[dst] += h[src]
        h = {i: 0 for i in ids}
        for src, dst in edges:
            h[src] += a[dst]
    want = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:_PR_TOPK]
    got = [(r.doc_id, r.authority) for r in hits_topk(spark, SF).collect()]
    assert got == want
    assert len({v for _, v in got}) > 1


def test_pagerank_plan_shapes(spark):
    from forum_dl_spark.operators.graph import pagerank_topk

    df = pagerank_topk(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, not a total sort
    assert "CartesianProduct" not in plan


def test_decontaminate_partitions_training_side(spark):
    from forum_dl_spark.operators.textops import (
        _CONTAM_MOD, _CONTAM_RES, contamination_ngram, decontaminate_apply)

    sf = "/root/testdata/sf0.01"
    kept = {r.doc_id for r in decontaminate_apply(spark, sf).collect()}
    hits = {r.doc_id for r in contamination_ngram(spark, sf).collect()}
    all_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf}/documents.parquet'"
        ).fetchall()
    }
    training = {i for i in all_ids if i % _CONTAM_MOD != _CONTAM_RES}
    assert hits, "fixture must plant at least one contaminated doc"
    assert kept & hits == set()
    assert kept | hits == training


def test_decontaminate_plan_broadcast_anti_join(spark):
    """The contaminated-id set must reach the documents scan as a
    BROADCAST left-anti join — a SortMergeJoin there would shuffle the
    full training corpus on doc_id at 100 TB."""
    from forum_dl_spark.operators.textops import decontaminate_apply

    df = decontaminate_apply(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    first_anti = plan.index("LeftAnti")
    assert "SortMergeJoin" not in plan[:first_anti]


def test_datasheet_planted_dups(spark, tmp_path):
    """dup_share semantics pinned on a planted fixture: the shared sf0.01
    testdata has zero exact-duplicate fingerprints (verified in
    test_operators_oracle via the oracle), so the column's non-trivial
    path is exercised here: 2 of 4 docs share a fingerprint after
    whitespace normalization."""
    from forum_dl_spark.operators.textops import corpus_datasheet

    rows = [
        (1, "the quick brown fox jumps", "en", "s1", 25),
        (2, "the  quick   brown fox jumps", "en", "s1", 28),  # ws-normalized dup of 1
        (3, "completely different text here", "en", "s1", 30),
        (4, "unrelated fourth document body", "de", "s2", 30),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in corpus_datasheet(spark, str(tmp_path)).collect()}
    assert out["s1"].n_docs == 3 and out["s2"].n_docs == 1
    assert out["s1"].dup_share == pytest.approx(2 / 3, abs=1e-6)
    assert out["s2"].dup_share == 0.0
    assert out["s1"].n_langs == 1 and out["s2"].n_langs == 1
    # every doc here fails the 100-char C4 floor -> kept_share 0 on both
    assert out["s1"].kept_share == 0.0 and out["s2"].kept_share == 0.0
