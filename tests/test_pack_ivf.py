"""Behavior pins for the round-4 additions: training-sequence packing and
IVF (inverted-file) ANN.

Oracle equality is covered by the parametrized gate in
tests/test_operators_oracle.py; these tests pin the SEMANTIC invariants a
hash match alone would not explain:

- packing: offsets stay inside the budget, the per-source token stream is
  contiguous (no gaps, no padding), and pack ids are dense from 0.
- IVF: the candidate set each query touches is bounded by its probed cells
  (the scale contract — never the full table) and recall vs exact brute
  force is high on the clustered fixture, which is the CORRECT behavior of
  IVF with a converged codebook (contrast: data-blind LSH hyperplanes need
  multi-table OR to get there).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pack_offsets_within_budget_and_contiguous(spark):
    from forum_dl_spark.operators.textops import PACK_BUDGET, pack_sequences

    rows = pack_sequences(spark, SF).collect()
    assert rows, "packing produced no rows"
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.pack_off < PACK_BUDGET
        assert r.pack_id >= 0
        assert r.n_tokens > 0
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r.doc_id)
        # the concatenated stream has no gaps: each doc starts where the
        # previous one ended
        start = 0
        for r in rs:
            assert r.pack_id * PACK_BUDGET + r.pack_off == start, src
            start += r.n_tokens
        # pack ids are dense 0..max (a doc starts in every chunk the
        # stream crosses, since docs are shorter than the budget here)
        ids = {r.pack_id for r in rs}
        assert ids == set(range(max(ids) + 1)), src


def test_pack_manifest_consistent_with_assignments(spark):
    from forum_dl_spark.operators.textops import pack_manifest, pack_sequences

    packs = pack_sequences(spark, SF)
    man = {(r.source, r.pack_id): r for r in pack_manifest(spark, SF).collect()}
    agg = (
        packs.groupBy("source", "pack_id")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    )
    assert len(agg) == len(man)
    for r in agg:
        m = man[(r.source, r.pack_id)]
        assert m.n_docs == r.n
        assert m.pack_tokens == r.tok


def test_ivf_candidates_bounded_by_probed_cells(spark):
    """The IVF scale contract: each query's candidate count equals the size
    of its IVF_NPROBE probed cells (minus self) — candidates never approach
    the full table."""
    from forum_dl_spark.operators.similarity import (
        CL_CENTROIDS,
        CL_MEMBERS,
        IVF_NPROBE,
        _ivf_scored,
    )

    n_total = CL_CENTROIDS * CL_MEMBERS
    assign = (
        _ivf_scored(spark, SF, queries_only=False)
        .filter(F.col("rn") == 1)
        .select("vec_id", "pid")
    )
    cell_sizes = {r.pid: r.n for r in assign.groupBy("pid").agg(F.count("*").alias("n")).collect()}
    probes = (
        _ivf_scored(spark, SF, queries_only=True)
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("vec_id", "pid")
        .collect()
    )
    per_query: dict[int, int] = {}
    for r in probes:
        per_query[r.vec_id] = per_query.get(r.vec_id, 0) + cell_sizes.get(r.pid, 0)
    assert per_query, "no probes"
    for qid, cand in per_query.items():
        cand -= 1  # self is excluded
        assert cand < n_total / 2, (qid, cand, n_total)


def test_ivf_recall_high_on_clustered_fixture(spark):
    from forum_dl_spark.operators.similarity import ivf_recall

    rows = ivf_recall(spark, SF).collect()
    assert len(rows) > 0
    mean = sum(r.recall for r in rows) / len(rows)
    assert mean >= 0.8, mean


def test_ivf_assignment_unique_and_pivots_broadcast(spark):
    """Every vector lands in exactly one cell; the pivot side of the scoring
    join is broadcast (no exchange on the big side before the NLJ)."""
    from forum_dl_spark.operators.similarity import _ivf_scored, ivf_topk

    assign = _ivf_scored(spark, SF, queries_only=False).filter(F.col("rn") == 1)
    n = assign.count()
    assert assign.select("vec_id").distinct().count() == n

    plan = ivf_topk(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# --- product quantization ------------------------------------------------------


def test_pq_codes_compress_and_respect_clusters(spark):
    """The code relation is M small ints per vector (the 32× compression
    contract), codes are valid ids, and quantization respects the planted
    clusters: a vector's codewords come from its OWN cluster in the
    overwhelming majority of subspaces (the codebook is cluster-member
    subvectors, so cross-cluster snapping would mean the quantizer is
    broken, not merely lossy)."""
    from forum_dl_spark.operators.similarity import (
        CL_ID_STRIDE,
        PQ_M,
        PQ_PIVOT_MS,
        pq_codes,
    )

    rows = pq_codes(spark, SF).collect()
    assert len(rows) == 300
    k = 10 * len(PQ_PIVOT_MS)
    own = total = 0
    for r in rows:
        codes = [int(c) for c in r.codes.split("-")]
        assert len(codes) == PQ_M
        assert all(0 <= c < k for c in codes)
        assert r.distortion >= 0
        cluster = int(r.vec_id) // CL_ID_STRIDE
        own += sum(1 for c in codes if c // len(PQ_PIVOT_MS) == cluster)
        total += PQ_M
    assert own / total >= 0.95, own / total
    # codebook members quantize to themselves: zero distortion
    for r in rows:
        if int(r.vec_id) % CL_ID_STRIDE in PQ_PIVOT_MS:
            assert r.distortion == 0, r


def test_pq_recall_meaningful_but_lossy(spark):
    """ADC over 8 codes recovers a meaningful share of the exact top-k but
    NOT all of it — the index genuinely can miss (a recall pinned at 1.0
    would mean the fixture isn't exercising the quantization loss at all)."""
    from forum_dl_spark.operators.similarity import pq_recall

    rows = pq_recall(spark, SF).collect()
    assert len(rows) == 10
    mean = sum(r.recall for r in rows) / len(rows)
    assert 0.4 <= mean < 1.0, mean


def test_pq_topk_touches_codes_only_and_one_exchange(spark):
    """ADC search shape: the query side (with its precomputed M×K distance
    tables) is broadcast, scoring is a per-row lookup-sum over the code
    arrays, and the only hash exchange in the plan is the per-query top-k
    window — no range exchange (global sort), no shuffled join."""
    from forum_dl_spark.operators.similarity import pq_topk

    df = pq_topk(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
