"""Behavior pins for scalar quantization (int8-per-dimension ANN).

Oracle equality is covered by the parametrized gate in
tests/test_operators_oracle.py; these pin the SEMANTIC invariants a hash
match alone would not explain:

- the affine map saturates its range: every dimension's corpus min maps to
  code 0 and its max to code 255 (a quantizer that wastes levels is
  miscalibrated, not merely lossy);
- distortion obeys the closed-form per-dimension bound (span/255 + 1)²;
- recall vs exact integer L2² is near-lossless — THE contrast with PQ's
  deliberately lossy 32× rung (pq_recall pins 0.4 ≤ r < 1.0);
- plan shapes: encoding is a zero-exchange projection (the quantizer params
  are plan literals), search broadcasts the query codes and shuffles only
  for the per-query top-k window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_sq_codes_saturate_range_and_bound_distortion(spark):
    from forum_dl_spark.operators.similarity import (
        SQ_LEVELS,
        _sq_params,
        sq_codes,
    )

    mins, spans = _sq_params(spark, SF)
    rows = sq_codes(spark, SF).collect()
    assert rows
    dim = len(spans)
    per_dim = [[] for _ in range(dim)]
    bound = sum((s // SQ_LEVELS + 1) ** 2 for s in spans)
    for r in rows:
        codes = [int(c) for c in r.codes.split("-")]
        assert len(codes) == dim
        assert all(0 <= c <= SQ_LEVELS for c in codes)
        assert 0 <= r.distortion <= bound, (r.distortion, bound)
        for d, c in enumerate(codes):
            per_dim[d].append(c)
    for d in range(dim):
        assert min(per_dim[d]) == 0, d
        assert max(per_dim[d]) == SQ_LEVELS, d


def test_sq_recall_high(spark):
    """8 bits/dim loses little — the cheap rung of the compression ladder,
    unlike PQ's deliberately lossy one. On this 50-vector fixture the exact
    top-5 are all FAR neighbors (no planted clusters), the adversarial case
    for any quantizer: ties between distant candidates flip on rounding
    noise, so recall is 0.82 here (deterministic — integer math) and ~1.0
    on realistic corpora where true neighbors are separated."""
    from forum_dl_spark.operators.similarity import sq_recall

    rows = sq_recall(spark, SF).collect()
    assert len(rows) == 10
    mean = sum(r.recall for r in rows) / len(rows)
    assert mean >= 0.8, mean


def test_sq_encoding_zero_exchange(spark):
    """The quantizer params are literals in the plan, so encoding (and the
    distortion audit) is scan + project — NO exchange anywhere."""
    from forum_dl_spark.operators.similarity import sq_codes

    plan = sq_codes(spark, SF)._jdf.queryExecution().executedPlan().toString()
    # r6: spread() may add one RoundRobin input repartition; the pin is
    # "no keyed exchange" (params stay plan literals).
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_sq_topk_broadcast_and_one_exchange(spark):
    from forum_dl_spark.operators.similarity import sq_topk

    df = sq_topk(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_sq_params_memoized_per_session(spark):
    from forum_dl_spark.operators import similarity as sim

    a = sim._sq_params(spark, SF)
    b = sim._sq_params(spark, SF)
    assert a is b
    key = (spark.sparkContext.applicationId, SF)
    assert key in sim._SQ_PARAMS_MEMO


# --- MMR diversified top-k -----------------------------------------------------


def _mmr_python(sf):
    """Independent greedy MMR replay on the raw parquet."""
    import math

    import pyarrow.parquet as pq

    from forum_dl_spark.operators.similarity import (
        MMR_CAND,
        MMR_K,
        MMR_QUERIES,
        SQ_PRESCALE,
    )

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(i): [math.floor(float(x) * SQ_PRESCALE) for x in v]
        for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    out = {}
    for q in range(MMR_QUERIES):
        cand = sorted(
            ((d2(vecs[q], v), i) for i, v in vecs.items() if i != q)
        )[:MMR_CAND]
        picked = []
        rows = []
        for rank in range(1, MMR_K + 1):
            best = None
            for dq, i in cand:
                if i in picked:
                    continue
                div = (
                    min(d2(vecs[i], vecs[j]) for j in picked) if picked else None
                )
                score = dq if div is None else dq - div
                key = (score, i)
                if best is None or key < best[0]:
                    best = (key, i, dq, div)
            rows.append((rank, best[1], best[2], best[3]))
            picked.append(best[1])
        out[q] = rows
    return out


def test_mmr_matches_python_greedy(spark):
    from forum_dl_spark.operators.similarity import mmr_diversified_topk

    expect = _mmr_python(SF)
    got: dict = {}
    for r in mmr_diversified_topk(spark, SF).collect():
        got.setdefault(r.query_id, []).append(
            (r.rank, r.neighbor_id, r.dist_q, r.div_dist)
        )
    for q in got:
        got[q].sort()
    assert got == expect


def test_mmr_diversity_actually_bites(spark):
    """The reranked pick set must differ from the plain distance top-K for
    at least one query — otherwise the fixture isn't exercising the
    redundancy penalty at all."""
    from forum_dl_spark.operators.similarity import MMR_K, mmr_diversified_topk

    expect = _mmr_python(SF)
    plain_differs = False
    import math

    import pyarrow.parquet as pq

    from forum_dl_spark.operators.similarity import MMR_QUERIES, SQ_PRESCALE

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(i): [math.floor(float(x) * SQ_PRESCALE) for x in v]
        for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }
    for q in range(MMR_QUERIES):
        d = sorted(
            (sum((x - y) * (x - y) for x, y in zip(vecs[q], v)), i)
            for i, v in vecs.items()
            if i != q
        )
        top_ids = {i for _, i in d[:MMR_K]}
        mmr_ids = {i for _, i, _, _ in expect[q]}
        if mmr_ids != top_ids:
            plain_differs = True
    assert plain_differs


def test_mmr_plan_broadcast_candidates_then_pandas_kernel(spark):
    from forum_dl_spark.operators.similarity import mmr_diversified_topk

    plan = (
        mmr_diversified_topk(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan, plan
