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
    assert "Exchange" not in plan, plan


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
