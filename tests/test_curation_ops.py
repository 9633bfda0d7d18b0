"""Behavior + plan pins for the round-5 curation trio: unicode_sanitize
(textops), curriculum_stages (pipeline), frontier_pop_sim (relational).
Oracle equality is covered by tests/test_operators_oracle.py
(auto-parametrized from the registry); these pin the semantics with
independent pure-Python replays and the plan shapes the scale claims
rest on.
"""

from __future__ import annotations

import hashlib
import math
import re

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _texts(spark):
    return {
        int(r.doc_id): r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


# --- unicode_sanitize -----------------------------------------------------------


def test_unicode_sanitize_round_trips_planted_corruption(spark):
    """Planted docs sanitize back to the fixed prefix + ORIGINAL text
    (the fixer repairs exactly what the corruption injected); clean ASCII
    docs pass through untouched with zero counters."""
    from forum_dl_spark.operators.textops import (SAN_PLANT_FIXED,
                                                  SANITIZE_EVERY,
                                                  SANITIZE_PHASE,
                                                  unicode_sanitize)

    texts = _texts(spark)
    rows = {int(r.doc_id): r for r in unicode_sanitize(spark, SF).collect()}
    assert set(rows) == set(texts)
    planted = [d for d in texts if d % SANITIZE_EVERY == SANITIZE_PHASE]
    assert planted  # non-vacuous
    for d, r in rows.items():
        if d in set(planted):
            assert r.clean_text == SAN_PLANT_FIXED + texts[d]
            assert r.changed == 1
            assert r.n_ctrl >= 1 and r.n_repl >= 1 and r.n_moji >= 2
        else:
            assert r.clean_text == texts[d]
            assert (r.changed, r.n_ctrl, r.n_repl, r.n_moji) == (0, 0, 0, 0)
        assert r.n_chars_clean == len(r.clean_text)


def test_unicode_sanitize_plan_is_map_only(spark):
    """The fixer is one codegen projection: no exchange, no join — the
    cheapest pass in the pipeline, which is why it can run first."""
    from forum_dl_spark.operators.textops import unicode_sanitize

    plan = _plan(unicode_sanitize(spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan


# --- curriculum_stages ----------------------------------------------------------


def _curriculum_replay(texts, k):
    scores = {
        d: (1000 * len(re.sub(r"[^A-Za-z]", "", t))) // max(1, len(t))
        for d, t in texts.items()
    }
    total = len(scores)
    c_lt = {
        s: sum(1 for v in scores.values() if v < s) for s in set(scores.values())
    }
    stage = {d: 1 + (k * c_lt[s]) // total for d, s in scores.items()}
    toks = {
        d: len([w for w in re.split(r"\s+", t) if w != ""])
        for d, t in texts.items()
    }
    agg = {}
    for d in scores:
        st = stage[d]
        n, tk, lo, hi = agg.get(st, (0, 0, 10**9, -1))
        agg[st] = (n + 1, tk + toks[d], min(lo, scores[d]), max(hi, scores[d]))
    out, cum = {}, 0
    for st in sorted(agg):
        n, tk, lo, hi = agg[st]
        cum += tk
        out[st] = (n, tk, lo, hi, cum)
    return out


def test_curriculum_stages_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.pipeline import (CURRICULUM_K,
                                                   curriculum_stages)

    texts = _texts(spark)
    want = _curriculum_replay(texts, CURRICULUM_K)
    got = {
        int(r.stage): (r.n_docs, r.n_tokens, r.score_min, r.score_max,
                       r.cum_tokens)
        for r in curriculum_stages(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 1  # non-vacuous: the fixture spans several stages


def test_curriculum_stages_are_contiguous_score_ranges(spark):
    """Stage k+1's minimum score strictly exceeds stage k's maximum —
    the partition-function property that makes the manifest order-
    independent (equal scores can never straddle a stage boundary)."""
    from forum_dl_spark.operators.pipeline import curriculum_stages

    rows = sorted(curriculum_stages(spark, SF).collect(),
                  key=lambda r: r.stage)
    for a, b in zip(rows, rows[1:]):
        assert a.score_max < b.score_min
    assert rows[-1].cum_tokens == sum(r.n_tokens for r in rows)


def test_curriculum_plan_has_no_global_sort_and_no_smj(spark):
    """The banned shape is ntile() over a global ORDER BY — a range
    exchange + single-partition window over the CORPUS. Here the only
    range-free corpus-sized stages are two hash aggregates; the stage
    map joins back broadcast."""
    from forum_dl_spark.operators.pipeline import curriculum_stages

    plan = _plan(curriculum_stages(spark, SF))
    assert "Exchange rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --- frontier_pop_sim -----------------------------------------------------------


def _frontier_replay(doc_ids, budget, window):
    rows = []
    for d in doc_ids:
        host = f"host{math.isqrt(_h32(str(d)) % 1024)}"
        prio = _h32(f"p:{d}") % 3
        rows.append((host, d, prio))
    by_host: dict[str, list] = {}
    for host, d, prio in sorted(rows, key=lambda r: (r[2], r[1])):
        by_host.setdefault(host, []).append((host, d, prio))
    admitted = []
    for host, items in by_host.items():
        for rank, (h, d, p) in enumerate(items, 1):
            if rank <= budget:
                admitted.append((h, d, p, rank))
    admitted.sort(key=lambda r: (r[2], r[1]))
    return set(admitted[:window])


def test_frontier_pop_sim_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.relational import (FRONTIER_HOST_BUDGET,
                                                     FRONTIER_WAVE_WINDOW,
                                                     frontier_pop_sim)

    texts = _texts(spark)
    want = _frontier_replay(sorted(texts), FRONTIER_HOST_BUDGET,
                            FRONTIER_WAVE_WINDOW)
    got = {
        (r.host, r.ord, r.priority, r.host_rank)
        for r in frontier_pop_sim(spark, SF).collect()
    }
    assert got == want
    assert len(got) == FRONTIER_WAVE_WINDOW
    # the budget binds: some host hit its cap (skew is real)
    capped = {h for h, _, _, rank in got if rank == FRONTIER_HOST_BUDGET}
    assert capped


def test_frontier_pop_plan_topk_no_global_sort(spark):
    """The wave's global top-W compiles to TakeOrderedAndProject
    (per-partition heaps) — no range exchange, no single-partition
    window; the host rank window is the plan's only hash exchange."""
    from forum_dl_spark.operators.relational import frontier_pop_sim

    plan = _plan(frontier_pop_sim(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
