"""Plan + semantic pins for the mixing / prefix-dedup / template batch.

Oracle equality vs DuckDB is covered by test_operators_oracle.py (the
registry auto-parametrizes); here we pin the claimed plan shapes and the
semantics a hash-equal oracle could still mask: the isqrt expression is
EXACT over adversarial inputs, the budget draw is a true greedy prefix,
and the prefix-dupe count matches an independent Python recount.
"""

from __future__ import annotations

import hashlib
import math
import re

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_hash_exchanges(df) -> int:
    return _plan(df).count("Exchange hashpartitioning")


def _toks(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


# --- plan pins -----------------------------------------------------------------


def test_mix_weights_broadcast_only(spark):
    """Weight table: source-keyed aggregate + 1-row broadcast normalizer —
    no SortMergeJoin, no range partitioning anywhere."""
    from forum_dl_spark.operators.mixing import mix_weights_temperature

    df = mix_weights_temperature(spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_mix_budget_sample_broadcast_one_corpus_exchange(spark):
    """The corpus side passes through exactly one source-keyed exchange
    (the greedy window); budgets join via broadcast; no SMJ, no global
    sort."""
    from forum_dl_spark.operators.mixing import mix_budget_sample

    df = mix_budget_sample(spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the window's exchange carries only narrow columns, never the text
    assert "text" not in plan.split("Window")[0].split("Exchange")[-1]


def test_dedup_prefix_no_join_two_exchanges(spark):
    """Prefix dedup is fingerprint-window + source rollup: exactly two
    hash exchanges, no join operator of any kind."""
    from forum_dl_spark.operators.dedup import dedup_prefix

    df = dedup_prefix(spark, SF)
    plan = _plan(df)
    assert _n_hash_exchanges(df) == 2, plan
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_template_ngrams_no_join_bounded_exchanges(spark):
    """distinct + DF-count + per-source top-K window: at most three hash
    exchanges, no join, no global sort."""
    from forum_dl_spark.operators.textstats import template_ngrams

    df = template_ngrams(spark, SF)
    plan = _plan(df)
    assert _n_hash_exchanges(df) <= 3, plan
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


# --- semantic pins ---------------------------------------------------------------


def test_isqrt_expression_exact(spark):
    """The ±1-corrected double-sqrt seed equals math.isqrt on adversarial
    inputs: perfect squares and their neighbours, including values big
    enough that the double seed is off by one ulp."""
    from forum_dl_spark.operators.mixing import _isqrt_expr

    vals = []
    for base in [0, 1, 2, 3, 10, 999, 10**6, 10**9, 10**12, 4503599627370496]:
        for d in (-1, 0, 1):
            v = base + d
            if v >= 0:
                vals.append(v)
    for s in [5, 1000, 10**6, 94906265]:  # isqrt boundaries s² ± 1
        for v in (s * s - 1, s * s, s * s + 1):
            vals.append(v)
    df = spark.createDataFrame([(v,) for v in vals], "n bigint")
    rows = df.selectExpr("n", f"{_isqrt_expr('n')} as s").collect()
    for r in rows:
        assert r.s == math.isqrt(r.n), (r.n, r.s, math.isqrt(r.n))


def _hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_mix_budget_sample_is_greedy_prefix(spark):
    """Recompute the draw in pure Python (md5 hash order + running token
    sum vs the integer-exact budget) and require the exact same pick set;
    also check every source's picks are a contiguous rank prefix."""
    from forum_dl_spark.operators.mixing import (mix_budget_sample,
                                                 mix_weights_temperature)

    budgets = {
        r.source: r.budget_tokens
        for r in mix_weights_temperature(spark, SF).collect()
    }
    t = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    by_src: dict[str, list] = {}
    for row in t:
        by_src.setdefault(row["source"], []).append(
            (_hash32(f"mixsel:{row['doc_id']}"), row["doc_id"],
             len(_toks(row["text"])))
        )
    expected = set()
    for src, rows in by_src.items():
        rows.sort()
        cum = 0
        for h, doc_id, n_tok in rows:
            if cum < budgets[src]:
                expected.add(doc_id)
            cum += n_tok
    got = mix_budget_sample(spark, SF).collect()
    assert {r.doc_id for r in got} == expected
    ranks: dict[str, list] = {}
    for r in got:
        ranks.setdefault(r.source, []).append(r.pick_rank)
    for src, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1)), src
    # a real subset: something picked, something left out
    assert 0 < len(expected) < len(t)


def test_dedup_prefix_matches_python_recount(spark):
    """Independent recount of prefix-16 duplicates per source; the fixture
    plants real prefix collisions (truncated-copy near-dups), so the
    result must be non-trivial."""
    from forum_dl_spark.operators.dedup import PREFIX_TOKENS, dedup_prefix

    t = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    first_seen: dict[str, int] = {}
    for row in sorted(t, key=lambda r: r["doc_id"]):
        fp = " ".join(_toks(row["text"])[:PREFIX_TOKENS])
        first_seen.setdefault(fp, row["doc_id"])
    per_src: dict[str, int] = {}
    for row in t:
        fp = " ".join(_toks(row["text"])[:PREFIX_TOKENS])
        if row["doc_id"] > first_seen[fp]:
            per_src[row["source"]] = per_src.get(row["source"], 0) + 1
    got = {r.source: r.n_prefix_dupes for r in dedup_prefix(spark, SF).collect()}
    for src, n in got.items():
        assert n == per_src.get(src, 0), src
    assert sum(got.values()) > 0  # non-trivial fixture structure


def test_template_ngrams_matches_python_recount(spark):
    """Per-source document-frequency recount; top-K rows must agree with
    the (df desc, gram asc) order, K rows per qualifying source."""
    from forum_dl_spark.operators.textstats import (TEMPLATE_N,
                                                    TEMPLATE_TOPK,
                                                    template_ngrams)

    t = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    df_count: dict[str, dict[str, int]] = {}
    for row in t:
        w = _toks(row["text"])
        grams = {
            " ".join(w[i : i + TEMPLATE_N])
            for i in range(len(w) - TEMPLATE_N + 1)
        }
        d = df_count.setdefault(row["source"], {})
        for g in grams:
            d[g] = d.get(g, 0) + 1
    got: dict[str, list] = {}
    for r in template_ngrams(spark, SF).collect():
        got.setdefault(r.source, []).append((r.rank, r.gram, r.df))
    assert set(got) == set(df_count)
    for src, rows in got.items():
        rows.sort()
        expect = sorted(
            df_count[src].items(), key=lambda kv: (-kv[1], kv[0])
        )[:TEMPLATE_TOPK]
        assert [(g, d) for _, g, d in rows] == expect, src
