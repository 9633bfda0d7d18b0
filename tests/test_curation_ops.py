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
    # r6: the scan-side spread() may add one RoundRobin input repartition
    # (parallelizing the unsplittable single-row-group fixture scan); the
    # pin is "no keyed exchange, no join" — nothing is grouped or joined.
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
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


# --- urlseen_bloom_audit --------------------------------------------------------


def _urlseen_replay(doc_ids, m, hosts):
    def h32(s, off=0):
        return int(hashlib.md5(s.encode()).hexdigest()[off:off + 8], 16)

    def positions(url):
        return (h32(url) % m, h32(url, 8) % m)

    rows = {}
    pos = set()
    urls = []
    for d in doc_ids:
        host = f"h{h32(str(d)) % hosts}.example"
        seen_url = f"https://{host}/t/{d}"
        unseen_url = f"https://{host}/u/{d}"
        pos.update(positions(seen_url))
        urls.append((host, seen_url, 1))
        urls.append((host, unseen_url, 0))
    for host, url, is_seen in urls:
        p1, p2 = positions(url)
        admitted = p1 in pos and p2 in pos
        n_seen, n_sa, n_unseen, n_fp = rows.get(host, (0, 0, 0, 0))
        rows[host] = (
            n_seen + is_seen,
            n_sa + (is_seen and admitted),
            n_unseen + (1 - is_seen),
            n_fp + ((not is_seen) and admitted),
        )
    return {
        h: (a, b, c, d, (10000 * d) // c) for h, (a, b, c, d) in rows.items()
    }


def test_urlseen_bloom_no_false_negatives_and_exact_fp(spark):
    from forum_dl_spark.operators.relational import (URLSEEN_HOSTS,
                                                     URLSEEN_M,
                                                     urlseen_bloom_audit)

    doc_ids = sorted(_texts(spark))
    want = _urlseen_replay(doc_ids, URLSEEN_M, URLSEEN_HOSTS)
    got = {
        r.host: (r.n_seen, r.n_seen_admitted, r.n_unseen, r.n_fp, r.fp_bp)
        for r in urlseen_bloom_audit(spark, SF).collect()
    }
    assert got == want
    for h, (n_seen, n_sa, _, _, _) in got.items():
        assert n_sa == n_seen  # blooms have no false negatives


def test_urlseen_bloom_plan_broadcast_words_no_smj(spark):
    """The 128-word filter broadcasts into both membership joins; the
    seen set itself is never broadcast, collected, or sort-merge
    joined."""
    from forum_dl_spark.operators.relational import urlseen_bloom_audit

    plan = _plan(urlseen_bloom_audit(spark, SF))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2


# --- robots_coverage_audit ------------------------------------------------------


def _robots_replay(doc_ids, hosts, paths, rules):
    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    out = {}
    for d in doc_ids:
        host = f"h{h32(str(d)) % hosts}.example"
        path = paths[h32(f"path:{d}") % 10] + str(d)
        blocked = any(
            h == host and path.startswith(p) for h, p in rules
        )
        n, b = out.get(host, (0, 0))
        out[host] = (n + 1, b + blocked)
    return {h: (n, b, (10000 * b) // n) for h, (n, b) in out.items()}


def test_robots_coverage_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.relational import (ROBOTS_PATHS,
                                                     URLSEEN_HOSTS,
                                                     _robots_rules,
                                                     robots_coverage_audit)

    doc_ids = sorted(_texts(spark))
    want = _robots_replay(doc_ids, URLSEEN_HOSTS, ROBOTS_PATHS,
                          _robots_rules())
    got = {
        r.host: (r.n_urls, r.n_blocked, r.blocked_bp)
        for r in robots_coverage_audit(spark, SF).collect()
    }
    assert got == want
    # the ruleset differentiates hosts: h3 (extra /u/ rule) blocks a
    # strictly larger share than a plain /admin/-only host
    plain = [bp for h, (_, _, bp) in got.items()
             if h not in ("h3.example",) and not h.startswith("h0")
             and not h.startswith("h4.") and not h.startswith("h8")
             and not h.startswith("h12")]
    assert got["h3.example"][2] > min(plain)


def test_robots_coverage_plan_broadcast_rules_no_smj(spark):
    from forum_dl_spark.operators.relational import robots_coverage_audit

    plan = _plan(robots_coverage_audit(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# --- politeness_schedule --------------------------------------------------------


def _schedule_replay(events):
    """The LITERAL recurrence a_i = max(t_i, a_{i-1} + d) — deliberately
    not the prefix-max identity the operator compiles to, so agreement
    proves the identity itself."""
    out = {}
    by_host: dict[int, list] = {}
    for host, eid, ts_us in sorted(events, key=lambda e: (e[0], e[2], e[1])):
        by_host.setdefault(host, []).append(ts_us)
    for host, ts_list in by_host.items():
        d = 100000000 * (1 + host % 4)
        sched = []
        for t in ts_list:
            a = t if not sched else max(t, sched[-1] + d)
            sched.append(a)
        waits = [a - t for a, t in zip(sched, ts_list)]
        out[host] = (
            len(ts_list),
            sum(waits) // 1000,
            max(waits) // 1000,
            (sched[-1] - ts_list[0]) // 1000,
        )
    return out


def test_politeness_schedule_matches_literal_recurrence(spark):
    import datetime

    from forum_dl_spark.operators.relational import politeness_schedule

    epoch = datetime.datetime(2024, 1, 1)
    events = [
        (int(r.user_id), int(r.event_id),
         int((r.ts - epoch).total_seconds() * 1_000_000))
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
    ]
    want = _schedule_replay(events)
    got = {
        int(r.host_id): (r.n_fetches, r.total_wait_ms, r.max_wait_ms,
                         r.makespan_ms)
        for r in politeness_schedule(spark, SF).collect()
    }
    assert got == want
    # non-vacuous: bursts exist, so politeness wait is incurred somewhere
    assert any(w for _, w, _, _ in got.values())


def test_politeness_schedule_plan_single_host_exchange_no_join(spark):
    """Rank window, prefix-max window and rollup all ride ONE host-keyed
    hash exchange; no join anywhere."""
    from forum_dl_spark.operators.relational import politeness_schedule

    plan = _plan(politeness_schedule(spark, SF))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
