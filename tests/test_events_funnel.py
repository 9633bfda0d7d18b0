"""Behavior pins for the events funnel + cohort retention operators.

Oracle equality is covered by tests/test_operators_oracle.py; these pin
the ORDER semantics (the part a hash match would not explain if both
engines made the same mistake) against a pure-Python replay, plus the
plan shapes."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def _events():
    return duckdb.sql(
        f"SELECT user_id, event_type, ts FROM '{SF}/events.parquet'"
    ).fetchall()


def test_funnel_matches_python_ordered_replay(spark):
    from forum_dl_spark.operators.relational import events_funnel

    by_user: dict = {}
    for uid, et, ts in _events():
        if et in ("view", "click", "purchase"):
            by_user.setdefault(uid, []).append((ts, et))
    n = [0, 0, 0]
    for evs in by_user.values():
        t1 = min((ts for ts, et in evs if et == "view"), default=None)
        if t1 is None:
            continue
        n[0] += 1
        t2 = min(
            (ts for ts, et in evs if et == "click" and ts >= t1), default=None
        )
        if t2 is None:
            continue
        n[1] += 1
        t3 = min(
            (ts for ts, et in evs if et == "purchase" and ts >= t2),
            default=None,
        )
        if t3 is not None:
            n[2] += 1

    rows = {r.step: r for r in events_funnel(spark, SF).collect()}
    assert [rows[i + 1].n_users for i in range(3)] == n
    assert [rows[i + 1].step_name for i in range(3)] == [
        "view", "click", "purchase",
    ]
    assert rows[1].conv_bp == 10000
    for i in range(3):
        assert rows[i + 1].conv_bp == (10000 * n[i]) // max(n[0], 1)


def test_funnel_order_rule_bites(spark, tmp_path):
    """A purchase BEFORE the user's view->click chain must not convert —
    the semantics a naive per-type EXISTS gets wrong. Planted fixture:
    user 1 does purchase, view, click (converts steps 1-2 only);
    user 2 does view, click, purchase (full conversion)."""
    from datetime import datetime

    from forum_dl_spark.operators.relational import events_funnel

    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0), "purchase", 0.0, "{}"),
        (2, 1, datetime(2024, 1, 1, 0, 1), "view", 0.0, "{}"),
        (3, 1, datetime(2024, 1, 1, 0, 2), "click", 0.0, "{}"),
        (4, 2, datetime(2024, 1, 1, 0, 0), "view", 0.0, "{}"),
        (5, 2, datetime(2024, 1, 1, 0, 1), "click", 0.0, "{}"),
        (6, 2, datetime(2024, 1, 1, 0, 2), "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp,"
        " event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r.step: r.n_users for r in events_funnel(spark, str(tmp_path)).collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_funnel_single_user_exchange_before_collapse(spark):
    """The three cascaded windows + per-user collapse all ride ONE user_id
    hash exchange; the only other exchange is the 1-row count collapse."""
    from forum_dl_spark.operators.relational import events_funnel

    plan = (
        events_funnel(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "Exchange rangepartitioning" not in plan


def test_retention_matches_python_cohorts(spark):
    from forum_dl_spark.operators.relational import (
        RETENTION_MAX_OFFSET,
        events_retention,
    )

    cohort: dict = {}
    act: dict = {}
    for uid, et, ts in _events():
        d = ts.date()
        act.setdefault(uid, set()).add(d)
        if et == "signup" and (uid not in cohort or d < cohort[uid]):
            cohort[uid] = d
    size: dict = {}
    for uid, cd in cohort.items():
        size[cd] = size.get(cd, 0) + 1
    expect: dict = {}
    for uid, cd in cohort.items():
        for d in act[uid]:
            off = (d - cd).days
            if 0 <= off <= RETENTION_MAX_OFFSET:
                expect.setdefault((cd, off), set()).add(uid)

    got = {
        (r.cohort_day, r.day_offset): (r.n_active, r.retention_bp)
        for r in events_retention(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for (cd, off), users in expect.items():
        assert got[(cd, off)] == (
            len(users), (10000 * len(users)) // size[cd]
        ), (cd, off)


def test_retention_broadcasts_cohorts(spark):
    from forum_dl_spark.operators.relational import events_retention

    plan = (
        events_retention(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
