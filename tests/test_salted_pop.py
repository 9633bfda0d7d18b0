"""Salted two-phase budgeted pop: exact-set equality with the unsalted
pop, the skewed-host window actually splits across salt partitions, and a
full crawl under salting stays bit-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.crawl.politeness import budgeted_pop
from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb


def _skewed_frontier(spark, big=5000, small=10):
    """One mega-host + one tiny host, shuffled priorities/ords."""
    rows = spark.range(big).select(
        F.concat(F.lit("https://big.example/p"), F.col("id")).alias("url"),
        F.lit("big.example").alias("host"),
        (F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(5)))
        .cast("int").alias("priority"),
        F.lpad(F.hex(F.col("id")), 16, "0").alias("ord"),
    )
    tiny = spark.range(small).select(
        F.concat(F.lit("https://tiny.example/p"), F.col("id")).alias("url"),
        F.lit("tiny.example").alias("host"),
        F.lit(1).alias("priority"),
        F.lpad(F.hex(F.col("id")), 16, "0").alias("ord"),
    )
    return rows.unionByName(tiny)


def _sets(popped, remaining):
    p = {tuple(r) for r in popped.select("url", "host").collect()}
    r = {tuple(r) for r in remaining.select("url", "host").collect()}
    return p, r


def test_salted_pop_equals_unsalted(spark):
    fr = _skewed_frontier(spark)
    plain = budgeted_pop(fr, None, 100, salts=0)
    for s in (2, 8, 64):
        salted = budgeted_pop(fr, None, 100, salts=s)
        assert _sets(*salted) == _sets(*plain), f"salts={s}"
    # sanity: the pop is really budgeted
    p, r = _sets(*plain)
    assert len(p) == 110 and len(r) == 5000 + 10 - 110


def test_salted_pop_with_per_host_budgets(spark):
    fr = _skewed_frontier(spark)
    budgets = spark.createDataFrame(
        [("big.example", 7)], ["host", "max_fetches_per_superstep"]
    )
    plain = budgeted_pop(fr, budgets, 3, salts=0)
    salted = budgeted_pop(fr, budgets, 3, salts=16)
    assert _sets(*salted) == _sets(*plain)
    p, _ = _sets(*plain)
    assert sum(1 for _, h in p if h == "big.example") == 7
    assert sum(1 for _, h in p if h == "tiny.example") == 3


def test_salted_window_partitions_by_salt(spark):
    """Phase 1's heavy sort must partition on (host, _salt) — that IS the
    skew defense; a plan that still windows on host alone would keep the
    mega-host in one straggler task."""
    import re

    fr = _skewed_frontier(spark)
    popped, _ = budgeted_pop(fr, None, 100, salts=8)
    plan = popped._jdf.queryExecution().executedPlan().toString()
    # phase 1: exchange keyed on (host, _salt); phase 2 re-ranks on host
    assert re.search(r"hashpartitioning\(host#\d+, _salt#\d+", plan), plan
    assert re.search(r"hashpartitioning\(host#\d+, \d+\)", plan), plan


def test_crawl_with_salted_pop_bit_identical(spark, tmp_path):
    srv = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    seed = "https://phpbb.example/"
    base = run_crawl(spark, srv, seed, str(tmp_path / "plain"),
                     CrawlConfig(host_budget=3))
    salted = run_crawl(spark, srv, seed, str(tmp_path / "salted"),
                       CrawlConfig(host_budget=3, salt_pop=8))

    def _tables(res):
        trace = [(r["url"], r["params"] or "", r["status_code"])
                 for r in res.pages().orderBy("ord", "attempt").collect()]
        seen = {(r["seen_key"], r["status"]) for r in res.seen().collect()}
        items = [(r["type"], tuple(r["path"] or ()), r["url"], r["content"])
                 for r in res.items().orderBy("ord").collect()]
        return trace, seen, items

    assert _tables(salted) == _tables(base)
