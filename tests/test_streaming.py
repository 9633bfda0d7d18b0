"""Structured Streaming operators, each verified against its batch
equivalent on the same input (stream == batch is the oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    from forum_dl_spark.crawl import CrawlConfig, run_crawl
    from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb

    srv = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    wd = tmp_path_factory.mktemp("stream") / "run"
    return run_crawl(spark, srv, "https://phpbb.example/", str(wd), CrawlConfig())


def test_stream_post_counts_equals_batch(spark, crawl):
    from forum_dl_spark.streaming import run_available_now, stream_post_counts

    got = {
        (r["hour"], r["n_posts"])
        for r in run_available_now(
            stream_post_counts(spark, crawl.workdir), "post_counts"
        ).collect()
    }
    want = {
        (r["hour"], r["n_posts"])
        for r in crawl.items()
        .filter((F.col("type") == "post") & F.col("creation_time").isNotNull())
        .groupBy(F.window("creation_time", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_posts"))
        .select(F.col("w.start").alias("hour"), "n_posts")
        .collect()
    }
    assert got == want and got


def test_stream_sessionize_equals_batch(spark):
    from forum_dl_spark.operators.relational import events_sessionize
    from forum_dl_spark.streaming import run_available_now, stream_sessionize

    res = run_available_now(
        stream_sessionize(spark, f"{SF}/events.parquet"), "sessions", "update"
    )
    # update-mode memory sink accumulates per-batch emissions: keep the last
    # (max-n_events) row per user — totals are monotone
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        res.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("user_id", "n_sessions", "n_events")
    )
    got = sorted(tuple(r) for r in final.collect())
    want = sorted(tuple(r) for r in events_sessionize(spark, SF).collect())
    assert got == want and len(got) > 0


def test_stream_dedup_exact_equals_batch_distinct(spark):
    """Streaming first-seen dedup drains to exactly the batch distinct
    fingerprint set — and the fixture has real duplicates, so the dedup
    actually dropped rows (non-vacuous)."""
    from forum_dl_spark.streaming import (
        docs_stream,
        run_available_now,
        stream_dedup_exact,
    )

    # planted-dupe FIXTURE feed (operator stays a pure first-seen dedup):
    # the sf0.01 docs have no exact duplicates, so replay the first 20
    # docs to guarantee the drop actually happens and is assertable
    src = docs_stream(spark, SF)
    feed = src.union(src.filter(F.col("doc_id") < 20))
    got = {
        r["fingerprint"]
        for r in run_available_now(
            stream_dedup_exact(spark, SF, source=feed), "dedup_stream", "append"
        ).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    norm = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    want = {
        r["fingerprint"]
        for r in docs.select(norm.alias("fingerprint")).distinct().collect()
    }
    assert got == want and got
    # the planted duplicate feed (first 20 docs twice) was dropped: the
    # stream saw docs.count()+20 rows but emitted exactly the distinct set
    assert len(got) <= docs.count()


def test_stream_quality_filter_equals_batch_and_stateless(spark):
    """Drained streaming quality gate == batch quality_filter_apply row set
    (same qf_keep_cond Column — anti-drift by construction), and the
    streaming plan is STATELESS: no state-store operator appears."""
    from forum_dl_spark.operators.textops import quality_filter_apply
    from forum_dl_spark.streaming import (
        run_available_now,
        stream_quality_filter,
    )

    sdf = stream_quality_filter(spark, SF)
    res = run_available_now(sdf, "t_stream_qf", "append")
    got = {tuple(r) for r in res.collect()}
    want = {tuple(r) for r in quality_filter_apply(spark, SF).collect()}
    assert got == want and got

    plan = sdf._jdf.queryExecution().analyzed().toString()
    for stateful in ("Deduplicate", "Aggregate", "FlatMapGroupsWithState"):
        assert stateful not in plan, plan
