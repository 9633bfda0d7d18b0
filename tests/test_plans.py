"""Physical-plan regression guards: the PLANS.md claims, pinned by tests.

These assert plan SHAPE (pruned read schemas, shuffle counts), not timing —
a refactor that silently reintroduces a shuffle or un-prunes the body column
fails here long before a benchmark would notice.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    # count shuffle exchanges in the pre-AQE physical plan
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.count("Exchange hashpartitioning") + s.count("Exchange rangepartitioning")


def test_simhash_is_shuffle_free(spark):
    from forum_dl_spark.operators.dedup import dedup_simhash

    df = dedup_simhash(spark, SF)
    assert _n_exchanges(df) == 0, _plan(df)
    # and the scan reads only the two needed columns
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in _plan(df)


def test_ann_lsh_single_exchange_and_literal_weights(spark):
    from forum_dl_spark.operators.similarity import ann_lsh_buckets

    df = ann_lsh_buckets(spark, SF)
    # partial agg -> one exchange -> final agg
    assert _n_exchanges(df) == 1, _plan(df)
    # hyperplane weights are plan literals, not per-row md5 calls
    plan = _plan(df)
    assert "md5" not in plan
    assert "[1.0,-1.0" in plan.replace(" ", "") or "[-1.0,1.0" in plan.replace(" ", "")


def test_token_count_narrow(spark):
    from forum_dl_spark.operators.textops import token_count

    df = token_count(spark, SF)
    assert _n_exchanges(df) == 0, _plan(df)


def test_seen_anti_join_no_aggregate(spark):
    """The URL-seen gate must stay a bare left-anti join: no aggregate
    (distinct) on the seen/pending right sides — that would be a second
    full shuffle over the hottest relation every superstep."""
    from forum_dl_spark.crawl.superstep import _anti_join_gate

    cand = spark.range(100).selectExpr("cast(id as string) seen_key", "id ord")
    seen = spark.range(50).selectExpr("cast(id * 2 as string) seen_key").union(
        spark.range(10).selectExpr("cast(id as string) seen_key")
    )
    df = _anti_join_gate(cand, seen)
    plan = _plan(df)
    assert "HashAggregate" not in plan, plan
    assert "LeftAnti" in plan
    # semantics: duplicates on the right change nothing
    assert df.count() == _anti_join_gate(cand, seen.distinct()).count()


def test_crawl_pages_projection_prunes_body(spark, tmp_path):
    """The scheduler-facing projections read pruned schemas: a url/ord
    selection over pages() must NOT read the body column from parquet."""
    from forum_dl_spark.crawl import CrawlConfig, run_crawl
    from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb

    srv = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    res = run_crawl(spark, srv, "https://phpbb.example/", str(tmp_path / "c"),
                    CrawlConfig())
    plan = _plan(res.pages().select("url", "ord"))
    import re

    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    assert schemas
    assert all("p_body" not in s for s in schemas), plan


def test_contamination_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must be the BROADCAST side of the overlap
    join — the big training side streams through a map-side hash join with
    no shuffle (the whole point of the benchmark-side-is-small design). A
    SortMergeJoin here would shuffle every training shingle."""
    from forum_dl_spark.operators.textops import contamination_ngram

    df = contamination_ngram(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # pruned scan: only doc_id + text are read
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_lsh_verified_broadcasts_candidates(spark):
    """The two-stage dedup's verify stage must BROADCAST the candidate
    side into BOTH per-doc shingle-set joins (doc_a, then doc_b) — the
    docstring's claimed 100 TB shape, hinted explicitly rather than left
    to AQE. A SortMergeJoin on either doc-id key would shuffle the per-doc
    shingle arrays."""
    import re

    from forum_dl_spark.operators.dedup import dedup_lsh_verified

    plan = _plan(dedup_lsh_verified(spark, SF))
    assert re.search(r"BroadcastHashJoin \[doc_a#\d+L\]", plan), plan
    assert re.search(r"BroadcastHashJoin \[doc_b#\d+L\]", plan), plan
    assert not re.search(r"SortMergeJoin \[doc_[ab]#", plan), plan


def test_source_rollup_single_exchange(spark):
    """The per-source rollup is one map-side-combined hash aggregate:
    partial agg -> single exchange on the group keys -> final agg."""
    from forum_dl_spark.operators.textops import source_quality_rollup

    df = source_quality_rollup(spark, SF)
    assert _n_exchanges(df) == 1, _plan(df)


def test_pii_scrub_zero_exchange(spark):
    """Redaction is a narrow whole-stage-codegen projection — no shuffle,
    scan pruned to the two needed columns."""
    from forum_dl_spark.operators.textops import pii_scrub

    df = pii_scrub(spark, SF)
    assert _n_exchanges(df) == 0, _plan(df)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in _plan(df)


def test_repetition_stats_keyed_aggregates_only(spark):
    """The bigram mode is two key-partitioned hash aggregates + a doc_id
    equi-join — no range partitioning (global sort) and no cartesian."""
    from forum_dl_spark.operators.textops import repetition_stats

    df = repetition_stats(spark, SF)
    plan = _plan(df)
    assert "Exchange rangepartitioning" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_pack_sequences_single_exchange_no_global_sort(spark):
    """Packing is one hash exchange on `source` + a per-partition sort —
    no Exchange rangepartitioning (a global total order would be the
    100 TB scale-killer) and a scan pruned to the three needed columns."""
    from forum_dl_spark.operators.textops import pack_sequences

    df = pack_sequences(spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string,source:string>" in plan, plan


def test_minhash_signature_single_doc_exchange_no_inflation(spark):
    """The K min-hashes are K aggregate COLUMNS of one groupBy(doc_id) —
    NOT K exploded rows. The round-4 shape (crossJoin with a K-row seed
    relation, groupBy(doc_id, j), then groupBy(doc_id, band)) inflated the
    shingle relation K× and paid two doc-keyed exchanges per join side;
    this pins the one-exchange-per-side shape and the absence of any
    (doc_id, j)/(doc_id, band)-keyed exchange or nested-loop seed join."""
    from forum_dl_spark.operators.dedup import _minhash_sig, dedup_minhash_lsh

    # the signature build itself (un-memoized — the r6 pair memo wraps
    # dedup_minhash_lsh's output in a cached relation whose AQE rendering
    # repeats the plan sections and defeats a raw substring count)
    sig_plan = _plan(_minhash_sig(spark, SF))
    import re

    assert sig_plan.count("hashpartitioning(doc_id#") == 1, sig_plan
    assert not re.search(r"hashpartitioning\(doc_id#\d+L?, (j|band)#", sig_plan), sig_plan

    df = dedup_minhash_lsh(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert not re.search(r"hashpartitioning\(doc_id#\d+L?, (j|band)#", plan), plan


def test_bottomk_sample_is_take_ordered(spark):
    """Fixed-size hash-rank sampling compiles to TakeOrderedAndProject —
    per-partition top-N heaps, no range exchange (global sort) anywhere."""
    from forum_dl_spark.operators.pipeline import bottomk_sample

    df = bottomk_sample(spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in plan, plan


def test_ngram_lm_topk_single_exchange_take_ordered(spark):
    """Bigram construction is a narrow projection; the LM count is one
    map-side-combined gram-keyed exchange; the top-K is TakeOrdered (the
    final rank window runs over K rows only)."""
    from forum_dl_spark.operators.textops import ngram_lm_topk

    df = ngram_lm_topk(spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "ReadSchema: struct<text:string>" in plan, plan


def test_events_asof_join_is_one_window_no_join(spark):
    """The as-of join compiles to union + ONE user_id exchange + window —
    no join operator of any kind (the naive encodings are a range-join
    BroadcastNestedLoopJoin or a per-key Python loop; this pins their
    absence), and the scan is pruned to the four needed columns."""
    from forum_dl_spark.operators.relational import events_asof_join

    df = events_asof_join(spark, SF)
    plan = _plan(df)
    for bad in ("Join", "CartesianProduct"):
        assert bad not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert (
        "ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,"
        "event_type:string>" in plan
    ), plan


def test_minhash_jaccard_est_candidate_bounded(spark):
    """The estimator audit never goes all-pairs: candidate pairs are
    broadcast into the signature and shingle-set lookups (three
    BroadcastHashJoins), and no cartesian/nested-loop join appears."""
    from forum_dl_spark.operators.dedup import minhash_jaccard_est

    df = minhash_jaccard_est(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_dsir_scoring_no_join_single_doc_exchange(spark):
    """DSIR's scoring pass inlines the collected 4096-bucket model as a
    literal array, so the returned plan has NO join of any kind and
    exactly one hash exchange (the doc_id-keyed map-side-combined sum);
    the top-K is TakeOrdered and the scan is pruned to (doc_id, text)."""
    from forum_dl_spark.operators.pipeline import dsir_weights

    df = dsir_weights(spark, SF)
    plan = _plan(df)
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_bpe_first_merges_single_exchange_take_ordered(spark):
    """BPE round-1 pair construction is a narrow two-explode projection;
    the count is one map-side-combined pair-keyed exchange (a few-thousand
    -key domain, so the partial combine collapses nearly all traffic);
    the top-K is TakeOrdered; the scan reads text only."""
    from forum_dl_spark.operators.textops import bpe_first_merges

    df = bpe_first_merges(spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "ReadSchema: struct<text:string>" in plan, plan


def test_bpe_encode_apply_is_zero_exchange_map_only(spark):
    """Once the merge table is trained (tiny driver-side state, memoized),
    encoding is a pure map: symbolize -> R composed literal replaces ->
    marker count. The returned plan must contain no join and no exchange
    of any kind, and the scan reads only (doc_id, text) — the operator
    inherits the corpus partitioning untouched at any scale."""
    from forum_dl_spark.operators.textops import bpe_encode

    df = bpe_encode(spark, SF)
    plan = _plan(df)
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert _n_exchanges(df) == 0, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_pack_sequences_bpe_single_exchange_no_join(spark):
    """Packing under the trained tokenizer keeps pack_sequences' plan:
    the token pricing is a map-only projection (rules are plan literals),
    so the only exchange is the source-keyed window partitioning — no
    join, no global sort, scan pruned to (doc_id, source, text)."""
    from forum_dl_spark.operators.textops import pack_sequences_bpe

    df = pack_sequences_bpe(spark, SF)
    plan = _plan(df)
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string,source:string>" in plan or \
        "ReadSchema: struct<doc_id:bigint,source:string,text:string>" in plan, plan


def test_dsir_apply_broadcasts_selection(spark):
    """The DSIR EMIT joins a fixed-size top-K selection back to the
    corpus: the selection side must broadcast (one BroadcastHashJoin) so
    the documents scan never shuffles."""
    from forum_dl_spark.operators.pipeline import dsir_apply

    df = dsir_apply(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_quality_classifier_apply_zero_exchange_map_only(spark):
    """Once the distilled classifier is fitted (2048-entry literal weight
    array + calibrated threshold — tiny driver-side model state, memoized
    per session), the production APPLY is a pure filter-projection: the
    returned plan must contain no join and no exchange of any kind, so
    the kept corpus inherits the raw corpus's partitioning at any scale."""
    from forum_dl_spark.operators.pipeline import quality_classifier_apply

    df = quality_classifier_apply(spark, SF)
    plan = _plan(df)
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert _n_exchanges(df) == 0, plan


def test_quality_classifier_eval_single_tiny_exchange(spark):
    """The out-of-sample audit adds only the 4-group (label, pred)
    aggregate on top of the map-only scoring — exactly one hash exchange
    (map-side combined to <= 4 rows), no join, no global sort."""
    from forum_dl_spark.operators.pipeline import quality_classifier_eval

    df = quality_classifier_eval(spark, SF)
    plan = _plan(df)
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
