"""Behavior pins for the final round-5 trio: shuffle_shards,
ppl_filter_apply, media_dedup_clusters.

Oracle equality is covered by tests/test_operators_oracle.py; these pin
the semantics with independent pure-Python replays plus the structural
invariants a hash match alone would not explain (no global window in the
shuffle plan; the CCNet emit is exactly the buckets relation filtered;
media clusters agree with a union-find over the pair relation).
"""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- shuffle_shards -----------------------------------------------------------


def test_shuffle_shards_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.pipeline import NSHUF_SHARDS, _docs, shuffle_shards

    doc_ids = [r.doc_id for r in _docs(spark, SF).select("doc_id").collect()]
    expect = {}
    keyed = []
    for d in doc_ids:
        h = int(hashlib.md5(f"shuf:{d}".encode()).hexdigest()[:8], 16)
        keyed.append((h % NSHUF_SHARDS, h, d))
    for shard in range(NSHUF_SHARDS):
        members = sorted((h, d) for s, h, d in keyed if s == shard)
        for pos, (h, d) in enumerate(members, start=1):
            expect[d] = (shard, pos)

    got = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_shards(spark, SF).collect()
    }
    assert got == expect


def test_shuffle_shards_positions_are_contiguous_per_shard(spark):
    from forum_dl_spark.operators.pipeline import shuffle_shards

    rows = shuffle_shards(spark, SF).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert sum(len(v) for v in by_shard.values()) == len(rows)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shuffle_shards_plan_has_no_single_partition_window(spark):
    # the whole point vs ntile-style global ordering: the window is
    # partitioned S ways, so no stage collapses to one partition
    from forum_dl_spark.operators.pipeline import shuffle_shards

    plan = _plan(shuffle_shards(spark, SF))
    assert "Exchange SinglePartition" not in plan, plan
    assert "Exchange hashpartitioning" in plan, plan


# --- ppl_filter_apply -----------------------------------------------------------


def test_ppl_filter_apply_is_buckets_relation_filtered(spark):
    from forum_dl_spark.operators.ir import perplexity_buckets, ppl_filter_apply

    buckets = {
        r.doc_id: (r.n_tokens, r.surprisal_bp, r.bucket)
        for r in perplexity_buckets(spark, SF).collect()
    }
    kept = {
        r.doc_id: (r.n_tokens, r.surprisal_bp, r.bucket)
        for r in ppl_filter_apply(spark, SF).collect()
    }
    expect = {d: v for d, v in buckets.items() if v[2] <= 2}
    assert kept == expect
    # ntile(3) guarantees the tail really is dropped: strictly fewer rows,
    # and roughly two thirds survive (bucket sizes differ by at most 1)
    n, k = len(buckets), len(kept)
    assert k < n
    assert abs(k - 2 * n / 3) <= 2


def test_ppl_filter_keeps_the_most_predictable_docs(spark):
    # every kept doc scores <= every dropped doc (with doc_id tiebreak,
    # the boundary can share a score but never invert)
    from forum_dl_spark.operators.ir import perplexity_buckets, ppl_filter_apply

    buckets = perplexity_buckets(spark, SF).collect()
    kept_ids = {r.doc_id for r in ppl_filter_apply(spark, SF).collect()}
    kept_max = max(r.surprisal_bp for r in buckets if r.doc_id in kept_ids)
    drop_min = min(r.surprisal_bp for r in buckets if r.doc_id not in kept_ids)
    assert kept_max <= drop_min


# --- media_dedup_clusters -------------------------------------------------------


def test_media_dedup_clusters_matches_union_find_over_pairs(spark):
    from forum_dl_spark.operators.multimodal import (
        media_dedup_clusters,
        media_phash_neardup,
    )

    pairs = [
        (r.media_a, r.media_b)
        for r in media_phash_neardup(spark, SF).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component min-id labels + sizes, edge-incident nodes only
    comp: dict[int, list[int]] = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    expect = {}
    for members in comp.values():
        label = min(members)
        for m in members:
            expect[m] = (label, len(members))

    got = {
        r.media_id: (r.cluster_id, r.cluster_size)
        for r in media_dedup_clusters(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0  # the planted 2-bit flips guarantee real clusters


def test_media_dedup_clusters_labels_are_component_minima(spark):
    from forum_dl_spark.operators.multimodal import media_dedup_clusters

    rows = media_dedup_clusters(spark, SF).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.media_id)
    for label, members in by_cluster.items():
        assert label == min(members)
        assert len(members) >= 2  # singletons are not edge-incident
