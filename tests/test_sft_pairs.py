"""Pins for the session's operator batch: sft_pairs (crawl conversation
pairs), politeness_gap_audit (fetch-log gaps) and contamination_bloom
(bloom-prefiltered decontamination).

Oracle equality for the two oracled ops is covered by the registry-
parametrized tests/test_operators_oracle.py; here we pin the semantics a
both-engines-made-the-same-mistake hash match would not cover (pure-Python
replays, bloom no-false-negative vs the exact detector, refsim pairing
equality) plus the plan shapes."""

from __future__ import annotations

import duckdb
import pytest

from forum_dl_spark.fixtures import SyntheticDiscourse
from forum_dl_spark.oracle import run_reference_discourse
from forum_dl_spark.spans import extract_spans

SF = "/root/testdata/sf0.001"

# the SAME fixture params as operators/_fixture.py (the memoized crawl the
# registered sft_pairs query pairs up)
FIXTURE_KW = dict(
    seed=7, n_cats=1, n_subcats=1, n_topics=2, max_posts=25,
    topics_per_page=2, duplicate_topic=False,
)


# --- sft_pairs ---------------------------------------------------------------


def _expected_pairs():
    """Adjacent-turn pairs from the sequential reference simulation:
    posts grouped by thread path in emission order, text = the flattened
    text-span kernel over the post content (the same kernel the crawl's
    span column is pinned against in test_crawl_discourse)."""
    oracle = run_reference_discourse(
        SyntheticDiscourse(**FIXTURE_KW), "https://forum.example/"
    )
    by_thread: dict[str, list] = {}
    for it in oracle.items:
        if it.type == "post":
            by_thread.setdefault(".".join(it.path), []).append(it)

    def text(it):
        return " ".join(
            s.text
            for s in extract_spans(it.content or "", it.origin)
            if s.kind == "text"
        )

    want = set()
    for tid, ps in by_thread.items():
        for i in range(1, len(ps)):
            want.add(
                (tid, i - 1, ps[i - 1].author, text(ps[i - 1]),
                 ps[i].author, text(ps[i]))
            )
    return want


def test_sft_pairs_match_refsim_threads(spark):
    from forum_dl_spark.operators.corpus import sft_pairs

    got = {
        (r.thread_id, r.turn, r.prompt_author, r.prompt_text,
         r.response_author, r.response_text)
        for r in sft_pairs(spark, "unused").collect()
    }
    want = _expected_pairs()
    assert got == want
    assert len(want) > 10  # non-vacuous: two topics with ~25 posts each


def test_sft_pairs_single_thread_exchange(spark):
    from forum_dl_spark.operators.corpus import sft_pairs

    plan = (
        sft_pairs(spark, "unused")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one thread-keyed exchange for the window; the crawl tables underneath
    # contribute no join on the pairing path
    assert plan.count("Exchange hashpartitioning(thread_id") == 1, plan
    assert "SortMergeJoin" not in plan


# --- sft_pairs_tree ------------------------------------------------------------


def _expected_tree_pairs():
    """Reply-tree pairs from the HyperKitty reference simulation: every
    post with a non-empty subpath pairs with the post whose subpath is
    its parent chain (thread roots have empty subpaths)."""
    from forum_dl_spark.fixtures.hyperkitty import SyntheticHyperkitty
    from forum_dl_spark.oracle.refsim_hyperkitty import (
        run_reference_hyperkitty,
    )

    oracle = run_reference_hyperkitty(
        SyntheticHyperkitty(seed=42), "https://hk.example/list/mylist.example/"
    )

    def text(it):
        return " ".join(
            s.text
            for s in extract_spans(it.content or "", it.origin)
            if s.kind == "text"
        )

    posts = {
        (".".join(it.path), ".".join(it.subpath)): it
        for it in oracle.items
        if it.type == "post"
    }
    want = set()
    for (tid, key), it in posts.items():
        if not key:
            continue  # thread root: prompt only
        parent = posts[(tid, ".".join(it.subpath[:-1]))]
        want.add(
            (tid, key, parent.author, text(parent), it.author, text(it))
        )
    return want


def test_sft_pairs_tree_match_refsim_reply_tree(spark):
    from forum_dl_spark.operators.corpus import sft_pairs_tree

    got = {
        (r.thread_id, r.response_key, r.prompt_author, r.prompt_text,
         r.response_author, r.response_text)
        for r in sft_pairs_tree(spark, "unused").collect()
    }
    want = _expected_tree_pairs()
    assert got == want
    assert len(want) > 3  # non-vacuous: replies exist across threads


# --- manifest_diff --------------------------------------------------------------


def test_manifest_diff_catches_exactly_the_three_planted_changes(spark):
    """The diff flags exactly the shards holding the edited, deleted and
    added docs (per the same md5-shard recipe), and every other shard's
    digests agree — including the edit shard keeping n_docs constant
    while its digests move (the case raw counts miss)."""
    from forum_dl_spark.operators.audits import (
        MANIFEST_ADD_ID,
        MANIFEST_DEL_ID,
        MANIFEST_EDIT_ID,
        MERKLE_SHARDS,
        manifest_diff,
    )

    def shard(doc_id: int) -> int:
        import hashlib

        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) \
            % MERKLE_SHARDS

    rows = {r.shard: r for r in manifest_diff(spark, SF).collect()}
    want_shards = {shard(i) for i in
                   (MANIFEST_EDIT_ID, MANIFEST_DEL_ID, MANIFEST_ADD_ID)}
    assert set(rows) == want_shards

    edit_s, del_s, add_s = (shard(MANIFEST_EDIT_ID), shard(MANIFEST_DEL_ID),
                            shard(MANIFEST_ADD_ID))
    assert rows[edit_s].n_docs_a == rows[edit_s].n_docs_b  # edit: count same
    assert rows[edit_s].digest_xor_a != rows[edit_s].digest_xor_b
    if del_s != edit_s and del_s != add_s:
        assert rows[del_s].n_docs_b == rows[del_s].n_docs_a - 1
    if add_s != edit_s and add_s != del_s:
        assert rows[add_s].n_docs_b == rows[add_s].n_docs_a + 1


# --- politeness_gap_audit ------------------------------------------------------


def test_politeness_gaps_match_python_replay(spark):
    from forum_dl_spark.operators.relational import (
        POLITENESS_MIN_GAP_MS,
        politeness_gap_audit,
    )

    evs = duckdb.sql(
        f"SELECT user_id, event_id, epoch_us(ts) FROM '{SF}/events.parquet'"
    ).fetchall()
    by_host: dict[int, list] = {}
    for uid, eid, us in evs:
        by_host.setdefault(uid, []).append((us, eid))
    want = {}
    for uid, rows in by_host.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        gaps = sorted(
            rows[i][0] - rows[i - 1][0] for i in range(1, len(rows))
        )
        if not gaps:
            continue  # single-fetch hosts have no gaps
        n = len(gaps)
        p50 = gaps[((50 * n) + 99) // 100 - 1]
        want[uid] = (
            n + 1,
            gaps[0] // 1000,
            p50 // 1000,
            sum(1 for g in gaps if g < POLITENESS_MIN_GAP_MS * 1000),
        )

    got = {
        r.host_id: (r.n_fetches, r.min_gap_ms, r.p50_gap_ms, r.n_violations)
        for r in politeness_gap_audit(spark, SF).collect()
    }
    assert got == want
    assert any(v[3] > 0 for v in want.values())  # threshold actually bites


def test_politeness_single_host_exchange(spark):
    """Lag window, rank window, count window and the rollup all ride ONE
    host-keyed hash exchange (the alias-above-the-window trick); no join."""
    from forum_dl_spark.operators.relational import politeness_gap_audit

    plan = (
        politeness_gap_audit(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan and "Exchange rangepartitioning" not in plan


# --- contamination_bloom -------------------------------------------------------


@pytest.fixture(scope="module")
def bloom_rows(spark):
    from forum_dl_spark.operators.textops import contamination_bloom

    return contamination_bloom(spark, SF).collect()


def test_bloom_has_no_false_negatives(spark, bloom_rows):
    """Every exact contamination hit survives the bloom with the SAME
    n_hits (blooms never drop a present key), and every bloom n_hits > 0
    exists in the exact detector — the two operators agree exactly on the
    verified column."""
    from forum_dl_spark.operators.textops import contamination_ngram

    exact = {r.doc_id: r.n_hits for r in contamination_ngram(spark, SF).collect()}
    bloom = {r.doc_id: r.n_hits for r in bloom_rows}
    assert all(bloom.get(k) == v for k, v in exact.items())
    assert all(exact.get(k, 0) == v for k, v in bloom.items() if v > 0)


def test_bloom_candidates_bound_hits(bloom_rows):
    assert all(r.n_candidates >= r.n_hits for r in bloom_rows)
    assert sum(r.n_hits for r in bloom_rows) > 0  # non-vacuous


def test_bloom_prefilter_is_joinless_below_broadcast_verify(spark):
    """The bloom test is literal bit arithmetic (shiftright on the inlined
    words) in a map-only filter; the ONLY join anywhere is the broadcast
    verify. No shuffle join, no shingle-string broadcast of the eval side
    on the training path."""
    from forum_dl_spark.operators.textops import contamination_bloom

    plan = (
        contamination_bloom(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "shiftright" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
