"""Pins for semantic_dedup_apply and mix_sample beyond the oracle hash:
the semantic invariants (who survives, who is collapsed, what rates apply)
and the broadcast plan shape of the mixture sampler.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_semantic_dedup_collapses_planted_copies(spark):
    """Every planted scaled copy (vec_id + OFFSET) must collapse into its
    original's cluster: survivors are exactly the original vec_ids, the
    first NEARDUP_SEEDS of them with n_members == 2."""
    from forum_dl_spark.operators.pipeline import semantic_dedup_apply
    from forum_dl_spark.operators.similarity import (NEARDUP_ID_OFFSET,
                                                     NEARDUP_SEEDS, _emb)

    rows = {r.vec_id: r.n_members for r in semantic_dedup_apply(spark, SF).collect()}
    originals = {r.vec_id for r in _emb(spark, SF).select("vec_id").collect()}
    assert set(rows) == originals  # no planted id survives
    for vid, n in rows.items():
        if vid < NEARDUP_SEEDS:
            assert n == 2, (vid, n)  # original + its planted copy
        else:
            assert n == 1, (vid, n)
    assert all(vid + NEARDUP_ID_OFFSET not in rows for vid in range(NEARDUP_SEEDS))


def test_mix_sample_rates_and_determinism(spark):
    """rate_bp = floor(10000 * sqrt(n_lang / n_max)); the largest stratum is
    never downsampled; kept fraction per stratum tracks its rate."""
    from forum_dl_spark.operators.pipeline import mix_sample

    d = spark.read.parquet(f"{SF}/documents.parquet")
    n_by_lang = {r.lang: r.n for r in
                 d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_max = max(n_by_lang.values())

    rows = mix_sample(spark, SF).collect()
    assert rows
    for r in rows:
        expect = math.floor(10000 * math.sqrt(n_by_lang[r.lang] / n_max))
        assert r.rate_bp == expect, (r.lang, r.rate_bp, expect)
    # the max stratum keeps everything; at least one stratum actually drops
    kept = {}
    for r in rows:
        kept[r.lang] = kept.get(r.lang, 0) + 1
    max_lang = max(n_by_lang, key=n_by_lang.get)
    assert kept[max_lang] == n_by_lang[max_lang]
    assert any(kept[l] < n_by_lang[l] for l in n_by_lang)
    # determinism: same rows on a second evaluation
    again = {(r.doc_id, r.lang) for r in mix_sample(spark, SF).collect()}
    assert again == {(r.doc_id, r.lang) for r in rows}


def test_mix_sample_broadcasts_rates(spark):
    """The per-stratum rate table joins back via broadcast — the corpus
    side is never sort-merge shuffled."""
    from forum_dl_spark.operators.pipeline import mix_sample

    plan = mix_sample(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cross_corpus_decisions(spark):
    """Planted exact copies resolve to their original's doc_id; novel docs
    resolve to -1 — the incremental-dedup decision table is exact."""
    from forum_dl_spark.operators.dedup import (CROSS_ID_OFFSET, CROSS_SEEDS,
                                                dedup_cross_corpus)

    rows = {r.doc_id: r.dup_of for r in dedup_cross_corpus(spark, SF).collect()}
    assert len(rows) == 2 * CROSS_SEEDS
    for i in range(CROSS_SEEDS):
        assert rows[i + CROSS_ID_OFFSET] == i  # copy -> original
        assert rows[i + CROSS_ID_OFFSET + CROSS_SEEDS] == -1  # novel


def test_cross_corpus_base_is_broadcast(spark):
    from forum_dl_spark.operators.dedup import dedup_cross_corpus

    plan = dedup_cross_corpus(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_length_histogram_buckets(spark):
    """bucket == floor(log2(ws_tokens)) recomputed in Python; per-source
    doc counts and share_bp are integer-exact."""
    from forum_dl_spark.operators.textops import length_histogram

    d = spark.read.parquet(f"{SF}/documents.parquet")
    toks = [(r.source, len([w for w in __import__("re").split(r"\s+", r.text) if w]))
            for r in d.select("source", "text").collect()]
    want = {}
    for src, n in toks:
        b = n.bit_length() - 1 if n >= 1 else 0
        want[(src, b)] = want.get((src, b), 0) + 1
    tot = {}
    for (src, _b), c in want.items():
        tot[src] = tot.get(src, 0) + c

    rows = length_histogram(spark, SF).collect()
    got = {(r.source, r.bucket): (r.n_docs, r.share_bp) for r in rows}
    assert set(got) == set(want)
    for key, (n_docs, share) in got.items():
        assert n_docs == want[key]
        assert share == (10000 * n_docs) // tot[key[0]]
