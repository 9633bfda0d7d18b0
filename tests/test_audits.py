"""Behavior + plan pins for the dataset-engineering audit batch
(operators/audits.py).  Oracle equality is covered by
tests/test_operators_oracle.py (auto-parametrized from the registry);
these pin the semantics with independent pure-Python replays plus the
structural invariants a hash match alone would not explain, and the plan
shapes the module's scale claims rest on.
"""

from __future__ import annotations

import hashlib
import re

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    s = _plan(df)
    return s.count("Exchange hashpartitioning") + s.count(
        "Exchange rangepartitioning"
    )


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _texts(spark):
    return {
        int(r.doc_id): (r.text, r.source)
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


# --- postings_index -------------------------------------------------------------


def test_postings_index_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.audits import (POSTINGS_TOP_K,
                                                 postings_index)

    texts = _texts(spark)
    postings: dict[str, list[int]] = {}
    for doc_id in texts:
        for t in set(_toks(texts[doc_id][0])):
            postings.setdefault(t, []).append(doc_id)
    want = {}
    for term, docs in postings.items():
        docs.sort()
        prev, bits = -1, 0
        for d in docs:
            gap = d - prev
            bits += 2 * (gap.bit_length() - 1) + 1
            prev = d
        want[term] = (len(docs), bits, docs[0], docs[-1])
    top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[
        :POSTINGS_TOP_K
    ]
    got = {
        r.term: (int(r.df), int(r.gap_bits), int(r.first_doc), int(r.last_doc))
        for r in postings_index(spark, SF).collect()
    }
    assert got == dict(top)


def test_postings_index_plan_is_takeordered_no_global_sort(spark):
    from forum_dl_spark.operators.audits import postings_index

    df = postings_index(spark, SF)
    p = _plan(df)
    assert "TakeOrderedAndProject" in p, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p


# --- hll_distinct ---------------------------------------------------------------


def test_hll_distinct_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.audits import HLL_M, hll_distinct

    texts = _texts(spark)
    per_src: dict[str, set[int]] = {}
    for _doc, (text, src) in texts.items():
        w = _toks(text)
        for i in range(len(w) - 2):
            per_src.setdefault(src, set()).add(
                _h32(" ".join(w[i : i + 3]))
            )
    want = {}
    for src, hs in per_src.items():
        regs = [0] * HLL_M
        for h in hs:
            b, rest = h % HLL_M, h // HLL_M
            rho = 27 - rest.bit_length()
            regs[b] = max(regs[b], rho)
        s = sum(1 << (30 - m) for m in regs)
        est = (709 * HLL_M * HLL_M * (1 << 30)) // (1000 * s)
        want[src] = (
            len(hs),
            est,
            abs(est - len(hs)) * 10000 // len(hs),
            sum(1 for m in regs if m == 0),
        )
    got = {
        r.source: (
            int(r.exact_distinct),
            int(r.hll_est),
            int(r.err_bp),
            int(r.n_zero_regs),
        )
        for r in hll_distinct(spark, SF).collect()
    }
    assert got == want


def test_hll_distinct_estimator_is_usefully_accurate_at_sf001(spark):
    """At sf0.01 every per-source shingle space is in HLL's
    high-cardinality regime (all 64 registers set) and the raw estimate
    lands within 40% — the m=64 error envelope."""
    from forum_dl_spark.operators.audits import hll_distinct

    rows = hll_distinct(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.n_zero_regs == 0
        assert r.err_bp < 4000, (r.source, r.err_bp)


def test_hll_exact_side_joins_broadcast(spark):
    from forum_dl_spark.operators.audits import hll_distinct

    p = _plan(hll_distinct(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


# --- semantic_contamination -----------------------------------------------------


def test_semantic_contamination_matches_pure_python_replay(spark):
    import math

    from forum_dl_spark.operators.audits import (CONTAM_THRESH,
                                                 semantic_contamination)
    from forum_dl_spark.operators.similarity import N_QUERIES

    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    want = {}
    for e in [v for v in vecs if v < N_QUERIES]:
        scored = sorted(
            (
                (cos(vecs[t], vecs[e]), t)
                for t in vecs
                if t >= N_QUERIES
            ),
            key=lambda p: (-p[0], p[1]),
        )
        best_cos, best_id = scored[0]
        n = sum(1 for c, _t in scored if c >= CONTAM_THRESH)
        want[e] = (best_id, round(best_cos, 6), n)
    got = {
        int(r.eval_id): (
            int(r.best_train_id),
            float(r.best_cos),
            int(r.n_contaminated),
        )
        for r in semantic_contamination(spark, SF).collect()
    }
    assert set(got) == set(want)
    for e in want:
        assert got[e][0] == want[e][0]
        assert abs(got[e][1] - want[e][1]) < 1e-9
        assert got[e][2] == want[e][2]


def test_semantic_contamination_broadcasts_eval_side(spark):
    from forum_dl_spark.operators.audits import semantic_contamination

    p = _plan(semantic_contamination(spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p


# --- padding_waste_audit --------------------------------------------------------


def _replay_padding(texts):
    from forum_dl_spark.operators.audits import PAD_BATCH, PAD_CAP

    per_src: dict[str, list[tuple[int, int, int]]] = {}
    for doc_id, (text, src) in texts.items():
        words = [t for t in re.split(r"\s+", text) if t != ""]
        n = min(PAD_CAP, sum((len(w) + 3) // 4 for w in words))
        per_src.setdefault(src, []).append(
            (doc_id, n, _h32(str(doc_id)))
        )

    def pad(order):
        total = 0
        for i in range(0, len(order), PAD_BATCH):
            batch = order[i : i + PAD_BATCH]
            total += len(batch) * max(batch) - sum(batch)
        return total

    out = {}
    for src, rows in per_src.items():
        naive = [n for _d, n, _k in sorted(rows, key=lambda r: (r[2], r[0]))]
        srt = [n for _d, n, _k in sorted(rows, key=lambda r: (r[1], r[0]))]
        pn, ps = pad(naive), pad(srt)
        out[src] = (
            len(rows),
            sum(naive),
            pn,
            ps,
            (pn - ps) * 10000 // pn if pn > 0 else 0,
        )
    return out


def test_padding_waste_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.audits import padding_waste_audit

    want = _replay_padding(_texts(spark))
    got = {
        r.source: (
            int(r.n_docs),
            int(r.tokens_real),
            int(r.pad_naive),
            int(r.pad_sorted),
            int(r.saving_bp),
        )
        for r in padding_waste_audit(spark, SF).collect()
    }
    assert got == want


def test_padding_waste_sorted_never_loses_and_plan_is_joinless(spark):
    from forum_dl_spark.operators.audits import padding_waste_audit

    df = padding_waste_audit(spark, SF)
    p = _plan(df)
    assert "Join" not in p, p
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.pad_sorted <= r.pad_naive, (r.source, r.pad_sorted, r.pad_naive)


# --- shard_merkle_manifest ------------------------------------------------------


def test_shard_merkle_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.audits import (MERKLE_SHARDS,
                                                 shard_merkle_manifest)

    texts = _texts(spark)
    want: dict[int, list[int]] = {}
    for doc_id, (text, _src) in texts.items():
        shard = _h32(str(doc_id)) % MERKLE_SHARDS
        content = f"{doc_id}:{text}"
        h56 = int(hashlib.md5(content.encode()).hexdigest()[:14], 16)
        acc = want.setdefault(shard, [0, 0, 0, 0])
        acc[0] += 1
        acc[1] += len(text)
        acc[2] ^= h56
        acc[3] += _h32(content)
    got = {
        int(r.shard): [
            int(r.n_docs),
            int(r.n_chars),
            int(r.digest_xor),
            int(r.digest_sum32),
        ]
        for r in shard_merkle_manifest(spark, SF).collect()
    }
    assert got == want


def test_shard_merkle_digest_is_partitioning_independent(spark):
    """The order-independent combiners are the point: re-partitioning the
    corpus arbitrarily must reproduce every digest bit-for-bit."""
    from pyspark.sql import functions as F

    from forum_dl_spark.operators.audits import MERKLE_SHARDS, _h32 as h32e

    d = spark.read.parquet(f"{SF}/documents.parquet").repartition(13)
    h = d.select(
        F.expr(f"{h32e('cast(doc_id as string)')} % {MERKLE_SHARDS}").alias(
            "shard"
        ),
        F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string), ':',"
            " text)), 1, 14), 16, 10) as bigint)"
        ).alias("h56"),
        F.expr(
            h32e("concat(cast(doc_id as string), ':', text)")
        ).alias("h32"),
        F.length("text").alias("nc"),
    )
    alt = {
        int(r.shard): (int(r.digest_xor), int(r.digest_sum32))
        for r in h.groupBy("shard")
        .agg(
            F.expr("bit_xor(h56)").alias("digest_xor"),
            F.sum("h32").alias("digest_sum32"),
        )
        .collect()
    }
    from forum_dl_spark.operators.audits import shard_merkle_manifest

    base = {
        int(r.shard): (int(r.digest_xor), int(r.digest_sum32))
        for r in shard_merkle_manifest(spark, SF).collect()
    }
    assert alt == base


def test_shard_merkle_plan_is_one_aggregate_no_join(spark):
    from forum_dl_spark.operators.audits import shard_merkle_manifest

    df = shard_merkle_manifest(spark, SF)
    p = _plan(df)
    assert "Join" not in p, p
    assert _n_exchanges(df) == 1, p


# --- boundary_stitch_pairs ------------------------------------------------------


def test_boundary_stitch_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.audits import (STITCH_K,
                                                 boundary_stitch_pairs)

    texts = _texts(spark)
    heads, tails = {}, {}
    for doc_id, (text, _src) in texts.items():
        w = _toks(text)
        if len(w) < STITCH_K:
            continue
        heads[doc_id] = " ".join(w[:STITCH_K])
        tails[doc_id] = " ".join(w[-STITCH_K:])
    want = {
        (a, b, tails[a])
        for a in tails
        for b in heads
        if a != b and tails[a] == heads[b]
    }
    got = {
        (int(r.left_doc), int(r.right_doc), r.stitch_gram)
        for r in boundary_stitch_pairs(spark, SF).collect()
    }
    assert got == want


def test_boundary_stitch_finds_pairs_at_sf001_and_is_equijoin(spark):
    from forum_dl_spark.operators.audits import boundary_stitch_pairs

    df = boundary_stitch_pairs(spark, "/root/testdata/sf0.01")
    p = _plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert df.count() > 0
