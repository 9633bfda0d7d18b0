"""IR / winnowing / phash-neardup operator semantics + plan guards.

Oracle equality for every ir.py operator is covered by
test_operators_oracle.py (auto-registered); these tests pin the properties
the oracle can't see: the winnowing detection guarantee on PLANTED inputs,
the planted-pair recovery of the phash near-dup, and plan shapes (the
materialized-hash-array CSE, the BM25 TakeOrdered top-k).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_winnow_hash_array_materialized_once(spark):
    """The k-gram md5 array must be built ONCE per row: if a refactor (or
    CollapseProject) inlines it into the window-transform lambda, the md5
    build re-runs per window element — O(n^2) per document. Exactly one
    md5( in the executed plan pins the materialization."""
    from forum_dl_spark.operators.ir import winnow_fingerprints

    plan = _plan(winnow_fingerprints(spark, SF))
    assert plan.count("md5(") == 1, plan


def test_bm25_topk_is_take_ordered(spark):
    """Top-k must be TakeOrdered (per-partition heap + driver merge), not a
    global sort of every scored document."""
    from forum_dl_spark.operators.ir import bm25_topk

    plan = _plan(bm25_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "s0", len(t))
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_winnow_detection_guarantee(spark, tmp_path):
    """SIGMOD'03 Thm. 2: any shared literal run of >= k + w - 1 chars
    (12 + 8 - 1 = 19 here) yields at least one shared fingerprint. Plant a
    60-char shared run inside otherwise-disjoint documents and assert the
    pair surfaces in winnow_dup_spans (>= 2 shared fingerprints — a 60-char
    run selects ~ (60-19)/((w+1)/2) ~ 9 expected fingerprints)."""
    from forum_dl_spark.operators.ir import winnow_dup_spans, winnow_fingerprints

    shared = "shared duplicated span of text that winnowing must detect here"
    assert len(shared) >= 19 + 40
    texts = [
        "alpha beta gamma delta epsilon zeta " + shared + " eta theta iota",
        "one two three four five six seven " + shared + " eight nine ten",
        "completely unrelated third document with no overlap at all kappa",
    ]
    sf = _write_docs(spark, tmp_path, texts)

    fps = winnow_fingerprints(spark, sf)
    by_doc = {
        r["doc_id"]: set()
        for r in fps.select("doc_id").distinct().collect()
    }
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared run must share >=1 fingerprint"

    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_fp"]
        for r in winnow_dup_spans(spark, sf).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_winnow_density(spark):
    """Winnowing selects ~2/(w+1) of positions (SIGMOD'03 §3). On the real
    corpus the per-doc fingerprint count must sit well below the k-gram
    count — the selection must happen BEFORE the explode/shuffle."""
    from forum_dl_spark.operators.ir import (WINNOW_K, WINNOW_W,
                                             winnow_fingerprints)
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        (
            F.length(F.expr(r"trim(regexp_replace(lower(text), '\\s+', ' '))"))
            - WINNOW_K + 1
        ).alias("n_grams"),
    )
    n_grams = d.agg(F.sum("n_grams")).collect()[0][0]
    n_fps = winnow_fingerprints(spark, SF).count()
    density = n_fps / n_grams
    # 2/(w+1) = 0.222 expected for random hashes; distinct-dedup pulls it
    # slightly below — assert a generous band that still catches a
    # no-selection regression (density 1.0) or a broken window (~0)
    assert 0.10 < density < 0.35, (n_fps, n_grams)


def test_media_phash_neardup_exact_planted_pairs(spark):
    """The verify stage must recover EXACTLY the 8 planted near-copies
    (hamming 2 — band 0 xor 3) and nothing else: random md5 phashes sit at
    expected hamming 32, and no random 64-bit pair lands <= 8."""
    from forum_dl_spark.operators.multimodal import (_PLANT_N, _PLANT_STRIDE,
                                                     N_MEDIA,
                                                     media_phash_neardup)

    rows = media_phash_neardup(spark, SF).collect()
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in rows}
    want = {
        (k * _PLANT_STRIDE, N_MEDIA + k): 2 for k in range(_PLANT_N)
    }
    assert got == want


def test_perplexity_buckets_are_balanced(spark):
    """ntile(3) must split the corpus into near-equal head/middle/tail."""
    from forum_dl_spark.operators.ir import perplexity_buckets
    from pyspark.sql import functions as F

    counts = dict(
        perplexity_buckets(spark, SF)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert set(counts) == {1, 2, 3}
    assert max(counts.values()) - min(counts.values()) <= 1


def test_media_frame_sample_exact_and_zero_exchange(spark):
    """Frame sampling must (a) re-derive exactly in pure Python over the
    md5 payload spec, and (b) fan out INSIDE the Arrow batch: the physical
    plan contains no shuffle exchange — the frame table inherits the media
    table's partitioning."""
    import hashlib

    from forum_dl_spark.operators.multimodal import (FRAME_BYTES, FRAME_EVERY,
                                                     media_frame_sample)

    df = media_frame_sample(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan

    got = {
        (r["media_id"], r["frame_idx"]): (r["n_frames"], r["frame_off"], r["frame_md5"])
        for r in df.collect()
    }
    want = {}
    for mid in range(200):
        h = hashlib.md5(f"media:{mid}".encode()).digest()
        payload = (h * (16 + mid % 16))[: 256 + mid % 256]
        nf = len(payload) // FRAME_BYTES
        for i in range(0, nf, FRAME_EVERY):
            off = i * FRAME_BYTES
            fr = payload[off : off + FRAME_BYTES]
            want[(mid, i)] = (
                nf,
                off,
                hashlib.md5(fr.hex().encode()).hexdigest()[:16],
            )
    assert got == want


def test_winnow_scrub_stats_planted_span(spark, tmp_path):
    """Span-level scrub accounting on a planted shared run: the EARLIER
    document owns the span (keeps its text, zero scrub), the later copy
    gets one merged island whose char mass sits inside the shared run,
    and an unrelated document is untouched. kept + dup must equal the
    normalized length for every row."""
    from forum_dl_spark.operators.ir import WINNOW_K, winnow_scrub_stats

    shared = "shared duplicated span of text that winnowing must detect here"
    texts = [
        "alpha beta gamma delta epsilon zeta " + shared + " eta theta iota",
        "one two three four five six seven " + shared + " eight nine ten",
        "completely unrelated third document with no overlap at all kappa",
    ]
    sf = _write_docs(spark, tmp_path, texts)

    rows = {r["doc_id"]: r for r in winnow_scrub_stats(spark, sf).collect()}
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        assert r["kept_chars"] + r["dup_chars"] == r["n_chars_norm"]
    assert rows[0]["n_spans"] == 0 and rows[0]["dup_chars"] == 0
    assert rows[2]["n_spans"] == 0 and rows[2]["dup_chars"] == 0
    assert rows[1]["n_spans"] >= 1
    # marked intervals are k-grams selected inside the shared run: at
    # least one k-gram of mass, at most the run plus one k-gram of slack
    assert WINNOW_K <= rows[1]["dup_chars"] <= len(shared) + WINNOW_K
    assert rows[1]["dup_bp"] > 0


def test_winnow_scrub_stats_no_global_sort(spark):
    """The island merge is a doc_id-keyed window — the plan must contain
    no range partitioning (global sort) and no cartesian product; the
    fingerprint relation is the shared persisted memo."""
    from forum_dl_spark.operators.ir import winnow_scrub_stats

    df = winnow_scrub_stats(spark, SF)
    plan = _plan(df)
    assert "Exchange rangepartitioning" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_winnow_scrub_apply_planted_span(spark, tmp_path):
    """Text surgery on a planted shared run: the owner's normalized text
    survives byte-identical; the later copy's kept_text is its normalized
    text with one contiguous chunk (the shared run ± k-gram slack) cut
    out — prefix/suffix far from the run are intact; and for EVERY row
    the reported kept_chars equals the actual reconstructed length."""
    from forum_dl_spark.operators.ir import WINNOW_K, winnow_scrub_apply

    shared = "shared duplicated span of text that winnowing must detect here"
    texts = [
        "alpha beta gamma delta epsilon zeta " + shared + " eta theta iota",
        "one two three four five six seven " + shared + " eight nine ten",
        "completely unrelated third document with no overlap at all kappa",
    ]
    sf = _write_docs(spark, tmp_path, texts)

    rows = {r["doc_id"]: r for r in winnow_scrub_apply(spark, sf).collect()}
    assert set(rows) == {0, 1, 2}
    for i, r in rows.items():
        assert r["kept_chars"] == len(r["kept_text"]), r
    norm = [" ".join(t.lower().split()) for t in texts]
    assert rows[0]["n_cut"] == 0 and rows[0]["kept_text"] == norm[0]
    assert rows[2]["n_cut"] == 0 and rows[2]["kept_text"] == norm[2]
    r1 = rows[1]
    assert r1["n_cut"] >= 1
    cut = len(norm[1]) - r1["kept_chars"]
    assert WINNOW_K <= cut <= len(shared) + WINNOW_K
    # the prefix is untouched (a k-gram straddling prefix+run differs
    # between docs, so it is never shared); the suffix may lose up to
    # K-1 chars to a selected k-gram that starts inside the run
    assert r1["kept_text"].startswith("one two three")
    assert r1["kept_text"].endswith("ten")
    assert shared not in r1["kept_text"]


def test_winnow_scrub_apply_plan_shape(spark):
    """The surgery plan: no global sort, no cartesian product, and the
    documents relation moves through exactly ONE join (islands back into
    the corpus scan) — the fold is a per-row expression, not an explode."""
    from forum_dl_spark.operators.ir import winnow_scrub_apply

    df = winnow_scrub_apply(spark, SF)
    plan = _plan(df)
    assert "Exchange rangepartitioning" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rrf_no_smj_and_take_ordered(spark):
    """RRF fusion plan shape: both legs' stat/query relations broadcast (no
    SortMergeJoin anywhere), the dense leg's 1-row query vector enters via
    BroadcastNestedLoopJoin, and the final top-k is TakeOrdered."""
    from forum_dl_spark.operators.ir import rrf_hybrid_topk

    plan = _plan(rrf_hybrid_topk(spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_rrf_fusion_matches_python_recombination(spark):
    """Semantic pin: collecting the two legs independently (BM25 scored
    relation + brute cosine for the dense query) and fusing them in pure
    Python under the integer RRF formula reproduces the operator's output
    exactly — ranks, contributions, ordering, and the absent-leg zeros."""
    from forum_dl_spark.operators.ir import (
        RRF_DENSE_QUERY,
        RRF_K,
        RRF_LEG_N,
        RRF_SCALE,
        RRF_TOPK,
        _bm25_scored,
        rrf_hybrid_topk,
    )

    lex_rows = _bm25_scored(spark, SF).collect()
    lex_sorted = sorted(lex_rows, key=lambda r: (-r.score, r.doc_id))
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(lex_sorted[:RRF_LEG_N])}

    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    q = emb[RRF_DENSE_QUERY]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return round(dot / (na * nb), 6)

    dense_sorted = sorted(
        ((vid, cos(q, v)) for vid, v in emb.items() if vid != RRF_DENSE_QUERY),
        key=lambda t: (-t[1], t[0]),
    )
    dense_rank = {vid: i + 1 for i, (vid, _) in
                  enumerate(dense_sorted[:RRF_LEG_N])}

    fused = {}
    for d, r in lex_rank.items():
        e = fused.setdefault(d, [0, 0, 0])
        e[0] = r
        e[2] += RRF_SCALE // (RRF_K + r)
    for d, r in dense_rank.items():
        e = fused.setdefault(d, [0, 0, 0])
        e[1] = r
        e[2] += RRF_SCALE // (RRF_K + r)
    expect = sorted(
        ((d, rl, rd, s) for d, (rl, rd, s) in fused.items()),
        key=lambda t: (-t[3], t[0]),
    )[:RRF_TOPK]

    got = [
        (r.doc_id, r.r_lex, r.r_dense, r.rrf_e6)
        for r in rrf_hybrid_topk(spark, SF).collect()
    ]
    assert got == expect
    # both legs actually contribute docs the other leg missed
    assert any(rl == 0 for _, rl, _, _ in got) or any(
        rd == 0 for _, _, rd, _ in got
    )


def test_lm_bigram_ppl_matches_python_lm(spark):
    """The trained bigram LM, recomputed in pure Python on the raw parquet:
    c2/cprev counts, floor-log2 integer surprisal, per-doc basis-point mean,
    tertile assignment — every row must match exactly."""
    import duckdb

    from forum_dl_spark.operators.ir import lm_bigram_ppl

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    bg_by_doc = {}
    c2: dict = {}
    cprev: dict = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split() if t]
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        bg_by_doc[doc_id] = bgs
        for b in bgs:
            c2[b] = c2.get(b, 0) + 1
            cprev[b[0]] = cprev.get(b[0], 0) + 1
    per_doc = {}
    for doc_id, bgs in bg_by_doc.items():
        s = sum((cprev[u] // c2[(u, v)]).bit_length() - 1 for u, v in bgs)
        per_doc[doc_id] = (len(bgs), (10000 * s) // len(bgs))
    order = sorted(per_doc, key=lambda d: (per_doc[d][1], d))
    n = len(order)
    expect = {}
    for i, d in enumerate(order):
        # ntile(3): first n%3 buckets get the extra rows
        q, r = divmod(n, 3)
        b = 1 + (i // (q + 1) if i < (q + 1) * r else r + (i - (q + 1) * r) // q)
        expect[d] = (*per_doc[d], b)

    got = {
        r.doc_id: (r.n_bigrams, r.bigram_surprisal_bp, r.bucket)
        for r in lm_bigram_ppl(spark, sf).collect()
    }
    assert got == expect


def test_lm_bigram_ppl_plan_shape(spark):
    """Bigram formation is a projection (no doc-keyed exchange before the
    model aggregate), the count model joins in as broadcasts — no
    SortMergeJoin / ShuffledHashJoin anywhere."""
    from forum_dl_spark.operators.ir import lm_bigram_ppl

    plan = (
        lm_bigram_ppl(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_media_resize_exact_and_zero_exchange(spark):
    """Nearest-neighbor thumbnail replayed in pure Python over the payload
    spec (md5 digest repeated, capped), plus the map-only plan pin: the
    thumbnail table inherits the media partitioning — no exchange."""
    import hashlib as _hl

    from forum_dl_spark.operators.multimodal import (
        RESIZE_H,
        RESIZE_W,
        media_resize,
    )

    df = media_resize(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only exchange is synth_media's own round-robin fixture spread —
    # the resize itself adds no hash/range exchange
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan

    rows = {r.media_id: r for r in df.collect()}
    assert len(rows) == 200
    for mid in (0, 7, 63, 199):
        h = _hl.md5(f"media:{mid}".encode()).digest()
        payload = (h * (16 + mid % 16))[: 256 + mid % 256]
        w, hgt = 64 + mid % 64, 48 + mid % 48
        resized = bytes(
            payload[(((y * hgt) // RESIZE_H) * w + ((x * w) // RESIZE_W))
                    % len(payload)]
            for y in range(RESIZE_H)
            for x in range(RESIZE_W)
        )
        r = rows[mid]
        assert (r.src_w, r.src_h, r.dst_w, r.dst_h) == (w, hgt, RESIZE_W, RESIZE_H)
        assert r.resized_sum == sum(resized)
        assert r.resized_md5 == _hl.md5(resized.hex().encode()).hexdigest()[:16]
