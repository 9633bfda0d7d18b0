"""Plan + semantic pins for the corpus-statistics batch (operators/textstats).

Oracle equality vs DuckDB is covered by test_operators_oracle.py (the
registry is auto-parametrized); here we pin the plan SHAPES the module's
docstrings claim and the semantics that a hash-equal oracle could still
mask (e.g. chunk coverage/overlap invariants hold for every document, the
sketch's exact branch matches an independent Python recount).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    s = _plan(df)
    return s.count("Exchange hashpartitioning") + s.count(
        "Exchange rangepartitioning"
    )


def _toks(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


# --- plan pins -----------------------------------------------------------------


def test_chunk_documents_zero_exchange(spark):
    """Chunking is a row-expanding narrow projection: explode + slice over
    the documents scan, NO shuffle anywhere, and the scan is pruned to the
    two needed columns."""
    from forum_dl_spark.operators.textstats import chunk_documents

    df = chunk_documents(spark, SF)
    assert _n_exchanges(df) == 0, _plan(df)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in _plan(df)


def test_zipf_histogram_two_hash_aggregates(spark):
    """Token count + bucket rollup: exactly two hash exchanges (each
    map-side combined), no join, no sort."""
    from forum_dl_spark.operators.textstats import zipf_histogram

    df = zipf_histogram(spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_pmi_broadcasts_unigrams_no_smj(spark):
    """The vocabulary-sized unigram relation joins via broadcast twice and
    N via a 1-row broadcast — no SortMergeJoin; the top-k compiles to
    TakeOrdered, not a global sort."""
    from forum_dl_spark.operators.textstats import pmi_top_pairs

    df = pmi_top_pairs(spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 3, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_distinct_sketch_broadcast_exact_join(spark):
    """The exact-vs-estimate join is a broadcast on the tiny source
    dimension (the exact branch exists only as the audit)."""
    from forum_dl_spark.operators.textstats import distinct_sketch

    df = distinct_sketch(spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bpe_fertility_single_exchange_literal_rules(spark):
    """With the trained rules inlined as plan literals, the encode side is
    map-only; the ONLY exchange is the lang-keyed partial aggregate, and
    the plan contains no join."""
    from forum_dl_spark.operators.textstats import bpe_fertility

    df = bpe_fertility(spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 1, plan
    assert "Join" not in plan, plan


# --- semantic pins ---------------------------------------------------------------


def test_chunk_coverage_and_overlap_invariants(spark):
    """For EVERY document: chunk 0 starts at token 1; consecutive starts
    differ by the stride; every token is covered; re-concatenating chunk 0
    plus each chunk's non-overlapping tail reconstructs the token stream
    exactly; and the chunk count matches the closed form."""
    from forum_dl_spark.operators.textstats import (
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        chunk_documents,
    )

    rows = chunk_documents(spark, SF_SMALL).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r

    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    docs = {d["doc_id"]: _toks(d["text"]) for d in tab}
    n_with_tokens = sum(1 for t in docs.values() if t)
    assert set(by_doc) == {d for d, t in docs.items() if t}
    assert n_with_tokens > 0

    w, s = CHUNK_WINDOW, CHUNK_STRIDE
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        n = len(toks)
        expect_nch = 1 + (0 if n <= w else -(-(n - w) // s))
        assert sorted(chunks) == list(range(expect_nch)), doc_id
        rebuilt: list[str] = []
        for cid in range(expect_nch):
            r = chunks[cid]
            start = cid * s
            piece = toks[start : start + w]
            assert r.chunk_text == " ".join(piece), (doc_id, cid)
            assert r.n_tokens_chunk == len(piece), (doc_id, cid)
            rebuilt.extend(piece if cid == 0 else piece[w - s :] if n > w else [])
        if n <= w:
            rebuilt = toks[:]
        assert rebuilt == toks, doc_id


def test_distinct_sketch_exact_branch_matches_python(spark):
    """The exact_distinct column equals an independent pure-Python distinct
    count of the md5-int32 3-gram-shingle hashes, and err_bp is the integer
    basis-point error of est vs exact."""
    from forum_dl_spark.operators.textstats import distinct_sketch

    rows = {r.source: r for r in distinct_sketch(spark, SF_SMALL).collect()}
    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    seen: dict[str, set[int]] = {}
    for d in tab:
        t = _toks(d["text"])
        for i in range(len(t) - 2):
            sh = " ".join(t[i : i + 3])
            h = int(hashlib.md5(sh.encode()).hexdigest()[:8], 16)
            seen.setdefault(d["source"], set()).add(h)
    assert set(rows) == {s for s, v in seen.items() if v}
    for src, r in rows.items():
        assert r.exact_distinct == len(seen[src]), src
        assert r.err_bp == abs(r.est_distinct - r.exact_distinct) * 10000 // (
            r.exact_distinct
        ), src
        # sanity: the 64-bucket sketch should be within ~25% on these sizes
        assert r.err_bp < 2500, (src, r)


def test_pmi_scores_match_python(spark):
    """pmi_bp and the rank order match a pure-Python recount of unigram /
    bigram frequencies under the same integer formula."""
    from forum_dl_spark.operators.textstats import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
        pmi_top_pairs,
    )

    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for d in tab:
        t = _toks(d["text"])
        for x in t:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n_total = sum(uni.values())
    scored = [
        (f"{a} {b}", c, 10000 * c * n_total // (uni[a] * uni[b]))
        for (a, b), c in bi.items()
        if c >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda x: (-x[2], x[0]))
    expect = [
        (g, c, p, i + 1) for i, (g, c, p) in enumerate(scored[:PMI_TOP_K])
    ]
    got = [
        (r.gram, r.cnt, r.pmi_bp, r.rank)
        for r in pmi_top_pairs(spark, SF_SMALL).collect()
    ]
    assert sorted(got, key=lambda x: x[3]) == expect


def test_zipf_histogram_totals_and_buckets(spark):
    """Bucket = floor(log2(count)); the histogram's token mass sums to the
    corpus token count and its type mass to the vocabulary size."""
    from forum_dl_spark.operators.textstats import zipf_histogram

    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    uni: dict[str, int] = {}
    for d in tab:
        for x in _toks(d["text"]):
            uni[x] = uni.get(x, 0) + 1
    expect: dict[int, list[int]] = {}
    for c in uni.values():
        b = c.bit_length() - 1
        agg = expect.setdefault(b, [0, 0])
        agg[0] += 1
        agg[1] += c
    got = {r.bucket: [r.n_types, r.n_tokens] for r in
           zipf_histogram(spark, SF_SMALL).collect()}
    assert got == expect


def test_bpe_fertility_consistent_with_bpe_encode(spark):
    """Cross-operator consistency: bpe_fertility's per-lang sums equal
    bpe_encode's per-doc counts aggregated by lang (same trained rules via
    the session memo)."""
    import pyspark.sql.functions as F

    from forum_dl_spark.operators.textops import bpe_encode
    from forum_dl_spark.operators.textstats import bpe_fertility

    fert = {r.lang: r for r in bpe_fertility(spark, SF_SMALL).collect()}
    enc = bpe_encode(spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang"
    )
    agg = {
        r.lang: r
        for r in enc.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("sum_words"),
            F.sum("n_tokens_bpe").alias("sum_tokens_bpe"),
        )
        .collect()
    }
    assert set(fert) == set(agg)
    for lang, r in fert.items():
        a = agg[lang]
        assert (r.n_docs, r.sum_words, r.sum_tokens_bpe) == (
            a.n_docs,
            a.sum_words,
            a.sum_tokens_bpe,
        ), lang
        assert r.fertility_bp == 10000 * r.sum_tokens_bpe // r.sum_words


def test_heaps_curve_plan_two_exchanges(spark):
    """tok→min-doc aggregate + decile rollup: two hash exchanges; the
    cumulative window runs over ≤10 rows (no range partitioning — not a
    data-scale sort); no join beyond the 1-row broadcast."""
    from forum_dl_spark.operators.textstats import heaps_curve

    df = heaps_curve(spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_vocab_drift_single_token_exchange(spark):
    """The two half-counts are conditional sums inside ONE tok-keyed
    aggregate (no pivot exchange); totals broadcast; top-k TakeOrdered."""
    from forum_dl_spark.operators.textstats import vocab_drift

    df = vocab_drift(spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_heaps_curve_matches_python(spark):
    """Per-decile new-type counts and the cumulative vocabulary equal a
    pure-Python first-occurrence scan, and the final cumulative equals the
    full vocabulary size."""
    from forum_dl_spark.operators.textstats import HEAPS_DECILES, heaps_curve

    tab = sorted(
        pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist(),
        key=lambda d: d["doc_id"],
    )
    n_docs = len(tab)
    first: dict[str, int] = {}
    for d in tab:
        for t in _toks(d["text"]):
            first.setdefault(t, d["doc_id"])
    expect: dict[int, int] = {}
    for fd in first.values():
        dec = fd * HEAPS_DECILES // n_docs
        expect[dec] = expect.get(dec, 0) + 1
    rows = sorted(heaps_curve(spark, SF_SMALL).collect(),
                  key=lambda r: r.decile)
    assert {r.decile: r.n_new_types for r in rows} == expect
    cum = 0
    for r in rows:
        cum += r.n_new_types
        assert r.n_types_cum == cum
    assert cum == len(first)


def test_vocab_drift_matches_python(spark):
    """Half assignment (md5 parity), per-half rates, drift, and the top-K
    cut all match a pure-Python recount."""
    from forum_dl_spark.operators.textstats import (
        DRIFT_MIN_COUNT,
        DRIFT_TOP_K,
        vocab_drift,
    )

    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    c: dict[str, list[int]] = {}
    for d in tab:
        half = int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:8],
                   16) % 2
        for t in _toks(d["text"]):
            c.setdefault(t, [0, 0])[half] += 1
    t0 = sum(v[0] for v in c.values())
    t1 = sum(v[1] for v in c.values())
    scored = []
    for tok, (c0, c1) in c.items():
        if c0 + c1 < DRIFT_MIN_COUNT:
            continue
        r0 = 1000000 * c0 // t0
        r1 = 1000000 * c1 // t1
        scored.append((tok, c0, c1, r0, r1, abs(r0 - r1)))
    scored.sort(key=lambda x: (-x[5], x[0]))
    expect = [s + (i + 1,) for i, s in enumerate(scored[:DRIFT_TOP_K])]
    got = [
        (r.tok, r.c0, r.c1, r.r0_e6, r.r1_e6, r.drift_e6, r.rank)
        for r in vocab_drift(spark, SF_SMALL).collect()
    ]
    assert sorted(got, key=lambda x: x[6]) == expect


def test_source_diversity_plan_and_python(spark):
    """Two hash exchanges, no join/sort; values match a pure-Python
    recount under the floor-log2 entropy proxy."""
    from forum_dl_spark.operators.textstats import source_diversity

    df = source_diversity(spark, SF_SMALL)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan

    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    c: dict[str, dict[str, int]] = {}
    for d in tab:
        for t in _toks(d["text"]):
            src = c.setdefault(d["source"], {})
            src[t] = src.get(t, 0) + 1
    got = {r.source: r for r in df.collect()}
    assert set(got) == {s for s, v in c.items() if v}
    flog2 = lambda x: x.bit_length() - 1  # noqa: E731
    for src, cnts in c.items():
        n = sum(cnts.values())
        types = len(cnts)
        hapax = sum(1 for v in cnts.values() if v == 1)
        sum_clog = sum(v * flog2(v) for v in cnts.values())
        r = got[src]
        assert (r.n_tokens, r.n_types) == (n, types), src
        assert r.ttr_bp == 10000 * types // n, src
        assert r.hapax_bp == 10000 * hapax // types, src
        assert r.ent_e4 == 10000 * (n * flog2(n) - sum_clog) // n, src


def test_length_outliers_planted_blob(spark, tmp_path):
    """Plant one blob document 50x its source's typical length into a
    copy of the corpus: it must rank first with the exact cross-
    multiplied deviation; the corpus never shuffles (broadcast stats,
    TakeOrdered)."""
    import pyarrow as pa

    from forum_dl_spark.operators.textstats import (
        OUTLIER_TOP_K,
        length_outliers,
    )

    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    blob = dict(tab[0])
    blob["doc_id"] = max(d["doc_id"] for d in tab) + 1
    blob["text"] = " ".join(["blobword"] * (50 * len(_toks(tab[0]["text"]))))
    tab.append(blob)
    out = tmp_path / "planted"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(tab), out / "documents.parquet")

    df = length_outliers(spark, str(out))
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan

    rows = df.collect()
    assert len(rows) == OUTLIER_TOP_K
    top = rows[0]
    assert top.doc_id == blob["doc_id"]
    # exact integer deviation for the planted doc
    src_rows = [d for d in tab if d["source"] == blob["source"]]
    n_src = len(src_rows)
    sum_len = sum(len(_toks(d["text"])) for d in src_rows)
    blob_len = len(_toks(blob["text"]))
    assert top.len == blob_len
    assert top.dev_e6 == 1000000 * abs(n_src * blob_len - sum_len) // sum_len
    assert rows == sorted(rows, key=lambda r: (-r.dev_e6, r.doc_id))


def test_source_overlap_matrix_plan_and_python(spark):
    """No shingle self-join (pairs explode from the per-shingle source
    set); totals join via broadcast; values match a pure-Python
    set-intersection recount at sf0.001."""
    from forum_dl_spark.operators.textstats import source_overlap_matrix

    df = source_overlap_matrix(spark, SF_SMALL)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan

    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    shingles: dict[str, set[int]] = {}
    for d in tab:
        t = _toks(d["text"])
        for i in range(len(t) - 2):
            h = int(
                hashlib.md5(" ".join(t[i : i + 3]).encode()).hexdigest()[:8],
                16,
            )
            shingles.setdefault(d["source"], set()).add(h)
    srcs = sorted(shingles)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = len(shingles[a] & shingles[b])
            if not common:
                continue
            na, nb = len(shingles[a]), len(shingles[b])
            expect[(a, b)] = (
                na,
                nb,
                common,
                10000 * common // (na + nb - common),
                10000 * common // na,
            )
    got = {
        (r.src_a, r.src_b): (r.n_a, r.n_b, r.n_common, r.jaccard_bp,
                             r.contain_a_bp)
        for r in df.collect()
    }
    assert got == expect


def test_length_percentiles_plan_and_python(spark):
    """ONE source-keyed exchange (the rollup rides the window's
    partitioning); exact order statistics match a pure-Python sort at
    sf0.001, including the ceil-rank selection rule."""
    from forum_dl_spark.operators.textstats import (
        PCTS,
        length_percentiles,
    )

    df = length_percentiles(spark, SF_SMALL)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan

    tab = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pylist()
    by_src: dict[str, list[int]] = {}
    for d in tab:
        by_src.setdefault(d["source"], []).append(len(_toks(d["text"])))
    got = {r.source: r for r in df.collect()}
    assert set(got) == set(by_src)
    for src, lens in by_src.items():
        lens.sort()
        n = len(lens)
        r = got[src]
        assert r.n_docs == n, src
        for p in PCTS:
            k = (p * n + 99) // 100
            assert getattr(r, f"p{p}") == lens[k - 1], (src, p)


def test_cms_estimate_matches_python_and_only_overestimates(spark):
    """Pure-Python CMS replay (same md5 cells, same D x W table): the
    estimate must match exactly, and the CMS one-sided guarantee must hold
    (est >= exact for every probed token)."""
    from forum_dl_spark.operators.textstats import (
        CMS_D,
        CMS_TOPK,
        CMS_W,
        cms_heavy_hitters,
    )

    toks = []
    for t in pq.read_table(f"{SF_SMALL}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist():
        toks.extend(x for x in t.lower().split() if x)
    cnt: dict = {}
    for t in toks:
        cnt[t] = cnt.get(t, 0) + 1

    def cell(d, tok):
        h = int(hashlib.md5(f"cms{d}:{tok}".encode()).hexdigest()[:8], 16)
        return h % CMS_W

    sketch: dict = {}
    for tok, c in cnt.items():
        for d in range(CMS_D):
            k = (d, cell(d, tok))
            sketch[k] = sketch.get(k, 0) + c
    top = sorted(cnt, key=lambda t: (-cnt[t], t))[:CMS_TOPK]
    expect = {
        tok: min(sketch[(d, cell(d, tok))] for d in range(CMS_D))
        for tok in top
    }

    rows = cms_heavy_hitters(spark, SF_SMALL).collect()
    assert len(rows) == CMS_TOPK
    for r in rows:
        assert r.cms_est == expect[r.tok], r
        assert r.cms_est >= r.exact_count, r
        assert r.over_bp == (10000 * (r.cms_est - r.exact_count)) // r.exact_count


def test_cms_sketch_broadcast_no_smj(spark):
    from forum_dl_spark.operators.textstats import cms_heavy_hitters

    plan = _plan(cms_heavy_hitters(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_quality_ablation_python_recount_and_consistency(spark):
    """Pure-Python gate replay at sf0.001 plus the anti-drift invariant:
    the audit's n_keep equals the filter EMIT's row count (both built from
    qf_gate_conds)."""
    from forum_dl_spark.operators.textops import (
        QF_MAX_CHARS,
        QF_MIN_ALPHA,
        QF_MIN_CHARS,
        QF_MIN_STOPWORD,
        quality_ablation,
        quality_filter_apply,
    )

    texts = pq.read_table(
        f"{SF_SMALL}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    stopw = {"the", "a", "and", "of", "to", "in"}
    fails = {"alpha": 0, "stopword": 0, "length": 0}
    only = {"alpha": 0, "stopword": 0, "length": 0}
    keep = 0
    for t in texts:
        n = len(t)
        alpha_ok = round(sum(c.isalpha() and c.isascii() for c in t) / max(n, 1), 6) >= QF_MIN_ALPHA
        toks = [x for x in t.split() if x]
        st = sum(1 for x in t.lower().split() if x in stopw)
        stop_ok = round(st / max(len(toks), 1), 6) >= QF_MIN_STOPWORD
        len_ok = QF_MIN_CHARS <= n <= QF_MAX_CHARS
        ok = {"alpha": alpha_ok, "stopword": stop_ok, "length": len_ok}
        keep += all(ok.values())
        for g in fails:
            if not ok[g]:
                fails[g] += 1
                if all(v for k, v in ok.items() if k != g):
                    only[g] += 1

    rows = {r.gate: r for r in quality_ablation(spark, SF_SMALL).collect()}
    assert set(rows) == {"alpha", "stopword", "length"}
    n_docs = len(texts)
    for g, r in rows.items():
        assert r.n_docs == n_docs
        assert r.n_keep == keep
        assert r.n_fail == fails[g], (g, r.n_fail, fails[g])
        assert r.n_fail_only == only[g], (g, r.n_fail_only, only[g])
        assert r.n_fail_only <= r.n_fail
        assert r.fail_bp == (10000 * r.n_fail) // n_docs
        assert r.marginal_bp == (10000 * r.n_fail_only) // n_docs
    assert rows["alpha"].n_keep == quality_filter_apply(spark, SF_SMALL).count()


def test_quality_ablation_single_pass_no_join(spark):
    from forum_dl_spark.operators.textops import quality_ablation

    plan = _plan(quality_ablation(spark, SF_SMALL))
    assert "Join" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
