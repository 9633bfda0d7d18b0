"""Behavior pins for the round-5 additions: the composed IVF+PQ index and
the Gopher rule-stack quality filter.

Oracle equality is covered by the parametrized gate in
tests/test_operators_oracle.py; these tests pin what a hash match alone
would not explain:

- IVF+PQ: a full pure-Python replay of the integer pipeline (coarse
  assign -> probe -> PQ encode -> ADC -> top-k) agrees row-for-row, the
  candidate set each query touches is bounded by its probed cells, and
  the plan keeps both codebooks as literals (one hash exchange total).
- Gopher: a pure-Python replay of all seven gates agrees per document,
  the stack actually bites on the fixture (neither all-keep nor
  all-drop), and the agreement matrix is consistent with the per-doc
  flags and the C4 gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --- pure-Python IVF+PQ replay ------------------------------------------------


def _replay_ivfpq(qvecs: dict[int, list[int]]):
    """Replay the whole integer pipeline from the quantized vectors."""
    from forum_dl_spark.operators.similarity import (
        CL_ID_STRIDE,
        IVF_PIVOT_M,
        IVFPQ_NPROBE,
        PQ_M,
        PQ_PIVOT_MS,
        TOP_K,
    )

    pivots = [q for vid, q in sorted(qvecs.items()) if vid % CL_ID_STRIDE == IVF_PIVOT_M]
    dim = len(next(iter(qvecs.values())))
    sub = dim // PQ_M
    # PQ codebook: sampled members, code id = position in vec_id order
    cb_vecs = [q for vid, q in sorted(qvecs.items()) if vid % CL_ID_STRIDE in PQ_PIVOT_MS]

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def coarse(q):
        ds = [l2(q, p) for p in pivots]
        return ds

    def codes(q):
        out = []
        for m in range(PQ_M):
            seg = q[m * sub : (m + 1) * sub]
            ds = [l2(seg, w[m * sub : (m + 1) * sub]) for w in cb_vecs]
            out.append(ds.index(min(ds)))
        return out

    assign = {vid: coarse(q).index(min(coarse(q))) for vid, q in qvecs.items()}
    enc = {vid: codes(q) for vid, q in qvecs.items()}
    rows = []
    for qid, q in sorted(qvecs.items()):
        if qid % CL_ID_STRIDE != 0:
            continue
        cd = coarse(q)
        probes = [p for _, p in sorted((d, p) for p, d in enumerate(cd))][:IVFPQ_NPROBE]
        # the query's M x K ADC table
        dt = [
            [l2(q[m * sub : (m + 1) * sub], w[m * sub : (m + 1) * sub]) for w in cb_vecs]
            for m in range(PQ_M)
        ]
        scored = []
        for nid in sorted(qvecs):
            if nid == qid or assign[nid] not in probes:
                continue
            adc = sum(dt[m][enc[nid][m]] for m in range(PQ_M))
            scored.append((adc, nid))
        scored.sort()
        for rank, (adc, nid) in enumerate(scored[:TOP_K], start=1):
            rows.append((qid, nid, rank, adc))
    return rows, assign, {
        qid: [p for _, p in sorted((d, p) for p, d in enumerate(coarse(q)))][:IVFPQ_NPROBE]
        for qid, q in qvecs.items()
        if qid % CL_ID_STRIDE == 0
    }


def _quantized(spark):
    from forum_dl_spark.operators.similarity import _pq_quant

    return {int(r["vec_id"]): [int(x) for x in r["q"]] for r in _pq_quant(spark, SF).collect()}


def test_ivfpq_topk_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.similarity import ivf_pq_topk

    want, _, _ = _replay_ivfpq(_quantized(spark))
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.rank), int(r.adc_dist))
        for r in ivf_pq_topk(spark, SF).collect()
    )
    assert got == sorted(want)


def test_ivfpq_candidates_bounded_by_probed_cells(spark):
    """The scale contract: every returned neighbor lives in one of the
    query's IVFPQ_NPROBE probed cells — the search never touches the rest
    of the table."""
    from forum_dl_spark.operators.similarity import ivf_pq_topk

    _, assign, probes = _replay_ivfpq(_quantized(spark))
    for r in ivf_pq_topk(spark, SF).collect():
        assert assign[int(r.neighbor_id)] in probes[int(r.query_id)]


def test_ivfpq_recall_meaningful_but_lossy(spark):
    """The composed index recovers a meaningful share of the exact top-k
    but not all of it (the quantization loss is real on this fixture)."""
    from forum_dl_spark.operators.similarity import ivf_pq_recall

    rows = ivf_pq_recall(spark, SF).collect()
    assert len(rows) == 10
    mean = sum(r.recall for r in rows) / len(rows)
    assert 0.3 <= mean < 1.0, mean


def test_ivfpq_plan_one_exchange_codebooks_inline(spark):
    """Both codebooks are plan literals: the database side is a narrow
    projection (assign + encode, no exchange), the probe relation is
    broadcast, and the only hash exchange is the per-query top-k window."""
    from forum_dl_spark.operators.similarity import ivf_pq_topk

    plan = ivf_pq_topk(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


# --- Gopher rule stack ----------------------------------------------------------


def _replay_gopher(text: str) -> dict[str, int]:
    from forum_dl_spark.operators.textops import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL,
        GOPHER_MIN_WORDS,
        GOPHER_STOPS,
    )
    import re

    words = [w for w in re.split(r"\s+", text) if w != ""]
    nw = len(words)
    wch = sum(len(w) for w in words)
    lines = text.split("\n")
    nl = len(lines)
    nbul = sum(1 for l in lines if l.startswith(("-", "*", "•")))
    nellend = sum(1 for l in lines if l.endswith("..."))
    nsym = text.count("#") + (len(text) - len(text.replace("...", ""))) // 3
    nalpha = sum(1 for w in re.split(r"\s+", text) if re.search("[a-zA-Z]", w))
    toks = set(re.split(r"\s+", text.lower()))
    nstop = sum(1 for s in GOPHER_STOPS if s in toks)
    ok = {
        "words": int(GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS),
        "mean_wl": int(GOPHER_MIN_MWL * nw <= wch <= GOPHER_MAX_MWL * nw),
        "symbol": int(10 * nsym <= nw),
        "bullet": int(10 * nbul <= 9 * nl),
        "ellipsis": int(10 * nellend <= 3 * nl),
        "alpha": int(5 * nalpha >= 4 * nw),
        "stop": int(nstop >= 2),
    }
    ok["keep"] = int(all(ok.values()))
    return ok


def test_gopher_rules_match_pure_python_replay(spark):
    from forum_dl_spark.operators.textops import _GOPHER_KEYS, gopher_rules

    texts = {
        int(r.doc_id): r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {int(r.doc_id): r.asDict() for r in gopher_rules(spark, SF).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        want = _replay_gopher(text)
        for k in _GOPHER_KEYS:
            assert got[doc_id][f"ok_{k}"] == want[k], (doc_id, k, text[:80])
        assert got[doc_id]["keep"] == want["keep"], doc_id


def test_gopher_stack_bites_on_fixture(spark):
    """Neither degenerate extreme: the stack keeps some docs and drops
    some (the word-count and stop-word gates have real signal here)."""
    from forum_dl_spark.operators.textops import gopher_rules

    rows = gopher_rules(spark, SF).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows), (kept, len(rows))


def test_gopher_rules_plan_is_map_only(spark):
    from forum_dl_spark.operators.textops import gopher_rules

    plan = gopher_rules(spark, SF)._jdf.queryExecution().executedPlan().toString()
    # r6: spread() may add one RoundRobin input repartition; the pin is
    # "no keyed exchange, no join".
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_agreement_matrix_plan_single_scan_no_join(spark):
    """Both keep predicates are Columns over the SAME documents scan —
    one pass, one aggregate, no join."""
    from forum_dl_spark.operators.textops import filter_stack_agreement

    plan = (
        filter_stack_agreement(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan


def test_agreement_matrix_consistent_with_flags(spark):
    """The 2x2 matrix totals equal the corpus size and its gopher margin
    equals the per-doc keep counts — matrix and flags cannot drift."""
    from forum_dl_spark.operators.textops import (
        filter_stack_agreement,
        gopher_rules,
        qf_keep_cond,
    )

    rows = filter_stack_agreement(spark, SF).collect()
    flags = gopher_rules(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_c4 = docs.filter(qf_keep_cond()).count()
    assert sum(r.n_docs for r in rows) == len(flags)
    gopher_kept = sum(r.n_docs for r in rows if r.gopher_keep == 1)
    assert gopher_kept == sum(r.keep for r in flags)
    assert sum(r.n_docs for r in rows if r.c4_keep == 1) == n_c4
