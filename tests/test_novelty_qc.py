"""Behavior pins for ngram_novelty and embedding_qc (round-5 additions).

Oracle equality is covered by tests/test_operators_oracle.py; these pin
the semantics with independent pure-Python replays plus the structural
invariants a hash match alone would not explain.
"""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def _replay_novelty(texts: dict[int, str]):
    from forum_dl_spark.operators.textstats import NOVELTY_N

    n = NOVELTY_N
    per_doc: dict[int, set] = {}
    for doc_id, text in texts.items():
        toks = [t for t in re.split(r"\s+", text.lower()) if t != ""]
        if len(toks) < n:
            continue
        per_doc[doc_id] = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    owner: dict[str, int] = {}
    for doc_id in sorted(per_doc):
        for g in per_doc[doc_id]:
            owner.setdefault(g, doc_id)
    out = {}
    for doc_id, grams in per_doc.items():
        novel = sum(1 for g in grams if owner[g] == doc_id)
        out[doc_id] = (len(grams), novel, (10000 * novel) // len(grams))
    return out


def test_ngram_novelty_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.textstats import ngram_novelty

    texts = {
        int(r.doc_id): r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    want = _replay_novelty(texts)
    got = {
        int(r.doc_id): (int(r.n_grams), int(r.n_novel), int(r.novelty_bp))
        for r in ngram_novelty(spark, SF).collect()
    }
    assert got == want


def test_ngram_novelty_first_doc_fully_novel_and_totals(spark):
    """In doc_id order the first document is 100% novel, and the novel
    counts across docs partition the corpus's distinct-gram space."""
    from forum_dl_spark.operators.textstats import ngram_novelty

    rows = ngram_novelty(spark, SF).collect()
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty_bp == 10000
    texts = {
        int(r.doc_id): r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    want = _replay_novelty(texts)
    all_grams = set()
    from forum_dl_spark.operators.textstats import NOVELTY_N

    for text in texts.values():
        toks = [t for t in re.split(r"\s+", text.lower()) if t != ""]
        all_grams |= {
            " ".join(toks[i : i + NOVELTY_N])
            for i in range(len(toks) - NOVELTY_N + 1)
        }
    assert sum(r.n_novel for r in rows) == len(all_grams)
    # novelty genuinely declines: the corpus is not all-novel
    assert any(r.novelty_bp < 10000 for r in rows)
    assert len(rows) == len(want)


def _replay_qc(vecs: dict[int, list[float]]):
    import math

    per = []
    for vid in vecs:
        v = vecs[vid]
        s = 0.0
        for x in v:
            s += x * x
        per.append(
            (
                vid,
                len(v),
                int(any(math.isnan(x) for x in v)),
                int(all(x == 0.0 for x in v)),
                math.floor(s * 10000),
            )
        )
    nqs = sorted((nq, vid) for vid, _, _, _, nq in per)
    n = len(per)

    def pct(p):
        return nqs[(p * n + 99) // 100 - 1][0]

    return {
        "n_vecs": n,
        "dim_min": min(d for _, d, _, _, _ in per),
        "dim_max": max(d for _, d, _, _, _ in per),
        "n_nan_vecs": sum(x for _, _, x, _, _ in per),
        "n_zero_vecs": sum(x for _, _, _, x, _ in per),
        "normsq_q_p50": pct(50),
        "normsq_q_p99": pct(99),
    }


def test_embedding_qc_matches_pure_python_replay(spark):
    from forum_dl_spark.operators.similarity import embedding_qc

    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    want = _replay_qc(vecs)
    rows = embedding_qc(spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    assert {k: int(v) for k, v in got.items()} == want


def test_ngram_novelty_plan_no_join(spark):
    """First-owner marking is a gram-keyed window over the distinct pair
    relation — never a self-join back onto it; the text column is gone
    after the first projection."""
    from forum_dl_spark.operators.textstats import ngram_novelty

    plan = ngram_novelty(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_embedding_qc_plan_no_join(spark):
    """One projection + one percentile window + one aggregate — no join
    anywhere (the audit must not be more expensive than what it audits)."""
    from forum_dl_spark.operators.similarity import embedding_qc

    plan = embedding_qc(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
