"""Behavior pins for the round-5 tokenizer/data-selection operators:
DSIR importance weights and BPE merge-round-1 pair counts.

Oracle equality is covered by the parametrized gate in
tests/test_operators_oracle.py; these pin the SEMANTIC invariants a hash
match alone would not explain:

- DSIR: the whole point of importance resampling is that the top-weighted
  documents are ENRICHED in the target distribution — the top-K must
  contain quality-predicate documents at a higher rate than the corpus
  base rate (Xie et al. 2023 §3; reference quality-gate target).
- BPE: round-1 pair counts must equal an independent pure-Python
  simulation of Sennrich et al.'s count step — independent of BOTH Spark
  SQL and the DuckDB oracle.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bpe_first_merges_match_python_reference(spark):
    from forum_dl_spark.operators.textops import BPE_PAIR_TOPK, bpe_first_merges

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    counts: Counter = Counter()
    for text in texts:
        for w in re.split(r"\s+", text.lower()):
            if len(w) >= 2:
                counts.update(w[i : i + 2] for i in range(len(w) - 1))
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :BPE_PAIR_TOPK
    ]

    rows = bpe_first_merges(spark, SF).orderBy("rank").collect()
    got = [(r["pair"], r["cnt"]) for r in rows]
    assert got == expect
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_dsir_top_docs_enriched_in_target(spark):
    from forum_dl_spark.operators.pipeline import DSIR_TOPK, dsir_weights
    from forum_dl_spark.operators.textops import qf_keep_cond

    rows = dsir_weights(spark, SF).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, DSIR_TOPK + 1))
    weights = [r["weight"] for r in rows]
    assert weights == sorted(weights, reverse=True)

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", qf_keep_cond().alias("tgt")
    )
    tgt = {r["doc_id"] for r in docs.filter("tgt").collect()}
    n_docs = docs.count()
    base_rate = len(tgt) / n_docs
    top_rate = sum(1 for r in rows if r["doc_id"] in tgt) / len(rows)
    assert top_rate > base_rate, (top_rate, base_rate)


def _bpe_apply(syms: list, a: str, b: str) -> list:
    """Greedy left-to-right merge application (Sennrich reference)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_merges_match_python_training_loop(spark):
    """The full iterative trainer equals an independent pure-Python BPE
    simulation — including the greedy left-to-right application order the
    bracket-wrapped replace() encoding must reproduce exactly."""
    from forum_dl_spark.operators.textops import BPE_MERGE_ROUNDS, bpe_merges

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    corpus = [
        list(w)
        for text in texts
        for w in re.split(r"\s+", text.lower())
        if len(w) >= 2
    ]
    expect = []
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        counts: Counter = Counter()
        for syms in corpus:
            counts.update(zip(syms, syms[1:]))
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rnd, a, b, a + b, cnt))
        corpus = [_bpe_apply(syms, a, b) for syms in corpus]

    got = [tuple(r) for r in bpe_merges(spark, SF).orderBy("merge_round").collect()]
    assert got == expect


def test_bpe_encode_matches_python_tokenizer(spark):
    """Encoding the corpus under the trained merge table equals applying
    the same rules per word with the greedy left-to-right reference
    tokenizer — token counts, char counts, and the basis-point
    compression ratio, for every document."""
    from forum_dl_spark.operators.textops import bpe_encode, bpe_merges

    import pyarrow.parquet as pq

    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges(spark, SF).orderBy("merge_round").collect()
    ]
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    expect = {}
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        ws = [w for w in re.split(r"\s+", text.lower()) if w]
        n_chars = sum(len(w) for w in ws)
        n_tokens = 0
        for w in ws:
            syms = list(w)
            for a, b in rules:
                syms = _bpe_apply(syms, a, b)
            n_tokens += len(syms)
        cpt = (10000 * n_chars) // n_tokens if n_tokens else 0
        expect[doc_id] = (len(ws), n_chars, n_tokens, cpt)

    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens_bpe"], r["cpt_e4"])
        for r in bpe_encode(spark, SF).collect()
    }
    assert got == expect


def test_pack_sequences_bpe_consistent_with_encode(spark):
    """The trained-tokenizer packing prices every document with EXACTLY
    bpe_encode's token count, and pack assignment is the per-source
    cumulative sum over doc_id order — recomputed independently in
    Python from the encode output."""
    from forum_dl_spark.operators.textops import (
        PACK_BUDGET,
        bpe_encode,
        pack_sequences_bpe,
    )

    import pyarrow.parquet as pq

    enc = {
        r["doc_id"]: r["n_tokens_bpe"] for r in bpe_encode(spark, SF).collect()
    }
    src = dict(
        zip(
            *[
                pq.read_table(
                    f"{SF}/documents.parquet", columns=["doc_id", "source"]
                )[c].to_pylist()
                for c in ("doc_id", "source")
            ]
        )
    )
    by_source: dict = {}
    for doc_id in sorted(enc):
        by_source.setdefault(src[doc_id], []).append(doc_id)
    expect = {}
    for docs in by_source.values():
        start = 0
        for doc_id in docs:
            expect[doc_id] = (
                enc[doc_id],
                start // PACK_BUDGET,
                start % PACK_BUDGET,
            )
            start += enc[doc_id]

    got = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"], r["pack_off"])
        for r in pack_sequences_bpe(spark, SF).collect()
    }
    assert got == expect


def test_quality_classifier_beats_majority_baseline(spark):
    """The distilled classifier's whole point (Brown et al. 2020 App. A)
    is that the cheap model discriminates: out-of-sample accuracy on the
    holdout split must STRICTLY beat the always-majority-class baseline
    (which the uncalibrated floor-log2 NB degenerates to), and both
    confusion-matrix diagonal cells must be non-empty."""
    from forum_dl_spark.operators.pipeline import quality_classifier_eval

    cells = {
        (r["label"], r["pred"]): r["n_docs"]
        for r in quality_classifier_eval(spark, "/root/testdata/sf0.01").collect()
    }
    total = sum(cells.values())
    correct = cells.get((0, 0), 0) + cells.get((1, 1), 0)
    majority = max(
        cells.get((0, 0), 0) + cells.get((0, 1), 0),
        cells.get((1, 0), 0) + cells.get((1, 1), 0),
    )
    assert cells.get((0, 0), 0) > 0 and cells.get((1, 1), 0) > 0, cells
    assert correct > majority, (cells, correct / total)


def test_quality_classifier_apply_consistent_with_eval(spark):
    """The EMIT keeps exactly the predicted-positive holdout docs: its
    per-label counts must equal the eval matrix's pred=1 column, and
    every kept score must clear the calibrated threshold."""
    from forum_dl_spark.operators.pipeline import (
        _fit_nbq,
        quality_classifier_apply,
        quality_classifier_eval,
    )

    sf = "/root/testdata/sf0.01"
    kept = quality_classifier_apply(spark, sf).collect()
    cells = {
        (r["label"], r["pred"]): r["n_docs"]
        for r in quality_classifier_eval(spark, sf).collect()
    }
    by_label = {}
    for r in kept:
        by_label[r["label"]] = by_label.get(r["label"], 0) + 1
    assert by_label.get(1, 0) == cells.get((1, 1), 0)
    assert by_label.get(0, 0) == cells.get((0, 1), 0)
    _, _, _, theta = _fit_nbq(spark, sf)
    assert all(r["score"] > theta for r in kept)
