"""Semantic pins for kmeans_assign and segment_dedup_apply beyond the
DuckDB oracle hash: an independent numpy re-derivation of the whole
k-means fixpoint, and the planted partial-reassembly path of the segment
dedup.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _numpy_kmeans(sf_dir: str):
    """Independent re-derivation: quantize -> 3 assignment passes with
    2 floor-division centroid updates, ties to smallest cluster id."""
    import pyarrow.parquet as pq

    from forum_dl_spark.operators.pipeline import KM_ITERS, KM_K, KM_SCALE

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vec_ids = list(t["vec_id"])
    q = np.floor(np.array(t["embedding"], dtype=np.float64) * KM_SCALE).astype(
        np.int64
    )
    order = np.argsort(vec_ids)
    vec_ids = [vec_ids[i] for i in order]
    q = q[order]
    cents = {vid: q[i] for i, vid in enumerate(vec_ids) if vid < KM_K}
    for it in range(KM_ITERS):
        ids = sorted(cents)
        c = np.stack([cents[i] for i in ids])
        # dists: (n, k) integer squared L2
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = [ids[j] for j in d.argmin(axis=1)]  # argmin -> first == min id
        if it == KM_ITERS - 1:
            return dict(zip(vec_ids, assign))
        cents = {}
        for cid in sorted(set(assign)):
            member = q[[i for i, a in enumerate(assign) if a == cid]]
            s = member.sum(axis=0)
            n = len(member)
            cents[cid] = np.array(
                [math.floor(x / n) for x in s.tolist()], dtype=np.int64
            )
    raise AssertionError("unreachable")


def test_kmeans_matches_numpy_rederivation(spark):
    from forum_dl_spark.operators.pipeline import kmeans_assign

    rows = kmeans_assign(spark, SF).collect()
    got = {r.vec_id: r.cluster_id for r in rows}
    want = _numpy_kmeans(SF)
    assert got == want
    # sizes column is consistent with the labels themselves
    sizes = {}
    for cid in got.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    for r in rows:
        assert r.n_members == sizes[r.cluster_id]
    # a real clustering: every seed cluster survives on this fixture
    from forum_dl_spark.operators.pipeline import KM_K

    assert len(sizes) == KM_K
    assert sum(sizes.values()) == len(rows)


def test_kmeans_sizes_join_is_broadcast(spark):
    from forum_dl_spark.operators.pipeline import kmeans_assign

    plan = kmeans_assign(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_segment_dedup_planted_partial_reassembly(spark):
    """Planted docs (copied head + novel plant tail): the head always loses
    keep-first to its original, the tail always survives — n_seg == 2,
    n_kept == 1, and the reassembled text is exactly the plant tail."""
    from forum_dl_spark.operators.dedup import (SEG_ID_OFFSET, SEG_SEEDS,
                                                SEG_W, segment_dedup_apply)

    out = {r.doc_id: r for r in segment_dedup_apply(spark, SF).collect()}
    d = spark.read.parquet(f"{SF}/documents.parquet")
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}

    for i in range(SEG_SEEDS):
        r = out[i + SEG_ID_OFFSET]
        assert r.n_seg == 2 and r.n_kept == 1, r
        assert r.text_deduped == " ".join([f"plant{i}"] * SEG_W)
        # ... and the original's head segment survived in the original
        head = " ".join(texts[i].split(" ")[:SEG_W])
        assert out[i].text_deduped.startswith(head)

    # global keep-first invariant: total kept == number of DISTINCT segments
    n_kept_total = sum(r.n_kept for r in out.values())
    n_seg_total = sum(r.n_seg for r in out.values())
    segs = set()
    for doc_id, text in texts.items():
        words = text.split(" ")
        for g in range(0, len(words), SEG_W):
            segs.add(" ".join(words[g : g + SEG_W]))
    for i in range(SEG_SEEDS):
        segs.add(" ".join([f"plant{i}"] * SEG_W))  # planted heads are never new
    assert n_kept_total == len(segs)
    assert n_kept_total < n_seg_total  # non-vacuous: something was dropped
    # natural (non-planted) duplicates exist among the originals too
    dropped_originals = [
        r for k, r in out.items() if k < SEG_ID_OFFSET and r.n_kept < r.n_seg
    ]
    assert dropped_originals


def test_segment_dedup_reassembly_roundtrip(spark):
    """A document whose segments all survived reassembles to its exact
    original text (chunk -> dedup -> join is lossless for the kept path)."""
    from forum_dl_spark.operators.dedup import (SEG_ID_OFFSET,
                                                segment_dedup_apply)

    out = {r.doc_id: r for r in segment_dedup_apply(spark, SF).collect()}
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    full = [
        k for k, r in out.items() if k < SEG_ID_OFFSET and r.n_kept == r.n_seg
    ]
    assert full
    for k in full[:50]:
        assert out[k].text_deduped == texts[k]
