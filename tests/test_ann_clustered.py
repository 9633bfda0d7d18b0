"""Clustered-fixture ANN evidence: the multi-table (OR-construction) LSH
index achieves production-grade recall where locality exists, and the
fixture is a real instrument (it can miss).

The clustered table is derived IN-ENGINE from the base embeddings
(CL_CENTROIDS centroids x CL_MEMBERS members with deterministic md5
noise) — no external data; the DuckDB oracle parity for both registered
queries runs in tests/test_operators_oracle.py.
"""

from __future__ import annotations

from statistics import mean

SF = "/root/testdata/sf0.01"


def _recalls(spark, n_tables):
    from forum_dl_spark.operators.similarity import ann_recall_clustered

    return {
        r["query_id"]: r["recall"]
        for r in ann_recall_clustered(spark, SF, n_tables=n_tables).collect()
    }


def test_clustered_recall_meets_bar_and_is_not_saturated(spark):
    """Mean recall@5 >= 0.8 over the 10 cluster queries (deterministic
    fixture — this is a pin, not a flaky threshold), and at least one
    query scores < 1.0: the noise scale is chosen so the instrument CAN
    miss, i.e. a recall of 1.0 would be information, not an artifact of a
    too-easy fixture."""
    rec = _recalls(spark, n_tables=4)
    assert len(rec) == 10
    assert mean(rec.values()) >= 0.8, rec
    assert any(v < 1.0 for v in rec.values()), rec


def test_multi_table_lifts_recall_over_single_table(spark):
    """The OR-construction is the recall lever: 4 tables must dominate
    1 table per query (a union of candidate sets can only add hits) and
    strictly beat it in aggregate on this fixture."""
    one = _recalls(spark, n_tables=1)
    four = _recalls(spark, n_tables=4)
    assert set(one) == set(four)
    assert all(four[q] >= one[q] for q in one), (one, four)
    assert mean(four.values()) > mean(one.values()), (one, four)


def test_clustered_queries_registered(spark):
    from forum_dl_spark.operators import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    assert "ann_clustered_topk" in q and "ann_clustered_topk" in o
    assert "ann_recall_clustered" in q and "ann_recall_clustered" in o
