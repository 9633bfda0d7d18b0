"""Link-graph analytics — the web-scale companion to the crawl engine.

A crawler at 10^10-page scale needs link analysis to prioritize its
frontier (host- and page-level PageRank is what e.g. Common Crawl
publishes alongside its dumps). This module implements the iterative
Pregel-style shape with plain DataFrame joins: per iteration one shuffle
join (ranks onto edge sources) + one map-side-combined aggregate
(contributions onto destinations) — the same plan a 1000-executor GraphX
run would produce, with no driver-side data path.

Determinism contract: PageRank here is INTEGER-exact — ranks are scaled
by 10^6, the damping step is ``150_000 + (17 * s) div 20`` (0.15 teleport
and 0.85 damping in exact integer arithmetic) and per-edge contributions
are ``r div outdeg`` — so the result is bit-identical across engines and
partitionings (integer sums are associative; no FP accumulation order).

The link graph is synthesized deterministically from the ``documents``
table (no external data, per the graft brief): each doc gets exactly
``_PR_OUT`` out-edges whose destinations are md5-derived mod N. This
requires the testdata contract that doc_ids are dense 0..N-1; on a real
crawl corpus the edge list comes from the crawler's extracted hrefs and
the mod-N step disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._par import read_spread


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/documents.parquet")


_PR_ITERS = 5      # fixed iteration count (unrolled in the DuckDB oracle)
_PR_OUT = 3        # constant out-degree of the synthetic graph
_PR_TOPK = 20
_PR_INIT = 1_000_000   # rank scale: 1.0 == 10^6


def pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``_PR_TOPK`` documents by integer-exact PageRank after
    ``_PR_ITERS`` synchronous iterations over the synthetic link graph.

    Scale shape: edges are materialized once (localCheckpoint — reused by
    every iteration without recomputing the md5 projection); each
    iteration is edges⋈ranks on the source id (shuffle on id) followed by
    a partial-aggregated sum on dst; the final top-k is TakeOrdered (no
    total sort). Dangling mass: none by construction (every node emits
    exactly ``_PR_OUT`` edges; self-loops are allowed and deterministic).
    """
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.count()  # driver scalar (graph modulus), one O(1)-result job
    dst_arr = (
        f"transform(sequence(0, {_PR_OUT - 1}), j -> "
        f"cast(conv(substring(md5(concat('edge:', cast(doc_id as string),"
        f" ':', cast(j as string))), 1, 8), 16, 10) as bigint) % {n})"
    )
    edges = d.select(
        F.col("doc_id").alias("src"), F.explode(F.expr(dst_arr)).alias("dst")
    ).localCheckpoint()
    ranks = d.select(
        F.col("doc_id").alias("id"),
        F.lit(_PR_INIT).cast("long").alias("r"),
    )
    for _ in range(_PR_ITERS):
        sums = (
            edges.join(ranks, edges.src == ranks.id)
            .select(F.col("dst").alias("id"), F.expr(f"r div {_PR_OUT}").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            d.select(F.col("doc_id").alias("id"))
            .join(sums, "id", "left")
            .select(
                "id",
                F.expr("cast(150000 + (17 * coalesce(s, 0)) div 20 as bigint)").alias("r"),
            )
        )
    return (
        ranks.orderBy(F.col("r").desc(), F.col("id"))
        .limit(_PR_TOPK)
        .select(F.col("id").alias("doc_id"), F.col("r").alias("rank_score"))
    )


def _pr_iter_cte(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT ids.id, CAST(150000 + (17 * coalesce(q.s, 0)) // 20 AS BIGINT) AS r
  FROM ids LEFT JOIN (
    SELECT dst AS id, sum(r // {_PR_OUT}) AS s
    FROM edges JOIN {prev} ON edges.src = {prev}.id
    GROUP BY dst
  ) q USING (id)
)"""


_PR_CTES = ",\n".join(
    _pr_iter_cte(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS)
)

PAGERANK_TOPK_SQL = f"""
WITH ids AS (SELECT doc_id AS id FROM documents),
edges AS (
  SELECT id AS src,
         CAST(concat('0x', substring(md5(concat('edge:', CAST(id AS VARCHAR),
                  ':', CAST(j AS VARCHAR))), 1, 8)) AS BIGINT)
           % (SELECT count(*) FROM documents) AS dst
  FROM ids, generate_series(0, {_PR_OUT - 1}) AS t(j)
),
r0 AS (SELECT id, CAST({_PR_INIT} AS BIGINT) AS r FROM ids),
{_PR_CTES}
SELECT id AS doc_id, r AS rank_score FROM r{_PR_ITERS}
ORDER BY r DESC, id LIMIT {_PR_TOPK}
"""


_HITS_ITERS = 3


def hits_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``_PR_TOPK`` documents by HITS authority score (Kleinberg) over
    the same synthetic link graph as ``pagerank_topk``.

    Integer-exact WITHOUT any normalization step: rankings are
    scale-invariant, so the usual per-iteration L2 normalization (which
    would force floats and accumulation-order nondeterminism) is dropped
    and the raw mutual-recurrence sums are kept — after ``_HITS_ITERS``
    rounds magnitudes are ~init·(out·in)^iters ≈ 10^6·3^6, far inside
    int64. Same per-iteration plan shape as PageRank: one shuffle join +
    one partial-aggregated sum per half-step; ties broken by doc_id for a
    deterministic top-k in both engines."""
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.count()
    dst_arr = (
        f"transform(sequence(0, {_PR_OUT - 1}), j -> "
        f"cast(conv(substring(md5(concat('edge:', cast(doc_id as string),"
        f" ':', cast(j as string))), 1, 8), 16, 10) as bigint) % {n})"
    )
    edges = d.select(
        F.col("doc_id").alias("src"), F.explode(F.expr(dst_arr)).alias("dst")
    ).localCheckpoint()
    ids = d.select(F.col("doc_id").alias("id"))
    hubs = ids.select("id", F.lit(_PR_INIT).cast("long").alias("h"))
    auths = None
    for _ in range(_HITS_ITERS):
        # authority(v) = sum of hub scores of pages linking to v
        auths = (
            ids.join(
                edges.join(hubs, edges.src == hubs.id)
                .groupBy("dst")
                .agg(F.sum("h").alias("a"))
                .withColumnRenamed("dst", "id"),
                "id",
                "left",
            ).select("id", F.coalesce("a", F.lit(0).cast("long")).alias("a"))
        )
        # hub(u) = sum of authority scores of pages u links to
        hubs = (
            ids.join(
                edges.join(auths, edges.dst == auths.id)
                .groupBy("src")
                .agg(F.sum("a").alias("h"))
                .withColumnRenamed("src", "id"),
                "id",
                "left",
            ).select("id", F.coalesce("h", F.lit(0).cast("long")).alias("h"))
        )
    return (
        auths.orderBy(F.col("a").desc(), F.col("id"))
        .limit(_PR_TOPK)
        .select(F.col("id").alias("doc_id"), F.col("a").alias("authority"))
    )


def _hits_iter_ctes(i: int) -> str:
    prev_h = f"h{i - 1}"
    return f"""a{i} AS (
  SELECT ids.id, CAST(coalesce(q.a, 0) AS BIGINT) AS a
  FROM ids LEFT JOIN (
    SELECT dst AS id, sum(h) AS a FROM edges JOIN {prev_h} ON edges.src = {prev_h}.id
    GROUP BY dst
  ) q USING (id)
),
h{i} AS (
  SELECT ids.id, CAST(coalesce(q.h, 0) AS BIGINT) AS h
  FROM ids LEFT JOIN (
    SELECT src AS id, sum(a) AS h FROM edges JOIN a{i} ON edges.dst = a{i}.id
    GROUP BY src
  ) q USING (id)
)"""


_HITS_CTES = ",\n".join(_hits_iter_ctes(i) for i in range(1, _HITS_ITERS + 1))

HITS_TOPK_SQL = f"""
WITH ids AS (SELECT doc_id AS id FROM documents),
edges AS (
  SELECT id AS src,
         CAST(concat('0x', substring(md5(concat('edge:', CAST(id AS VARCHAR),
                  ':', CAST(j AS VARCHAR))), 1, 8)) AS BIGINT)
           % (SELECT count(*) FROM documents) AS dst
  FROM ids, generate_series(0, {_PR_OUT - 1}) AS t(j)
),
h0 AS (SELECT id, CAST({_PR_INIT} AS BIGINT) AS h FROM ids),
{_HITS_CTES}
SELECT id AS doc_id, a AS authority FROM a{_HITS_ITERS}
ORDER BY a DESC, id LIMIT {_PR_TOPK}
"""


def pagerank_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the CRAWL'S REAL LINK GRAPH (round-4 verdict ask #4):
    the edges are ``CrawlResult.link_edges()`` — every (discovering page →
    discovered URL) pair the fixture Discourse crawl's parse kernels
    actually emitted (reference resolves the same hrefs via urljoin,
    extractors/common.py:436,505) — not the md5-synthesized graph
    ``pagerank_topk`` ranks. Nodes are all URLs on either edge side; URLs
    with no out-links are dangling (their mass is dropped, the classic
    simplification — documented, deterministic).

    Same integer-exact Pregel shape as ``pagerank_topk`` (string keys
    instead of longs; integer sums are associative, so the result is
    bit-identical across partitionings). Rows-only in the driver gate (the
    producing crawl is iterative/stateful); the edge table itself is
    pinned EXACTLY against the reference simulation's discovered-link set
    in tests/test_graph_crawl.py, and the rank arithmetic is pinned by the
    same pure-Python simulation used for pagerank_topk.
    """
    from ._fixture import fixture_discourse_crawl

    res = fixture_discourse_crawl(spark)
    edges = res.link_edges().select(
        F.col("src_key").alias("src"), F.col("dst_key").alias("dst")
    ).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    esrc = edges.join(outdeg, "src")
    ranks = nodes.select("id", F.lit(_PR_INIT).cast("long").alias("r"))
    for _ in range(_PR_ITERS):
        sums = (
            esrc.join(ranks, esrc.src == ranks.id)
            .select(F.col("dst").alias("id"), F.expr("r div outdeg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                F.expr("cast(150000 + (17 * coalesce(s, 0)) div 20 as bigint)").alias("r"),
            )
        )
    return (
        ranks.orderBy(F.col("r").desc(), F.col("id"))
        .limit(_PR_TOPK)
        .select(F.col("id").alias("url_key"), F.col("r").alias("rank_score"))
    )


QUERIES = {
    "pagerank_topk": pagerank_topk,
    "hits_topk": hits_topk,
    "pagerank_crawl": pagerank_crawl,
}

ORACLES = {
    "pagerank_topk": PAGERANK_TOPK_SQL,
    "hits_topk": HITS_TOPK_SQL,
    # pagerank_crawl: rows-only (the producing crawl is iterative/stateful,
    # not SQL-expressible); edge set + rank arithmetic pinned by
    # tests/test_graph_crawl.py instead
}
