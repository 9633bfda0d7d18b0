"""Data-mixing operators: temperature-scaled source weights + budgeted draw.

The mixture stage of a training-data pipeline (mT5 §3.3, The Pile §2,
LLaMA tbl. 1): given per-source corpus sizes, compute sampling weights
w_i ∝ n_i^alpha with alpha = 0.5 (temperature sampling — upweights small
sources relative to proportional sampling without letting any source
dominate), then materialize an actual token-budgeted draw per source.

Integer-exact contract: the only non-integer step, n^0.5, is computed as
the EXACT integer square root — isqrt(n) = the unique s with
s² ≤ n < (s+1)² — via a double `sqrt` seed corrected by ±1 integer
comparisons, so both engines (and any partitioning) produce bit-identical
weights; everything downstream is integer div in basis points.

Scale shape: the weight table is ONE source-keyed hash aggregate
(map-side combined; #groups = #sources, tiny at any corpus scale) plus a
1-row broadcast for the normalizer — no wide join, no sort.  The budgeted
draw broadcasts that tiny weight table into the corpus scan and does ONE
source-keyed window for the greedy cumulative-token cut; document text
never shuffles (only doc_id/source/counts enter the exchange).

Reference scope note: forum-dl has no mixing stage (it is a crawler); these
operators serve the 100 TB training-data-pipeline surface the engine adds
on top of the crawl corpus (same bucket as dedup/ANN/DSIR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._par import read_spread

_TOK = r"filter(split(lower(text), '\\s+'), x -> x != '')"
_TOK_DUCK = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"

MIX_ALPHA_NOTE = "alpha = 0.5 (square-root temperature)"
# The total draw budget is HALF the corpus's tokens (integer div), derived
# from the data rather than a constant so the draw is a real subset at any
# scale factor — small sources get epochs_bp near (or above) 10000, big
# sources get cut hard, which is exactly the temperature-mixing picture.


def _isqrt_expr(n: str) -> str:
    """Exact integer sqrt of a BIGINT expression, identical in Spark SQL
    and DuckDB: seed with the double sqrt, then correct the at-most-1-ulp
    seed error by integer comparison (n ≤ 2^53 here, so the seed is within
    ±1 of the true isqrt)."""
    s0 = f"cast(sqrt(cast(({n}) as double)) as bigint)"
    return (
        f"({s0} + (case when ({s0}+1)*({s0}+1) <= ({n}) then 1 else 0 end)"
        f" - (case when {s0}*{s0} > ({n}) then 1 else 0 end))"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/documents.parquet")


def _source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source → (n_docs, n_tokens, sqrt_tokens, weight_bp, budget_tokens):
    the shared CTE of both operators."""
    d = _docs(spark, sf_dir)
    per_src = (
        d.select("source", F.expr(f"size({_TOK})").alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .withColumn("sqrt_tokens", F.expr(_isqrt_expr("n_tokens")))
    )
    tot = per_src.agg(
        F.sum("sqrt_tokens").alias("tot_sqrt"),
        F.sum("n_tokens").alias("tot_tokens"),
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "sqrt_tokens",
        F.expr("(10000 * sqrt_tokens) div tot_sqrt").alias("weight_bp"),
        F.expr(
            "((tot_tokens div 2) * ((10000 * sqrt_tokens) div tot_sqrt)) div 10000"
        ).alias("budget_tokens"),
    )


def mix_weights_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature mixture weights (basis points) and the
    per-source slice of a half-the-corpus token budget, with the implied
    epoch count (epochs_bp > 10000 ⇔ the source must repeat to fill its
    slice — the small-high-quality-source accounting from The Pile /
    LLaMA).  All-integer: exact isqrt + integer div."""
    s = _source_stats(spark, sf_dir)
    # r6 correctness: the four sum-derived columns are emitted as DOUBLE
    # to match the oracle's delivery — DuckDB sum()/`//`-of-sum produce
    # HUGEINT, which a pandas/arrow fetch renders as float64 (the exact
    # bug class that made dedup_prefix the round-5 driver red; caught
    # here preemptively by gate_mimic's r6 dtype audit). Values are the
    # same exact integers; the oracle SQL is fingerprint-frozen.
    return s.select(
        "source",
        "n_docs",
        F.col("n_tokens").cast("double").alias("n_tokens"),
        "sqrt_tokens",
        F.col("weight_bp").cast("double").alias("weight_bp"),
        F.col("budget_tokens").cast("double").alias("budget_tokens"),
        F.expr("(10000 * budget_tokens) div n_tokens")
        .cast("double")
        .alias("epochs_bp"),
    )


_SRC_STATS_CTE = f"""
tok AS (
  SELECT source, len({_TOK_DUCK}) AS n_tok, doc_id
  FROM documents
),
per_src AS (
  SELECT source, count(*) AS n_docs, sum(n_tok) AS n_tokens
  FROM tok GROUP BY source
),
sq AS (
  SELECT *, {_isqrt_expr('n_tokens')} AS sqrt_tokens FROM per_src
),
w AS (
  SELECT source, n_docs, n_tokens, sqrt_tokens,
         (10000 * sqrt_tokens) // (SELECT sum(sqrt_tokens) FROM sq) AS weight_bp,
         (((SELECT sum(n_tokens) FROM sq) // 2)
          * ((10000 * sqrt_tokens) // (SELECT sum(sqrt_tokens) FROM sq))) // 10000
           AS budget_tokens
  FROM sq
)
"""

MIX_WEIGHTS_SQL = f"""
WITH {_SRC_STATS_CTE}
SELECT source, n_docs, n_tokens, sqrt_tokens, weight_bp, budget_tokens,
       (10000 * budget_tokens) // n_tokens AS epochs_bp
FROM w
"""


def mix_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the mixture: per source, draw documents in md5
    hash-rank order (a deterministic uniform shuffle) greedily while the
    tokens already drawn stay under the source's budget slice — the last
    pick may overshoot (standard greedy prefix; every source with a
    non-zero budget contributes at least one document).

    Scale shape: budgets broadcast (one row per source — the other
    exchanges in the plan are on that dimension-sized side); the CORPUS
    rows pass through exactly ONE source-keyed exchange (the window), and
    text never enters it (only doc_id/source/n_tok/hash).  Plan-pinned:
    no SortMergeJoin, broadcast join, no range partitioning."""
    d = _docs(spark, sf_dir)
    h = (
        "cast(conv(substring(md5(concat('mixsel:', cast(doc_id as string))),"
        " 1, 8), 16, 10) as bigint)"
    )
    budgets = _source_stats(spark, sf_dir).select("source", "budget_tokens")
    toks = d.select(
        "doc_id", "source", F.expr(f"size({_TOK})").alias("n_tok"),
        F.expr(h).alias("h"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("h", "doc_id")
    picked = (
        toks.join(F.broadcast(budgets), "source")
        .withColumn("pick_rank", F.row_number().over(w))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .filter(F.col("cum_before") < F.col("budget_tokens"))
    )
    # cum_before cast to DOUBLE: DuckDB's window sum() is HUGEINT and a
    # pandas/arrow fetch renders it float64 (see mix_weights_temperature)
    return picked.select(
        "doc_id",
        "source",
        "n_tok",
        "pick_rank",
        F.col("cum_before").cast("double").alias("cum_before"),
    )


MIX_BUDGET_SAMPLE_SQL = f"""
WITH {_SRC_STATS_CTE},
ranked AS (
  SELECT t.doc_id, t.source, t.n_tok,
         cast(concat('0x', substring(md5(concat('mixsel:', cast(t.doc_id as varchar))),
                                     1, 8)) as bigint) AS h,
         w.budget_tokens
  FROM tok t JOIN w USING (source)
),
cum AS (
  SELECT doc_id, source, n_tok, budget_tokens,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS pick_rank,
         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cum_before
  FROM ranked
)
SELECT doc_id, source, n_tok, pick_rank, cum_before
FROM cum WHERE cum_before < budget_tokens
"""


QUERIES = {
    "mix_weights_temperature": mix_weights_temperature,
    "mix_budget_sample": mix_budget_sample,
}

ORACLES = {
    "mix_weights_temperature": MIX_WEIGHTS_SQL,
    "mix_budget_sample": MIX_BUDGET_SAMPLE_SQL,
}
