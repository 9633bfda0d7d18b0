"""Corpus-statistics / chunking operators over the ``documents`` table.

The second text-analysis batch (the first lives in ``textops``): the
operators a training-data pipeline runs AFTER the per-document filters —
chunking for context-window / RAG ingestion, cardinality sketching for
shingle-space sizing, collocation mining (PMI), vocabulary shape audits
(Zipf/Heaps), and tokenizer-fertility evaluation of the trained BPE.

Every operator is integer-exact or shared-regex deterministic and carries
a DuckDB oracle with identical column names and arithmetic.  All plans are
scale-shaped: chunking is a zero-exchange row-expanding projection; the
sketch and histogram are map-side-combined hash aggregates; PMI broadcasts
the vocabulary-sized unigram relation; fertility reuses the session-memoized
trained tokenizer as literal plan state (no retraining, no join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._par import read_spread

_TOK = r"filter(split(lower(text), '\\s+'), x -> x != '')"
_TOK_DUCK = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/documents.parquet")


# --- document chunking ---------------------------------------------------------

CHUNK_WINDOW = 32  # tokens per chunk
CHUNK_STRIDE = 24  # tokens between chunk starts (overlap = WINDOW - STRIDE)


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking with stride — the context-window /
    RAG-ingestion splitter (every token is covered; consecutive chunks
    overlap by ``CHUNK_WINDOW - CHUNK_STRIDE`` tokens; the last chunk may
    be short).  Chunk count = 1 + ceil(max(0, n - W) / S), integer-exact
    in both engines.

    Scale shape: tokenize once, compute the chunk-start sequence per row,
    explode, slice — a ZERO-exchange row-expanding narrow projection that
    inherits the corpus partitioning (the ideal 100 TB operator, same
    class as bpe_encode).  Plan-pinned exchange-free in
    tests/test_textstats.py.
    """
    w, s = CHUNK_WINDOW, CHUNK_STRIDE
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.expr(_TOK).alias("w")).filter(F.size("w") >= 1)
    nch = F.expr(
        f"1 + case when size(w) > {w}"
        f" then cast((size(w) - {w} + {s} - 1) div {s} as int) else 0 end"
    )
    chunks = toks.select(
        "doc_id",
        F.col("w"),
        F.explode(F.sequence(F.lit(0), nch - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * s + 1
    take = F.least(F.lit(w), F.size("w") - start + 1)
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        take.cast("long").alias("n_tokens_chunk"),
        F.array_join(F.slice(F.col("w"), start, take), " ").alias("chunk_text"),
    )


CHUNK_DOCUMENTS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, {_TOK_DUCK} AS w FROM documents
),
sized AS (
  SELECT doc_id, w,
         1 + CASE WHEN len(w) > {CHUNK_WINDOW}
                  THEN (len(w) - {CHUNK_WINDOW} + {CHUNK_STRIDE} - 1)
                       // {CHUNK_STRIDE}
                  ELSE 0 END AS nch
  FROM toks WHERE len(w) >= 1
),
exploded AS (
  SELECT doc_id, w, unnest(generate_series(0, nch - 1)) AS chunk_id
  FROM sized
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(least({CHUNK_WINDOW}, len(w) - (chunk_id * {CHUNK_STRIDE} + 1) + 1)
            AS BIGINT) AS n_tokens_chunk,
       array_to_string(
         w[chunk_id * {CHUNK_STRIDE} + 1 :
           chunk_id * {CHUNK_STRIDE}
             + least({CHUNK_WINDOW},
                     len(w) - (chunk_id * {CHUNK_STRIDE} + 1) + 1)],
         ' ') AS chunk_text
FROM exploded
"""


# --- distinct-cardinality sketch -----------------------------------------------
#
# Bucketed-minimum KMV-family estimator (Bar-Yossef et al. 2002 / the
# stochastic-averaging idea behind HLL, Flajolet et al. 2007) over the
# per-source 3-gram shingle space: split the 32-bit hash universe into M
# buckets, keep the MINIMUM hash per bucket, estimate
# n ≈ M_present² · 2³² / (Σ mins + M_present).  Everything is integer
# arithmetic on the shared md5→int32 hash, so Spark and DuckDB agree bit
# for bit — the oracle recomputes estimate AND exact and the value-hash
# doubles as an estimator audit (same design as ann_recall / pq_recall).

SKETCH_BUCKETS = 64
_H32_SPARK = "cast(conv(substring(md5(sh), 1, 8), 16, 10) as bigint)"
_H32_DUCK = "cast(concat('0x', substring(md5(sh), 1, 8)) as bigint)"
_H32_BASE = 1 << 32


def distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct 3-gram-shingle cardinality: exact count next to
    the bucketed-min sketch estimate and its error in basis points.

    Scale shape: the shingle build is a narrow row-expanding projection;
    the hash-distinct is the one heavy exchange (map-side combined); the
    bucket-min and per-source rollups are partial-aggregated ``min``/
    ``sum`` (64 rows per source survive the map side), and the exact-vs-
    estimate join is a broadcast on the tiny source dimension.  At 100 TB
    only the sketch side would ship (drop the exact branch); it is kept
    here because the operator IS the audit.
    """
    d = _docs(spark, sf_dir)
    sh = (
        d.select("source", F.expr(_TOK).alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> concat_ws(' ', element_at(t, i),"
                    " element_at(t, i + 1), element_at(t, i + 2)))"
                )
            ).alias("sh"),
        )
    )
    hashed = sh.select(
        "source", F.expr(_H32_SPARK).alias("h")
    ).distinct()
    # r6 note: materializing this once for the two consumers was TRIED and
    # measured SLOWER at the 10x proxy sf (1.9 s -> 4.3 s): the persist
    # write + checkpoint copy of the multi-million-row distinct relation
    # costs more than one extra tokenize+distinct rebuild. Left as two
    # scans on purpose.
    exact = hashed.groupBy("source").agg(
        F.count("*").alias("exact_distinct")
    )
    mins = (
        hashed.withColumn("bucket", F.col("h") % SKETCH_BUCKETS)
        .groupBy("source", "bucket")
        .agg(F.min("h").alias("mn"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("mn").alias("sum_mins"),
        )
    )
    est = F.expr(
        f"cast((n_buckets * n_buckets * {_H32_BASE}L)"
        " div (sum_mins + n_buckets) as bigint)"
    )
    return (
        mins.join(F.broadcast(exact), "source")
        .withColumn("est_distinct", est)
        .select(
            "source",
            "exact_distinct",
            "est_distinct",
            F.expr(
                "cast(abs(est_distinct - exact_distinct) * 10000"
                " div exact_distinct as bigint)"
            ).alias("err_bp"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
        )
    )


DISTINCT_SKETCH_SQL = rf"""
WITH sh AS (
  SELECT source,
         unnest([concat(t[i], ' ', t[i + 1], ' ', t[i + 2])
                 for i in generate_series(1, len(t) - 2)]) AS sh
  FROM (SELECT source, {_TOK_DUCK} AS t FROM documents)
  WHERE len(t) >= 3
),
hashed AS (
  SELECT DISTINCT source, {_H32_DUCK} AS h FROM sh
),
exact AS (
  SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct
  FROM hashed GROUP BY source
),
mins AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(mn) AS BIGINT) AS sum_mins
  FROM (SELECT source, h % {SKETCH_BUCKETS} AS bucket, min(h) AS mn
        FROM hashed GROUP BY 1, 2)
  GROUP BY source
)
SELECT source, exact_distinct,
       CAST((n_buckets * n_buckets * {_H32_BASE})
            // (sum_mins + n_buckets) AS BIGINT) AS est_distinct,
       CAST(abs((n_buckets * n_buckets * {_H32_BASE})
                // (sum_mins + n_buckets) - exact_distinct) * 10000
            // exact_distinct AS BIGINT) AS err_bp,
       n_buckets
FROM mins JOIN exact USING (source)
"""


# --- PMI collocations ------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``PMI_TOP_K`` word bigrams by pointwise mutual information —
    collocation mining (Church & Hanks 1990), the phrase-detection step of
    a tokenizer / phrase-vocab pipeline.  PMI is kept in INTEGER basis
    points of the probability ratio, pmi_bp = (10000·c_xy·N) div
    (c_x·c_y), so both engines rank identically (at real scale you would
    let this be a double; exactness is the point of the gate).

    Scale shape: bigram and unigram counts are each ONE map-side-combined
    hash aggregate over the same narrow tokenization; the unigram relation
    is vocabulary-sized and joined twice via BROADCAST (plan-pinned: no
    SortMergeJoin); N is a 1-row broadcast; the final top-k is a
    TakeOrdered, not a global sort.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    words = d.select(F.expr(_TOK).alias("t"))
    uni = words.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count("*").alias("c")
    )
    n_tot = uni.agg(F.sum("c").alias("n_total"))
    bi = (
        words.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) as lhs,"
                    " element_at(t, i + 1) as rhs))"
                )
            ).alias("p")
        )
        .select("p.lhs", "p.rhs")
        .groupBy("lhs", "rhs")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= PMI_MIN_COUNT)
    )
    scored = (
        bi.join(F.broadcast(uni.withColumnRenamed("tok", "lhs")
                            .withColumnRenamed("c", "c_lhs")), "lhs")
        .join(F.broadcast(uni.withColumnRenamed("tok", "rhs")
                          .withColumnRenamed("c", "c_rhs")), "rhs")
        .join(F.broadcast(n_tot))
        .select(
            F.concat_ws(" ", "lhs", "rhs").alias("gram"),
            F.col("cnt").cast("long").alias("cnt"),
            F.expr(
                "cast((10000 * cnt * n_total) div (c_lhs * c_rhs) as bigint)"
            ).alias("pmi_bp"),
        )
    )
    top = scored.orderBy(F.desc("pmi_bp"), F.asc("gram")).limit(PMI_TOP_K)
    rank_w = Window.orderBy(F.desc("pmi_bp"), F.asc("gram"))
    return top.withColumn("rank", F.row_number().over(rank_w)).select(
        "gram", "cnt", "pmi_bp", "rank"
    )


PMI_TOP_PAIRS_SQL = rf"""
WITH words AS (SELECT {_TOK_DUCK} AS t FROM documents),
uni AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest(t) AS tok FROM words) GROUP BY tok
),
ntot AS (SELECT sum(c) AS n_total FROM uni),
bi AS (
  SELECT lhs, rhs, count(*) AS cnt
  FROM (SELECT unnest([struct_pack(lhs := t[i], rhs := t[i + 1])
                       for i in generate_series(1, len(t) - 1)], recursive := true)
        FROM words WHERE len(t) >= 2)
  GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COUNT}
),
scored AS (
  SELECT concat(lhs, ' ', rhs) AS gram,
         CAST(cnt AS BIGINT) AS cnt,
         CAST((10000 * cnt * n_total) // (ul.c * ur.c) AS BIGINT) AS pmi_bp
  FROM bi
  JOIN uni ul ON ul.tok = bi.lhs
  JOIN uni ur ON ur.tok = bi.rhs
  CROSS JOIN ntot
)
SELECT gram, cnt, pmi_bp, rank FROM (
  SELECT gram, cnt, pmi_bp,
         row_number() OVER (ORDER BY pmi_bp DESC, gram ASC) AS rank
  FROM scored
) WHERE rank <= {PMI_TOP_K}
"""


# --- Zipf / vocabulary-shape histogram -------------------------------------------


def zipf_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary shape audit: token types and token mass per
    floor(log2(frequency)) bucket — the no-global-sort way to read a
    Zipf/Heaps curve (a straight-ish line of n_types per doubling bucket
    is the Zipf signature; the bucket-0 row is the hapax count that
    drives Heaps growth).  Integer-exact via the binary-string-length
    floor-log2 idiom shared with perplexity_buckets.

    Scale shape: two map-side-combined hash aggregates (token → count,
    bucket → rollup) and nothing else — no window, no sort, no join; the
    second exchange carries at most ~32 rows per map task.
    """
    d = _docs(spark, sf_dir)
    counts = (
        d.select(F.explode(F.expr(_TOK)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.select(
            F.expr("cast(length(bin(cnt)) - 1 as bigint)").alias("bucket"),
            "cnt",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_types"),
            F.sum("cnt").alias("n_tokens"),
        )
    )


ZIPF_HISTOGRAM_SQL = rf"""
WITH counts AS (
  SELECT tok, count(*) AS cnt
  FROM (SELECT unnest({_TOK_DUCK}) AS tok FROM documents)
  GROUP BY tok
)
SELECT CAST(length(printf('%b', cnt)) - 1 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(cnt) AS BIGINT) AS n_tokens
FROM counts GROUP BY 1
"""


# --- BPE tokenizer fertility ------------------------------------------------------


def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit of the trained BPE, by language: tokens
    per word and chars per token in integer basis points — the standard
    multilingual-tokenizer equity metric (how many subwords a word costs
    per language; Rust et al. 2021).  Reuses the session-memoized trained
    merge table from ``textops._train_bpe``: in a gate/bench session the
    tokenizer trains ONCE and bpe_merges / bpe_encode / pack_sequences_bpe
    / this all share it.

    Scale shape: encode is the same zero-exchange literal-``replace``
    projection as bpe_encode; the only exchange is the final tiny
    lang-keyed partial aggregate.
    """
    from .textops import _bpe_token_count_col, _bpe_words_col, _train_bpe

    rules = _train_bpe(spark, sf_dir)
    d = _docs(spark, sf_dir)
    enc = d.withColumn("ws", _bpe_words_col()).select(
        "lang",
        F.expr("cast(size(ws) as bigint)").alias("n_words"),
        F.expr("cast(length(concat_ws('', ws)) as bigint)").alias("n_chars"),
        _bpe_token_count_col(rules).alias("n_tok"),
    )
    agg = enc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("sum_words"),
        F.sum("n_tok").alias("sum_tokens_bpe"),
        F.sum("n_chars").alias("sum_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "sum_words",
        "sum_tokens_bpe",
        F.expr(
            "cast(case when sum_words > 0 then (10000 * sum_tokens_bpe)"
            " div sum_words else 0 end as bigint)"
        ).alias("fertility_bp"),
        F.expr(
            "cast(case when sum_tokens_bpe > 0 then (10000 * sum_chars)"
            " div sum_tokens_bpe else 0 end as bigint)"
        ).alias("cpt_e4"),
    )


def _bpe_fertility_sql() -> str:
    from .textops import BPE_MERGE_ROUNDS, _bpe_train_and_enc_ctes

    last = f"e{BPE_MERGE_ROUNDS}"
    return (
        _bpe_train_and_enc_ctes(carry=", lang")
        + f""",
per_doc AS (
  SELECT lang, n_words, n_chars,
         CAST(length(s) - length(replace(s, '[', '')) AS BIGINT) AS n_tok
  FROM {last}
),
agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS sum_words,
         CAST(sum(n_tok) AS BIGINT) AS sum_tokens_bpe,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM per_doc GROUP BY lang
)
SELECT lang, n_docs, sum_words, sum_tokens_bpe,
       CAST(CASE WHEN sum_words > 0
                 THEN (10000 * sum_tokens_bpe) // sum_words
                 ELSE 0 END AS BIGINT) AS fertility_bp,
       CAST(CASE WHEN sum_tokens_bpe > 0
                 THEN (10000 * sum_chars) // sum_tokens_bpe
                 ELSE 0 END AS BIGINT) AS cpt_e4
FROM agg
"""
    )


# --- Heaps-law vocabulary-growth curve ---------------------------------------------


HEAPS_DECILES = 10


def heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth across corpus prefixes (Heaps' law audit): how
    many NEW token types each corpus decile introduces, and the cumulative
    vocabulary after it.  The one-pass trick: the vocabulary of prefix P is
    the number of types whose FIRST occurrence (min doc_id — doc_ids are
    dense 0..N-1, so doc_id order IS corpus order) lands in P, so a single
    min-aggregate replaces materializing every prefix.

    Scale shape: one (tok → min doc_id) map-side-combined hash aggregate,
    one ≤``HEAPS_DECILES``-row rollup, and a cumulative window over those
    ≤10 rows (single-partition by construction — constant-sized, not a
    data-scale sort).  Deciles introducing zero new types are omitted by
    both engines identically.

    Honesty note: on the shared-vocabulary synthetic corpus the whole
    vocabulary first occurs in decile 0, so the gate result is a single
    row — the mechanism (first-occurrence assignment + cumulative sum) is
    pinned against a pure-Python scan in tests/test_textstats.py, where a
    Heaps-shaped corpus would populate every decile.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    n = d.agg(F.count("*").alias("n_docs"))
    first = (
        d.select("doc_id", F.explode(F.expr(_TOK)).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per = (
        first.join(F.broadcast(n))
        .select(
            F.expr(
                f"cast((first_doc * {HEAPS_DECILES}) div n_docs as bigint)"
            ).alias("decile")
        )
        .groupBy("decile")
        .agg(F.count("*").alias("n_new_types"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "n_new_types",
        F.sum("n_new_types").over(w).cast("long").alias("n_types_cum"),
    )


HEAPS_CURVE_SQL = rf"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
first AS (
  SELECT tok, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest({_TOK_DUCK}) AS tok FROM documents)
  GROUP BY tok
),
per AS (
  SELECT CAST((first_doc * {HEAPS_DECILES}) // n_docs AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_new_types
  FROM first CROSS JOIN n
  GROUP BY 1
)
SELECT decile, n_new_types,
       CAST(sum(n_new_types) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       AS n_types_cum
FROM per
"""


# --- split-half vocabulary drift ----------------------------------------------------

DRIFT_MIN_COUNT = 10
DRIFT_TOP_K = 20
_HALF_SPARK = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
    " as bigint) % 2"
)
_HALF_DUCK = (
    "cast(concat('0x', substring(md5(cast(doc_id as varchar)), 1, 8))"
    " as bigint) % 2"
)


def vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit between two md5-split corpus halves (the
    same split idiom as the quality classifier's train/holdout): per token,
    the occurrence rate in each half in parts-per-million and the top
    ``DRIFT_TOP_K`` tokens by absolute rate drift — the data-mixing /
    domain-shift detector (on a homogeneous corpus drift is pure sampling
    noise; on a shifted mix the moved vocabulary surfaces at the top).
    Integer arithmetic throughout, ``DRIFT_MIN_COUNT`` support floor.

    Scale shape: ONE (tok) map-side-combined hash aggregate with the two
    half-counts as conditional sums (no pivot exchange), totals as a 1-row
    broadcast, TakeOrdered top-k.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = d.select(
        F.expr(f"{_HALF_SPARK}").alias("half"),
        F.explode(F.expr(_TOK)).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.expr("case when half = 0 then 1 else 0 end")).alias("c0"),
        F.sum(F.expr("case when half = 1 then 1 else 0 end")).alias("c1"),
    )
    # totals taken off the exploded tokens directly (ungrouped partial
    # aggregate), NOT off `counts` — aggregating counts again would plan a
    # SECOND tok-keyed exchange + corpus scan
    tot = toks.agg(
        F.sum(F.expr("case when half = 0 then 1 else 0 end")).alias("t0"),
        F.sum(F.expr("case when half = 1 then 1 else 0 end")).alias("t1"),
    )
    scored = (
        counts.filter(F.col("c0") + F.col("c1") >= DRIFT_MIN_COUNT)
        .join(F.broadcast(tot))
        .select(
            "tok",
            F.col("c0").cast("long").alias("c0"),
            F.col("c1").cast("long").alias("c1"),
            F.expr("cast((1000000 * c0) div t0 as bigint)").alias("r0_e6"),
            F.expr("cast((1000000 * c1) div t1 as bigint)").alias("r1_e6"),
        )
        .withColumn(
            "drift_e6",
            F.expr("cast(abs(r0_e6 - r1_e6) as bigint)"),
        )
    )
    top = scored.orderBy(F.desc("drift_e6"), F.asc("tok")).limit(DRIFT_TOP_K)
    w = Window.orderBy(F.desc("drift_e6"), F.asc("tok"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "tok", "c0", "c1", "r0_e6", "r1_e6", "drift_e6", "rank"
    )


VOCAB_DRIFT_SQL = rf"""
WITH toks AS (
  SELECT {_HALF_DUCK} AS half, unnest({_TOK_DUCK}) AS tok FROM documents
),
counts AS (
  SELECT tok,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM toks GROUP BY tok
),
tot AS (
  SELECT sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS t0,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS t1
  FROM toks
),
scored AS (
  SELECT tok, c0, c1,
         CAST((1000000 * c0) // t0 AS BIGINT) AS r0_e6,
         CAST((1000000 * c1) // t1 AS BIGINT) AS r1_e6,
         CAST(abs((1000000 * c0) // t0 - (1000000 * c1) // t1) AS BIGINT)
           AS drift_e6
  FROM counts CROSS JOIN tot
  WHERE c0 + c1 >= {DRIFT_MIN_COUNT}
)
SELECT tok, c0, c1, r0_e6, r1_e6, drift_e6, rank FROM (
  SELECT *, row_number() OVER (ORDER BY drift_e6 DESC, tok ASC) AS rank
  FROM scored
) WHERE rank <= {DRIFT_TOP_K}
"""


# --- per-source lexical-diversity audit -------------------------------------------


def source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity: token mass, vocabulary size,
    type-token ratio (basis points), hapax share of the vocabulary
    (basis points), and a floor-log2 Shannon-entropy proxy
    ent_e4 = (10000·(N·⌊log2 N⌋ − Σ c·⌊log2 c⌋)) div N — the same
    integer surprisal idiom as perplexity_buckets, so both engines agree
    bit for bit (a real pipeline would use doubles; exactness is the
    point of the gate).  Low TTR / low entropy flags template-generated
    or boilerplate-heavy sources — the per-source counterpart of the
    per-document repetition_stats.

    Scale shape: one (source, tok) map-side-combined hash aggregate, one
    per-source rollup — two exchanges, no join, no sort (the same shape
    as zipf_histogram with a source key).
    """
    d = _docs(spark, sf_dir)
    counts = (
        d.select("source", F.explode(F.expr(_TOK)).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.expr("case when c = 1 then 1 else 0 end")).alias("n_hapax"),
        F.sum(F.expr("c * (length(bin(c)) - 1)")).alias("sum_clog"),
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.expr("cast((10000 * n_types) div n_tokens as bigint)").alias(
            "ttr_bp"
        ),
        F.expr("cast((10000 * n_hapax) div n_types as bigint)").alias(
            "hapax_bp"
        ),
        F.expr(
            "cast((10000 * (n_tokens * (length(bin(n_tokens)) - 1)"
            " - sum_clog)) div n_tokens as bigint)"
        ).alias("ent_e4"),
    )


SOURCE_DIVERSITY_SQL = rf"""
WITH counts AS (
  SELECT source, tok, count(*) AS c
  FROM (SELECT source, unnest({_TOK_DUCK}) AS tok FROM documents)
  GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         CAST(sum(c * (length(printf('%b', c)) - 1)) AS BIGINT) AS sum_clog
  FROM counts GROUP BY source
)
SELECT source, n_tokens, n_types,
       CAST((10000 * n_types) // n_tokens AS BIGINT) AS ttr_bp,
       CAST((10000 * n_hapax) // n_types AS BIGINT) AS hapax_bp,
       CAST((10000 * (n_tokens * (length(printf('%b', n_tokens)) - 1)
             - sum_clog)) // n_tokens AS BIGINT) AS ent_e4
FROM agg
"""


# --- per-source length-outlier detection --------------------------------------------

OUTLIER_TOP_K = 25


def length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``OUTLIER_TOP_K`` documents by relative deviation of their
    token length from their SOURCE's mean length — the truncation /
    concatenation / boilerplate-blob detector run per stratum so a
    long-form source doesn't drown a short-form one.  dev_e6 =
    (10⁶·|n_src·len − sum_len_src|) div sum_len_src, integer-exact (the
    cross-multiplied form of |len/mean − 1| that avoids any division
    before the final one).

    Scale shape: per-source (count, sum) is one map-side-combined
    aggregate over a narrow length projection; the tiny source dimension
    broadcasts back into the scan; top-k is a TakeOrdered.  The corpus
    never shuffles.
    """
    d = _docs(spark, sf_dir)
    lens = d.select(
        "doc_id", "source", F.expr(f"size({_TOK})").cast("long").alias("len")
    )
    stats = lens.groupBy("source").agg(
        F.count("*").alias("n_src"), F.sum("len").alias("sum_len")
    )
    scored = lens.join(F.broadcast(stats), "source").select(
        "doc_id",
        "source",
        "len",
        F.expr(
            "cast((1000000 * abs(n_src * len - sum_len)) div sum_len"
            " as bigint)"
        ).alias("dev_e6"),
    )
    return (
        scored.orderBy(F.desc("dev_e6"), F.asc("doc_id"))
        .limit(OUTLIER_TOP_K)
        .select("doc_id", "source", "len", "dev_e6")
    )


LENGTH_OUTLIERS_SQL = rf"""
WITH lens AS (
  SELECT doc_id, source, CAST(len({_TOK_DUCK}) AS BIGINT) AS len
  FROM documents
),
stats AS (
  SELECT source, count(*) AS n_src, sum(len) AS sum_len
  FROM lens GROUP BY source
)
SELECT doc_id, source, len,
       CAST((1000000 * abs(n_src * len - sum_len)) // sum_len AS BIGINT)
         AS dev_e6
FROM lens JOIN stats USING (source)
ORDER BY dev_e6 DESC, doc_id ASC LIMIT {OUTLIER_TOP_K}
"""


# --- pairwise source-overlap matrix ---------------------------------------------


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 3-gram-shingle overlap between sources: common shingles,
    Jaccard, and A-in-B containment in basis points — the dataset
    provenance / cross-source contamination audit (which corpora are
    re-hosting or mirroring each other), the corpus-level counterpart of
    dedup_cross_corpus.  Only source pairs sharing ≥1 shingle appear.

    Scale shape: NO shingle self-join — the distinct (shingle, source)
    relation aggregates to a per-shingle SORTED source set (bounded by
    the source-dimension size, not the corpus), pair combinations explode
    from that array in a narrow projection, and the pair rollup + two
    broadcast total joins finish on the tiny source-pair domain.  The
    heavy exchanges are both shingle-keyed and linear in distinct
    shingles.  Totals and pairs both consume the distinct (source,
    shingle) relation, which Spark plans as two scans (no automatic
    common-subplan reuse) — same audit-grade tradeoff as
    ``distinct_sketch``'s exact branch; a standalone run at real scale
    would persist it once.
    """
    d = _docs(spark, sf_dir)
    ss = (
        d.select("source", F.expr(_TOK).alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> concat_ws(' ', element_at(t, i),"
                    " element_at(t, i + 1), element_at(t, i + 2)))"
                )
            ).alias("sh"),
        )
        .select("source", F.expr(_H32_SPARK).alias("h"))
        .distinct()
    )
    # r6 note: materializing ss once for the two consumers was TRIED and
    # measured a small net LOSS at the 10x proxy sf (7.7 s -> 8.6 s) —
    # same verdict as distinct_sketch: the checkpoint copy of the
    # multi-million-row relation exceeds one rebuild. Two scans kept.
    totals = ss.groupBy("source").agg(F.count("*").alias("n"))
    pairs = (
        ss.groupBy("h")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(ss) - 1),"
                    " i -> transform(sequence(i + 1, size(ss)),"
                    " j -> struct(element_at(ss, i) as src_a,"
                    " element_at(ss, j) as src_b))))"
                )
            ).alias("p")
        )
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    ta = totals.select(
        F.col("source").alias("src_a"), F.col("n").alias("n_a")
    )
    tb = totals.select(
        F.col("source").alias("src_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_common").cast("long").alias("n_common"),
            F.expr(
                "cast((10000 * n_common) div (n_a + n_b - n_common)"
                " as bigint)"
            ).alias("jaccard_bp"),
            F.expr("cast((10000 * n_common) div n_a as bigint)").alias(
                "contain_a_bp"
            ),
        )
    )


SOURCE_OVERLAP_SQL = rf"""
WITH ss AS (
  SELECT DISTINCT source, {_H32_DUCK} AS h
  FROM (
    SELECT source,
           unnest([concat(t[i], ' ', t[i + 1], ' ', t[i + 2])
                   for i in generate_series(1, len(t) - 2)]) AS sh
    FROM (SELECT source, {_TOK_DUCK} AS t FROM documents)
    WHERE len(t) >= 3
  )
),
totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY source),
sets AS (
  SELECT h, list_sort(list(DISTINCT source)) AS s
  FROM ss GROUP BY h HAVING count(DISTINCT source) >= 2
),
pairs AS (
  SELECT p.src_a, p.src_b, CAST(count(*) AS BIGINT) AS n_common
  FROM (
    SELECT unnest(flatten(list_transform(
             generate_series(1, len(s) - 1),
             i -> list_transform(generate_series(i + 1, len(s)),
                  j -> struct_pack(src_a := s[i], src_b := s[j]))))) AS p
    FROM sets
  ) GROUP BY 1, 2
)
SELECT src_a, src_b, ta.n AS n_a, tb.n AS n_b, n_common,
       CAST((10000 * n_common) // (ta.n + tb.n - n_common) AS BIGINT)
         AS jaccard_bp,
       CAST((10000 * n_common) // ta.n AS BIGINT) AS contain_a_bp
FROM pairs
JOIN totals ta ON ta.source = pairs.src_a
JOIN totals tb ON tb.source = pairs.src_b
"""


# --- exact per-source length percentiles --------------------------------------------

PCTS = [25, 50, 75, 90, 99]


def length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token-length percentiles (p25/p50/p75/p90/p99) as
    discontinuous order statistics: p_q = the ceil(q·n/100)-th smallest
    length — pure integer rank arithmetic, so both engines pick the
    identical element (no interpolation, no float quantile estimator).
    The datasheet companion of ``corpus_datasheet``'s totals and the
    honest 100 TB quantile shape ``ir.py`` gestures at for the CCNet cut.

    Scale shape: ONE source-keyed exchange feeding a per-partition sort
    (the window), then the per-source rollup rides the window's existing
    partitioning (no second exchange — plan-pinned); the percentile pivot
    is conditional aggregation on rank equality, not five passes.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    lens = d.select(
        "doc_id", "source", F.expr(f"size({_TOK})").cast("long").alias("len")
    )
    w = Window.partitionBy("source").orderBy("len", "doc_id")
    ranked = lens.select(
        "source",
        "len",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    aggs = [F.count("*").alias("n_docs")] + [
        F.max(
            F.expr(f"case when rn = (({p} * n) + 99) div 100 then len end")
        ).alias(f"p{p}")
        for p in PCTS
    ]
    return ranked.groupBy("source").agg(*aggs)


LENGTH_PERCENTILES_SQL = rf"""
WITH ranked AS (
  SELECT source, len,
         row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM (SELECT doc_id, source, CAST(len({_TOK_DUCK}) AS BIGINT) AS len
        FROM documents)
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
{",".join(f"       max(CASE WHEN rn = (({p} * n) + 99) // 100 THEN len END) AS p{p}"
          for p in PCTS)}
FROM ranked GROUP BY source
"""


# --- per-source template n-grams ------------------------------------------------

TEMPLATE_N = 3       # n-gram order
TEMPLATE_TOPK = 3    # templates reported per source


def template_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detector: the ``TEMPLATE_TOPK`` word
    ``TEMPLATE_N``-grams with the highest DOCUMENT frequency within each
    source (ties broken lexicographically) — high-DF n-grams inside one
    source are template/boilerplate text (nav bars, signatures, footers),
    the thing line-based CCNet dedup removes; PMI finds *strong*
    collocations, this finds *ubiquitous* ones.

    Scale shape: distinct (source, doc, gram) then a (source, gram)
    count aggregate — both map-side combined — and a source-keyed
    window for the top-K; the gram relation carries fixed-width strings
    only (no text column past the first projection), and the final
    window's partition count equals the source dimension.  No join, no
    global sort (plan-pinned).
    """
    from pyspark.sql.window import Window

    n, k = TEMPLATE_N, TEMPLATE_TOPK
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", "source", F.expr(_TOK).alias("w")).filter(
        F.size("w") >= n
    )
    # r6: the (doc, gram) DISTINCT is per-document by construction (each
    # row's grams come from that document alone), so it folds into an
    # array_distinct inside the projection — drops the row-level distinct
    # exchange over the full gram relation (the winnow_fingerprints trick)
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(w) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(w, i, {n})))"
                )
            )
        ).alias("gram"),
    )
    df_counts = grams.groupBy("source", "gram").agg(
        F.count("*").alias("df")
    )
    w = Window.partitionBy("source").orderBy(F.desc("df"), F.asc("gram"))
    return (
        df_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("source", "gram", "df", "rank")
    )


# --- per-document n-gram novelty --------------------------------------------------
#
# The dataset-ordering / curriculum audit: when the corpus is consumed in
# doc_id order (the deterministic ingestion order), how much of each
# document's n-gram content is NEW at the point it arrives?  Late documents
# full of already-seen n-grams are the redundancy a curriculum or a
# near-dedup pass would drop; the per-doc novelty share is the signal
# dataset-pruning papers (e.g. D4, SemDeDup follow-ups) threshold on.
# First occurrence is min(doc_id) over each gram — the same one-aggregate
# trick as heaps_curve, here kept per-document instead of per-decile.
#
# Scale shape: three key-changing exchanges, each linear in distinct
# (doc, gram) pairs — the pair-distinct (map-side combined), the gram-keyed
# window that marks first owners (NO self-join back onto the gram
# relation), and the doc-keyed rollup.  Fixed-width gram strings only past
# the first projection; the text column never shuffles.

NOVELTY_N = 3


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    n = NOVELTY_N
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.expr(_TOK).alias("w")).filter(
        F.size("w") >= n
    )
    # r6: per-document distinct folds into array_distinct (see
    # template_ngrams) — one less full-relation exchange
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(w) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(w, i, {n})))"
                )
            )
        ).alias("gram"),
    )
    owned = grams.withColumn(
        "owner", F.min("doc_id").over(Window.partitionBy("gram"))
    )
    return owned.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum((F.col("doc_id") == F.col("owner")).cast("long")).alias(
            "n_novel"
        ),
        F.expr(
            "cast((10000 * sum(case when doc_id = owner then 1 else 0 end))"
            " div count(*) as bigint)"
        ).alias("novelty_bp"),
    )


NGRAM_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOK_DUCK} AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, i + {NOVELTY_N - 1}), ' ') AS gram
  FROM toks, unnest(range(1, len(w) - {NOVELTY_N - 2})) AS r(i)
  WHERE len(w) >= {NOVELTY_N}
),
owned AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY gram) AS owner FROM grams
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN doc_id = owner THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST((10000 * sum(CASE WHEN doc_id = owner THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS novelty_bp
FROM owned GROUP BY doc_id
"""


TEMPLATE_NGRAMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {_TOK_DUCK} AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(list_slice(w, i, i + {TEMPLATE_N - 1}), ' ') AS gram
  FROM toks, unnest(range(1, len(w) - {TEMPLATE_N - 2})) AS r(i)
  WHERE len(w) >= {TEMPLATE_N}
),
df_counts AS (
  SELECT source, gram, count(*) AS df FROM grams GROUP BY source, gram
),
ranked AS (
  SELECT source, gram, df,
         row_number() OVER (PARTITION BY source ORDER BY df DESC, gram ASC)
           AS rank
  FROM df_counts
)
SELECT source, gram, df, rank FROM ranked WHERE rank <= {TEMPLATE_TOPK}
"""



# --- count-min sketch heavy hitters ---------------------------------------------
#
# The frequency-estimation sketch next to distinct_sketch's cardinality one
# (Cormode & Muthukrishnan 2005): D=4 hash rows x W=1024 buckets of summed
# counts; a token's estimate is the MIN over its D cells, which can only
# OVER-estimate (collisions add, never subtract) — the one-sided error the
# audit pins. Integer arithmetic on the shared md5->int32 hash throughout, so
# the driver value-hash doubles as an estimator audit (the distinct_sketch /
# ann_recall design).

CMS_D = 4
CMS_W = 1024
CMS_TOPK = 20


def _cms_cells_spark(tok_col: str) -> str:
    """array<struct<d,b>>: the D sketch cells of a token."""
    parts = ", ".join(
        f"struct({d} as d, cast(conv(substring(md5(concat('cms{d}:', {tok_col})), 1, 8), 16, 10) as bigint) % {CMS_W} as b)"
        for d in range(CMS_D)
    )
    return f"array({parts})"


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count vs count-min estimate for the corpus's top-K tokens.

    Scale shape: exact token counts are the ONE corpus-sized exchange
    (map-side combined; at 100 TB the exact branch is exactly what the
    sketch replaces — it is kept because the operator IS the audit); the
    sketch is built FROM the vocabulary-sized count relation (each token
    contributes its D cells — a vocab x D explode, never corpus-sized),
    collapsing to <= D*W rows that BROADCAST into the top-K probe; the
    top-K cut is a TakeOrdered. CMS guarantee pinned: est >= exact always.
    """
    d = _docs(spark, sf_dir)
    cnt = (
        d.select(F.explode(F.expr(_TOK)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    cells = cnt.select(
        "c", F.explode(F.expr(_cms_cells_spark("tok"))).alias("x")
    ).select(F.col("x.d").alias("d"), F.col("x.b").alias("b"), "c")
    sketch = cells.groupBy("d", "b").agg(F.sum("c").alias("cell"))
    top = cnt.orderBy(F.desc("c"), F.asc("tok")).limit(CMS_TOPK)
    probe = top.select(
        "tok", "c", F.explode(F.expr(_cms_cells_spark("tok"))).alias("x")
    ).select("tok", "c", F.col("x.d").alias("d"), F.col("x.b").alias("b"))
    est = (
        probe.join(F.broadcast(sketch), ["d", "b"])
        .groupBy("tok", "c")
        .agg(F.min("cell").alias("cms_est"))
    )
    return est.select(
        "tok",
        F.col("c").alias("exact_count"),
        "cms_est",
        F.expr("cast((10000 * (cms_est - c)) div c as bigint)").alias(
            "over_bp"
        ),
    )


_CMS_CELLS_DUCK = " UNION ALL ".join(
    f"SELECT tok, c, {d} AS d,"
    f" cast(concat('0x', substring(md5(concat('cms{d}:', tok)), 1, 8)) as bigint)"
    f" % {CMS_W} AS b FROM cnt"
    for d in range(CMS_D)
)

CMS_HEAVY_HITTERS_SQL = f"""
WITH toks AS (SELECT unnest({_TOK_DUCK}) AS tok FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
cells AS ({_CMS_CELLS_DUCK}),
sketch AS (SELECT d, b, CAST(sum(c) AS BIGINT) AS cell FROM cells GROUP BY d, b),
top AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT {CMS_TOPK}),
probe AS (SELECT * FROM cells WHERE tok IN (SELECT tok FROM top)),
est AS (
  SELECT p.tok, p.c, min(s.cell) AS cms_est
  FROM probe p JOIN sketch s USING (d, b)
  GROUP BY p.tok, p.c
)
SELECT tok, c AS exact_count, cms_est,
       CAST((10000 * (cms_est - c)) // c AS BIGINT) AS over_bp
FROM est
"""

QUERIES = {
    "chunk_documents": chunk_documents,
    "template_ngrams": template_ngrams,
    "ngram_novelty": ngram_novelty,
    "distinct_sketch": distinct_sketch,
    "pmi_top_pairs": pmi_top_pairs,
    "zipf_histogram": zipf_histogram,
    "bpe_fertility": bpe_fertility,
    "heaps_curve": heaps_curve,
    "vocab_drift": vocab_drift,
    "source_diversity": source_diversity,
    "length_outliers": length_outliers,
    "source_overlap_matrix": source_overlap_matrix,
    "length_percentiles": length_percentiles,
    "cms_heavy_hitters": cms_heavy_hitters,
}

ORACLES = {
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "template_ngrams": TEMPLATE_NGRAMS_SQL,
    "ngram_novelty": NGRAM_NOVELTY_SQL,
    "distinct_sketch": DISTINCT_SKETCH_SQL,
    "pmi_top_pairs": PMI_TOP_PAIRS_SQL,
    "zipf_histogram": ZIPF_HISTOGRAM_SQL,
    "bpe_fertility": _bpe_fertility_sql(),
    "heaps_curve": HEAPS_CURVE_SQL,
    "vocab_drift": VOCAB_DRIFT_SQL,
    "source_diversity": SOURCE_DIVERSITY_SQL,
    "length_outliers": LENGTH_OUTLIERS_SQL,
    "source_overlap_matrix": SOURCE_OVERLAP_SQL,
    "length_percentiles": LENGTH_PERCENTILES_SQL,
    "cms_heavy_hitters": CMS_HEAVY_HITTERS_SQL,
}
