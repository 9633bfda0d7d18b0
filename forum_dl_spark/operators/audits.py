"""Dataset-engineering audits: the infrastructure bookkeeping a 100 TB
training-data pipeline runs AROUND the filter/dedup/pack stages.

Six operators, each DuckDB-oracled with identical column names and
integer-exact (or proven round-6 float) arithmetic:

- ``postings_index``       — inverted-index build accounting: per-term
  posting lists with delta-gap Elias-gamma bit costs (Witten/Moffat/Bell
  "Managing Gigabytes" index-size model) — what the BM25/tf-idf retrieval
  stack (operators/ir.py) would pay to materialize its index.
- ``hll_distinct``         — HyperLogLog (Flajolet et al. 2007) register
  sketch of the per-source 3-gram shingle space next to the exact count —
  the constant-memory counterpart of ``distinct_sketch``'s KMV estimator,
  on the SAME hash so the two sketch families are directly comparable.
- ``semantic_contamination`` — eval-set leakage audit in embedding space:
  per benchmark vector, the nearest TRAINING vector and how many training
  vectors exceed the contamination threshold — the dense-retrieval
  complement of the n-gram ``contamination_ngram`` audit.
- ``padding_waste_audit``  — batching efficiency: padding tokens wasted by
  arrival-order batching vs length-sorted batching per source — the audit
  that justifies ``pack_sequences`` (packing wastes zero; this measures
  what naive padding would cost and what plain length-bucketing recovers).
- ``shard_merkle_manifest``— dataset-versioning digest: per-shard
  order-INDEPENDENT content digests (xor + modular sum of per-doc hashes)
  so two materializations of the corpus can be compared shard-by-shard
  without sorting — the reproducibility stamp for ``shuffle_shards``.
- ``boundary_stitch_pairs``— split-document detection: documents whose
  trailing k-gram equals another document's leading k-gram (the crawl
  artifact where one logical page was cut into two records).

Scale shapes (plan-pinned in tests/test_audits.py):
- postings: distinct + one term-keyed window/agg (the groupBy rides the
  window's exchange), TakeOrderedAndProject for the top-K — no global sort.
- hll: the shingle hash-distinct is the one heavy exchange; registers are
  64 rows/source after the map side; exact-vs-est join broadcasts.
- contamination: the eval side (bounded) broadcasts into the corpus scan;
  only eval-keyed partial aggregates shuffle (≤ eval-count rows).
- padding: everything rides ONE source-keyed exchange (two in-partition
  sorts, no join anywhere); a skewed mega-source salts like pack_sequences.
- merkle: map-only projection + one 16-row hash aggregate; digests are
  order-independent so NO collect_list/sort — the aggregate combines
  map-side and is insensitive to partitioning (pinned by repartition test).
- stitch: one gram-keyed equi-join over constant-width boundary grams
  (two short strings per document — never the text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._par import read_spread

from .similarity import N_QUERIES
from .textops import BPE_DUCK, _BPE_EXPR
from .textstats import _TOK, _TOK_DUCK


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/documents.parquet")


def _h32(col: str) -> str:
    """Shared md5→int32 hash (Spark side) — same idiom as dedup/textstats."""
    return f"cast(conv(substring(md5({col}), 1, 8), 16, 10) as bigint)"


def _h32_duck(col: str) -> str:
    return f"CAST(concat('0x', substring(md5({col}), 1, 8)) AS BIGINT)"


# --- inverted-index posting-list accounting -----------------------------------

POSTINGS_TOP_K = 20


def postings_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term posting-list build accounting for the top-K
    document-frequency terms: df, total Elias-gamma bits to delta-encode
    the doc_id gap sequence (2*floor(log2(gap))+1 per gap, first gap
    anchored at doc_id+1), and the bits-per-posting rate in basis points.

    This is the index-size model an IR engine prices before building the
    BM25 index — high-df terms compress best (small gaps), and the
    bits-per-posting curve is the classic inverse-df shape.

    Scale shape: distinct (term, doc) pairs are one exchange; the gap
    window and the per-term rollup BOTH key on term, so the rollup rides
    the window's exchange; top-K compiles to TakeOrderedAndProject (no
    global sort).  floor(log2) is the integer length(bin())-1 idiom shared
    with perplexity_buckets — no libm in either engine.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    # r6: the (doc, term) DISTINCT is per-document by construction —
    # array_distinct inside the projection drops the row-level distinct
    # exchange (the winnow_fingerprints trick); identical rows
    pairs = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(_TOK))).alias("term"),
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    g = pairs.withColumn(
        "gap", F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(-1))
    ).withColumn(
        "gbits", F.expr("cast(2 * (length(bin(gap)) - 1) + 1 as bigint)")
    )
    agg = (
        g.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("gbits").alias("gap_bits"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .withColumn(
            "bits_per_posting_bp",
            F.expr("cast(gap_bits * 10000 div df as bigint)"),
        )
    )
    return agg.orderBy(F.desc("df"), F.asc("term")).limit(POSTINGS_TOP_K)


POSTINGS_INDEX_SQL = rf"""
WITH tok AS (SELECT doc_id, unnest({_TOK_DUCK}) AS term FROM documents),
pairs AS (SELECT DISTINCT doc_id, term FROM tok),
g AS (SELECT term, doc_id,
        doc_id - coalesce(lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
                          -1) AS gap
      FROM pairs),
agg AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
        CAST(sum(2 * (length(printf('%b', gap)) - 1) + 1) AS BIGINT)
            AS gap_bits,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM g GROUP BY term)
SELECT term, df, gap_bits,
       CAST(gap_bits * 10000 // df AS BIGINT) AS bits_per_posting_bp,
       first_doc, last_doc
FROM agg ORDER BY df DESC, term ASC LIMIT {POSTINGS_TOP_K}
"""


# --- HyperLogLog cardinality next to the KMV sketch ---------------------------
#
# Same 3-gram shingle space and md5→int32 hash as distinct_sketch, so the
# two estimator families (order statistics vs register maxima) are
# directly comparable per source.  p=6 → m=64 registers; the low 6 hash
# bits pick the bucket, rho = leading-zero count of the remaining 26 bits
# + 1 (rest=0 → rho=27).  The estimate is the raw Flajolet E =
# alpha_64 * m^2 / sum(2^-M_j) in 2^30 fixed point with alpha_64 = 0.709
# carried as the integer 709/1000 — NO small-range linear-counting branch
# (it needs libm ln; the 100 TB regime this audits is the high-cardinality
# one where the raw estimator is the right branch anyway).

HLL_M = 64
HLL_ALPHA_MILLI = 709  # alpha_64 = 0.709


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source HLL-64 estimate of distinct 3-gram shingles vs the exact
    (hashed-space) count, with the error in basis points and the number of
    still-zero registers.

    Scale shape: shingle build is a narrow row-expanding projection; the
    hash-distinct is the one heavy exchange (map-side combined); register
    maxima partial-aggregate to ≤64 rows per source before shuffling; the
    exact branch (kept because the operator IS the estimator audit — at
    100 TB only the 64-register sketch would ship) joins broadcast.
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
    hashed = sh.select("source", F.expr(_h32("sh")).alias("h")).distinct()
    regs = (
        hashed.select(
            "source",
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(f"h div {HLL_M}").alias("rest"),
        )
        .withColumn(
            "rho",
            F.expr(
                "cast(case when rest = 0 then 27"
                " else 27 - length(bin(rest)) end as bigint)"
            ),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    per = regs.groupBy("source").agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr("shiftleft(cast(1 as bigint), cast(30 - m as int))")
        ).alias("s_present"),
    )
    exact = hashed.groupBy("source").agg(
        F.count("*").alias("exact_distinct")
    )
    est = F.expr(
        f"cast((cast({HLL_ALPHA_MILLI} as bigint) * {HLL_M * HLL_M}"
        " * 1073741824) div (1000 * (s_present"
        f" + ({HLL_M} - n_present) * 1073741824)) as bigint)"
    )
    return (
        per.join(F.broadcast(exact), "source")
        .withColumn("hll_est", est)
        .select(
            "source",
            "exact_distinct",
            "hll_est",
            F.expr(
                "cast(abs(hll_est - exact_distinct) * 10000"
                " div exact_distinct as bigint)"
            ).alias("err_bp"),
            F.expr(f"cast({HLL_M} - n_present as bigint)").alias(
                "n_zero_regs"
            ),
        )
    )


HLL_DISTINCT_SQL = rf"""
WITH toks AS (SELECT source, {_TOK_DUCK} AS t FROM documents),
sh AS (SELECT source,
              unnest([array_to_string(t[i:i+2], ' ')
                      for i in range(1, len(t) - 1)]) AS sh
       FROM toks WHERE len(t) >= 3),
hashed AS (SELECT DISTINCT source, {_h32_duck('sh')} AS h FROM sh),
regs AS (SELECT source, h % {HLL_M} AS bucket,
                max(CASE WHEN h // {HLL_M} = 0 THEN 27
                    ELSE 27 - length(printf('%b', h // {HLL_M})) END) AS m
         FROM hashed GROUP BY source, h % {HLL_M}),
per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_present,
               CAST(sum(CAST(1 AS BIGINT) << (30 - m)) AS BIGINT)
                   AS s_present
        FROM regs GROUP BY source),
exact AS (SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct
          FROM hashed GROUP BY source),
est AS (SELECT p.source, e.exact_distinct,
        CAST((CAST({HLL_ALPHA_MILLI} AS BIGINT) * {HLL_M * HLL_M}
              * 1073741824)
             // (1000 * (s_present
                         + ({HLL_M} - n_present) * 1073741824)) AS BIGINT)
            AS hll_est,
        CAST({HLL_M} - n_present AS BIGINT) AS n_zero_regs
        FROM per p JOIN exact e USING (source))
SELECT source, exact_distinct, hll_est,
       CAST(abs(hll_est - exact_distinct) * 10000 // exact_distinct
            AS BIGINT) AS err_bp,
       n_zero_regs
FROM est
"""


# --- embedding-space eval-set contamination audit ------------------------------

CONTAM_THRESH = 0.45  # cosine above which a training vector counts as leakage


def semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per benchmark (eval) vector: the nearest TRAINING vector, its cosine
    (round 6), and how many training vectors exceed the contamination
    threshold — the dense-retrieval complement of contamination_ngram
    (n-gram leakage) and decontaminate_apply.  Eval set = vec_id <
    N_QUERIES, the same holdout convention as the whole ANN ladder.

    Scale shape: the bounded eval side broadcasts into the training scan
    (BroadcastNestedLoopJoin — the scan is touched once); the argmax and
    threshold count partial-aggregate map-side, so only ≤ eval-count rows
    per partition reach the final exchange.  Tie-break: max(struct(cos,
    -train_id)) picks the SMALLER train_id on an exact cosine tie —
    matching the oracle's (cos DESC, train_id ASC) window order.
    """
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "v", F.expr("transform(embedding, x -> cast(x as double))")
    )
    ev = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("ev")
    )
    tr = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("train_id"), "v"
    )
    dot = (
        "aggregate(zip_with(v, ev, (x, y) -> x * y),"
        " cast(0 as double), (s, x) -> s + x)"
    )
    nv = (
        "sqrt(aggregate(transform(v, x -> x * x),"
        " cast(0 as double), (s, x) -> s + x))"
    )
    ne = (
        "sqrt(aggregate(transform(ev, x -> x * x),"
        " cast(0 as double), (s, x) -> s + x))"
    )
    pairs = tr.crossJoin(F.broadcast(ev)).withColumn(
        "cos_sim", F.expr(f"{dot} / ({nv} * {ne})")
    )
    agg = pairs.groupBy("eval_id").agg(
        F.max(
            F.struct(
                F.col("cos_sim").alias("c"),
                (-F.col("train_id")).alias("nid"),
            )
        ).alias("b"),
        F.sum(
            F.expr(
                f"case when cos_sim >= {CONTAM_THRESH} then 1 else 0 end"
            )
        ).alias("n_contaminated"),
    )
    return agg.select(
        "eval_id",
        F.expr("-b.nid").alias("best_train_id"),
        F.round(F.col("b.c"), 6).alias("best_cos"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
    )


SEMANTIC_CONTAMINATION_SQL = f"""
WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings),
pairs AS (SELECT a.vec_id AS eval_id, b.vec_id AS train_id,
                 list_cosine_similarity(a.v, b.v) AS cos_sim
          FROM e a JOIN e b
          ON a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}),
ranked AS (SELECT *, row_number() OVER (PARTITION BY eval_id
                     ORDER BY cos_sim DESC, train_id ASC) AS rn
           FROM pairs),
counts AS (SELECT eval_id,
                  CAST(sum(CASE WHEN cos_sim >= {CONTAM_THRESH}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
           FROM pairs GROUP BY eval_id)
SELECT r.eval_id, r.train_id AS best_train_id,
       round(r.cos_sim, 6) AS best_cos, c.n_contaminated
FROM ranked r JOIN counts c USING (eval_id) WHERE r.rn = 1
"""


# --- batch padding-waste audit --------------------------------------------------

PAD_BATCH = 8  # documents per batch
PAD_CAP = 256  # model max sequence length (tokens truncate here)


def padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: padding tokens wasted batching PAD_BATCH documents at a
    time under (a) arrival order (md5-of-doc_id shuffle proxy) vs (b)
    length-sorted order, and the saving in basis points — the audit that
    motivates pack_sequences (which wastes zero) and length-bucketed
    batching.  Batch cost = n_in_batch * max(len); padding = cost − sum.
    Token counts reuse pack_sequences' BPE-ish estimator, truncated at
    PAD_CAP (the model context).

    Scale shape: NO join anywhere; both row_number orderings ride ONE
    source-keyed exchange (two in-partition sorts), the batch and variant
    rollups key on source too.  A skewed mega-source salts into
    sub-streams exactly like pack_sequences documents.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id",
        "source",
        F.expr(
            f"least(cast({PAD_CAP} as bigint), {_BPE_EXPR})"
        ).alias("n_tokens"),
        F.expr(_h32("cast(doc_id as string)")).alias("akey"),
    )
    wn = Window.partitionBy("source").orderBy("akey", "doc_id")
    ws = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    t = t.withColumn(
        "bn", ((F.row_number().over(wn) - 1) / PAD_BATCH).cast("int")
    ).withColumn(
        "bs", ((F.row_number().over(ws) - 1) / PAD_BATCH).cast("int")
    )
    ex = t.select(
        "source",
        "n_tokens",
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("variant"),
                    F.col("bn").alias("batch"),
                ),
                F.struct(
                    F.lit("sorted").alias("variant"),
                    F.col("bs").alias("batch"),
                ),
            )
        ).alias("vb"),
    ).select("source", "n_tokens", "vb.variant", "vb.batch")
    pb = ex.groupBy("source", "variant", "batch").agg(
        F.count("*").alias("n"),
        F.max("n_tokens").alias("mx"),
        F.sum("n_tokens").alias("sm"),
    )
    pv = pb.groupBy("source", "variant").agg(
        F.sum(F.expr("n * mx - sm")).alias("pad"),
        F.sum("sm").alias("tokens_real"),
        F.sum("n").alias("n_docs"),
    )
    return (
        pv.groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("tokens_real").alias("tokens_real"),
            F.max(
                F.expr("case when variant = 'naive' then pad end")
            ).alias("pad_naive"),
            F.max(
                F.expr("case when variant = 'sorted' then pad end")
            ).alias("pad_sorted"),
        )
        .withColumn(
            "saving_bp",
            F.expr(
                "cast(case when pad_naive > 0 then"
                " (pad_naive - pad_sorted) * 10000 div pad_naive"
                " else 0 end as bigint)"
            ),
        )
    )


PADDING_WASTE_SQL = rf"""
WITH t AS (SELECT doc_id, source,
                  least(CAST({PAD_CAP} AS BIGINT), {BPE_DUCK}) AS n_tokens,
                  {_h32_duck('CAST(doc_id AS VARCHAR)')} AS akey
           FROM documents),
rn AS (SELECT source, n_tokens,
         (row_number() OVER (PARTITION BY source ORDER BY akey, doc_id) - 1)
             // {PAD_BATCH} AS bn,
         (row_number() OVER (PARTITION BY source
                             ORDER BY n_tokens, doc_id) - 1)
             // {PAD_BATCH} AS bs
       FROM t),
ex AS (SELECT source, 'naive' AS variant, bn AS batch, n_tokens FROM rn
       UNION ALL SELECT source, 'sorted', bs, n_tokens FROM rn),
pb AS (SELECT source, variant, batch, CAST(count(*) AS BIGINT) AS n,
              max(n_tokens) AS mx, CAST(sum(n_tokens) AS BIGINT) AS sm
       FROM ex GROUP BY source, variant, batch),
pv AS (SELECT source, variant, CAST(sum(n * mx - sm) AS BIGINT) AS pad,
              CAST(sum(sm) AS BIGINT) AS tokens_real,
              CAST(sum(n) AS BIGINT) AS n_docs
       FROM pb GROUP BY source, variant)
SELECT source, max(n_docs) AS n_docs, max(tokens_real) AS tokens_real,
       max(CASE WHEN variant = 'naive' THEN pad END) AS pad_naive,
       max(CASE WHEN variant = 'sorted' THEN pad END) AS pad_sorted,
       CAST(CASE WHEN max(CASE WHEN variant = 'naive' THEN pad END) > 0
            THEN (max(CASE WHEN variant = 'naive' THEN pad END)
                  - max(CASE WHEN variant = 'sorted' THEN pad END)) * 10000
                 // max(CASE WHEN variant = 'naive' THEN pad END)
            ELSE 0 END AS BIGINT) AS saving_bp
FROM pv GROUP BY source
"""


# --- shard merkle manifest (dataset versioning digest) --------------------------

MERKLE_SHARDS = 16


def shard_merkle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard content digest for dataset versioning: shard =
    md5(doc_id) mod S; digest_xor = bit_xor of the per-document 56-bit
    content hash, digest_sum32 = modular sum of the 32-bit one.  Both
    combiners are ORDER-INDEPENDENT, so the digest needs no sort and no
    collect_list — two corpora materialized in any partitioning compare
    shard-by-shard (the reproducibility stamp for shuffle_shards
    manifests; cf. Iceberg's per-manifest content summaries).

    Scale shape: map-only hash projection + ONE S-row hash aggregate that
    combines map-side; partitioning-insensitivity is pinned by a
    repartition test.  (digest_sum32 overflows int64 only past ~2^31 docs
    per shard — at that point you shard wider, as documented here.)
    """
    return _merkle(_docs(spark, sf_dir))


def _merkle(df: DataFrame) -> DataFrame:
    """Shard manifest over any (doc_id, text, ...) relation — shared by
    shard_merkle_manifest and its first consumer, manifest_diff."""
    h = df.select(
        F.expr(
            f"{_h32('cast(doc_id as string)')} % {MERKLE_SHARDS}"
        ).alias("shard"),
        F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string), ':',"
            " text)), 1, 14), 16, 10) as bigint)"
        ).alias("h56"),
        F.expr(
            _h32("concat(cast(doc_id as string), ':', text)")
        ).alias("h32"),
        F.length("text").alias("nc"),
    )
    return h.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("nc").alias("n_chars"),
        F.expr("bit_xor(h56)").alias("digest_xor"),
        F.sum("h32").alias("digest_sum32"),
    )


SHARD_MERKLE_SQL = f"""
WITH h AS (
  SELECT {_h32_duck('CAST(doc_id AS VARCHAR)')} % {MERKLE_SHARDS} AS shard,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':'
              || text), 1, 14)) AS BIGINT) AS h56,
         {_h32_duck("CAST(doc_id AS VARCHAR) || ':' || text")} AS h32,
         length(text) AS nc
  FROM documents)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       bit_xor(h56) AS digest_xor,
       CAST(sum(h32) AS BIGINT) AS digest_sum32
FROM h GROUP BY shard
"""


# --- dataset-version manifest diff ---------------------------------------------

# deterministic v2 synthesis (no external data): one edit, one delete, one
# add — the three change kinds a dataset release diff must catch
MANIFEST_EDIT_ID = 42
MANIFEST_DEL_ID = 43
MANIFEST_ADD_ID = 9_000_001
MANIFEST_ADD_TEXT = "added revision document payload"


def manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``shard_merkle_manifest``'s first consumer: diff two dataset
    versions BY MANIFEST — the shards whose digests differ, without
    comparing (or even co-locating) any document rows. v2 is synthesized
    deterministically from the corpus in-plan: one doc edited, one
    deleted, one added — one shard-level change of
    each kind a release diff must catch (an edit keeps n_docs constant
    and only moves the digests, which is exactly the case raw counts
    miss).

    Scale shape: two map-side-combined S-row aggregates (order-
    independent xor/sum digests — no sort, no collect_list) + one S-row
    full-outer join; at 100 TB this is the plan — version comparison
    cost is O(corpus scan) map-side and O(S) everywhere else, the
    Iceberg-manifest-diff shape. Changed-shard rows carry both sides'
    counts and digests (absent side coalesced to 0/0)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    v2 = (
        d.filter(F.col("doc_id") != MANIFEST_DEL_ID)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") == MANIFEST_EDIT_ID,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            spark.range(1).select(
                F.lit(MANIFEST_ADD_ID).cast("long").alias("doc_id"),
                F.lit(MANIFEST_ADD_TEXT).alias("text"),
            )
        )
    )
    cols = ["n_docs", "n_chars", "digest_xor", "digest_sum32"]
    a = _merkle(d).select(
        "shard", *[F.col(c).alias(f"{c}_a") for c in cols]
    )
    b = _merkle(v2).select(
        "shard", *[F.col(c).alias(f"{c}_b") for c in cols]
    )
    z = F.lit(0).cast("long")
    joined = a.join(b, "shard", "full_outer")
    changed = (
        (F.coalesce("n_docs_a", z) != F.coalesce("n_docs_b", z))
        | (F.coalesce("digest_xor_a", z) != F.coalesce("digest_xor_b", z))
        | (F.coalesce("digest_sum32_a", z) != F.coalesce("digest_sum32_b", z))
    )
    return joined.filter(changed).select(
        "shard",
        F.coalesce("n_docs_a", z).alias("n_docs_a"),
        F.coalesce("n_docs_b", z).alias("n_docs_b"),
        F.coalesce("digest_xor_a", z).alias("digest_xor_a"),
        F.coalesce("digest_xor_b", z).alias("digest_xor_b"),
        F.coalesce("digest_sum32_a", z).alias("digest_sum32_a"),
        F.coalesce("digest_sum32_b", z).alias("digest_sum32_b"),
    )


_MANIFEST_DUCK_BODY = f"""
  SELECT {_h32_duck('CAST(doc_id AS VARCHAR)')} % {MERKLE_SHARDS} AS shard,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':'
              || text), 1, 14)) AS BIGINT) AS h56,
         {_h32_duck("CAST(doc_id AS VARCHAR) || ':' || text")} AS h32
"""

MANIFEST_DIFF_SQL = f"""
WITH v1 AS (SELECT doc_id, text FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id = {MANIFEST_EDIT_ID} THEN text || ' rev2'
              ELSE text END AS text
  FROM documents WHERE doc_id <> {MANIFEST_DEL_ID}
  UNION ALL
  SELECT {MANIFEST_ADD_ID}, '{MANIFEST_ADD_TEXT}'
),
ma AS (
  SELECT shard, count(*) AS n_docs, bit_xor(h56) AS digest_xor,
         sum(h32) AS digest_sum32
  FROM ({_MANIFEST_DUCK_BODY} FROM v1) GROUP BY shard
),
mb AS (
  SELECT shard, count(*) AS n_docs, bit_xor(h56) AS digest_xor,
         sum(h32) AS digest_sum32
  FROM ({_MANIFEST_DUCK_BODY} FROM v2) GROUP BY shard
)
SELECT shard,
       CAST(coalesce(ma.n_docs, 0) AS BIGINT) AS n_docs_a,
       CAST(coalesce(mb.n_docs, 0) AS BIGINT) AS n_docs_b,
       CAST(coalesce(ma.digest_xor, 0) AS BIGINT) AS digest_xor_a,
       CAST(coalesce(mb.digest_xor, 0) AS BIGINT) AS digest_xor_b,
       CAST(coalesce(ma.digest_sum32, 0) AS BIGINT) AS digest_sum32_a,
       CAST(coalesce(mb.digest_sum32, 0) AS BIGINT) AS digest_sum32_b
FROM ma FULL OUTER JOIN mb USING (shard)
WHERE coalesce(ma.n_docs, 0) <> coalesce(mb.n_docs, 0)
   OR coalesce(ma.digest_xor, 0) <> coalesce(mb.digest_xor, 0)
   OR coalesce(ma.digest_sum32, 0) <> coalesce(mb.digest_sum32, 0)
"""


# --- split-document stitch detection --------------------------------------------

STITCH_K = 3  # boundary-gram width in tokens


def boundary_stitch_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents whose trailing STITCH_K-gram equals another document's
    leading STITCH_K-gram — candidate halves of a logical page the crawl
    cut into two records (truncation mid-thread, pagination seams).  The
    stitch candidates feed a downstream re-join or a dedup exclusion.

    Scale shape: each document contributes TWO constant-width boundary
    grams (never the text); the equi-join keys on the gram — one bounded
    exchange whose skew is the boundary-gram collision rate, not corpus
    size.
    """
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.expr(_TOK).alias("w")).filter(
        F.size("w") >= STITCH_K
    )
    hb = toks.select(
        "doc_id",
        F.expr(f"concat_ws(' ', slice(w, 1, {STITCH_K}))").alias("head"),
        F.expr(
            f"concat_ws(' ', slice(w, -{STITCH_K}, {STITCH_K}))"
        ).alias("tail"),
    )
    a = hb.select(
        F.col("doc_id").alias("left_doc"), F.col("tail").alias("stitch_gram")
    )
    b = hb.select(
        F.col("doc_id").alias("right_doc"), F.col("head").alias("stitch_gram")
    )
    return (
        a.join(b, "stitch_gram")
        .filter(F.col("left_doc") != F.col("right_doc"))
        .select("left_doc", "right_doc", "stitch_gram")
    )


BOUNDARY_STITCH_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOK_DUCK} AS w FROM documents),
hb AS (SELECT doc_id,
              array_to_string(w[1:{STITCH_K}], ' ') AS head,
              array_to_string(w[-{STITCH_K}:], ' ') AS tail
       FROM toks WHERE len(w) >= {STITCH_K})
SELECT a.doc_id AS left_doc, b.doc_id AS right_doc, a.tail AS stitch_gram
FROM hb a JOIN hb b ON a.tail = b.head AND a.doc_id != b.doc_id
"""


QUERIES = {
    "postings_index": postings_index,
    "hll_distinct": hll_distinct,
    "semantic_contamination": semantic_contamination,
    "padding_waste_audit": padding_waste_audit,
    "shard_merkle_manifest": shard_merkle_manifest,
    "manifest_diff": manifest_diff,
    "boundary_stitch_pairs": boundary_stitch_pairs,
}

ORACLES = {
    "postings_index": POSTINGS_INDEX_SQL,
    "hll_distinct": HLL_DISTINCT_SQL,
    "semantic_contamination": SEMANTIC_CONTAMINATION_SQL,
    "padding_waste_audit": PADDING_WASTE_SQL,
    "shard_merkle_manifest": SHARD_MERKLE_SQL,
    "manifest_diff": MANIFEST_DIFF_SQL,
    "boundary_stitch_pairs": BOUNDARY_STITCH_SQL,
}
