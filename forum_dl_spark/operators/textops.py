"""Text-analysis operators over the ``documents`` table.

- lang-ID: deterministic stopword-marker heuristic
- quality score: length / punctuation / stopword / alpha ratios
- token counting: whitespace tokenizer + a BPE-ish subword estimate
- fingerprinting: md5 over whitespace-normalized text
- spans_interleave: sentence-chunk explode with document-order offsets
  (the flat-table cousin of the crawl engine's interleaved spans payload)

Every operator has an exactly-equivalent DuckDB oracle (identical regexes
and arithmetic, shared Java/RE2 regex subset only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._par import read_spread


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/documents.parquet")


# --- language ID -------------------------------------------------------------

# marker words per language; prediction = argmax hit count, ties by the
# fixed language order below, fallback 'und'
_LANG_MARKERS = {
    "en": ["the", "and", "a"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "los"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]


def _spark_hits(lang: str) -> str:
    words = _LANG_MARKERS[lang]
    terms = " + ".join(
        f"size(filter(split(lower(text), '\\\\s+'), x -> x = '{w}'))" for w in words
    )
    return f"({terms})"


def _duck_hits(lang: str) -> str:
    words = _LANG_MARKERS[lang]
    terms = " + ".join(
        f"len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x = '{w}'))"
        for w in words
    )
    return f"({terms})"


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    hit_cols = [F.expr(_spark_hits(l)).alias(f"h_{l}") for l in _LANG_ORDER]
    with_hits = d.select("doc_id", "lang", *hit_cols)
    best = F.greatest(*[F.col(f"h_{l}") for l in _LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for l in _LANG_ORDER:
        pred = pred.when(F.col(f"h_{l}") == best, F.lit(l))
    return with_hits.select("doc_id", "lang", pred.alias("lang_pred"))


LANG_ID_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN greatest({", ".join(_duck_hits(l) for l in _LANG_ORDER)}) = 0 THEN 'und'
            {" ".join(
                f"WHEN {_duck_hits(l)} = greatest({', '.join(_duck_hits(x) for x in _LANG_ORDER)}) THEN '{l}'"
                for l in _LANG_ORDER
            )}
       END AS lang_pred
FROM documents
"""


# --- quality score -------------------------------------------------------------


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    punct = F.length(F.regexp_replace(F.col("text"), "[^,.!?;:]", ""))
    stop = F.expr(
        "size(filter(split(lower(text), '\\\\s+'),"
        " x -> x in ('the','a','and','of','to','in')))"
    )
    n_tok = F.expr(r"size(filter(split(text, '\\s+'), x -> x != ''))")
    return d.select(
        "doc_id",
        n.alias("n_chars_m"),
        F.round(alpha / F.greatest(n, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(punct / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            (alpha / F.greatest(n, F.lit(1))) * 0.6
            + (stop / F.greatest(n_tok, F.lit(1))) * 0.3
            + F.least(n / F.lit(1000.0), F.lit(1.0)) * 0.1,
            6,
        ).alias("quality"),
    )


QUALITY_SQL = r"""
SELECT doc_id,
       length(text) AS n_chars_m,
       round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             / greatest(length(text), 1), 6) AS alpha_ratio,
       round(length(regexp_replace(text, '[^,.!?;:]', '', 'g'))
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                             x -> x in ('the','a','and','of','to','in')))
             / greatest(len(list_filter(regexp_split_to_array(text, '\s+'),
                                        x -> x != '')), 1), 6) AS stopword_ratio,
       round(
         (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
              / greatest(length(text), 1)) * 0.6
         + (len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x in ('the','a','and','of','to','in')))
              / greatest(len(list_filter(regexp_split_to_array(text, '\s+'),
                                         x -> x != '')), 1)) * 0.3
         + least(length(text) / 1000.0, 1.0) * 0.1, 6) AS quality
FROM documents
"""


# --- token counting -------------------------------------------------------------


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    ws = F.expr(r"size(filter(split(text, '\\s+'), x -> x != ''))")
    # BPE-ish estimate: word-pieces of <=4 chars — ceil(len/4) per word
    bpe = F.expr(
        r"aggregate(filter(split(text, '\\s+'), x -> x != ''),"
        r" 0L, (acc, x) -> acc + cast(ceil(length(x) / 4.0) as long))"
    )
    return d.select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''))
           AS ws_tokens,
       CAST(list_sum(list_transform(
           list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''),
           x -> cast(ceil(length(x) / 4.0) as bigint))) AS BIGINT)
           AS bpe_tokens
FROM documents
"""


# --- fingerprinting -------------------------------------------------------------


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    norm = F.trim(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.md5(F.substring(norm, 1, 64)).alias("prefix_fingerprint"),
    )


DOC_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
       md5(substring(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 64))
           AS prefix_fingerprint
FROM documents
"""


# --- interleaved spans over the flat documents table -----------------------------


def spans_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-chunk spans with document-order offsets (posexplode)."""
    d = _docs(spark, sf_dir)
    chunks = F.expr(r"filter(split(text, '\\. '), x -> x != '')")
    return d.select(
        "doc_id", F.posexplode(chunks).alias("offset", "chunk_text")
    ).withColumn("n_chunk_chars", F.length("chunk_text"))


SPANS_INTERLEAVE_SQL = r"""
SELECT doc_id, i - 1 AS offset, a[i] AS chunk_text, length(a[i]) AS n_chunk_chars
FROM (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\. '), x -> x != '') AS a
  FROM documents
), LATERAL (SELECT unnest(generate_series(1, len(a))) AS i) g
"""


# --- benchmark contamination ------------------------------------------------

_CONTAM_N = 8           # word n-gram size (13-gram is typical at prod scale;
                        # 8 keeps the synthetic fixture non-vacuous)
_CONTAM_MOD = 7         # deterministic benchmark split: doc_id % 7 == 2
_CONTAM_RES = 2


# r6: the (doc_id, n-gram shingle) relation is rebuilt by every
# contamination pass — contamination_ngram (1x), decontaminate_apply (1x
# via the detect query), contamination_bloom (3x: bench-position collect,
# training candidates, exact-verify side). One persisted build per
# (session, sf_dir) — the _SHINGLE_MEMO ownership pattern.
_CONTAM_SH_MEMO: dict[tuple[str, str], DataFrame] = {}


def _contam_sh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _memo_get

    def build() -> DataFrame:
        d = _docs(spark, sf_dir)
        toks = d.select(
            "doc_id",
            F.expr(r"filter(split(text, '\\s+'), x -> x != '')").alias("t"),
        )
        return toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"case when size(t) < {_CONTAM_N} "
                    f"then cast(array() as array<string>) "
                    f"else transform(sequence(1, size(t) - {_CONTAM_N} + 1), "
                    f"i -> concat_ws(' ', slice(t, i, {_CONTAM_N}))) end"
                )
            ).alias("s"),
        )

    return _memo_get(_CONTAM_SH_MEMO, spark, sf_dir, build)


def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: flag training documents sharing
    any word ``n``-gram with a held-out benchmark set (the standard
    n-gram-overlap decontamination check for LLM training corpora).

    Scale shape: the benchmark side is small by construction, so its
    distinct shingle set is BROADCAST — the big training side streams
    through a map-side hash join with no shuffle; the only wide stages are
    the benchmark distinct and the final per-doc aggregate. At 100 TB the
    broadcast becomes a bloom filter over benchmark shingles with an exact
    re-check on the survivors."""
    sh = _contam_sh(spark, sf_dir)
    is_bench = F.col("doc_id") % _CONTAM_MOD == _CONTAM_RES
    bench = sh.filter(is_bench).select("s").distinct()
    return (
        sh.filter(~is_bench)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_hits"))
    )


# shared CTE block: shingles + benchmark side (reused verbatim by the
# detect query and the decontaminated-corpus EMIT so they cannot drift)
_CONTAM_CTES = rf"""toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) < {_CONTAM_N} THEN []
                ELSE list_transform(generate_series(1, len(t) - {_CONTAM_N} + 1),
                     i -> array_to_string(list_slice(t, i, i + {_CONTAM_N} - 1), ' '))
                END) AS s
  FROM toks
), bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_CONTAM_MOD} = {_CONTAM_RES}
)"""

CONTAMINATION_SQL = rf"""
WITH {_CONTAM_CTES}
SELECT sh.doc_id, CAST(count(DISTINCT sh.s) AS BIGINT) AS n_hits
FROM sh JOIN bench USING (s)
WHERE sh.doc_id % {_CONTAM_MOD} <> {_CONTAM_RES}
GROUP BY sh.doc_id
"""


def decontaminate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminated-corpus EMIT (completes the contamination story the
    way ``dedup_apply`` completes detection): return the training docs —
    benchmark rows excluded by definition — that share NO word
    ``n``-gram with the benchmark set.

    Scale shape: the contaminated doc-id set is at most the hit count
    (small — it is the thing decontamination assumes is rare), so it is
    BROADCAST into a left-anti join against the documents scan; the
    training side is touched twice (shingle pass + anti-join pass) but
    never shuffles on a wide key. At 100 TB the shingle pass reuses
    contamination_ngram's bloom-then-exact plan."""
    d = _docs(spark, sf_dir)
    contaminated = contamination_ngram(spark, sf_dir).select("doc_id")
    is_bench = F.col("doc_id") % _CONTAM_MOD == _CONTAM_RES
    return (
        d.filter(~is_bench)
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select("doc_id", "source", "lang", "n_chars")
    )


DECONTAMINATE_SQL = rf"""
WITH {_CONTAM_CTES},
contaminated AS (
  SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)
  WHERE sh.doc_id % {_CONTAM_MOD} <> {_CONTAM_RES}
)
SELECT doc_id, source, lang, n_chars FROM documents
WHERE doc_id % {_CONTAM_MOD} <> {_CONTAM_RES}
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


# --- contamination: bloom-prefilter variant ----------------------------------

# Bloom size in BITS (k=2 hash probes = two disjoint md5 slices). Sized so
# the fixture corpus exercises BOTH regimes: at sf0.01 the eval side sets
# ~5.8k/131k bits (load 0.044, fp/probe ~2e-3 → a visible-but-small
# false-positive tail for the audit columns); at sf0.1 load ~0.4 (fp ~0.15
# — heavy but harmless: the verify join trims candidates exactly). In
# production m is sized at ~10-15 bits/key like the crawl's URL-seen bloom
# (crawl/bloom.py) — the point is that the broadcast is bounded by m BITS
# (16 KiB here), not by the eval suite's shingle-string volume.
_BLOOM_M = 131072


def contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``contamination_ngram``'s own 100 TB scale path, made concrete: the
    benchmark shingle set is summarized into a BLOOM FILTER whose bit
    words are inlined as a plan literal (the broadcast is m bits, fixed,
    instead of the eval suite's full shingle strings), the training scan
    is prefiltered by pure bit arithmetic (map-only, zero-join, inside
    codegen), and only the bloom survivors meet the exact benchmark set
    in a broadcast verify join. Output per training doc that passes the
    bloom: ``n_candidates`` (distinct shingles the bloom admitted) next
    to ``n_hits`` (exactly verified) — the false-positive overhead is
    part of the audit, and blooms have no false negatives, so ``n_hits``
    per doc equals ``contamination_ngram``'s (test-pinned).

    The bit positions are deterministic integer arithmetic (two md5
    slices mod m), so DuckDB reconstructs the SAME filter as a position
    set and the value hash covers the bloom itself, false positives
    included — same trick as the crawl's bit-identical bloom prefilter
    (tests/test_politeness_bloom_resume.py).

    Scale shape: one bounded collect builds the words (eval side only —
    the kmeans-centroid / dsir-weights precedent); the training side is
    scan → map-only bloom filter → broadcast verify join → ONE doc-keyed
    aggregate (distinct folded into countDistinct). Plan-pinned: no
    SortMergeJoin, exactly one BroadcastHashJoin, bloom filter below it."""
    sh = _contam_sh(spark, sf_dir)
    hashes = sh.select(
        "doc_id",
        "s",
        F.expr(
            f"cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint) % {_BLOOM_M}"
        ).alias("p1"),
        F.expr(
            f"cast(conv(substring(md5(s), 9, 8), 16, 10) as bigint) % {_BLOOM_M}"
        ).alias("p2"),
    )
    is_bench = F.col("doc_id") % _CONTAM_MOD == _CONTAM_RES

    # bounded driver-side build of the bit words: eval suites are small by
    # construction (same argument as contamination_ngram's broadcast)
    pos_rows = (
        hashes.filter(is_bench)
        .select(F.explode(F.array("p1", "p2")).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_M // 64)
    for r in pos_rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    # two's-complement into signed 64-bit so the longs survive as Spark
    # BIGINT literals
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    bit = (
        "((shiftright(_bloom[cast({p} div 64 as int)],"
        " cast({p} % 64 as int))) & 1) = 1"
    )
    cand = (
        hashes.filter(~is_bench)
        .withColumn("_bloom", F.lit(words))
        .filter(F.expr(bit.format(p="p1")) & F.expr(bit.format(p="p2")))
        .select("doc_id", "s")
    )
    bench = (
        sh.filter(is_bench).select("s").distinct().withColumn("_hit", F.lit(1))
    )
    return (
        cand.join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("s").alias("n_candidates"),
            F.count_distinct(
                F.when(F.col("_hit") == 1, F.col("s"))
            ).alias("n_hits"),
        )
    )


CONTAM_BLOOM_SQL = rf"""
WITH {_CONTAM_CTES},
hashes AS (
  SELECT doc_id, s,
         CAST(concat('0x', substring(md5(s), 1, 8)) AS BIGINT) % {_BLOOM_M} AS p1,
         CAST(concat('0x', substring(md5(s), 9, 8)) AS BIGINT) % {_BLOOM_M} AS p2
  FROM sh
),
pos AS (
  SELECT DISTINCT p FROM (
    SELECT p1 AS p FROM hashes WHERE doc_id % {_CONTAM_MOD} = {_CONTAM_RES}
    UNION
    SELECT p2 FROM hashes WHERE doc_id % {_CONTAM_MOD} = {_CONTAM_RES})
)
SELECT doc_id,
       CAST(count(DISTINCT s) AS BIGINT) AS n_candidates,
       CAST(count(DISTINCT CASE WHEN s IN (SELECT s FROM bench) THEN s END)
            AS BIGINT) AS n_hits
FROM hashes
WHERE doc_id % {_CONTAM_MOD} <> {_CONTAM_RES}
  AND p1 IN (SELECT p FROM pos) AND p2 IN (SELECT p FROM pos)
GROUP BY doc_id
"""


# --- per-source quality rollup ----------------------------------------------


def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus rollup: per (source, lang) document counts, token
    totals, mean length, and the share passing a keep-filter
    (alpha-ratio ≥ 0.55 and ≥ 100 chars).

    Determinism note: every aggregate is an exact BIGINT sum; ratios are a
    single division of two exact integers, so the result is bit-stable
    across partitionings (no floating-point accumulation order). One
    map-side-combined hash aggregate — the 100 TB plan is the same plan."""
    d = _docs(spark, sf_dir)
    n = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    n_tok = F.expr(r"size(filter(split(text, '\\s+'), x -> x != ''))")
    kept = ((alpha * 100 >= n * 55) & (F.col("n_chars") >= 100)).cast("long")
    per = d.select(
        "source", "lang", n.alias("nc"), n_tok.alias("nt"), kept.alias("k")
    )
    cnt = F.count(F.lit(1))
    return per.groupBy("source", "lang").agg(
        cnt.alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.round(F.sum("nc") / cnt, 6).alias("avg_chars"),
        F.round(F.sum("k") / cnt, 6).alias("kept_share"),
    )


SOURCE_ROLLUP_SQL = r"""
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x != ''))) AS BIGINT) AS total_tokens,
       round(CAST(sum(length(text)) AS BIGINT) / count(*), 6) AS avg_chars,
       round(CAST(sum(CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 100
                                >= length(text) * 55
                           AND n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT)
             / count(*), 6) AS kept_share
FROM documents
GROUP BY source, lang
"""


# C4-style corpus gates (Raffel et al. 2020 §2.2 in spirit: length bounds,
# alphabetic density, a natural-language stopword floor) — thresholds are
# integer-ratio comparisons on ROUNDED values so both engines decide each
# row identically (no FP-boundary drift)
QF_MIN_CHARS = 100
QF_MAX_CHARS = 20_000
QF_MIN_ALPHA = 0.6
QF_MIN_STOPWORD = 0.02


def qf_gate_conds() -> dict[str, F.Column]:
    """The three C4-style gates as individual Columns over ``text`` —
    the single source of truth ``qf_keep_cond`` ANDs together and
    ``quality_ablation`` attributes separately (so they cannot drift)."""
    n = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    stop = F.expr(
        "size(filter(split(lower(text), '\\\\s+'),"
        " x -> x in ('the','a','and','of','to','in')))"
    )
    n_tok = F.expr(r"size(filter(split(text, '\\s+'), x -> x != ''))")
    return {
        "alpha": F.round(alpha / F.greatest(n, F.lit(1)), 6) >= QF_MIN_ALPHA,
        "stopword": F.round(stop / F.greatest(n_tok, F.lit(1)), 6)
        >= QF_MIN_STOPWORD,
        "length": n.between(QF_MIN_CHARS, QF_MAX_CHARS),
    }


def qf_keep_cond() -> F.Column:
    """The C4-style keep predicate as a Column over a ``text`` column —
    shared by quality_filter_apply and pipeline.corpus_pipeline_apply so
    the two operators can never drift apart."""
    g = qf_gate_conds()
    return g["alpha"] & g["stopword"] & g["length"]


# the same predicate as a DuckDB WHERE body (shared for composition)
QF_PRED_DUCK = rf"""round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
            / greatest(length(text), 1), 6) >= {QF_MIN_ALPHA}
  AND round(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x in ('the','a','and','of','to','in')))
            / greatest(len(list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x != '')), 1), 6)
      >= {QF_MIN_STOPWORD}
  AND length(text) BETWEEN {QF_MIN_CHARS} AND {QF_MAX_CHARS}"""


def quality_filter_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-corpus EMIT (companion to ``pipeline.dedup_apply``): keep
    docs passing the C4-style quality gates and return the surviving rows.
    One narrow projection + filter over the documents scan — no shuffle,
    no join; at 100 TB this is a map-only pass whose predicate pushes into
    the scan."""
    d = _docs(spark, sf_dir)
    return d.filter(qf_keep_cond()).select("doc_id", "lang", "source", "n_chars")


QUALITY_FILTER_SQL = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {QF_PRED_DUCK}
"""


# --- filter-ablation audit -------------------------------------------------------
#
# The Dolma/RefinedWeb-style gate-attribution audit: before shipping a
# filter stack you want to know what each gate removes ALONE (its marginal
# — the docs only it fails, which dropping that gate would re-admit) next
# to its raw fail count (which overlaps with other gates). One conditional
# aggregate over the corpus scan — zero joins, zero extra passes; the
# 3-row output is an explode of the 1-row count vector (the events_funnel
# shape). Gates come from qf_gate_conds(), the SAME Column objects
# qf_keep_cond ANDs together, so the audit can never drift from the
# filter it audits.


def quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    g = qf_gate_conds()
    names = list(g)  # alpha, stopword, length
    flagged = d.select(
        *[g[k].cast("long").alias(f"ok_{k}") for k in names]
    )
    aggs = [F.count("*").alias("n")]
    for k in names:
        aggs.append(F.sum(1 - F.col(f"ok_{k}")).alias(f"fail_{k}"))
        others = [F.col(f"ok_{o}") for o in names if o != k]
        only = (1 - F.col(f"ok_{k}")) * others[0] * others[1]
        aggs.append(F.sum(only).alias(f"only_{k}"))
    aggs.append(
        F.sum(
            F.col(f"ok_{names[0]}")
            * F.col(f"ok_{names[1]}")
            * F.col(f"ok_{names[2]}")
        ).alias("keep")
    )
    counts = flagged.agg(*aggs)
    rows = ", ".join(
        f"struct('{k}' as gate, fail_{k} as n_fail, only_{k} as n_fail_only)"
        for k in names
    )
    return counts.select(
        F.explode(F.expr(f"array({rows})")).alias("x"), "n", "keep"
    ).select(
        F.col("x.gate").alias("gate"),
        F.col("n").alias("n_docs"),
        F.col("keep").alias("n_keep"),
        F.col("x.n_fail").alias("n_fail"),
        F.col("x.n_fail_only").alias("n_fail_only"),
        F.expr("cast((10000 * x.n_fail) div n as bigint)").alias("fail_bp"),
        F.expr("cast((10000 * x.n_fail_only) div n as bigint)").alias(
            "marginal_bp"
        ),
    )


_QF_GATES_DUCK = {
    "alpha": rf"""round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
            / greatest(length(text), 1), 6) >= {QF_MIN_ALPHA}""",
    "stopword": rf"""round(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x in ('the','a','and','of','to','in')))
            / greatest(len(list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x != '')), 1), 6)
      >= {QF_MIN_STOPWORD}""",
    "length": f"length(text) BETWEEN {QF_MIN_CHARS} AND {QF_MAX_CHARS}",
}

QUALITY_ABLATION_SQL = f"""
WITH flags AS (
  SELECT CASE WHEN {_QF_GATES_DUCK['alpha']} THEN 1 ELSE 0 END AS ok_alpha,
         CASE WHEN {_QF_GATES_DUCK['stopword']} THEN 1 ELSE 0 END AS ok_stopword,
         CASE WHEN {_QF_GATES_DUCK['length']} THEN 1 ELSE 0 END AS ok_length
  FROM documents
),
counts AS (
  SELECT count(*) AS n,
         CAST(sum(1 - ok_alpha) AS BIGINT) AS fail_alpha,
         CAST(sum((1 - ok_alpha) * ok_stopword * ok_length) AS BIGINT)
           AS only_alpha,
         CAST(sum(1 - ok_stopword) AS BIGINT) AS fail_stopword,
         CAST(sum((1 - ok_stopword) * ok_alpha * ok_length) AS BIGINT)
           AS only_stopword,
         CAST(sum(1 - ok_length) AS BIGINT) AS fail_length,
         CAST(sum((1 - ok_length) * ok_alpha * ok_stopword) AS BIGINT)
           AS only_length,
         CAST(sum(ok_alpha * ok_stopword * ok_length) AS BIGINT) AS keep
  FROM flags
)
SELECT g.gate, n AS n_docs, keep AS n_keep,
       CASE g.gate WHEN 'alpha' THEN fail_alpha
                   WHEN 'stopword' THEN fail_stopword
                   ELSE fail_length END AS n_fail,
       CASE g.gate WHEN 'alpha' THEN only_alpha
                   WHEN 'stopword' THEN only_stopword
                   ELSE only_length END AS n_fail_only,
       CAST((10000 * (CASE g.gate WHEN 'alpha' THEN fail_alpha
                                  WHEN 'stopword' THEN fail_stopword
                                  ELSE fail_length END)) // n AS BIGINT)
         AS fail_bp,
       CAST((10000 * (CASE g.gate WHEN 'alpha' THEN only_alpha
                                  WHEN 'stopword' THEN only_stopword
                                  ELSE only_length END)) // n AS BIGINT)
         AS marginal_bp
FROM counts, (VALUES ('alpha'), ('stopword'), ('length')) AS g(gate)
"""


# --- Gopher rule-stack quality filter -----------------------------------------
#
# The second industry-standard heuristic stack next to the C4 gate: the
# Gopher rules (Rae et al. 2021, §A1.1 "quality filtering") — word-count
# bounds, mean-word-length bounds, symbol-to-word ratio, bullet-/ellipsis-
# line shares, alphabetic-word share, and the >=2-distinct-stop-words rule.
# The stop LIST is the fixture corpus's function words (the same six the C4
# stopword gate uses — Gopher's English list would be degenerate on the
# synthetic vocabulary); the RULE (>=2 distinct present as tokens) is
# Gopher's. Every gate is an exact integer cross-multiplied comparison (no
# FP anywhere), so both engines decide every row identically.
#
# Scale shape: per-doc flags are ONE narrow map-only projection over the
# documents scan (string ops only — no shuffle, no join, no UDF); the
# agreement matrix adds one conditional aggregate. Map-only at 100 TB.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3   # mean word length lower bound (chars/word)
GOPHER_MAX_MWL = 10
GOPHER_STOPS = ("the", "a", "and", "of", "to", "in")

_G_WORDS = "filter(split(text, '\\\\s+'), x -> x != '')"
_G_LINES = "split(text, '\\n')"


def gopher_gate_conds() -> dict[str, F.Column]:
    """The seven Gopher gates as individual Columns over ``text`` — the
    single source of truth shared by ``gopher_rules`` and the agreement
    matrix (the ``qf_gate_conds`` anti-drift recipe)."""
    nw = F.expr(f"size({_G_WORDS})")
    wch = F.expr(
        f"aggregate({_G_WORDS}, cast(0 as bigint), (s, x) -> s + length(x))"
    )
    nl = F.expr(f"size({_G_LINES})")
    nbul = F.expr(
        f"size(filter({_G_LINES},"
        " l -> l like '-%' or l like '*%' or l like '•%'))"
    )
    nellend = F.expr(f"size(filter({_G_LINES}, l -> l like '%...'))")
    nsym = F.expr(
        "(length(text) - length(replace(text, '#', '')))"
        " + (length(text) - length(replace(text, '...', ''))) div 3"
    )
    nalpha = F.expr(
        "size(filter(split(text, '\\\\s+'), x -> x rlike '[a-zA-Z]'))"
    )
    nstop = F.expr(
        " + ".join(
            "(case when array_contains(split(lower(text), '\\\\s+'),"
            f" '{s}') then 1 else 0 end)"
            for s in GOPHER_STOPS
        )
    )
    return {
        "words": nw.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS),
        "mean_wl": (wch >= GOPHER_MIN_MWL * nw) & (wch <= GOPHER_MAX_MWL * nw),
        "symbol": (F.lit(10) * nsym) <= nw,
        "bullet": (F.lit(10) * nbul) <= F.lit(9) * nl,
        "ellipsis": (F.lit(10) * nellend) <= F.lit(3) * nl,
        "alpha": (F.lit(5) * nalpha) >= F.lit(4) * nw,
        "stop": nstop >= F.lit(2),
    }


_GOPHER_KEYS = (
    "words", "mean_wl", "symbol", "bullet", "ellipsis", "alpha", "stop"
)


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher gate flags + the combined keep decision."""
    d = _docs(spark, sf_dir)
    g = gopher_gate_conds()
    flagged = d.select(
        "doc_id", *[g[k].cast("int").alias(f"ok_{k}") for k in _GOPHER_KEYS]
    )
    keep = " * ".join(f"ok_{k}" for k in _GOPHER_KEYS)
    return flagged.withColumn("keep", F.expr(f"cast({keep} as int)"))


# DuckDB mirror: the raw per-doc counters once (f), the gate flags over
# them (g) — both reused verbatim by the agreement matrix below.
_GOPHER_F_DUCK = r"""
f AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x != '')) AS nw,
         coalesce(list_sum(list_transform(
             list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''),
             x -> length(x))), 0) AS wch,
         len(string_split(text, chr(10))) AS nl,
         len(list_filter(string_split(text, chr(10)),
                         l -> l LIKE '-%' OR l LIKE '*%'
                              OR l LIKE '""" + "•" + r"""%')) AS nbul,
         len(list_filter(string_split(text, chr(10)),
                         l -> l LIKE '%...')) AS nellend,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3 AS nsym,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> regexp_matches(x, '[a-zA-Z]'))) AS nalpha,
         """ + " + ".join(
    "(CASE WHEN list_contains(regexp_split_to_array(lower(text),"
    f" '\\s+'), '{s}') THEN 1 ELSE 0 END)"
    for s in GOPHER_STOPS
) + r""" AS nstop
  FROM documents
)"""

_GOPHER_G_DUCK = f"""
g AS (
  SELECT doc_id,
         CASE WHEN nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
              THEN 1 ELSE 0 END AS ok_words,
         CASE WHEN wch >= {GOPHER_MIN_MWL} * nw
               AND wch <= {GOPHER_MAX_MWL} * nw THEN 1 ELSE 0 END AS ok_mean_wl,
         CASE WHEN 10 * nsym <= nw THEN 1 ELSE 0 END AS ok_symbol,
         CASE WHEN 10 * nbul <= 9 * nl THEN 1 ELSE 0 END AS ok_bullet,
         CASE WHEN 10 * nellend <= 3 * nl THEN 1 ELSE 0 END AS ok_ellipsis,
         CASE WHEN 5 * nalpha >= 4 * nw THEN 1 ELSE 0 END AS ok_alpha,
         CASE WHEN nstop >= 2 THEN 1 ELSE 0 END AS ok_stop
  FROM f
)"""

GOPHER_RULES_SQL = (
    "WITH "
    + _GOPHER_F_DUCK.strip()
    + ",\n"
    + _GOPHER_G_DUCK.strip()
    + f"""
SELECT doc_id, {', '.join('ok_' + k for k in _GOPHER_KEYS)},
       {' * '.join('ok_' + k for k in _GOPHER_KEYS)} AS keep
FROM g
"""
)


def filter_stack_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 agreement matrix between the Gopher stack and the C4 gate —
    the audit run before swapping one quality filter for another: how many
    docs each stack keeps that the other drops. Reuses the SAME gate
    Column objects as ``gopher_rules`` and ``quality_filter_apply``
    (anti-drift); one conditional aggregate over the scan."""
    d = _docs(spark, sf_dir)
    g = gopher_gate_conds()
    gopher = None
    for k in _GOPHER_KEYS:
        gopher = g[k] if gopher is None else gopher & g[k]
    return (
        d.select(
            gopher.cast("int").alias("gopher_keep"),
            qf_keep_cond().cast("int").alias("c4_keep"),
        )
        .groupBy("gopher_keep", "c4_keep")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


FILTER_STACK_AGREEMENT_SQL = (
    "WITH "
    + _GOPHER_F_DUCK.strip()
    + ",\n"
    + _GOPHER_G_DUCK.strip()
    + f""",
m AS (
  SELECT g.doc_id,
         {' * '.join('ok_' + k for k in _GOPHER_KEYS)} AS gopher_keep,
         CASE WHEN {QF_PRED_DUCK} THEN 1 ELSE 0 END AS c4_keep
  FROM g JOIN documents USING (doc_id)
)
SELECT gopher_keep, c4_keep, CAST(count(*) AS BIGINT) AS n_docs
FROM m GROUP BY 1, 2
"""
)


def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Datasheets for datasets' rollup — the one-page per-source summary a
    corpus release ships with: doc/lang counts, token and char totals,
    corpus-wide exact-duplicate share (same whitespace-normalized md5
    fingerprint as dedup_exact, counted ACROSS sources so cross-source
    copies show up in both), and the C4 quality-gate pass share (the
    shared ``qf_keep_cond`` predicate — cannot drift from
    quality_filter_apply).

    Scale shape: one window count over the fingerprint hash (the
    dedup_exact shuffle, reused semantics) followed by one
    map-side-combined per-source aggregate; every output ratio is a
    single division of two exact BIGINTs, so results are bit-stable
    across partitionings."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    n_tok = F.expr(r"size(filter(split(text, '\\s+'), x -> x != ''))")
    per = d.select(
        "source",
        "lang",
        F.length("text").alias("nc"),
        n_tok.alias("nt"),
        qf_keep_cond().cast("long").alias("k"),
        fp.alias("fp"),
    ).withColumn(
        "is_dup",
        (F.count(F.lit(1)).over(Window.partitionBy("fp")) > 1).cast("long"),
    )
    cnt = F.count(F.lit(1))
    return per.groupBy("source").agg(
        cnt.alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("nt").alias("total_tokens"),
        F.sum("nc").alias("total_chars"),
        F.round(F.sum("is_dup") / cnt, 6).alias("dup_share"),
        F.round(F.sum("k") / cnt, 6).alias("kept_share"),
    )


CORPUS_DATASHEET_SQL = rf"""
WITH per AS (
  SELECT source, lang,
         length(text) AS nc,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x != '')) AS nt,
         CASE WHEN {QF_PRED_DUCK} THEN 1 ELSE 0 END AS k,
         CASE WHEN count(*) OVER (
                PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
              ) > 1 THEN 1 ELSE 0 END AS is_dup
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       CAST(sum(nc) AS BIGINT) AS total_chars,
       round(CAST(sum(is_dup) AS BIGINT) / count(*), 6) AS dup_share,
       round(CAST(sum(k) AS BIGINT) / count(*), 6) AS kept_share
FROM per
GROUP BY source
"""


VOCAB_TOP_K = 50


def token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: top-K tokens by DOCUMENT frequency (each doc
    counts a token once), ties broken lexicographically — the first step
    of vocab building / stopword-list induction over a corpus.

    Scale shape: per-doc ``array_distinct`` runs inside the projection
    (no doc_id-level shuffle), the DF count is one map-side-combined
    aggregate on token, and the top-K is ``orderBy().limit(K)`` — a
    TakeOrdered, not a global sort; the rank window then runs over K rows
    only."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    tok = d.select(
        F.explode(
            F.expr(
                r"array_distinct(filter(split(lower(text), '\\s+'), x -> x != ''))"
            )
        ).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("df"))
    top = counts.orderBy(F.desc("df"), F.asc("token")).limit(VOCAB_TOP_K)
    w = Window.orderBy(F.desc("df"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "df", "rank"
    )


TOKEN_TOPK_SQL = rf"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x != '')) AS token
  FROM documents
),
counts AS (SELECT token, count(*) AS df FROM tok GROUP BY token)
SELECT token, df, rank FROM (
  SELECT token, df,
         row_number() OVER (ORDER BY df DESC, token ASC) AS rank
  FROM counts
) WHERE rank <= {VOCAB_TOP_K}
"""

BIGRAM_TOP_K = 50


def ngram_lm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K word bigrams by corpus frequency — the first table of an
    n-gram LM / collocation pass (the KenLM-count step of a training-data
    pipeline). Same whitespace tokenization as ``token_topk``, but counts
    every occurrence (LM counts), not document frequency.

    Scale shape: bigrams are built per-row inside the projection
    (``transform`` over an index sequence — no join, no doc_id shuffle),
    the count is one map-side-combined aggregate keyed on the gram, and
    the top-K is TakeOrdered. The gram-keyed aggregate is the only
    exchange; hot grams ("of the") are exactly what the partial combine
    absorbs."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    # tokenize ONCE per row into a named projection — inlining the split()
    # into each element_at would re-split the document 4x per row (measured
    # 7.8 s -> ~2 s at sf0.1); the size() >= 2 filter also makes the
    # sequence() bound safe (sequence(1, 0) would yield a DESCENDING array)
    grams = (
        d.select(
            F.expr(r"filter(split(lower(text), '\\s+'), x -> x != '')").alias("w")
        )
        .filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
                )
            ).alias("gram")
        )
    )
    counts = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("gram")).limit(BIGRAM_TOP_K)
    w = Window.orderBy(F.desc("cnt"), F.asc("gram"))
    return top.withColumn("rank", F.row_number().over(w)).select("gram", "cnt", "rank")


NGRAM_LM_TOPK_SQL = rf"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x != '') AS w
  FROM documents
),
grams AS (
  SELECT unnest([concat(w[i], ' ', w[i + 1])
                 for i in generate_series(1, len(w) - 1)]) AS gram
  FROM words WHERE len(w) >= 2
),
counts AS (SELECT gram, count(*) AS cnt FROM grams GROUP BY gram)
SELECT gram, cnt, rank FROM (
  SELECT gram, cnt,
         row_number() OVER (ORDER BY cnt DESC, gram ASC) AS rank
  FROM counts
) WHERE rank <= {BIGRAM_TOP_K}
"""


# --- BPE merge-round 1: adjacent character-pair counts ------------------------
#
# The first round of byte-pair-encoding tokenizer training (Sennrich et al.
# 2016 §3.2): count adjacent symbol pairs WITHIN each whitespace word across
# the corpus; the most frequent pair becomes the first merge rule. At round 1
# every symbol is a single character, so the pair table is exactly the
# adjacent character-bigram counts per word occurrence — counting every word
# occurrence directly is equivalent to the paper's frequency-weighted word
# dictionary. (Later rounds need the merge applied back to the corpus — an
# iterative job like k-means/CC — but round 1 is the canonical "is the count
# infrastructure right" step and the one with a clean relational oracle.)

BPE_PAIR_TOPK = 50


def bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``BPE_PAIR_TOPK`` adjacent character pairs within words — the
    candidate table for BPE's first merge rule, ties broken
    lexicographically.

    Scale shape: same as ``ngram_lm_topk`` — words and their character
    pairs are built per-row inside the projection (two nested explodes,
    no join, no doc_id shuffle), the count is one map-side-combined
    aggregate keyed on the 2-char pair (a few-thousand-key domain, so the
    partial combine collapses virtually all traffic), and the top-K is
    TakeOrdered; the rank window runs over K rows only."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    pairs = (
        d.select(
            F.explode(
                F.expr(r"filter(split(lower(text), '\\s+'), x -> x != '')")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair")
        )
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("pair")).limit(BPE_PAIR_TOPK)
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "pair", "cnt", "rank"
    )


BPE_FIRST_MERGES_SQL = rf"""
WITH words AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x != '')) AS w
  FROM documents
),
pairs AS (
  SELECT unnest([substring(w, i, 2) for i in generate_series(1, length(w) - 1)])
         AS pair
  FROM words WHERE length(w) >= 2
),
counts AS (SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair)
SELECT pair, cnt, rank FROM (
  SELECT pair, cnt,
         row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rank
  FROM counts
) WHERE rank <= {BPE_PAIR_TOPK}
"""


# --- BPE merge training: the full iterative loop ------------------------------
#
# The multi-round continuation of ``bpe_first_merges``: BPE_MERGE_ROUNDS
# rounds of Sennrich et al.'s training loop — count adjacent symbol pairs,
# pick the most frequent (ties lexicographic), merge it everywhere, repeat.
# This is the kmeans_assign/CC pattern applied to tokenizer training: the
# learned state (the merge table) is TINY driver-side control state (one
# (lhs, rhs) rule per round) while the corpus-sized work stays declarative —
# each round is one map-side-combined pair-count aggregate over a narrow
# symbolization projection, and the chosen merge is applied by composing one
# more literal `replace()` onto that projection (no join, nothing persisted).
#
# Symbol representation: each symbol is bracket-wrapped (`[t][h][e]`), so a
# merge is the LITERAL string replace `'[a][b]' -> '[ab]'`. Brackets make
# adjacent occurrences disjoint — with space separators the shared boundary
# char makes `replace` skip every second occurrence of a run (` a b a b `
# has overlapping ` a b ` matches), whereas `[a][b][a][b]` replaces cleanly
# twice. Left-to-right non-overlapping `replace` is exactly BPE's greedy
# merge-application order, and Spark, DuckDB, and Python `str.replace` all
# share that semantics, which is what makes the unrolled static-SQL oracle
# possible (each round's winner enters the next round's replace as a scalar
# subquery).
#
# At 100 TB: R rounds = R corpus scans. The known production optimization —
# incremental pair-count DELTAS touching only words containing the merged
# pair (what HF tokenizers does) — trades this for a stateful word table;
# the per-round full recount is the faithful reference algorithm and keeps
# every round a two-stage narrow plan.

BPE_MERGE_ROUNDS = 4


# Trained merge tables are TINY driver-side state (BPE_MERGE_ROUNDS tuples)
# but cost R corpus aggregates to learn; the memo lets bpe_merges and
# bpe_encode share one training run per (session, sf_dir) — pure Python
# lists, so unlike _WINNOW_MEMO there is no persist lifetime to manage.
_BPE_RULES_MEMO: dict[tuple[str, str], list] = {}


def _train_bpe(spark: SparkSession, sf_dir: str) -> list:
    """Run the BPE training loop; returns [(round, lhs, rhs, merged, cnt)]."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BPE_RULES_MEMO.get(key)
    if cached is not None:
        return cached
    d = _docs(spark, sf_dir)
    # r6: train on the FREQUENCY-WEIGHTED WORD DICTIONARY, not on word
    # occurrences — the classic BPE-training representation (Sennrich et
    # al. 2016 §3.2 train on a word->count dict; so does every production
    # tokenizer trainer). Pair counts are identical integers: a pair
    # occurring p times inside word w contributes p * count(w) either way.
    # This turns R rounds x full-corpus re-symbolization (the dominant
    # cost: a per-character regexp over every word occurrence, per round)
    # into ONE map-side-combined word count plus R rounds over the tiny
    # persisted dictionary (vocabulary-sized, not corpus-sized).
    words = (
        d.select(
            F.explode(
                F.expr(r"filter(split(lower(text), '\\s+'), x -> x != '')")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("wn"))
        .persist()
    )
    cur = F.regexp_replace(F.col("w"), "(.)", "[$1]")
    rules: list[tuple] = []
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        top = (
            words.select(cur.alias("s"), "wn")
            .select(
                F.split(
                    F.expr("substring(s, 2, length(s) - 2)"), r"\]\["
                ).alias("y"),
                "wn",
            )
            .filter(F.size("y") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(y) - 1),"
                        " i -> struct(element_at(y, i) as lhs,"
                        " element_at(y, i + 1) as rhs))"
                    )
                ).alias("p"),
                "wn",
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("wn").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        rules.append((rnd, a, b, a + b, cnt))
        cur = F.replace(cur, F.lit(f"[{a}][{b}]"), F.lit(f"[{a}{b}]"))
    words.unpersist()
    for old_key in [k for k in _BPE_RULES_MEMO if k[0] != key[0]]:
        del _BPE_RULES_MEMO[old_key]
    _BPE_RULES_MEMO[key] = rules
    return rules


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ``BPE_MERGE_ROUNDS`` BPE merge rules (round, lhs, rhs,
    merged symbol, pair count at merge time), trained on the corpus with
    the greedy left-to-right merge application of the reference BPE."""
    return spark.createDataFrame(
        _train_bpe(spark, sf_dir),
        "merge_round bigint, lhs string, rhs string, merged string, cnt bigint",
    )


def _bpe_words_col() -> "F.Column":
    """The non-empty lowercased word array every encode-side consumer
    symbolizes (lazy: ``F.expr`` needs an active session)."""
    return F.expr(r"filter(split(lower(text), '\\s+'), x -> x != '')")


def _bpe_token_count_col(rules: list) -> "F.Column":
    """Token count under the trained tokenizer, as a pure Column over a
    ``ws`` word-array column: symbolize every word into bracket groups,
    compose the R learned merges as literal ``replace`` calls (left-to-
    right ``replace`` IS the greedy reference application on disjoint
    bracket patterns), then count the remaining ``[`` symbol markers."""
    sym: F.Column = F.concat_ws(
        " ", F.expr("transform(ws, w -> regexp_replace(w, '(.)', '[$1]'))")
    )
    for _rnd, a, b, _m, _cnt in rules:
        sym = F.replace(sym, F.lit(f"[{a}][{b}]"), F.lit(f"[{a}{b}]"))
    return (F.length(sym) - F.length(F.replace(sym, F.lit("[")))).cast(
        "bigint"
    )


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the trained merge table encoded back over
    the corpus: per document, every word is symbolized and the
    ``BPE_MERGE_ROUNDS`` learned merges are applied greedily left-to-right
    (the reference BPE encode order), yielding per-doc token counts under
    the trained tokenizer and the chars-per-token compression ratio
    (integer basis points, so both engines decide identically).

    Scale shape — the part worth pinning: once the rules exist they are
    LITERAL plan state (like kmeans centroids / the DSIR score array), so
    encoding is a map-only narrow projection over the documents scan with
    ZERO exchange: symbolize → R composed literal ``replace`` calls →
    count the remaining ``[`` symbol markers. Per-word bracket groups are
    joined with a bare space the wrapper never brackets, so no merge
    pattern (always ``...][...`` contiguous) can span a word boundary —
    encode-time isolation matches the per-word training. At 100 TB this is
    the ideal operator: embarrassingly parallel, inherits the corpus
    partitioning, whole-stage codegen end to end.
    """
    rules = _train_bpe(spark, sf_dir)
    d = _docs(spark, sf_dir)
    enc = (
        d.withColumn("ws", _bpe_words_col())
        .select(
            "doc_id",
            F.expr("cast(size(ws) as bigint)").alias("n_words"),
            F.expr("cast(length(concat_ws('', ws)) as bigint)").alias(
                "n_chars"
            ),
            _bpe_token_count_col(rules).alias("n_tokens_bpe"),
        )
    )
    return enc.withColumn(
        "cpt_e4",
        F.expr(
            "cast(case when n_tokens_bpe > 0"
            " then (10000 * n_chars) div n_tokens_bpe else 0 end as bigint)"
        ),
    )


def _bpe_train_and_enc_ctes(carry: str = "") -> str:
    """The shared oracle scaffolding every encode-side query composes:
    ``_bpe_merges_sql``'s training CTE chain VERBATIM (anti-drift — an
    apply query cannot diverge from the train query), then the e0..eR
    per-doc symbolize + R-replace chain.  ``carry`` threads extra document
    columns (e.g. ``", source"``) through the chain."""
    train = _bpe_merges_sql()
    # _bpe_merges_sql ends with the m1..mR UNION ALL select; strip it and
    # keep every CTE (w0..w{R-1}, p1..pR, m1..mR).
    ctes = train.split("\nSELECT CAST(1 AS BIGINT)")[0][len("WITH ") :]
    enc = [
        rf"""e0 AS (
  SELECT doc_id{carry},
         array_to_string(list_transform(ws,
             w -> regexp_replace(w, '(.)', '[\1]', 'g')), ' ') AS s,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(length(array_to_string(ws, '')) AS BIGINT) AS n_chars
  FROM (SELECT doc_id{carry},
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> x != '') AS ws
        FROM documents)
)"""
    ]
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        enc.append(
            f"""e{r} AS (
  SELECT doc_id{carry}, n_words, n_chars,
         replace(s,
                 '[' || (SELECT lhs FROM m{r}) || '][' ||
                 (SELECT rhs FROM m{r}) || ']',
                 '[' || (SELECT lhs || rhs FROM m{r}) || ']') AS s
  FROM e{r - 1}
)"""
        )
    return "WITH " + ctes.rstrip().rstrip(",") + ",\n" + ",\n".join(enc)


def _bpe_encode_sql() -> str:
    """Unrolled oracle: train CTEs + symbolize/replace chain, then the
    per-doc token count and compression ratio."""
    last = f"e{BPE_MERGE_ROUNDS}"
    return (
        _bpe_train_and_enc_ctes()
        + f"""
SELECT doc_id, n_words, n_chars, n_tokens_bpe,
       CAST(CASE WHEN n_tokens_bpe > 0
                 THEN (10000 * n_chars) // n_tokens_bpe ELSE 0 END
            AS BIGINT) AS cpt_e4
FROM (
  SELECT doc_id, n_words, n_chars,
         CAST(length(s) - length(replace(s, '[', '')) AS BIGINT)
         AS n_tokens_bpe
  FROM {last}
)"""
    )


def _bpe_merges_sql() -> str:
    parts = [
        r"""w0 AS (
  SELECT regexp_replace(w, '(.)', '[\1]', 'g') AS s
  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  x -> x != '')) AS w FROM documents)
  WHERE length(w) >= 2
)"""
    ]
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        parts.append(
            f"""p{r} AS (
  SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT unnest([{{'lhs': y[i], 'rhs': y[i + 1]}}
                   for i in generate_series(1, len(y) - 1)],
                  recursive := true)
    FROM (SELECT string_split(substr(s, 2, length(s) - 2), '][') AS y
          FROM w{r - 1})
  ) GROUP BY 1, 2
),
m{r} AS (SELECT lhs, rhs, cnt FROM p{r} ORDER BY cnt DESC, lhs, rhs LIMIT 1)"""
        )
        if r < BPE_MERGE_ROUNDS:
            parts.append(
                f"""w{r} AS (
  SELECT replace(s,
                 '[' || (SELECT lhs FROM m{r}) || '][' ||
                 (SELECT rhs FROM m{r}) || ']',
                 '[' || (SELECT lhs || rhs FROM m{r}) || ']') AS s
  FROM w{r - 1}
)"""
            )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, lhs, rhs,"
        f" lhs || rhs AS merged, cnt FROM m{r}"
        for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel


# --- training-sequence packing ----------------------------------------------------
#
# GPT-style sequence packing: the corpus is (logically) concatenated in a
# deterministic order and sliced into fixed PACK_BUDGET-token training
# sequences; each document is assigned to the pack its FIRST token lands in
# (documents may straddle pack boundaries — the standard concat-and-chunk
# recipe, which wastes zero tokens on padding). The running offset is a
# window cumulative sum PARTITIONED BY source: packing is per-source, so at
# 100 TB this is one hash exchange on `source` + a per-partition sort — no
# global total order, and a skewed mega-source can be salted into
# sub-streams exactly like the crawl's salted pop. Token counts reuse
# ``token_count``'s BPE-ish estimator so the two operators agree.

PACK_BUDGET = 2048

_BPE_EXPR = (
    r"aggregate(filter(split(text, '\\s+'), x -> x != ''),"
    r" 0L, (acc, x) -> acc + cast(ceil(length(x) / 4.0) as long))"
)

# DuckDB equivalent of _BPE_EXPR (shared with pipeline.corpus_pipeline_apply)
BPE_DUCK = (
    r"CAST(list_sum(list_transform("
    r"list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''), "
    r"x -> cast(ceil(length(x) / 4.0) as bigint))) AS BIGINT)"
)


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    t = d.select("doc_id", "source", F.expr(_BPE_EXPR).alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"cast(start div {PACK_BUDGET} as int)").alias("pack_id"),
        F.col("start").__mod__(PACK_BUDGET).cast("long").alias("pack_off"),
    )


PACK_SEQUENCES_SQL = rf"""
WITH t AS (
  SELECT doc_id, source,
         CAST(list_sum(list_transform(
             list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''),
             x -> cast(ceil(length(x) / 4.0) as bigint))) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM t
)
SELECT doc_id, source, n_tokens,
       cast(start // {PACK_BUDGET} AS int) AS pack_id,
       cast(start % {PACK_BUDGET} AS bigint) AS pack_off
FROM s
"""


def pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack rollup of the packing plan: how many documents START in each
    (source, pack), their token mass, and the fill in basis points —
    integer-exact (no FP accumulation order) like source_quality_rollup.
    One map-side-combined aggregate over ``pack_sequences``."""
    p = pack_sequences(spark, sf_dir)
    return (
        p.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .withColumn(
            "fill_bp",
            F.expr(f"cast((pack_tokens * 10000) div {PACK_BUDGET} as bigint)"),
        )
    )


PACK_MANIFEST_SQL = (
    "WITH packs AS (" + PACK_SEQUENCES_SQL.strip() + ")\n"
    + f"""
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS bigint) AS pack_tokens,
       min(doc_id) AS first_doc,
       cast((CAST(sum(n_tokens) AS bigint) * 10000) // {PACK_BUDGET} AS bigint)
           AS fill_bp
FROM packs
GROUP BY source, pack_id
"""
)


def pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing under the TRAINED tokenizer — the end-to-end
    pretraining data path: ``bpe_merges`` learns the merge table,
    ``_bpe_token_count_col`` prices every document in REAL trained-
    tokenizer tokens (not the ceil(len/4) heuristic ``pack_sequences``
    uses), and the same per-source cumulative-sum window assigns each
    document to the fixed ``PACK_BUDGET``-token pack its first token lands
    in.

    Scale shape: identical to ``pack_sequences`` — the token pricing is a
    map-only projection (trained rules are plan literals), so the ONLY
    exchange is the source-keyed window hash partitioning; no global sort,
    no join. Swapping the tokenizer changed the cost model, not the plan.
    """
    from pyspark.sql import Window

    rules = _train_bpe(spark, sf_dir)
    d = _docs(spark, sf_dir)
    t = d.withColumn("ws", _bpe_words_col()).select(
        "doc_id",
        "source",
        _bpe_token_count_col(rules).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"cast(start div {PACK_BUDGET} as int)").alias("pack_id"),
        F.col("start").__mod__(PACK_BUDGET).cast("long").alias("pack_off"),
    )


def _pack_sequences_bpe_sql() -> str:
    """Oracle composition: the shared BPE train+encode CTE chain (with
    ``source`` carried through) feeding ``pack_sequences``'s window —
    neither half can drift from its standalone query."""
    last = f"e{BPE_MERGE_ROUNDS}"
    return (
        _bpe_train_and_enc_ctes(carry=", source")
        + f""",
t AS (
  SELECT doc_id, source,
         CAST(length(s) - length(replace(s, '[', '')) AS BIGINT) AS n_tokens
  FROM {last}
),
cum AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS start
  FROM t
)
SELECT doc_id, source, n_tokens,
       cast(start // {PACK_BUDGET} AS int) AS pack_id,
       cast(start % {PACK_BUDGET} AS bigint) AS pack_off
FROM cum
"""
    )


# --- repetition signals -------------------------------------------------------
#
# Gopher-style (Rae et al. 2021, table A1) repetition-quality signals:
# duplicate-word fraction and most-frequent-word-bigram fraction, both as
# integer basis points (no FP accumulation-order nondeterminism, like
# source_quality_rollup). The reference corpus has no newlines, so the
# line-dup variant would be vacuous here; the word/bigram signals have real
# spread (distinct-word ratio 0.28-1.0 on the synthetic docs).
#
# Scale shape: the per-word stats are a narrow projection; the bigram mode
# needs one (doc_id, bigram) hash aggregate, one (doc_id) rollup, and a
# doc_id equi-join back — all key-partitioned, no all-pairs anywhere. At
# 100 TB the bigram explode is the dominant row multiplier (n_words-1 rows
# per doc), which is the same multiplier every shingle operator here
# already carries.

_BP = "CAST(10000 AS BIGINT)"


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    base = (
        d.select(
            "doc_id",
            F.expr(r"filter(split(text, '\\s+'), x -> x != '')").alias("w"),
        )
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_words"),
            F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct_words"),
            F.expr(
                "CASE WHEN size(w) >= 2 THEN"
                " transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))"
                " ELSE cast(array() as array<string>) END"
            ).alias("bg"),
        )
    )
    bg_stats = (
        base.select("doc_id", F.explode("bg").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"), F.sum("c").alias("n_bg"))
    )
    return (
        base.drop("bg")
        .join(bg_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.expr(
                f"cast(({_BP} * (n_words - n_distinct_words))"
                " div greatest(n_words, 1) as bigint)"
            ).alias("dup_word_bp"),
            F.coalesce(
                F.expr(f"cast(({_BP} * max_c) div n_bg as bigint)"),
                F.lit(0).cast("bigint"),
            ).alias("top_bigram_bp"),
        )
    )


REPETITION_SQL = rf"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS w
  FROM documents
),
base AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
         CASE WHEN len(w) >= 2
              THEN list_transform(generate_series(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i+1])
              ELSE [] END AS bg
  FROM w
),
bgc AS (
  SELECT doc_id, max(c) AS max_c, CAST(sum(c) AS BIGINT) AS n_bg FROM (
    SELECT doc_id, b, count(*) AS c
    FROM (SELECT doc_id, unnest(bg) AS b FROM base)
    GROUP BY doc_id, b
  ) GROUP BY doc_id
)
SELECT base.doc_id, n_words,
       CAST(({_BP} * (n_words - n_distinct_words))
            // greatest(n_words, 1) AS BIGINT) AS dup_word_bp,
       COALESCE(CAST(({_BP} * max_c) // n_bg AS BIGINT), 0) AS top_bigram_bp
FROM base LEFT JOIN bgc ON base.doc_id = bgc.doc_id
"""


# --- PII scrubbing ------------------------------------------------------------
#
# Email/phone redaction for training corpora. The synthetic docs contain no
# '@' or digits, so (like embedding_neardup's planted copies) a
# deterministic contact line is planted into every 20th document in BOTH
# engines — the operator's fixture, not its semantics. Redaction itself is
# a narrow zero-exchange projection (regexp_replace / regexp_count are
# whole-stage-codegen JVM expressions); the regex subset is shared
# Java/RE2 so both engines match the exact same spans.

_PII_MOD = 20
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"


def _docs_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" today."),
    )
    return d.withColumn(
        "text",
        F.when(F.col("doc_id") % _PII_MOD == 0, planted).otherwise(F.col("text")),
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_pii(spark, sf_dir)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("clean_text"),
    )


PII_SCRUB_SQL = rf"""
WITH pii AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_PII_MOD} = 0
              THEN text || ' Contact user' || doc_id
                   || '@example.com or call 555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today.'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM pii
"""


# --- token-length distribution -----------------------------------------------
#
# Corpus-shape diagnostic: per-source histogram of whitespace token counts
# in log2 buckets. The bucket index is derived from the BINARY STRING
# length of the count (length(conv(n, 10, 2)) - 1 == floor(log2(n)) for
# n >= 1) instead of floor(log2(n)) — libm log rounding is not guaranteed
# identical across engines at exact powers of two, string length is.
# share_bp is pure integer arithmetic ((10000 * n) div total).
#
# Scale shape: one narrow projection + one map-side-combined aggregate;
# the per-source share join is a broadcast of a bucket-count-sized table.


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n = F.expr(r"size(filter(split(text, '\\s+'), x -> x != ''))")
    bucket = F.expr(
        r"cast(length(conv(cast(size(filter(split(text, '\\s+'), x -> x != ''))"
        r" as string), 10, 2)) - 1 as bigint)"
    )
    counts = (
        d.select("source", n.alias("n"), bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    totals = counts.groupBy("source").agg(F.sum("n_docs").alias("_tot"))
    return counts.join(F.broadcast(totals), "source").select(
        "source",
        "bucket",
        "n_docs",
        F.expr("(10000 * n_docs) div _tot").alias("share_bp"),
    )


LENGTH_HISTOGRAM_SQL = r"""
WITH c AS (
  SELECT source,
         CAST(length(printf('%b',
                len(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x != '')))) - 1 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
)
SELECT source, bucket, n_docs,
       CAST((10000 * n_docs) // CAST(sum(n_docs) OVER (PARTITION BY source)
            AS BIGINT) AS BIGINT) AS share_bp
FROM c
"""


# --- unicode sanitize (ftfy-style fixer audit) ---------------------------------
#
# Every web-scale corpus pipeline runs an encoding fixer before anything
# else (ftfy / CCNet's pre-clean): strip control characters and U+FFFD
# replacement chars, repair the classic UTF-8-bytes-read-as-cp1252
# mojibake digraphs. The corpus fixture is clean ASCII, so the audit
# plants its own corruption deterministically in-plan (the manifest_diff
# pattern — no external data): docs with doc_id % SANITIZE_EVERY ==
# SANITIZE_PHASE get a BEL control char, one U+FFFD and one mojibake
# token of each repaired digraph prepended, exercising every fix path.
#
# Scale shape: map-only — one codegen projection, NO exchange and NO join
# anywhere (plan-pinned); the fix chain and all counts are string
# built-ins. At 100 TB this is the cheapest pass in the pipeline, which
# is why it runs first.

SANITIZE_EVERY = 37
SANITIZE_PHASE = 3
# mojibake digraphs repaired: UTF-8 bytes of é (C3 A9) and ’ (E2 80 99)
# decoded as cp1252 — 'Ã©' and 'â€™'
_MOJI_E = "Ã©"
_FIX_E = "é"
_MOJI_APOS = "â€™"
_FIX_APOS = "’"
_SAN_CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
# planted prefix: BEL + 'café' mojibake + U+FFFD + 'don’t' mojibake
_SAN_PLANT = "\x07caf" + _MOJI_E + " � don" + _MOJI_APOS + "t "
# what the planted prefix must sanitize to (U+FFFD removal leaves the
# double space — the sanitizer repairs encoding, it does not re-space)
SAN_PLANT_FIXED = "café  don’t "


def unicode_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    corrupted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % SANITIZE_EVERY == SANITIZE_PHASE,
            F.concat(F.lit(_SAN_PLANT), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )

    def occurrences(sig: str) -> F.Column:
        return (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(sig))))
            / F.lit(len(sig))
        ).cast("long")

    clean = F.regexp_replace(
        F.replace(
            F.replace(
                F.replace(F.col("text"), F.lit(_MOJI_E), F.lit(_FIX_E)),
                F.lit(_MOJI_APOS),
                F.lit(_FIX_APOS),
            ),
            F.lit("�"),
        ),
        _SAN_CTRL_RE,
        "",
    )
    return corrupted.select(
        "doc_id",
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), _SAN_CTRL_RE, ""))
        )
        .cast("long")
        .alias("n_ctrl"),
        occurrences("�").alias("n_repl"),
        (occurrences(_MOJI_E) + occurrences(_MOJI_APOS)).alias("n_moji"),
        (clean != F.col("text")).cast("long").alias("changed"),
        F.length(clean).cast("long").alias("n_chars_clean"),
        clean.alias("clean_text"),
    )


UNICODE_SANITIZE_SQL = f"""
WITH corrupted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {SANITIZE_EVERY} = {SANITIZE_PHASE}
              THEN chr(7) || 'caf{_MOJI_E} ' || chr(65533) ||
                   ' don{_MOJI_APOS}t ' || text
              ELSE text END AS text
  FROM documents
),
fixed AS (
  SELECT doc_id, text,
         regexp_replace(
           replace(replace(replace(text, '{_MOJI_E}', '{_FIX_E}'),
                           '{_MOJI_APOS}', '{_FIX_APOS}'),
                   chr(65533), ''),
           '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g') AS clean
  FROM corrupted
)
SELECT doc_id,
       CAST(length(text) - length(regexp_replace(text,
            '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')) AS BIGINT)
           AS n_ctrl,
       CAST(length(text) - length(replace(text, chr(65533), '')) AS BIGINT)
           AS n_repl,
       CAST((length(text) - length(replace(text, '{_MOJI_E}', ''))) // 2
          + (length(text) - length(replace(text, '{_MOJI_APOS}', ''))) // 3
            AS BIGINT) AS n_moji,
       CAST(CASE WHEN clean <> text THEN 1 ELSE 0 END AS BIGINT) AS changed,
       CAST(length(clean) AS BIGINT) AS n_chars_clean,
       clean AS clean_text
FROM fixed
"""


QUERIES = {
    "lang_id": lang_id,
    "quality_score": quality_score,
    "quality_filter_apply": quality_filter_apply,
    "quality_ablation": quality_ablation,
    "gopher_rules": gopher_rules,
    "filter_stack_agreement": filter_stack_agreement,
    "token_topk": token_topk,
    "ngram_lm_topk": ngram_lm_topk,
    "bpe_first_merges": bpe_first_merges,
    "bpe_merges": bpe_merges,
    "bpe_encode": bpe_encode,
    "pack_sequences_bpe": pack_sequences_bpe,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
    "spans_interleave": spans_interleave,
    "contamination_ngram": contamination_ngram,
    "contamination_bloom": contamination_bloom,
    "decontaminate_apply": decontaminate_apply,
    "source_quality_rollup": source_quality_rollup,
    "corpus_datasheet": corpus_datasheet,
    "pack_sequences": pack_sequences,
    "pack_manifest": pack_manifest,
    "repetition_stats": repetition_stats,
    "pii_scrub": pii_scrub,
    "length_histogram": length_histogram,
    "unicode_sanitize": unicode_sanitize,
}

ORACLES = {
    "lang_id": LANG_ID_SQL,
    "quality_score": QUALITY_SQL,
    "quality_filter_apply": QUALITY_FILTER_SQL,
    "quality_ablation": QUALITY_ABLATION_SQL,
    "gopher_rules": GOPHER_RULES_SQL,
    "filter_stack_agreement": FILTER_STACK_AGREEMENT_SQL,
    "token_topk": TOKEN_TOPK_SQL,
    "ngram_lm_topk": NGRAM_LM_TOPK_SQL,
    "bpe_first_merges": BPE_FIRST_MERGES_SQL,
    "bpe_merges": _bpe_merges_sql(),
    "bpe_encode": _bpe_encode_sql(),
    "pack_sequences_bpe": _pack_sequences_bpe_sql(),
    "token_count": TOKEN_COUNT_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "spans_interleave": SPANS_INTERLEAVE_SQL,
    "contamination_ngram": CONTAMINATION_SQL,
    "contamination_bloom": CONTAM_BLOOM_SQL,
    "decontaminate_apply": DECONTAMINATE_SQL,
    "source_quality_rollup": SOURCE_ROLLUP_SQL,
    "corpus_datasheet": CORPUS_DATASHEET_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "pack_manifest": PACK_MANIFEST_SQL,
    "repetition_stats": REPETITION_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "length_histogram": LENGTH_HISTOGRAM_SQL,
    "unicode_sanitize": UNICODE_SANITIZE_SQL,
}
