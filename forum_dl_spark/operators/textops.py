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


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


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


QUERIES = {
    "lang_id": lang_id,
    "quality_score": quality_score,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
    "spans_interleave": spans_interleave,
}

ORACLES = {
    "lang_id": LANG_ID_SQL,
    "quality_score": QUALITY_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "spans_interleave": SPANS_INTERLEAVE_SQL,
}
