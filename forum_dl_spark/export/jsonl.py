"""JSONL export — the reference's Entry envelope, field-compatible.

Mirrors forum_dl/writers/jsonl.py:8-10 + the envelope construction at
writers/common.py:261-285: one JSON object per line with
``generator, version, extractor, download_time, type, item``; file bytes
are base64-encoded (the Entry JSON encoder, writers/common.py:59-61).

The primary sink of this engine is the columnar ``items``/``documents``
tables; JSONL is the verification export. Emission order = the reference's
writer order = sort by ``ord`` (crawl-order key). At verification scale the
export coalesces to one file; at 100 TB you would keep it partitioned by
ord ranges (each partition internally sorted — global order preserved by
file naming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GENERATOR = "forum-dl-spark"
VERSION = "0.1.0"


def items_to_entries(items: DataFrame, extractor: str,
                     download_time: str = "1970-01-01T00:00:00+00:00") -> DataFrame:
    """items → one JSON string per row (ordered by ord when written).

    ``download_time`` is pinned by default so exports are reproducible
    (the reference stamps wall-clock time per entry,
    writers/common.py:278 — non-deterministic by design; we default to a
    fixed stamp and let callers pass the real one).
    """
    item_struct = F.struct(
        F.col("path"),
        F.col("url"),
        F.col("origin"),
        F.coalesce(F.col("data"), F.lit("{}")).alias("data"),
        F.col("subpath"),
        F.col("title"),
        F.col("author"),
        F.date_format(F.col("creation_time"), "yyyy-MM-dd'T'HH:mm:ss").alias(
            "creation_time"
        ),
        F.col("content"),
        F.col("content_type"),
        F.base64(F.col("content_bytes")).alias("content_b64"),
    )
    entry = F.struct(
        F.lit(GENERATOR).alias("generator"),
        F.lit(VERSION).alias("version"),
        F.lit(extractor).alias("extractor"),
        F.lit(download_time).alias("download_time"),
        F.col("type"),
        item_struct.alias("item"),
    )
    return items.select(F.col("ord"), F.to_json(entry).alias("line"))


def export_jsonl(items: DataFrame, extractor: str, out_path: str) -> None:
    """Write the ordered JSONL verification export."""
    (
        items_to_entries(items, extractor)
        .orderBy("ord")
        .select("line")
        .coalesce(1)
        .write.mode("overwrite")
        .text(out_path)
    )


def export_warc_equivalent(pages: DataFrame, out_path: str) -> None:
    """WARC-equivalent fetch lineage (the reference tees every request into
    a WARC via warcio, forum_dl/session.py:37-46,171-179; warcio is not in
    this container, so the durable equivalent is the pages table itself:
    url, status, content type, body, attempt, trace ord)."""
    pages.select(
        "url", "params", "status_code", "content_type", "body", "ord", "attempt"
    ).write.mode("overwrite").parquet(out_path)
