"""Multimodal column plumbing — binary payloads with typed metadata.

Image/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct, exactly as a 100 TB training-data pipeline would: the
Spark-side plumbing (schema, batched Arrow transfer, ``mapInPandas``
signature, partitioning) is real and tested; the actual codec step is
STUBBED behind ``decode_image`` (the image/audio libraries are not in this
container) with a deterministic fake so results are verifiable.

The synthetic payloads derive from ``md5`` so the pipeline is pure:
``payload(vec_id) = md5(vec_id) * N`` bytes tagged ``image/png``.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content_type", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_sum", LongType(), False),
        StructField("byte_mean_e4", LongType(), False),
        StructField("phash", StringType(), False),
        StructField("thumb_w", LongType(), False),
        StructField("thumb_h", LongType(), False),
    ]
)


def decode_image(payload: bytes) -> "object":
    """REAL decode would go through PIL/libvips here — not available in this
    container. Raises so callers must opt into the deterministic fake."""
    raise NotImplementedError("image codecs not available in this container")


def synth_media(spark: SparkSession, sf_dir: str, n_rows: int = 200) -> DataFrame:
    """Deterministic fake media table (binary payload per id)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                h = hashlib.md5(f"media:{int(mid)}".encode()).digest()
                payload = (h * (16 + int(mid) % 16))[: 256 + int(mid) % 256]
                rows.append(
                    {
                        "media_id": int(mid),
                        "content_type": "image/png" if mid % 3 else "image/jpeg",
                        "payload": payload,
                        "width": 64 + int(mid) % 64,
                        "height": 48 + int(mid) % 48,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n_rows).repartition(4).mapInPandas(gen, MEDIA_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: mapInPandas over binary payloads.

    Uses the deterministic fake featureizer — the Arrow batch shape and
    UDF signature are exactly what a real decoder would use. Every output
    is chosen to be INTEGER-EXACT or hash-exact so a DuckDB closed-form
    oracle can replay it over the md5-derived payload spec: byte_sum /
    byte_mean_e4 (= 10000*sum // n, integer floor — no FP rounding-tie
    nondeterminism between engines) and phash = md5 of the payload's HEX
    encoding (DuckDB 1.0 has no md5(BLOB) / blob substring, and the hex
    string of the repeated-digest payload is closed-form in SQL).
    """
    media = synth_media(spark, sf_dir)

    def featurize(batches):
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            # numpy view over each buffer — no per-byte Python loop
            sums = [
                int(np.frombuffer(p, dtype=np.uint8).sum()) if len(p) else 0
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content_type": pdf["content_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "byte_mean_e4": pd.Series(
                        [
                            (10000 * s) // n if n else 0
                            for s, n in zip(sums, n_bytes)
                        ],
                        dtype="int64",
                    ),
                    "phash": [
                        hashlib.md5(bytes(p).hex().encode()).hexdigest()[:16]
                        for p in payloads
                    ],
                    "thumb_w": np.minimum(pdf["width"], 32).astype("int64"),
                    "thumb_h": np.minimum(pdf["height"], 32).astype("int64"),
                },
                columns=[f.name for f in FEATURES_SCHEMA.fields],
            )

    return media.mapInPandas(featurize, FEATURES_SCHEMA)


def crawl_discourse_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny end-to-end crawl returning the interleaved-spans documents table
    (the north-rule payload) — registered rows-only (no SQL oracle: the
    crawl is iterative/stateful, not SQL-expressible)."""
    import tempfile

    from ..crawl import CrawlConfig, run_crawl
    from ..fixtures import SyntheticDiscourse

    srv = SyntheticDiscourse(
        seed=7, n_cats=1, n_subcats=1, n_topics=2, max_posts=25, topics_per_page=2,
        duplicate_topic=False,
    )
    wd = tempfile.mkdtemp(prefix="crawl_smoke_")
    res = run_crawl(spark, srv, "https://forum.example/", wd, CrawlConfig())
    docs = res.documents()
    return docs.select(
        "doc_id",
        F.expr("size(spans)").alias("n_spans"),
        F.expr("size(filter(spans, s -> s.kind = 'media'))").alias("n_media"),
        F.expr("concat_ws('|', transform(spans, s -> s.kind))").alias("kind_seq"),
    )


def crawl_phpbb_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny phpBB crawl returning the completed file items — exercises the
    HtmlExtractor file pipeline (stub emission + dedup'd downloads + body
    join) through the driver gate. Rows-only (iterative crawl)."""
    import tempfile

    from ..crawl import CrawlConfig, run_crawl
    from ..fixtures.phpbb import SyntheticPhpbb

    srv = SyntheticPhpbb(seed=11, n_cats=1, n_subs=1, n_topics=2, max_posts=3)
    wd = tempfile.mkdtemp(prefix="crawl_phpbb_")
    res = run_crawl(spark, srv, "https://phpbb.example/", wd, CrawlConfig())
    return res.items().filter(F.col("type") == "file").select(
        "url",
        "content_type",
        F.length(F.col("content_bytes")).alias("n_bytes"),
        F.array_join(F.col("subpath"), "|").alias("subpath_key"),
    )


QUERIES = {
    "media_features": media_features,
    "crawl_discourse_spans": crawl_discourse_spans,
    "crawl_phpbb_files": crawl_phpbb_files,
}

# media_features IS oracle-able: the fake featurizer is a closed form over
# md5('media:'||id), so DuckDB replays payload construction symbolically —
# hex(payload) = (hexdigest * reps)[:2*n_bytes] and per-byte stats come from
# the 16 digest bytes (full repeats + remainder prefix). The two crawl
# smokes stay rows-only (iterative stateful crawl, not SQL-expressible).
ORACLES: dict[str, str] = {
    "media_features": """
WITH m AS (
  SELECT id AS media_id,
         CASE WHEN id % 3 <> 0 THEN 'image/png' ELSE 'image/jpeg' END
           AS content_type,
         md5('media:' || id) AS hexd,
         16 + id % 16 AS reps,
         256 + id % 256 AS cap,
         64 + id % 64 AS width,
         48 + id % 48 AS height
  FROM range(0, 200) t(id)
),
b AS (
  SELECT *,
         LEAST(16 * reps, cap) AS n_bytes,
         list_transform(range(0, 16),
           i -> CAST(concat('0x', substring(hexd, 2 * i + 1, 2)) AS BIGINT))
           AS bytes16
  FROM m
),
s AS (
  SELECT *,
         CAST((n_bytes // 16) * list_sum(bytes16)
              + COALESCE(list_sum(bytes16[1:(n_bytes % 16)]), 0) AS BIGINT)
           AS byte_sum
  FROM b
)
SELECT media_id,
       content_type,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       byte_sum,
       CAST((10000 * byte_sum) // n_bytes AS BIGINT) AS byte_mean_e4,
       substring(md5(substring(repeat(hexd, reps), 1, 2 * n_bytes)), 1, 16)
         AS phash,
       CAST(LEAST(width, 32) AS BIGINT) AS thumb_w,
       CAST(LEAST(height, 32) AS BIGINT) AS thumb_h
FROM s
""",
}
