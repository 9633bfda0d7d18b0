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
        StructField("n_bytes", IntegerType(), False),
        StructField("byte_mean", DoubleType(), False),
        StructField("phash", StringType(), False),
        StructField("thumb_w", IntegerType(), False),
        StructField("thumb_h", IntegerType(), False),
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

    Uses the deterministic fake featureizer (mean byte, length, md5-phash,
    thumbnail dims from a fixed resize rule) — the Arrow batch shape and
    UDF signature are exactly what a real decoder would use.
    """
    media = synth_media(spark, sf_dir)

    def featurize(batches):
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_type": pdf["content_type"],
                    "n_bytes": payloads.map(len),
                    # numpy view over each buffer — no per-byte Python loop
                    "byte_mean": [
                        round(float(np.frombuffer(p, dtype=np.uint8).mean()), 4)
                        if len(p)
                        else 0.0
                        for p in payloads
                    ],
                    "phash": [hashlib.md5(p).hexdigest()[:16] for p in payloads],
                    "thumb_w": np.minimum(pdf["width"], 32),
                    "thumb_h": np.minimum(pdf["height"], 32),
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

# rows-only checks: stateful/iterative or binary-payload ops, not
# SQL-expressible — the driver records the weaker rows-only check for these
ORACLES: dict[str, str] = {}
