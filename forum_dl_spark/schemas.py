"""Spark schemas for all engine tables (FIXTURES.md §1-3).

Design notes for 100 TB scale:

- ``frontier``/``seen`` are partitioned by a hash shard column
  (``shard = pmod(xxhash64(seen_key), N_SHARDS)``) so the seen anti-join is a
  co-partitioned shuffle and partition pruning applies on point lookups.
- ``ord`` is a fixed-width-per-level hex string: each tree level appends 8
  hex chars, so plain string ordering == pre-order DFS == the reference's
  sequential crawl order. It composes at discovery time from the parent's
  key + the child's document-order index, never from physical row order.
- ``state`` is a ``map<string,string>`` (engine pagination extras, e.g. the
  remaining Discourse post-id stream, reference
  forum_dl/extractors/discourse.py:14-15) — Arrow-safe, avoids ragged
  structs.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Number of hash shards for seen/frontier partitioning. At 10^10 URLs this
# would be sized to ~2-4x total cluster cores (e.g. 8192); for local[32]
# tests a small power of two keeps files small.
N_SHARDS_DEFAULT = 32

SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
    ]
)

FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("params", StringType(), True),  # canonical urlencoded, "" if none
        StructField("seen_key", StringType(), False),
        StructField("host", StringType(), False),
        StructField("engine", StringType(), False),
        StructField("kind", StringType(), False),  # board|board_page|thread_page|post_page|seed
        StructField("path", ArrayType(StringType()), True),
        StructField("page", IntegerType(), False),
        StructField("state", MapType(StringType(), StringType()), True),
        StructField("priority", IntegerType(), False),  # kind rank; boards<threads<posts
        StructField("ord", StringType(), False),  # deterministic crawl-order key
        StructField("attempt", IntegerType(), False),
        StructField("should_retry", IntegerType(), False),  # bool as int (Arrow-safe)
    ]
)

SEEN = StructType(
    [
        StructField("seen_key", StringType(), False),
        StructField("url", StringType(), False),
        StructField("status", StringType(), False),  # ok|failed
        StructField("superstep", IntegerType(), False),
        # one-shot cache-eviction quirk (session.py:105-111): evicted keys
        # are excluded from the FINAL seen set but still gate re-fetches
        StructField("evict", IntegerType(), False),
    ]
)

PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("params", StringType(), True),
        StructField("status_code", IntegerType(), False),
        StructField("content_type", StringType(), True),
        StructField("body", BinaryType(), True),
        StructField("ord", StringType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("superstep", IntegerType(), False),
        StructField("engine", StringType(), False),
        StructField("kind", StringType(), False),
    ]
)

ITEMS = StructType(
    [
        StructField("type", StringType(), False),  # board|thread|post|file
        StructField("path", ArrayType(StringType()), False),
        StructField("subpath", ArrayType(StringType()), True),
        StructField("url", StringType(), False),
        StructField("origin", StringType(), True),
        StructField("title", StringType(), True),
        StructField("author", StringType(), True),
        StructField("creation_time", TimestampType(), True),
        StructField("content", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_bytes", BinaryType(), True),
        StructField("data", StringType(), True),  # raw engine JSON payload
        StructField("ord", StringType(), False),  # emission-order key
        StructField("spans", ArrayType(SPAN), True),  # posts only
    ]
)

HOST_BUDGETS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("max_fetches_per_superstep", IntegerType(), False),
        StructField("robots_disallow", ArrayType(StringType()), True),
        # seconds between fetches requested by robots Crawl-delay; enforced
        # by adaptive per-wave budgets + inter-wave sleep (politeness.py)
        StructField("crawl_delay", DoubleType(), True),
    ]
)

# Per-superstep metrics are written as metrics.json (see superstep._loop),
# not parquet — no StructType needed.

# Combined output schema of the fetch+parse mapInPandas stage. A single
# Arrow round-trip produces both item rows and next-frontier rows,
# discriminated by `rec`; the driver splits them with two cheap filters on a
# cached DataFrame (one Python->JVM transfer total).
PARSED = StructType(
    [StructField("rec", StringType(), False)]
    # item fields must be nullable here: frontier/page records leave them null
    + [StructField(f.name, f.dataType, True) for f in ITEMS.fields]
    + [
        # frontier-candidate columns (prefixed to avoid collisions)
        StructField("f_url", StringType(), True),
        StructField("f_params", StringType(), True),
        StructField("f_kind", StringType(), True),
        StructField("f_path", ArrayType(StringType()), True),
        StructField("f_page", IntegerType(), True),
        StructField("f_state", MapType(StringType(), StringType()), True),
        StructField("f_priority", IntegerType(), True),
        StructField("f_ord", StringType(), True),
        StructField("f_attempt", IntegerType(), True),
        StructField("f_should_retry", IntegerType(), True),
        # owning engine of the candidate (nullable: single-engine crawls may
        # leave it unset and fall back to the crawl's engine; shared-
        # frontier crawls REQUIRE it — children inherit their parent's)
        StructField("f_engine", StringType(), True),
        # page-lineage columns
        StructField("p_url", StringType(), True),
        StructField("p_params", StringType(), True),
        StructField("p_status", IntegerType(), True),
        StructField("p_content_type", StringType(), True),
        StructField("p_body", BinaryType(), True),
        StructField("p_kind", StringType(), True),
        StructField("p_attempt", IntegerType(), True),
        StructField("p_engine", StringType(), True),
        # reference one-shot cache-eviction quirk (session.py:105-111): a
        # should_cache=True page consumed exactly once vanishes from the
        # final seen set; flagged here so CrawlResult.seen() can exclude it
        # while internal anti-joins still see it
        StructField("p_seen_evict", IntegerType(), True),
    ]
)
