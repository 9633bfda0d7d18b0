"""Structured Streaming surface.

The reference is strictly batch (one blocking request at a time,
forum_dl/session.py:171–187), but this engine's checkpoint layout — one
append-only ``parsed`` parquet delta per superstep — IS a file-source
stream: a downstream consumer can tail a live crawl without touching the
crawl loop. Three streaming operators, each verified against its batch
equivalent (stream result == batch result on the same input, the strongest
oracle a stream can have):

- :func:`stream_post_counts` — event-time windowed aggregation with a
  watermark over the crawl's post items (documents-per-hour while the
  crawl runs).
- :func:`stream_sessionize` — custom stateful sessionization with
  ``applyInPandasWithState`` over the events table, same session rule as
  the batch ``events_sessionize`` operator (30-min gap).
- :func:`stream_dedup_exact` — first-seen exact dedup keyed on the batch
  ``dedup_exact`` fingerprint (``dropDuplicates`` state across
  micro-batches; ``dropDuplicatesWithinWatermark`` is the unbounded-feed
  variant).

Both use ``Trigger.AvailableNow`` in tests (process everything, then stop)
so results are deterministic; on a live crawl the same queries run with a
processing-time trigger and the watermark bounds state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import schemas

SESSION_GAP_MIN = 30  # same rule as operators.relational.events_sessionize


def stream_post_counts(spark: SparkSession, workdir: str) -> DataFrame:
    """Streaming DataFrame: posts per 1-hour event-time window per engine,
    with a 2-hour watermark for late items. Source = the crawl's parsed
    deltas (append-only parquet under ``steps/*/parsed``)."""
    src = (
        spark.readStream.schema(schemas.PARSED)
        .option("recursiveFileLookup", "false")
        .parquet(f"{workdir}/steps/*/parsed")
    )
    posts = src.filter(
        (F.col("rec") == "item")
        & (F.col("type") == "post")
        & F.col("creation_time").isNotNull()
    )
    return (
        posts.withWatermark("creation_time", "2 hours")
        .groupBy(F.window("creation_time", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_posts"))
        .select(F.col("w.start").alias("hour"), "n_posts")
    )


_SESSION_OUT = "user_id LONG, n_sessions LONG, n_events LONG"
_SESSION_STATE = "last_ts DOUBLE, n_sessions LONG, n_events LONG"


def _sessionize_group(key, pdf_iter, state: GroupState):
    """Per-user session counter: a new session starts when the gap since
    the previous event exceeds SESSION_GAP_MIN (same rule as the batch
    operator). State carries (last event time, session count, event count)
    across micro-batches."""
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    gap = SESSION_GAP_MIN * 60
    for pdf in pdf_iter:
        for ts in sorted(pdf["ts_sec"]):
            if last_ts is None or ts - last_ts > gap:
                n_sessions += 1
            last_ts = float(ts)
            n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def stream_sessionize(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming sessionization over the events table with
    ``applyInPandasWithState`` (update mode: each micro-batch emits the
    current per-user totals; the final batch's rows equal the batch
    operator's output).

    Caveat (documented, inherent to per-batch streaming): events must
    arrive in per-user timestamp order ACROSS micro-batches for the gap
    rule to be exact — within a batch they are sorted here. AvailableNow
    over a single input file satisfies this; a production deployment would
    watermark + buffer out-of-order events before the stateful stage."""
    import os

    # the file-stream source needs a DIRECTORY; point it at the parent with
    # a glob filter so a single-file table works too
    base, name = os.path.dirname(events_path), os.path.basename(events_path)
    src = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
            " value DOUBLE, props STRING"
        )
        .option("pathGlobFilter", name)
        .parquet(base)
    )
    ev = src.select(
        "user_id", F.unix_timestamp("ts").cast("double").alias("ts_sec")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a file stream (micro-batched parquet read)."""
    return (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_dedup_exact(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """Streaming exact dedup: emit each content fingerprint the first time
    it is seen (``dropDuplicates`` keeps first-arrival state across
    micro-batches), keyed on the same normalized-text fingerprint as the
    batch ``dedup_exact``. Output is the fingerprint alone, so the result
    is the arrival-order-independent distinct SET — comparable 1:1 with
    the batch distinct. A pure first-seen dedup of its input: ``source``
    (default: the sf_dir documents stream) is deduped as-is — tests that
    need guaranteed duplicates plant them in the fixture feed they pass
    in, never here.

    Scale note: bare ``dropDuplicates`` state grows with the distinct-key
    count; on an unbounded feed use ``dropDuplicatesWithinWatermark`` with
    an event-time column so keys age out — same plan shape, bounded
    state."""
    src = source if source is not None else docs_stream(spark, sf_dir)
    norm = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return src.select(norm.alias("fingerprint")).dropDuplicates(["fingerprint"])


def stream_quality_filter(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """The C4 quality gate in the STREAMING ingest path: the exact same
    ``qf_keep_cond`` Column the batch ``quality_filter_apply`` uses,
    applied to the documents stream — map-only, so the streaming query is
    STATELESS (no state store, no watermark needed; each micro-batch
    filters independently) and drained-stream == batch is exact by
    construction. This is the operator that lets a crawl's parsed deltas
    be quality-gated as they land instead of in a nightly batch pass."""
    from ..operators.textops import qf_keep_cond

    src = source if source is not None else docs_stream(spark, sf_dir)
    return src.filter(qf_keep_cond()).select(
        "doc_id", "lang", "source", "n_chars"
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    input_bytes: int | None = None,
) -> DataFrame:
    """Drain the stream with AvailableNow into a memory sink; return the
    result table (deterministic: processes all existing input, then stops).
    In update mode the memory sink accumulates every batch's emissions —
    callers take the last row per key (the emitted totals are monotone).

    ``input_bytes`` (when the caller knows the bounded input's size) sizes
    the STATE exchange: streaming state partitioning is fixed at query
    start from ``spark.sql.shuffle.partitions`` and AQE cannot coalesce it
    afterwards, so a stateful drain of a small bounded input otherwise
    pays per-partition state-store + Python-worker setup for dozens of
    near-empty state partitions (measured: the sessionize drain at the
    gate sf dropped 17 s -> 2 s going 64 -> right-sized partitions). The
    partition count is ceil(input_bytes / the session's AQE advisory
    partition size) clamped to [1, current shuffle partitions] — the same
    sizing rule AQE applies to batch exchanges, so it grows with the data,
    not with the local core count."""
    spark = stream_df.sparkSession
    prev = None
    if input_bytes:
        advisory = _advisory_bytes(spark)
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        parts = max(1, min(cur, -(-input_bytes // advisory)))
        if parts < cur:
            prev = cur
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(prev))
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def _advisory_bytes(spark: SparkSession) -> int:
    """The session's AQE advisory partition size, in bytes (default 64 MB)."""
    raw = str(
        spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"
        )
    ).strip().lower()
    if raw.endswith("b"):  # "64mb"/"64kb"/plain "...b" byte-suffix forms
        raw = raw[:-1]
    units = {"k": 1024, "m": 1024**2, "g": 1024**3}
    if raw and raw[-1] in units:
        return int(float(raw[:-1])) * units[raw[-1]]
    return int(raw or "67108864")
