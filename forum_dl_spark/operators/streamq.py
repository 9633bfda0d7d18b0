"""Driver-gate wrappers for the Structured Streaming operators.

Each wrapper drains its stream with an AvailableNow trigger into a memory
sink (``streaming.run_available_now``) and returns the drained result as a
batch DataFrame — so the streaming operators get a CORRECTNESS row like
every batch operator instead of living only in tests/test_streaming.py.
Two of the three are SQL-expressible (the drained stream equals a batch
query over the same table — stream==batch IS the oracle, here enforced by
DuckDB rather than a pytest assert):

- ``stream_dedup_exact_q``  → distinct normalized-text fingerprints
- ``stream_sessionize_q``   → final per-user session/event totals
- ``stream_post_counts``    → rows-only (streams a tiny crawl's parsed
  deltas; the input is produced by the iterative crawl, not a SQL view)

Memory-sink query names are suffixed with a module counter: a second
invocation in the same session must not collide with an active query name.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEQ = itertools.count()


def _input_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of the bounded drain input — sizes the state exchange
    (see streaming.run_available_now)."""
    import os

    try:
        return os.path.getsize(os.path.join(sf_dir, name))
    except OSError:
        return 0


def stream_dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drained streaming first-seen dedup == the batch distinct fingerprint
    set (arrival-order-independent, so directly hash-comparable)."""
    from ..streaming import run_available_now, stream_dedup_exact

    res = run_available_now(
        stream_dedup_exact(spark, sf_dir),
        f"gate_stream_dedup_{next(_SEQ)}",
        "append",
        input_bytes=_input_bytes(sf_dir, "documents.parquet"),
    )
    return res.select("fingerprint")


STREAM_DEDUP_SQL = r"""
SELECT DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def stream_sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drained streaming sessionization: the update-mode memory sink
    accumulates every micro-batch's emissions; totals are monotone per
    user, so the max-n_events row per user is the final state and equals
    the batch ``events_sessionize`` output."""
    from pyspark.sql import Window

    from ..streaming import run_available_now, stream_sessionize

    res = run_available_now(
        stream_sessionize(spark, f"{sf_dir}/events.parquet"),
        f"gate_stream_sessions_{next(_SEQ)}",
        "update",
        input_bytes=_input_bytes(sf_dir, "events.parquet"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        res.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "n_events")
    )


def stream_quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drained streaming quality filter == the batch quality_filter_apply
    (stateless map-only stream, so equality is exact by construction; the
    oracle IS the batch operator's SQL — anti-drift by reuse)."""
    from ..streaming import run_available_now, stream_quality_filter

    res = run_available_now(
        stream_quality_filter(spark, sf_dir),
        f"gate_stream_qf_{next(_SEQ)}",
        "append",
    )
    return res.select("doc_id", "lang", "source", "n_chars")


def stream_post_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny crawl + streamed windowed post counts over its parsed deltas —
    rows-only (the stream source is the crawl's output, not a SQL view)."""
    import tempfile

    from ..crawl import CrawlConfig, run_crawl
    from ..fixtures.phpbb import SyntheticPhpbb
    from ..streaming import run_available_now, stream_post_counts

    srv = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    wd = tempfile.mkdtemp(prefix="stream_gate_")
    res = run_crawl(spark, srv, "https://phpbb.example/", wd, CrawlConfig())
    return run_available_now(
        stream_post_counts(spark, res.workdir),
        f"gate_stream_posts_{next(_SEQ)}",
        "complete",
    ).select("hour", "n_posts")


QUERIES = {
    "stream_dedup_exact": stream_dedup_exact_q,
    "stream_sessionize": stream_sessionize_q,
    "stream_post_counts": stream_post_counts_q,
    "stream_quality_filter": stream_quality_filter_q,
}

ORACLES = {
    "stream_dedup_exact": STREAM_DEDUP_SQL,
    # same final state as the batch sessionization — reuse its oracle
    # (imported lazily below to avoid a cycle at module import order)
}

from .relational import EVENTS_SESSIONIZE_SQL  # noqa: E402

ORACLES["stream_sessionize"] = EVENTS_SESSIONIZE_SQL

from .textops import QUALITY_FILTER_SQL  # noqa: E402

ORACLES["stream_quality_filter"] = QUALITY_FILTER_SQL
