"""Driver contract for the spark-graft builder (PySpark target).

``entry``     — flagship query (TPC-H-ish pricing summary) on sf0.001.
``queries``   — every implemented operator from SURVEY.md §2 + the
                training-data-pipeline operators (dedup, similarity, text
                analysis, multimodal plumbing) + the crawl engine smoke.
``oracle_sql``— DuckDB-equivalent SQL for every SQL-expressible query,
                with identical column names/semantics (verified by
                tests/test_operators_oracle.py which mimics this gate).
Rows-only entries (no oracle): crawl_discourse_spans / crawl_phpbb_files /
crawl_corpus_quality / pagerank_crawl / recrawl_delta (iterative stateful
crawls — not SQL-expressible; pagerank_crawl's edge table and rank
arithmetic are pinned exactly against the reference simulation in
tests/test_graph_crawl.py, recrawl_delta's one-changed-row payload and
fetch set in tests/test_recrawl_diff.py), sft_pairs / sft_pairs_tree
(conversation-pair EMITs over the fixture crawls' linear / reply-tree
thread structure, pinned against the reference simulations in
tests/test_sft_pairs.py) and
stream_post_counts (streams a crawl's parsed deltas). Everything else — including
media_features (closed-form md5 featurizer) and the drained streaming
dedup/sessionize — carries a DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from forum_dl_spark.operators import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from forum_dl_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
