"""SparkSession builder with scale-oriented defaults.

One place to own the knobs that matter at 100 TB:

- AQE on (runtime coalescing + skew-join splitting for the seen anti-join).
- Arrow enabled end-to-end (all parse stages are pandas/Arrow batches).
- ``spark.sql.shuffle.partitions`` sized for the local test harness;
  on a real cluster this is 2-3x total cores (AQE coalesces down).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession


def _export_pythonpath() -> None:
    """Make this package importable in executor Python workers.

    Local mode: workers inherit the driver env, so prepending the package
    root to PYTHONPATH suffices. On a real cluster, ship the package with
    ``spark-submit --py-files forum_dl_spark.zip`` instead (BASELINE.md).
    """
    pkg_root = str(Path(__file__).resolve().parents[1])
    current = os.environ.get("PYTHONPATH", "")
    if pkg_root not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{current}" if current else pkg_root
        )


def get_spark(
    app_name: str = "forum-dl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _export_pythonpath()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and master == "local[*]":
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-optimize (coalesce tiny post-shuffle partitions) the
        # plans that compute PERSISTED relations too — off by default only
        # to keep cached output partitioning stable for reuse, which no
        # consumer here relies on. Without it every persisted intermediate
        # (shingle/winnow memos, iterative CC rounds) executes at the raw
        # shuffle-partition count however small the data is (r6, guide §2.2)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
