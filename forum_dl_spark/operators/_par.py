"""Scale-adaptive parallelism for unsplittable scans.

The fixture tables are single-row-group parquet files (verified with
pyarrow at every sf): Spark can only assign ONE scan task per row group, so
every expensive pre-shuffle projection — per-token md5 hashing, shingle
explodes, winnowing window scans, per-pair vector math — runs on one core
regardless of ``local[N]`` (the optimization guide's §2.5 "input skew: one
huge unsplittable file … repartition immediately after the read").

``spread(df)`` round-robin-repartitions a frame to the session's default
parallelism, but ONLY when the frame currently has fewer partitions than
that — on a real cluster where inputs arrive already split into hundreds
of tasks it is a no-op, so nothing here is tuned to ``local[32]``; the
target is ``sparkContext.defaultParallelism`` (= total cores) wherever the
session runs.

Result equivalence: RoundRobinPartitioning only changes WHICH task
evaluates each row, never the expression fold order inside a row, and
every downstream aggregate in this package is keyed and order-independent
(counts / integer sums / min / max, or per-row projections) by the
integer-exact design contract — re-verified after this change by
bit-exact output snapshots at sf0.001/0.01/0.1/1.0
(scripts/snapshot_outputs.py, OPTIMIZATION_r06.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition an under-partitioned frame to default parallelism."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
