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


# Memoized reader DataFrames per (session, path). A DataFrame is an
# immutable LAZY plan — nothing is cached or precomputed here; what the
# memo saves is re-CONSTRUCTING the reader for every query: each
# ``spark.read.parquet(path)`` pays file listing + parquet footer/schema
# read (~85 ms) and each ``spread()`` an RDD-conversion round trip
# (~40 ms), and a full 128-query run constructs readers hundreds of times
# (~30 s of pure driver-side setup measured at the 10x proxy sf). Inputs
# are immutable fixture tables, so the cached file listing never staleness.
_READER_MEMO: dict[tuple[str, str], DataFrame] = {}


def read_spread(spark, path: str) -> DataFrame:
    """``spread(spark.read.parquet(path))``, memoized per (session, path)."""
    key = (spark.sparkContext.applicationId, path)
    got = _READER_MEMO.get(key)
    if got is None:
        got = spread(spark.read.parquet(path))
        for old_key in [k for k in _READER_MEMO if k[0] != key[0]]:
            del _READER_MEMO[old_key]
        _READER_MEMO[key] = got
    return got


def materialize_cp(df: DataFrame, action=None) -> tuple[DataFrame, int]:
    """Truncate an iterative round's lineage with BOUNDED planning stats.

    Spark 4's ``localCheckpoint()`` carries the child plan's ESTIMATED
    statistics into the new ``LogicalRDD`` (``LogicalRDD.
    rewriteStatsAndConstraints`` calls ``plan.stats`` on the plan being
    checkpointed). ``SizeInBytesOnlyStatsPlanVisitor`` estimates a join as
    the PRODUCT of its children's sizeInBytes, so in an iterative loop
    whose round plan references the previous round's frame twice (an edge
    join plus a pointer-jump self-join) the estimated sizeInBytes SQUARES
    every round: the BigInteger's digit count doubles per round, and after
    ~15 rounds the driver sits for minutes in single-threaded Karatsuba
    multiplications while the executors idle (observed on
    corpus_pipeline_apply at sf1.0; guide §7.3 "planning a huge query" —
    the interesting thread was deep in ``BigInteger.multiplyToomCook3``
    under ``Dataset.localCheckpoint``).

    Fix: persist + materialize FIRST, then checkpoint. Once the frame is
    cached, ``localCheckpoint``'s stats pass sees the cache-substituted
    plan — an ``InMemoryRelation`` leaf whose sizeInBytes is the ACTUAL
    materialized byte count — so the carried stats are real and bounded,
    and every later round plans in constant time. Job count per round is
    unchanged (the checkpoint copy reads from the cache instead of
    recomputing the join); the transient cache is dropped immediately.


    ``action`` (default: ``count``) is the materializing action; its result
    is returned alongside the checkpointed frame so convergence counts
    don't cost an extra job.
    """
    df = df.persist()
    result = action(df) if action is not None else df.count()
    out = df.localCheckpoint()
    df.unpersist()
    return out, result


class RoundCheckpointer:
    """``materialize_cp`` at ONE job per round instead of two.

    Same stats/tree-truncation guarantees (persist first so the
    checkpoint's carried stats come from the materialized cache; a
    checkpoint every round so the plan tree cannot compound), but the
    ``localCheckpoint`` is LAZY: its partitions are saved as a side effect
    of the NEXT round's materializing action (whose plan computes through
    this round's frame), so the separate eager-checkpoint copy job
    disappears. The previous round's transient cache is dropped only
    after the current action has run — i.e. after the previous lazy
    checkpoint is guaranteed materialized.

    Call ``finish(frame)`` once after the loop with whatever frame is
    returned to the caller: it forces the last lazy checkpoint (one cheap
    job over cached data) and drops the final cache.
    """

    def __init__(self) -> None:
        self._prev: DataFrame | None = None

    def step(self, df: DataFrame, action) -> tuple[DataFrame, int]:
        df = df.persist()
        result = action(df)  # materializes this cache AND, through the
        # plan lineage, the previous round's lazy checkpoint
        out = df.localCheckpoint(eager=False)
        if self._prev is not None:
            self._prev.unpersist()
        self._prev = df
        return out, result

    def finish(self, out: DataFrame | None = None) -> DataFrame | None:
        if out is not None:
            out.count()  # force the last lazy checkpoint off the cache
        if self._prev is not None:
            self._prev.unpersist()
            self._prev = None
        return out
