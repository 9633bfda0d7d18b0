"""Relational operators over the TPC-H-ish tables (TESTDATA.md).

These exercise the standard operator checklist the reference lacks
(SURVEY.md §2.6): multi-way joins (broadcast for small dims), hash
aggregations with map-side partials, window functions, top-k, and
time-bucketed / sessionized event analytics.

Scale notes (100 TB): every query here is expressed declaratively so
Catalyst handles pushdown/pruning; dimension tables (region/nation/
supplier/customer at TPC-H ratios) are broadcast-joined; only lineitem/
orders-sized tables shuffle, on their join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._par import read_spread


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- q1: pricing summary (groupBy agg, map-side combine) -------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       round(sum(l_extendedprice), 2)                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       round(avg(l_quantity), 4)                          AS avg_qty,
       round(avg(l_discount), 6)                          AS avg_disc,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- q3: shipping priority (3-way join + top-k) ----------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- q5: local supplier volume (6-way join, broadcast dims) ----------------


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


# --- window: top-3 customers per nation by balance --------------------------


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("n_name", "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"), "rank")
    )


TOP_CUSTOMERS_SQL = """
SELECT n_name, c_custkey, c_name, round(c_acctbal, 2) AS acctbal, rank
FROM (
  SELECT n_name, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rank <= 3
"""


# --- events: hourly rollup (time-bucketed aggregation) ----------------------


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)                  AS n_events,
       round(sum(value), 4)      AS sum_value,
       count(DISTINCT user_id)   AS n_users
FROM events
GROUP BY 1, 2
"""


# --- events: sessionization (lag window + gap rule) -------------------------

SESSION_GAP_MIN = 30


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > SESSION_GAP_MIN * 60),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return with_gap.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


EVENTS_SESSIONIZE_SQL = f"""
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*)         AS n_events
FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
)
GROUP BY user_id
"""


# --- events: as-of join (point-in-time attribution) -------------------------


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each 'click' event attributed to the most recent
    preceding (or simultaneous) 'view' event of the same user — the
    point-in-time-correct join of event attribution / feature-store reads.

    Spark has no ASOF JOIN operator; the naive encodings are a range join
    (O(n·m) BroadcastNestedLoopJoin blowup) or a per-key ``applyInPandas``
    loop (Python in the hot path). The scalable DataFrame shape used here
    is union + window: tag both sides, union them into ONE relation,
    sort each user's timeline once, and carry the last non-null view id
    forward with ``last(..., ignorenulls=True)`` over an unbounded-
    preceding frame. One exchange on user_id, one per-partition sort, no
    join operator at all (plan-pinned by tests/test_plans.py) — at 100 TB
    this shuffles each side exactly once, identical cost to the
    sessionize window, regardless of how many views precede each click.

    Tie rule: a view at exactly the click's timestamp matches (side
    orders views before clicks within a timestamp). ``gap_us`` is an
    integer microsecond difference, so engine timezone rendering cannot
    diverge. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    timeline = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "click").cast("int").alias("side"),
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("v_id"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("v_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        timeline.withColumn("view_id", F.last("v_id", ignorenulls=True).over(w))
        .withColumn("view_ts", F.last("v_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            "view_id",
            F.expr("timestampdiff(MICROSECOND, view_ts, ts)").alias("gap_us"),
        )
    )


EVENTS_ASOF_SQL = """
SELECT c.event_id AS click_id, c.user_id AS user_id, v.event_id AS view_id,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


# --- events: ordered conversion funnel ---------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user completes
    step k only with an event at-or-after their step-(k-1) completion time
    (the ORDER is the point — a purchase before any view does not count,
    which a naive per-type EXISTS gets wrong).

    Step times are cascaded windowed minima over ONE user partitioning:
    t1 = min(view ts), t2 = min(click ts ≥ t1), t3 = min(purchase ts ≥ t2)
    — three Window ops + the per-user collapse all ride a single user_id
    exchange (each consumes its predecessor's partitioning; plan-pinned:
    exactly one hash exchange until the 1-row count collapse). Timestamp
    comparisons are exact (microsecond integers), so both engines agree
    bit-for-bit. Output: one row per step with the surviving-user count
    and conversion from step 1 in integer basis points."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*FUNNEL_STEPS)
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    counts = per_user.agg(
        F.sum(F.col("t1").isNotNull().cast("long")).alias("n1"),
        F.sum(F.col("t2").isNotNull().cast("long")).alias("n2"),
        F.sum(F.col("t3").isNotNull().cast("long")).alias("n3"),
    )
    steps = ", ".join(
        f"struct({i + 1} as step, '{s}' as step_name, n{i + 1} as n_users)"
        for i, s in enumerate(FUNNEL_STEPS)
    )
    return counts.select(
        F.explode(F.expr(f"array({steps})")).alias("x"), F.col("n1")
    ).select(
        F.col("x.step").alias("step"),
        F.col("x.step_name").alias("step_name"),
        F.col("x.n_users").cast("long").alias("n_users"),
        F.expr("cast((10000 * x.n_users) div greatest(n1, 1) as bigint)").alias(
            "conv_bp"
        ),
    )


EVENTS_FUNNEL_SQL = """
WITH staged AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
staged2 AS (
  SELECT *,
         min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
             OVER (PARTITION BY user_id) AS t2
  FROM staged
),
staged3 AS (
  SELECT *,
         min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
             OVER (PARTITION BY user_id) AS t3
  FROM staged2
),
per_user AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
  FROM staged3 GROUP BY user_id
),
counts AS (
  SELECT CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM per_user
)
SELECT step, step_name, n_users,
       CAST((10000 * n_users) // greatest(n1, 1) AS BIGINT) AS conv_bp
FROM counts, (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
     AS s(step, step_name),
     LATERAL (SELECT CASE step WHEN 1 THEN n1 WHEN 2 THEN n2
                     ELSE n3 END AS n_users)
"""


# --- events: cohort retention -------------------------------------------------

RETENTION_MAX_OFFSET = 7


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users cohorted by their first 'signup'
    day; for each cohort and day offset 0..7, the share of the cohort with
    ANY event that day, in integer basis points.

    Scale shape: cohorts are one user-keyed aggregate; the (user, day)
    activity relation is a distinct over the scan; the cohort table is a
    user-dimension relation — broadcast here, a user-keyed shuffle join at
    web scale (no shape change); per-cohort sizes are a tiny broadcast.
    Day arithmetic is integer (date - date), identical in both engines."""
    ev = _t(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
    )
    size = cohort.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    joined = (
        act.join(F.broadcast(cohort), "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .filter(
            (F.col("day_offset") >= 0)
            & (F.col("day_offset") <= RETENTION_MAX_OFFSET)
        )
    )
    ret = joined.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    return ret.join(F.broadcast(size), "cohort_day").select(
        "cohort_day",
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_active",
        F.expr("cast((10000 * n_active) div cohort_size as bigint)").alias(
            "retention_bp"
        ),
    )


EVENTS_RETENTION_SQL = f"""
WITH cohort AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
sz AS (
  SELECT cohort_day, count(*) AS cohort_size FROM cohort GROUP BY cohort_day
),
act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
ret AS (
  SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM act a JOIN cohort c USING (user_id)
  WHERE a.day - c.cohort_day BETWEEN 0 AND {RETENTION_MAX_OFFSET}
  GROUP BY 1, 2
)
SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset, n_active,
       CAST((10000 * n_active) // cohort_size AS BIGINT) AS retention_bp
FROM ret JOIN sz USING (cohort_day)
"""


# --- events: per-host politeness gap audit ---------------------------------

# Gap threshold under which two consecutive fetches from the same host key
# count as a politeness violation. The fixture events table is a days-scale
# activity log, so the threshold is an hour; a production crawler audits its
# pages/trace table with this same plan at a seconds-scale threshold (the
# crawl loop ENFORCES budgets online, politeness.py — this is the offline
# verification pass over the recorded fetch log).
POLITENESS_MIN_GAP_MS = 3_600_000


def politeness_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host inter-fetch gap audit over a fetch log: fetch count, the
    minimum and exact-median gap in integer milliseconds, and how many
    gaps violate the politeness threshold. Hosts with a single fetch have
    no gaps and are (correctly) absent.

    Gaps are integer microsecond differences (``timestampdiff`` /
    ``epoch_us`` — the events_asof_join idiom, NTZ-safe with no timezone
    in play), so the ceil-rank median pick (the ``length_percentiles``
    idiom — no interpolation) and the threshold compare are identical
    bit-for-bit in both engines.

    Scale shape: the lag window, the rank window and the final rollup all
    ride ONE host-keyed hash exchange (the rename-preserving partitioning
    — plan-pinned: exactly one hashpartitioning Exchange, no join). A
    mega-host skews its partition exactly like pack_sequences' mega-source
    — same salting remedy; gaps-per-host is politeness-bounded anyway."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", F.lag("ts").over(wt).alias("prev_ts"))
        # the host_id alias happens ABOVE the window so the user_id hash
        # partitioning survives the rename (alias-aware output partitioning)
        # and the rank window + rollup ride the same exchange
        .select(
            F.col("user_id").alias("host_id"),
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    wr = Window.partitionBy("host_id").orderBy("gap_us")
    ranked = gaps.select(
        "host_id",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(Window.partitionBy("host_id")).alias("n"),
    )
    return ranked.groupBy("host_id").agg(
        (F.count("*") + F.lit(1)).cast("long").alias("n_fetches"),
        F.expr("min(gap_us) div 1000").alias("min_gap_ms"),
        F.expr(
            "max(case when rn = ((50 * n) + 99) div 100 then gap_us end)"
            " div 1000"
        ).alias("p50_gap_ms"),
        F.sum(
            # threshold to µs in PYTHON — a 32-bit Spark literal times 1000
            # would wrap (3.6e9 > 2^31)
            (F.col("gap_us") < F.lit(POLITENESS_MIN_GAP_MS * 1000)).cast("long")
        ).alias("n_violations"),
    )


POLITENESS_GAP_SQL = f"""
WITH g AS (
  SELECT user_id AS host_id,
         epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
ranked AS (
  SELECT host_id, gap_us,
         row_number() OVER (PARTITION BY host_id ORDER BY gap_us) AS rn,
         count(*) OVER (PARTITION BY host_id) AS n
  FROM g WHERE gap_us IS NOT NULL
)
SELECT host_id,
       CAST(count(*) + 1 AS BIGINT) AS n_fetches,
       CAST(min(gap_us) // 1000 AS BIGINT) AS min_gap_ms,
       CAST(max(CASE WHEN rn = ((50 * n) + 99) // 100 THEN gap_us END) // 1000
            AS BIGINT) AS p50_gap_ms,
       CAST(count(CASE WHEN gap_us < {POLITENESS_MIN_GAP_MS}000::BIGINT
                  THEN 1 END) AS BIGINT) AS n_violations
FROM ranked GROUP BY host_id
"""


# --- politeness schedule smoothing ----------------------------------------------
#
# The crawl loop spaces same-host fetches by a per-host delay (politeness
# budgets online). The OFFLINE planning question is: given a burst of
# fetch requests per host, when would each actually run under a crawl
# delay d, and how much politeness wait does the burst incur? The
# schedule obeys the recurrence a_i = max(t_i, a_{i-1} + d) — not
# directly SQL-expressible (it references its own previous output) —
# but the standard queue-smoothing identity linearizes it:
# with b_i = t_i - d*i (i = 0-based arrival rank within host),
# a_i = d*i + max_{j<=i} b_j, a pure PREFIX-MAX window. That transform
# is what makes this a declarative one-exchange operator instead of a
# per-host Python loop (the events_asof_join moral again: find the
# window form, not the UDF form).
#
# Fetch log = events (user_id as host, the politeness_gap_audit
# convention); per-host delay varies (100s * (1 + host % 4) — sized to the
# fixture log, whose inter-event gaps are minutes-scale) so the
# rollup exercises the delay dimension. All integer µs.
#
# Scale shape: rank window, prefix-max window and rollup all ride ONE
# host-keyed hash exchange (alias-above-the-window partitioning, pinned);
# per-host burst length is politeness-bounded in practice.


def politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    wt = Window.partitionBy("host_id").orderBy("ts", "event_id")
    wmax = (
        Window.partitionBy("host_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = ev.select(
        F.col("user_id").alias("host_id"),
        F.col("event_id"),
        F.col("ts"),
        F.expr(
            "cast(100000000 * (1 + user_id % 4) as bigint)"
        ).alias("delay_us"),
        F.expr(
            "timestampdiff(MICROSECOND, timestamp'2024-01-01', ts)"
        ).alias("ts_us"),
    )
    ranked = base.select(
        "host_id", "delay_us", "ts_us",
        (F.row_number().over(wt) - F.lit(1)).cast("long").alias("rn"),
    )
    sched = ranked.select(
        "host_id", "ts_us",
        (
            F.col("delay_us") * F.col("rn")
            + F.max(F.col("ts_us") - F.col("delay_us") * F.col("rn")).over(wmax)
        ).alias("sched_us"),
    )
    return sched.groupBy("host_id").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.expr("sum(sched_us - ts_us) div 1000").alias("total_wait_ms"),
        F.expr("max(sched_us - ts_us) div 1000").alias("max_wait_ms"),
        F.expr(
            "(max(sched_us) - min(ts_us)) div 1000"
        ).alias("makespan_ms"),
    )


POLITENESS_SCHEDULE_SQL = """
WITH base AS (
  SELECT user_id AS host_id, event_id,
         CAST(100000000 * (1 + user_id % 4) AS BIGINT) AS delay_us,
         epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS ts_us
  FROM events
),
ranked AS (
  SELECT host_id, delay_us, ts_us,
         CAST(row_number() OVER (PARTITION BY host_id
              ORDER BY ts_us, event_id) - 1 AS BIGINT) AS rn
  FROM base
),
sched AS (
  SELECT host_id, ts_us,
         delay_us * rn + max(ts_us - delay_us * rn) OVER (
             PARTITION BY host_id ORDER BY rn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sched_us
  FROM ranked
)
SELECT host_id,
       CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(sum(sched_us - ts_us) // 1000 AS BIGINT) AS total_wait_ms,
       CAST(max(sched_us - ts_us) // 1000 AS BIGINT) AS max_wait_ms,
       CAST((max(sched_us) - min(ts_us)) // 1000 AS BIGINT) AS makespan_ms
FROM sched GROUP BY host_id
"""


# --- frontier pop simulation ----------------------------------------------------
#
# The crawl loop's politeness-budgeted priority-queue pop
# (crawl/politeness.py budgeted_pop + the wave window, superstep.py) as a
# STANDALONE oracled operator: the online loop is iterative/stateful and
# therefore rows-only at the driver gate, but one pop step is pure SQL —
# this registers exactly that step so the scheduler's core semantics get
# a value-hash row against DuckDB. Frontier synthesized deterministically
# from the documents table (no external data): ord = doc_id, host drawn
# md5→sqrt-binned so host mass is SKEWED (~30 hosts, the biggest ~6% —
# the per-host-window shape under exactly the skew the salting defends),
# priority = md5 % 3 (the board→thread→post BFS depth classes).
#
# Pop semantics (same as the online loop): rank within host by
# (priority, ord); admit host_rank <= budget; the wave takes the global
# top-W admitted by (priority, ord). Scale shape: ONE host-keyed hash
# exchange for the rank window (at 10^10 frontier rows the same window
# runs salted two-phase, budgeted_pop(salts>1) — set-equality pinned in
# tests/test_salted_pop.py) and the global top-W compiles to
# TakeOrderedAndProject — per-partition heaps, NO global sort, NO
# single-partition window (plan-pinned).

FRONTIER_HOST_BUDGET = 6
FRONTIER_WAVE_WINDOW = 64

_FRONTIER_H_SPARK = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
    " as bigint)"
)
_FRONTIER_P_SPARK = (
    "cast(conv(substring(md5(concat('p:', cast(doc_id as string))), 1, 8),"
    " 16, 10) as bigint)"
)
_FRONTIER_H_DUCK = (
    "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    " AS BIGINT)"
)
_FRONTIER_P_DUCK = (
    "CAST(concat('0x', substring(md5('p:' || CAST(doc_id AS VARCHAR)), 1, 8))"
    " AS BIGINT)"
)


def frontier_pop_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = read_spread(spark, f"{sf_dir}/documents.parquet")
    frontier = d.select(
        F.col("doc_id").alias("ord"),
        F.expr(
            f"concat('host', cast(cast(floor(sqrt({_FRONTIER_H_SPARK} % 1024))"
            " as int) as string))"
        ).alias("host"),
        F.expr(f"{_FRONTIER_P_SPARK} % 3").alias("priority"),
    )
    w = Window.partitionBy("host").orderBy("priority", "ord")
    ranked = frontier.select(
        "host",
        "ord",
        "priority",
        F.row_number().over(w).cast("long").alias("host_rank"),
    )
    return (
        ranked.filter(F.col("host_rank") <= FRONTIER_HOST_BUDGET)
        .orderBy("priority", "ord")
        .limit(FRONTIER_WAVE_WINDOW)
    )


FRONTIER_POP_SQL = f"""
WITH frontier AS (
  SELECT doc_id AS ord,
         'host' || CAST(CAST(floor(sqrt({_FRONTIER_H_DUCK} % 1024)) AS INT)
                   AS VARCHAR) AS host,
         {_FRONTIER_P_DUCK} % 3 AS priority
  FROM documents
),
ranked AS (
  SELECT host, ord, priority,
         row_number() OVER (PARTITION BY host ORDER BY priority, ord)
             AS host_rank
  FROM frontier
)
SELECT host, ord, CAST(priority AS BIGINT) AS priority,
       CAST(host_rank AS BIGINT) AS host_rank
FROM ranked
WHERE host_rank <= {FRONTIER_HOST_BUDGET}
ORDER BY priority, ord LIMIT {FRONTIER_WAVE_WINDOW}
"""


# --- URL-seen bloom false-positive audit ----------------------------------------
#
# The crawl's URL-seen gate runs a bloom prefilter ahead of the sharded
# anti-join (crawl/bloom.py, bit-identical by test) because at a 10^10-URL
# frontier the exact seen set cannot broadcast. The design question a
# 10^10 deployment must keep answering is: *is m still sized to n?* —
# an undersized sketch silently admits false positives into the
# anti-join (extra work) and, if ever used alone, would DROP novel URLs.
# This operator is that audit as an oracled query: build the bloom
# DISTRIBUTED (bit_or word aggregate — no driver collect, unlike
# contamination_bloom's bounded eval-side build), then measure, per
# host, the false-positive rate over a candidate set of seen ∪
# guaranteed-unseen URLs. m is deliberately sized for sf0.01
# (URLSEEN_M = 8192 bits), so at sf0.1 the SAME query shows the
# saturation curve (~70% fill) — the audit demonstrating exactly the
# failure it exists to catch, with the numbers value-hash-pinned in
# both engines.
#
# Scale shape: bloom build = one map-side-combined aggregate bounded at
# m/64 = 128 word rows; membership = two BROADCAST joins of that word
# table (16 KiB) + codegen bit tests; rollup = one host-keyed exchange.
# No row of the seen set is ever broadcast or collected.

URLSEEN_M = 8192  # bits; sized for sf0.01 so sf0.1 shows saturation
URLSEEN_HOSTS = 16

_URL_H32 = (
    "cast(conv(substring(md5({x}), 1, 8), 16, 10) as bigint)"
)
_URL_H32_DUCK = "CAST(concat('0x', substring(md5({x}), 1, 8)) AS BIGINT)"


def urlseen_bloom_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_spread(spark, f"{sf_dir}/documents.parquet")
    host = F.expr(
        f"concat('h', {_URL_H32.format(x='cast(doc_id as string)')} % "
        f"{URLSEEN_HOSTS}, '.example')"
    )
    base = d.select(F.col("doc_id"), host.alias("host"))
    seen = base.select(
        "host",
        F.concat(F.lit("https://"), F.col("host"), F.lit("/t/"),
                 F.col("doc_id")).alias("url"),
        F.lit(1).alias("is_seen"),
    )
    unseen = base.select(
        "host",
        F.concat(F.lit("https://"), F.col("host"), F.lit("/u/"),
                 F.col("doc_id")).alias("url"),
        F.lit(0).alias("is_seen"),
    )

    def pos(slice_start: int) -> F.Column:
        return F.expr(
            f"cast(conv(substring(md5(url), {slice_start}, 8), 16, 10)"
            f" as bigint) % {URLSEEN_M}"
        )

    words = (
        seen.select(pos(1).alias("p"))
        .unionByName(seen.select(pos(9).alias("p")))
        .select(
            F.expr("cast(p div 64 as int)").alias("widx"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    cand = seen.unionByName(unseen).select(
        "host", "is_seen",
        pos(1).alias("p1"), pos(9).alias("p2"),
    )
    w1 = words.select(F.col("widx").alias("w1"), F.col("bits").alias("b1"))
    w2 = words.select(F.col("widx").alias("w2"), F.col("bits").alias("b2"))
    tested = (
        cand.join(F.broadcast(w1),
                  F.expr("cast(p1 div 64 as int)") == F.col("w1"), "left")
        .join(F.broadcast(w2),
              F.expr("cast(p2 div 64 as int)") == F.col("w2"), "left")
        .select(
            "host", "is_seen",
            (
                F.expr("(shiftright(coalesce(b1, 0L), cast(p1 % 64 as int))"
                       " & 1) = 1")
                & F.expr("(shiftright(coalesce(b2, 0L), cast(p2 % 64 as int))"
                         " & 1) = 1")
            ).cast("long").alias("admitted"),
        )
    )
    return tested.groupBy("host").agg(
        F.sum("is_seen").cast("long").alias("n_seen"),
        F.sum(
            F.when(F.col("is_seen") == 1, F.col("admitted"))
        ).cast("long").alias("n_seen_admitted"),
        F.sum(1 - F.col("is_seen")).cast("long").alias("n_unseen"),
        F.sum(
            F.when(F.col("is_seen") == 0, F.col("admitted"))
        ).cast("long").alias("n_fp"),
    ).select(
        "host", "n_seen", "n_seen_admitted", "n_unseen", "n_fp",
        F.expr("(10000 * n_fp) div n_unseen").alias("fp_bp"),
    )


URLSEEN_BLOOM_SQL = f"""
WITH base AS (
  SELECT doc_id,
         'h' || CAST({_URL_H32_DUCK.format(x='CAST(doc_id AS VARCHAR)')}
                % {URLSEEN_HOSTS} AS VARCHAR) || '.example' AS host
  FROM documents
),
cand AS (
  SELECT host, 'https://' || host || '/t/' || CAST(doc_id AS VARCHAR) AS url,
         1 AS is_seen FROM base
  UNION ALL
  SELECT host, 'https://' || host || '/u/' || CAST(doc_id AS VARCHAR) AS url,
         0 AS is_seen FROM base
),
hashed AS (
  SELECT host, is_seen,
         {_URL_H32_DUCK.format(x='url')} % {URLSEEN_M} AS p1,
         CAST(concat('0x', substring(md5(url), 9, 8)) AS BIGINT)
             % {URLSEEN_M} AS p2
  FROM cand
),
pos AS (
  SELECT DISTINCT p FROM (
    SELECT p1 AS p FROM hashed WHERE is_seen = 1
    UNION SELECT p2 FROM hashed WHERE is_seen = 1)
),
tested AS (
  SELECT host, is_seen,
         CASE WHEN p1 IN (SELECT p FROM pos)
               AND p2 IN (SELECT p FROM pos) THEN 1 ELSE 0 END AS admitted
  FROM hashed
)
SELECT host,
       CAST(sum(is_seen) AS BIGINT) AS n_seen,
       CAST(sum(CASE WHEN is_seen = 1 THEN admitted END) AS BIGINT)
           AS n_seen_admitted,
       CAST(sum(1 - is_seen) AS BIGINT) AS n_unseen,
       CAST(sum(CASE WHEN is_seen = 0 THEN admitted END) AS BIGINT) AS n_fp,
       CAST((10000 * sum(CASE WHEN is_seen = 0 THEN admitted END))
            // sum(1 - is_seen) AS BIGINT) AS fp_bp
FROM tested GROUP BY host
"""


# --- robots coverage audit ------------------------------------------------------
#
# The crawl loop enforces robots prefix gates online
# (crawl/politeness.py apply_robots, RFC 9309 prefix semantics); this is
# the OFFLINE audit a crawl operator runs before a big run — per host,
# what fraction of the candidate frontier the ruleset blocks. Frontier
# synthesized deterministically (same 16-host draw as the bloom audit;
# path class from a second md5 draw: 60% thread pages, 20% /admin/,
# 10% /private/, 10% /u/), rules as an in-plan literal dimension:
# every host disallows /admin/, every 4th host also /private/, and h3
# additionally /u/ — so blocked share varies BY host and the per-host
# rollup is non-trivial.
#
# Scale shape: rules are a tiny dimension → BROADCAST join on host with
# the startswith predicate as the join residual (one hash exchange only
# for the final host rollup); the frontier never shuffles for the match.

ROBOTS_PATHS = ["/t/", "/t/", "/t/", "/t/", "/t/", "/t/",
                "/admin/", "/admin/", "/private/", "/u/"]


def _robots_rules() -> list[tuple[str, str]]:
    rules = []
    for k in range(URLSEEN_HOSTS):
        h = f"h{k}.example"
        rules.append((h, "/admin/"))
        if k % 4 == 0:
            rules.append((h, "/private/"))
    rules.append(("h3.example", "/u/"))
    return rules


def robots_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_spread(spark, f"{sf_dir}/documents.parquet")
    path_case = "case " + " ".join(
        f"when {_URL_H32.format(x=repr('path:') + ' || cast(doc_id as string)')}"
        f" % 10 = {i} then '{p}'"
        for i, p in enumerate(ROBOTS_PATHS)
    ) + " end"
    frontier = d.select(
        F.expr(
            f"concat('h', {_URL_H32.format(x='cast(doc_id as string)')} % "
            f"{URLSEEN_HOSTS}, '.example')"
        ).alias("host"),
        F.expr(
            f"concat({path_case}, cast(doc_id as string))"
        ).alias("path"),
    )
    rules = spark.createDataFrame(
        _robots_rules(), "host string, prefix string"
    )
    blocked = (
        frontier.join(
            F.broadcast(rules),
            (frontier.host == rules.host)
            & frontier.path.startswith(rules.prefix),
            "left_semi",
        )
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_blocked"))
    )
    totals = frontier.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls")
    )
    return (
        totals.join(blocked, "host", "left")
        .select(
            "host",
            "n_urls",
            F.coalesce("n_blocked", F.lit(0)).cast("long").alias("n_blocked"),
        )
        .select(
            "host", "n_urls", "n_blocked",
            F.expr("(10000 * n_blocked) div n_urls").alias("blocked_bp"),
        )
    )


def _robots_rules_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT '{h}' AS host, '{p}' AS prefix"
        for h, p in _robots_rules()
    )


_ROBOTS_PATH_H_DUCK = _URL_H32_DUCK.format(
    x="'path:' || CAST(doc_id AS VARCHAR)"
)
_ROBOTS_PATH_CASE_DUCK = "CASE " + " ".join(
    f"WHEN {_ROBOTS_PATH_H_DUCK} % 10 = {i} THEN '{p}'"
    for i, p in enumerate(ROBOTS_PATHS)
) + " END"

ROBOTS_COVERAGE_SQL = f"""
WITH frontier AS (
  SELECT 'h' || CAST({_URL_H32_DUCK.format(x='CAST(doc_id AS VARCHAR)')}
               % {URLSEEN_HOSTS} AS VARCHAR) || '.example' AS host,
         ({_ROBOTS_PATH_CASE_DUCK})
             || CAST(doc_id AS VARCHAR) AS path
  FROM documents
),
rules AS ({_robots_rules_sql()}),
blocked AS (
  SELECT f.host, count(*) AS n_blocked
  FROM frontier f
  WHERE EXISTS (
    SELECT 1 FROM rules r
    WHERE r.host = f.host
      AND left(f.path, length(r.prefix)) = r.prefix)
  GROUP BY f.host
)
SELECT t.host,
       CAST(t.n_urls AS BIGINT) AS n_urls,
       CAST(coalesce(b.n_blocked, 0) AS BIGINT) AS n_blocked,
       CAST((10000 * coalesce(b.n_blocked, 0)) // t.n_urls AS BIGINT)
           AS blocked_bp
FROM (SELECT host, count(*) AS n_urls FROM frontier GROUP BY host) t
LEFT JOIN blocked b ON t.host = b.host
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "top_customers_per_nation": top_customers_per_nation,
    "events_hourly": events_hourly,
    "events_sessionize": events_sessionize,
    "events_asof_join": events_asof_join,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "politeness_gap_audit": politeness_gap_audit,
    "frontier_pop_sim": frontier_pop_sim,
    "urlseen_bloom_audit": urlseen_bloom_audit,
    "robots_coverage_audit": robots_coverage_audit,
    "politeness_schedule": politeness_schedule,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "top_customers_per_nation": TOP_CUSTOMERS_SQL,
    "events_hourly": EVENTS_HOURLY_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_asof_join": EVENTS_ASOF_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_retention": EVENTS_RETENTION_SQL,
    "politeness_gap_audit": POLITENESS_GAP_SQL,
    "frontier_pop_sim": FRONTIER_POP_SQL,
    "urlseen_bloom_audit": URLSEEN_BLOOM_SQL,
    "robots_coverage_audit": ROBOTS_COVERAGE_SQL,
    "politeness_schedule": POLITENESS_SCHEDULE_SQL,
}
