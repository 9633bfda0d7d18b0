"""Politeness budgets and robots.txt gates.

These are north-rule ADDITIONS — the reference has none (verified in
SURVEY.md §4: no robots handling anywhere; only retry backoff,
forum_dl/session.py:117-141, and an unused ``delay`` field,
session.py:61). Design:

- ``host_budgets`` table (FIXTURES.md §2): per-host max fetches per
  superstep + robots disallow prefixes. Small dimension → broadcast join.
- budgeted pop: ``row_number() OVER (PARTITION BY host ORDER BY priority,
  ord) <= budget`` — deterministic (ord is the crawl-order key), so a
  budget changes WHEN a page is fetched but never the final tables
  (the ord-sorted outputs are schedule-invariant).
- robots gate: candidates whose URL path starts with a disallowed prefix
  for their host are dropped before they ever enter the frontier,
  mirroring ``urllib.robotparser`` prefix semantics for the common
  Disallow-prefix case.

Scale notes: the pop window partitions by host — per-host skew (one
mega-forum) is bounded because only the POPPED batch is ranked per host
(the frontier at rest is hash-sharded); AQE skew-join handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_robots(candidates: DataFrame, host_budgets: DataFrame) -> DataFrame:
    """Drop candidates disallowed by per-host robots prefixes."""
    rules = host_budgets.select(
        F.col("host").alias("_rh"), F.explode("robots_disallow").alias("_prefix")
    )
    paths = candidates.withColumn(
        "_path", F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    )
    blocked = (
        paths.join(
            F.broadcast(rules),
            (paths.host == rules._rh) & paths._path.startswith(rules._prefix),
            "inner",
        )
        .select("seen_key")
        .distinct()
    )
    return (
        paths.join(blocked, "seen_key", "left_anti").drop("_path")
    )


def budgeted_pop(frontier: DataFrame, host_budgets: DataFrame | None,
                 default_budget: int | None) -> tuple[DataFrame, DataFrame]:
    """(popped, remaining) under per-host budgets; None budget = pop all."""
    from pyspark.sql import Window

    if host_budgets is None and default_budget is None:
        empty = frontier.limit(0)
        return frontier, empty
    w = Window.partitionBy("host").orderBy("priority", "ord")
    ranked = frontier.withColumn("_rn", F.row_number().over(w))
    if host_budgets is not None:
        ranked = ranked.join(
            F.broadcast(
                host_budgets.select(
                    F.col("host"), F.col("max_fetches_per_superstep").alias("_budget")
                )
            ),
            "host",
            "left",
        ).withColumn("_budget", F.coalesce(F.col("_budget"), F.lit(default_budget or 2**31 - 1)))
    else:
        ranked = ranked.withColumn("_budget", F.lit(default_budget))
    popped = ranked.filter(F.col("_rn") <= F.col("_budget")).drop("_rn", "_budget")
    remaining = ranked.filter(F.col("_rn") > F.col("_budget")).drop("_rn", "_budget")
    return popped, remaining


def fetch_robots(server: object, hosts: list[str], scheme: str = "https",
                 user_agent: str = "*") -> list[dict]:
    """Fetch and parse /robots.txt per host into ``host_budgets`` rows.

    Driver-side, one fetch per distinct host (hosts are few relative to
    URLs; at 10^10-frontier scale this list is still only the distinct-host
    dimension, and the result is a broadcast table). Parsing follows the
    common-case prefix semantics of ``urllib.robotparser``: Disallow lines
    from the ``User-agent: *`` group (or the matching agent group), with
    ``Crawl-delay`` mapped onto ``max_fetches_per_superstep`` when present
    (one fetch per delay window per superstep is the BSP equivalent of the
    reference-less sequential sleep).

    A missing or failing robots.txt means no restrictions for that host —
    the de-facto web convention.
    """
    out: list[dict] = []
    for host in dict.fromkeys(hosts):  # stable order, deduped
        url = f"{scheme}://{host}/robots.txt"
        try:
            status, _, body = server.get(url, None, 0)
        except Exception:
            continue
        if status >= 400:
            continue
        disallow: list[str] = []
        delay: float | None = None
        applies = False
        for raw in body.decode("utf-8", "replace").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                applies = val == "*" or val.lower() in user_agent.lower()
            elif applies and key == "disallow" and val:
                disallow.append(val)
            elif applies and key == "crawl-delay":
                try:
                    delay = float(val)
                except ValueError:
                    pass
        if disallow or delay:
            out.append(
                {
                    "host": host,
                    "max_fetches_per_superstep": max(1, int(60 / delay))
                    if delay
                    else 2**31 - 1,
                    "robots_disallow": disallow,
                }
            )
    return out
