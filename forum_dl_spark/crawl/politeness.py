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
                 default_budget: int | None,
                 salts: int = 0) -> tuple[DataFrame, DataFrame]:
    """(popped, remaining) under per-host budgets; None budget = pop all.

    ``salts > 0`` enables the SALTED two-phase pop (north-rule skew
    defense at 10^10-frontier scale): a mega-host's frontier rows would
    otherwise all land in ONE window partition and the per-host
    ``row_number`` sort becomes a straggler task. Phase 1 ranks within
    ``(host, salt)`` — ``salts`` parallel partitions per host, each
    keeping its local top-B — and phase 2 re-ranks only the <= salts*B
    survivors per host. Any row in a host's global top-B is necessarily
    in its own salt partition's top-B, so the popped/remaining SETS are
    exactly the unsalted result (pinned by tests/test_salted_pop.py);
    what changes is the heavy sort's partition count. The salt key is
    ``xxhash64(ord)`` — deterministic, uniform, independent of host."""
    from pyspark.sql import Window

    if host_budgets is None and default_budget is None:
        empty = frontier.limit(0)
        return frontier, empty

    def _with_budget(df: DataFrame) -> DataFrame:
        if host_budgets is not None:
            return df.join(
                F.broadcast(
                    host_budgets.select(
                        F.col("host"),
                        F.col("max_fetches_per_superstep").alias("_budget"),
                    )
                ),
                "host",
                "left",
            ).withColumn(
                "_budget",
                F.coalesce(F.col("_budget"), F.lit(default_budget or 2**31 - 1)),
            )
        return df.withColumn("_budget", F.lit(default_budget))

    if salts and salts > 1:
        salted = _with_budget(frontier).withColumn(
            "_salt", F.pmod(F.xxhash64("ord"), F.lit(salts)).cast("int")
        )
        w1 = Window.partitionBy("host", "_salt").orderBy("priority", "ord")
        local = salted.withColumn("_lrn", F.row_number().over(w1))
        survivors = local.filter(F.col("_lrn") <= F.col("_budget"))
        dropped1 = local.filter(F.col("_lrn") > F.col("_budget")).drop(
            "_lrn", "_salt", "_budget"
        )
        w2 = Window.partitionBy("host").orderBy("priority", "ord")
        ranked = survivors.withColumn("_rn", F.row_number().over(w2))
        popped = ranked.filter(F.col("_rn") <= F.col("_budget")).drop(
            "_rn", "_lrn", "_salt", "_budget"
        )
        dropped2 = ranked.filter(F.col("_rn") > F.col("_budget")).drop(
            "_rn", "_lrn", "_salt", "_budget"
        )
        return popped, dropped1.unionByName(dropped2)

    w = Window.partitionBy("host").orderBy("priority", "ord")
    ranked = _with_budget(frontier).withColumn("_rn", F.row_number().over(w))
    popped = ranked.filter(F.col("_rn") <= F.col("_budget")).drop("_rn", "_budget")
    remaining = ranked.filter(F.col("_rn") > F.col("_budget")).drop("_rn", "_budget")
    return popped, remaining


def _parse_robots_groups(text: str) -> list[tuple[list[str], list[str], float | None]]:
    """robots.txt → [(agent_tokens, disallow_prefixes, crawl_delay)] groups.
    Consecutive User-agent lines share one rule group (RFC 9309 §2.1)."""
    groups: list[tuple[list[str], list[str], float | None]] = []
    agents: list[str] = []
    rules: list[str] = []
    delay: float | None = None
    in_ua_block = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_ua_block and agents:
                groups.append((agents, rules, delay))
                agents, rules, delay = [], [], None
            agents.append(val.lower())
            in_ua_block = True
        else:
            in_ua_block = False
            if key == "disallow" and val:
                rules.append(val)
            elif key == "crawl-delay":
                try:
                    delay = float(val)
                except ValueError:
                    pass
    if agents:
        groups.append((agents, rules, delay))
    return groups


def _matching_group(
    groups: list[tuple[list[str], list[str], float | None]], user_agent: str
) -> tuple[list[str], float | None] | None:
    """First group naming this agent specifically, else the first ``*``
    group — ``urllib.robotparser`` precedence. Agent matching is
    robotparser's: the robots token (lowercased) must be a substring of the
    UA's PRODUCT token (the part before '/'), so 'Forum-dl 0.3.0 (spark)'
    matches 'forum-dl' but a group for 'other-bot' never applies
    (RobotFileParser.Entry.applies_to)."""
    ua_tok = user_agent.split("/")[0].lower()
    star = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = (rules, delay)
            elif a in ua_tok:
                return (rules, delay)
    return star


def fetch_robots(server: object, hosts: list[str], scheme: str = "https",
                 user_agent: str = "*") -> list[dict]:
    """Fetch and parse /robots.txt per host into ``host_budgets`` rows.

    Driver-side, one fetch per distinct host (hosts are few relative to
    URLs; at 10^10-frontier scale this list is still only the distinct-host
    dimension, and the result is a broadcast table). Group selection and
    agent matching follow ``urllib.robotparser`` (see ``_matching_group``);
    the configured crawl User-Agent is threaded in by ``run_crawl``.

    ``Crawl-delay`` is carried through as ``crawl_delay`` seconds; the
    superstep loop enforces it by ADAPTIVE budgeting — next wave's budget
    for the host is max(1, floor(measured_wave_wall / delay)) — plus an
    inter-wave sleep when a wave finished faster than its fetch count
    times the delay. Supersteps on small hosts finish in well under a
    second, so a fixed fetches-per-wave quota derived from an assumed wave
    length would overshoot the requested rate by orders of magnitude.

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
        groups = _parse_robots_groups(body.decode("utf-8", "replace"))
        match = _matching_group(groups, user_agent)
        if match is None:
            continue
        disallow, delay = match
        if disallow or delay:
            out.append(
                {
                    "host": host,
                    # no explicit cap — the delay budget is computed per
                    # wave from the measured wall (see effective_budgets)
                    "max_fetches_per_superstep": 2**31 - 1,
                    "robots_disallow": disallow,
                    "crawl_delay": float(delay) if delay else 0.0,
                }
            )
    return out


def host_key(netloc: str) -> str:
    """Single canonical host key for ALL politeness joins: the netloc with
    userinfo and ':port' stripped — the same value Spark's
    ``parse_url(url, 'HOST')`` derives for the frontier's ``host`` column.
    Both sides of every budget/robots/delay lookup MUST go through this
    (a ported seed like ``localhost:8765`` would otherwise never match the
    port-stripped frontier host and its pacing would silently not apply)."""
    host = netloc.rsplit("@", 1)[-1]
    if host.startswith("["):  # IPv6 literal: [::1]:8080 -> [::1]
        return host.split("]", 1)[0] + "]"
    return host.split(":", 1)[0]


def effective_budgets(host_budgets: list[dict], prev_wall: float | None) -> list[dict]:
    """Normalize host_budgets rows (canonical ``host_key``, fill optional
    fields), MERGE duplicate-host rows (strictest wins: min budget, union
    of disallow prefixes, max crawl-delay — http:// and https:// seeds of
    one host each fetch robots, and user rows may repeat a host; without
    the merge ``budgeted_pop``'s left join would emit each popped row once
    per duplicate), and scale crawl-delay hosts' per-wave budget by the
    measured wave wall: a host asking for one fetch per ``delay`` seconds
    gets floor(wall/delay) fetches out of a wave that takes ``wall``
    seconds (min 1 — the wave plus the inter-wave sleep in the loop then
    paces the remainder)."""
    merged: dict[str, dict] = {}
    for hb in host_budgets:
        h = host_key(hb["host"])
        row = {
            "host": h,
            "max_fetches_per_superstep": int(hb.get("max_fetches_per_superstep", 2**31 - 1)),
            "robots_disallow": list(hb.get("robots_disallow") or ()),
            "crawl_delay": float(hb.get("crawl_delay") or 0.0),
        }
        prev = merged.get(h)
        if prev is None:
            merged[h] = row
        else:
            prev["max_fetches_per_superstep"] = min(
                prev["max_fetches_per_superstep"], row["max_fetches_per_superstep"]
            )
            prev["robots_disallow"] += [
                p for p in row["robots_disallow"] if p not in prev["robots_disallow"]
            ]
            prev["crawl_delay"] = max(prev["crawl_delay"], row["crawl_delay"])
    out = []
    for row in merged.values():
        if row["crawl_delay"] > 0:
            row["max_fetches_per_superstep"] = min(
                row["max_fetches_per_superstep"],
                max(1, int((prev_wall or 0.0) / row["crawl_delay"])),
            )
        out.append(row)
    return out
