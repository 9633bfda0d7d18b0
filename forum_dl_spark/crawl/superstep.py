"""The BSP superstep crawl loop.

Replaces the reference's sequential generator pipeline
(forum_dl/extractors/common.py:334-366, one blocking HTTP request in flight
ever, forum_dl/session.py:171-187) with a batch-iterative driver loop over
DataFrames — the idiomatic Spark shape for a fixpoint iteration:

    while frontier:
        popped  = politeness-budgeted pop (window rank per host)
        parsed  = popped.mapInPandas(fetch+parse)      # ONE Arrow stage
        items/pages/seen/frontier deltas split from `parsed`
        candidates → dedup(min ord) → anti-join seen → new frontier
        atomically checkpoint all deltas (superstep dir + _COMPLETE marker)

Scale design decisions (the ones that matter at 10^10 URLs / 1000 executors):

- **fetch and parse are fused into one ``mapInPandas`` stage** so page
  bodies never cross a shuffle boundary; only typed rows (items, frontier
  candidates, lineage) leave the Python worker.
- **the seen anti-join is the only unavoidable wide dependency**; both
  sides carry a ``shard = pmod(xxhash64(seen_key), K)`` column and the seen
  table is written partitioned by it, so the scan prunes and AQE handles
  skew. A bloom prefilter (crawl/bloom.py) cuts the shuffle input further.
- **crawl order is data, not scheduling**: the ``ord`` key (engines/ordkey)
  is assigned from parent order at parse time, so any superstep/parallelism
  schedule yields the same final tables; sorting by ``ord`` reproduces the
  reference's sequential order exactly.
- **checkpoint per superstep** (parquet deltas + marker file — the
  Iceberg-snapshot pattern without Iceberg jars, which this container
  lacks): a killed run resumes bit-identically (north_rule).
"""

from __future__ import annotations

import dataclasses
import json
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import schemas
from ..engines import ENGINES
from ..oracle.session import FetchError
from .detect import detect_engine

# seen-set size at which AUTO bloom (CrawlConfig.use_bloom=None) engages:
# below this the sketch build outweighs the anti-join it trims; above it
# the prefilter keeps most candidates out of the shuffle
BLOOM_AUTO_KEYS = 100_000

_ITEM_COLS = [f.name for f in schemas.ITEMS.fields]
_FRONTIER_CORE = [
    "url",
    "params",
    "kind",
    "path",
    "page",
    "state",
    "priority",
    "ord",
    "attempt",
    "should_retry",
]


@dataclass
class CrawlConfig:
    retries: int = 4  # total attempts, reference default (options.py:49-56)
    host_budget: int | None = None  # politeness: max fetches/host/superstep
    # per-host overrides + robots prefixes (north-rule additions; the
    # reference has neither — SURVEY.md §4):
    # [{"host": ..., "max_fetches_per_superstep": N, "robots_disallow": [...]}]
    host_budgets: list[dict] | None = None
    max_supersteps: int = 10_000
    shards: int = schemas.N_SHARDS_DEFAULT
    keep_bodies: bool = True
    # bloom prefilter ahead of the seen anti-join. None = AUTO: off while
    # the seen set is small (the sketch build would cost more than the
    # anti-join it trims), on once seen_size crosses BLOOM_AUTO_KEYS —
    # long crawls get the prefilter without opting in. True/False force.
    # Safe to flip mid-crawl: the bloom path is bit-identical by test
    # (test_incremental_bloom_long_crawl_identical).
    use_bloom: bool | None = None
    # fetch /robots.txt for the seed host at crawl start and merge its
    # Disallow prefixes / Crawl-delay into host_budgets (explicit entries
    # win). Driver-side config acquisition — not part of the crawl trace
    # (the reference fetches no robots at all; SURVEY.md §4).
    fetch_robots: bool = False
    # merge all seen deltas into one compact table every K supersteps so the
    # per-step anti-join reads O(K) files instead of O(steps) — without it a
    # long crawl re-opens every historical delta each wave (O(steps^2) file
    # opens over the crawl). 0 disables.
    compact_every: int = 16
    # which prefilter sketch backs the seen anti-join when engaged:
    # "bloom" (grow-only, crawl/bloom.py) or "cuckoo" (deletable
    # fingerprints tracking exactly the gating set, crawl/cuckoo.py).
    # Both paths are bit-identical to the exact join by test.
    sketch: str = "bloom"
    # salted two-phase budgeted pop (north-rule per-host skew defense):
    # S > 1 splits each host's window rank across S salt partitions before
    # the exact per-host re-rank — same popped/remaining SETS, but a
    # mega-host's sort runs on S tasks instead of one straggler. 0/1 = off
    # (fixture-scale hosts don't need it; a 10^10-frontier run sets S to
    # ~frontier_rows_per_hot_host / target_partition_rows).
    salt_pop: int = 0


@dataclass
class CrawlResult:
    """Handle over the crawl's checkpointed tables.

    Single-materialization layout: each superstep writes ONE ``parsed``
    parquet delta (the fused fetch+parse output); pages/items/documents are
    column-pruned projections over it (parquet reads only the projected
    columns — e.g. the scheduler never reads page bodies), while ``seen``
    and ``frontier`` (small, body-free) are materialized per step because
    the next superstep's anti-join consumes them.
    """

    workdir: str
    base_url: str
    engine: str
    supersteps: int
    spark: SparkSession = field(repr=False)
    # time-travel bound (Iceberg-snapshot semantics over the step-dir log):
    # None = latest; k = read the tables AS OF completed superstep k — the
    # exact state a run killed after step k (and resumed) would observe.
    upto_step: int | None = None

    def as_of(self, step: int) -> "CrawlResult":
        """Snapshot view at superstep ``step`` (time travel).

        Every step dir is an atomic snapshot commit (`_COMPLETE` marker =
        manifest); reading `<= step` replays the table log to that commit,
        so ``as_of(k).pages()`` equals the pages() of a crawl whose last
        completed superstep is k — including the absence of finalize-step
        ord fixes, which by definition have not happened at k. This is the
        parquet-native equivalent of an Iceberg `VERSION AS OF` read over
        the checkpoint (Iceberg jars are absent in this container;
        README.md documents the layout mapping)."""
        from dataclasses import replace

        done = self._step_dirs_all()
        if not done or step < int(done[0].name):
            raise ValueError(f"no completed superstep <= {step} in {self.workdir}")
        # Iceberg VERSION AS OF semantics both ways: an unknown snapshot is
        # an error — a typo'd FUTURE step must not silently masquerade as
        # the latest view (round-4 ADVICE)
        if step > int(done[-1].name):
            raise ValueError(
                f"no completed superstep >= {step} in {self.workdir} "
                f"(last completed: {int(done[-1].name)})"
            )
        return replace(
            self, upto_step=step,
            supersteps=min(self.supersteps, step + 1),
        )

    def _step_dirs_all(self) -> list[Path]:
        return sorted(
            p
            for p in Path(self.workdir, "steps").glob("*")
            if (p / "_COMPLETE").exists()
        )

    def _step_dirs(self) -> list[Path]:
        return [
            p
            for p in self._step_dirs_all()
            if self.upto_step is None or int(p.name) <= self.upto_step
        ]

    def _delta(self, name: str) -> DataFrame:
        paths = [str(p / name) for p in self._step_dirs() if (p / name).exists()]
        return self.spark.read.parquet(*paths)

    def parsed(self) -> DataFrame:
        return self._delta("parsed")

    def _ord_fix(self) -> DataFrame | None:
        """Optional trace-position overrides (url -> ord, evict) written by
        engine finalize steps (engines whose reference order is recovered
        post-hoc from the fetched graph, e.g. hackernews)."""
        paths = [
            str(p / "ord_fix")
            for p in self._step_dirs()
            if (p / "ord_fix").exists()
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths).dropDuplicates(["url"])

    def pages(self) -> DataFrame:
        p = self._pages_raw()
        fix = self._ord_fix()
        if fix is None:
            return p
        fix = fix.select("url", F.col("ord").alias("_ord"))
        return (
            p.join(fix, "url", "left")
            .withColumn("ord", F.coalesce(F.col("_ord"), F.col("ord")))
            .drop("_ord")
        )

    def _pages_raw(self) -> DataFrame:
        p = self.parsed()
        return p.filter(F.col("rec").isin("page", "pfail")).select(
            F.col("p_url").alias("url"),
            F.col("p_params").alias("params"),
            F.col("p_status").alias("status_code"),
            F.col("p_content_type").alias("content_type"),
            F.col("p_body").alias("body"),
            F.col("ord"),
            F.col("p_attempt").alias("attempt"),
            F.col("superstep"),
            F.col("p_engine").alias("engine"),
            F.col("p_kind").alias("kind"),
        )

    def items(self) -> DataFrame:
        """All items; file-item stubs are completed by joining the fetched
        file bodies (the reference inlines downloaded content into the file
        entry at write time, writers/common.py:168-189 — here it's a
        broadcast-able join on url instead of a per-item blocking GET)."""
        items = self.parsed().filter(F.col("rec") == "item").select(
            *_ITEM_COLS, "superstep"
        )
        stubs = items.filter(
            (F.col("type") == "file") & F.col("content_bytes").isNull()
        )
        rest = items.filter(
            (F.col("type") != "file") | F.col("content_bytes").isNotNull()
        )
        bodies = (
            self.pages()
            .filter((F.col("kind") == "file") & (F.col("status_code") >= 0))
            .select(
                F.col("url"),
                F.col("body").alias("_body"),
                F.col("content_type").alias("_ctype"),
            )
            .dropDuplicates(["url"])
        )
        # data-URI stubs never hit the network: decode inline, JVM-side
        # (reference write_file regex branch, writers/common.py:162-167 +
        # 178-181, with the files-output-path materialization inlined)
        data_re = r"^data:(.+/.+);base64,(.*)$"
        data_stubs = stubs.filter(F.col("url").startswith("data:")).select(
            *[
                c
                for c in _ITEM_COLS
                if c not in ("content_type", "content_bytes")
            ],
            F.when(
                F.regexp_extract("url", data_re, 1) != "",
                F.regexp_extract("url", data_re, 1),
            ).alias("content_type"),
            F.when(
                F.regexp_extract("url", data_re, 1) != "",
                F.unbase64(F.regexp_extract("url", data_re, 2)),
            ).alias("content_bytes"),
            "superstep",
        ).select(*_ITEM_COLS, "superstep")
        filled = (
            stubs.filter(~F.col("url").startswith("data:"))
            .join(bodies, "url", "left")
            .withColumn("content_bytes", F.col("_body"))
            .withColumn("content_type", F.col("_ctype"))
            .drop("_body", "_ctype")
            .select(*_ITEM_COLS, "superstep")
        )
        return (
            rest.select(*_ITEM_COLS, "superstep")
            .unionByName(filled)
            .unionByName(data_stubs)
        )

    def seen(self) -> DataFrame:
        """Final URL-seen set, excluding one-shot-evicted cache entries
        (reference: a should_cache=True response consumed once is deleted
        from the cache and ends up in NO seen set, session.py:105-111)."""
        s = self._delta("seen")
        fix = self._ord_fix()
        if fix is not None:
            fx = fix.select(F.col("url").alias("seen_key"), F.col("evict").alias("_evict"))
            s = (
                s.join(fx, "seen_key", "left")
                .withColumn("evict", F.coalesce(F.col("_evict"), F.col("evict")))
                .drop("_evict")
            )
        return s.filter(F.col("evict") == 0)

    def seen_all(self) -> DataFrame:
        """Every fetched key incl. evicted ones (internal anti-join view)."""
        return self._delta("seen")

    def documents(self) -> DataFrame:
        return self.items().filter(F.col("type") == "post").select(
            F.array_join(F.concat(F.col("path"), F.col("subpath")), ".").alias("doc_id"),
            F.col("spans"),
        )

    def link_edges(self) -> DataFrame:
        """The crawl's discovered-link graph: one row per DISTINCT
        (src_key, dst_key) where ``src_key`` is the seen-key of the fetched
        page whose body yielded the candidate and ``dst_key`` the
        candidate's seen-key — i.e. every 'next' record's lineage, BEFORE
        the URL-seen gate (discovery happens whether or not the fetch is
        then suppressed). Column-pruned projection over the parsed deltas
        (reads no bodies); the distinct is the only wide stage. Oracle:
        OracleSession.links (tests/test_graph_crawl.py)."""
        return (
            self.parsed()
            .filter(F.col("rec") == "next")
            .select(
                F.col("origin").alias("src_key"),
                F.when(F.col("f_params") == "", F.col("f_url"))
                .otherwise(F.concat_ws("\x00", "f_url", "f_params"))
                .alias("dst_key"),
            )
            .distinct()
        )

    def _items_latest(self) -> DataFrame:
        """Items keyed for snapshot comparison: one row per logical item
        (type, url, path, subpath), the LATEST emission winning — a
        recrawled page re-emits its items at a later superstep and that
        emission supersedes the original. ``h`` is a content hash over
        every payload field (spans included), so 'changed' detection is
        field-exact."""
        items = self.items()
        key = F.concat_ws(
            "\x1f",
            "type",
            "url",
            F.array_join(F.coalesce(F.col("path"), F.array()), "."),
            F.array_join(F.coalesce(F.col("subpath"), F.array()), "."),
        )
        h = F.md5(
            F.to_json(
                F.struct(
                    F.col("title"),
                    F.col("author"),
                    F.col("creation_time").cast("string").alias("ct"),
                    F.col("content"),
                    F.col("content_type"),
                    F.base64(F.col("content_bytes")).alias("cb"),
                    F.col("data"),
                    F.col("spans"),
                )
            )
        )
        w = Window.partitionBy("k").orderBy(F.desc("superstep"), F.desc("ord"))
        return (
            items.select(
                key.alias("k"), h.alias("h"), "type", "url", "superstep", "ord"
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def diff(self, a: int, b: int) -> DataFrame:
        """Incremental-recrawl delta between two snapshots (round-4 verdict
        ask #6 — the first consumer of ``as_of`` time travel): items view
        of ``as_of(b)`` minus ``as_of(a)``, one row per added / changed /
        removed logical item. This is the parquet-native equivalent of an
        Iceberg incremental read between two snapshot ids.

        Scale shape: two column-pruned reads of the parsed deltas (no
        bodies), one hash per side, a key-partitioned window for
        latest-wins, and a single full-outer join on the item key — the
        item key is high-cardinality and uniform, so the join shuffles
        evenly."""
        va = self.as_of(a)._items_latest().select(
            "k",
            F.col("h").alias("h_a"),
            F.col("type").alias("type_a"),
            F.col("url").alias("url_a"),
            F.col("superstep").alias("superstep_a"),
        )
        vb = self.as_of(b)._items_latest().select(
            "k",
            F.col("h").alias("h_b"),
            F.col("type").alias("type_b"),
            F.col("url").alias("url_b"),
            F.col("superstep").alias("superstep_b"),
        )
        joined = va.join(vb, "k", "full_outer")
        change = (
            F.when(F.col("h_a").isNull(), F.lit("added"))
            .when(F.col("h_b").isNull(), F.lit("removed"))
            .when(F.col("h_a") != F.col("h_b"), F.lit("changed"))
        )
        return (
            joined.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(
                "change",
                F.coalesce("type_b", "type_a").alias("type"),
                F.coalesce("url_b", "url_a").alias("url"),
                "superstep_a",
                "superstep_b",
            )
        )

    def metrics(self) -> list[dict]:
        out = []
        for d in self._step_dirs():
            p = d / "metrics.json"
            if p.exists():
                out.append(json.loads(p.read_text()))
        return out


def _anti_join_gate(left: DataFrame, right: DataFrame) -> DataFrame:
    """Drop left rows whose seen_key appears in ``right``.

    A left-anti join is insensitive to duplicate keys on its right side, so
    the seen/pending relations go in RAW — a ``.distinct()`` here would add
    a full wide aggregation over the seen relation EVERY superstep (at
    10^10 seen keys, a needless extra shuffle per wave). Pinned by
    tests/test_plans.py::test_seen_anti_join_no_aggregate."""
    return left.join(right.select("seen_key"), on="seen_key", how="left_anti")


def _with_derived(df: DataFrame, shards: int = schemas.N_SHARDS_DEFAULT) -> DataFrame:
    """seen_key / host / shard derivation — JVM-side column expressions."""
    seen_key = F.when(F.col("params") == "", F.col("url")).otherwise(
        F.concat(F.col("url"), F.lit("\x00"), F.col("params"))
    )
    return (
        df.withColumn("seen_key", seen_key)
        .withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
        .withColumn(
            "shard", F.pmod(F.xxhash64(F.col("seen_key")), F.lit(shards)).cast("int")
        )
    )


def _make_fetch_parse(server: object, retries: int, keep_bodies: bool):
    """Build the fused fetch+parse mapInPandas function.

    Input rows are *pages to fetch* (coarse units); output rows are typed
    records discriminated by ``rec``: page lineage, items, next-frontier
    candidates, retries, failures. One Arrow round-trip per batch.
    """
    parsed_cols = [f.name for f in schemas.PARSED.fields]

    def fn(batches):
        halted = False  # strict sequential-abort support (see engines/hackernews.py)
        for pdf in batches:
            out: list[dict] = []
            # deterministic in-partition order; required by halt_batch_on
            pdf = pdf.sort_values(["priority", "ord"])
            for r in pdf.to_dict("records"):
                row = {
                    "url": r["url"],
                    "params": r["params"] or "",
                    "kind": r["kind"],
                    "path": list(r["path"]) if r["path"] is not None else [],
                    "page": int(r["page"]),
                    "state": dict(r["state"]) if r["state"] is not None else {},
                    "ord": r["ord"],
                }
                eff_url = row["url"] if not row["params"] else f"{row['url']}?{row['params']}"
                halt_flag = row["state"].get("halt_batch_on") == "null_body"

                def emit(**kw) -> None:
                    rec = dict.fromkeys(parsed_cols)
                    rec.update(kw)
                    out.append(rec)

                def emit_frontier(rec: str, ch: dict, attempt: int) -> None:
                    emit(
                        rec=rec,
                        # link lineage: the discovering page's seen-key
                        # (reference semantics of Item.origin = the fetch
                        # response an entity was parsed from,
                        # extractors/common.py:436,505) — feeds
                        # CrawlResult.link_edges / pagerank_crawl
                        origin=(
                            row["url"]
                            if not row["params"]
                            else f"{row['url']}\x00{row['params']}"
                        ),
                        f_url=ch["url"],
                        f_params=ch["params"],
                        f_kind=ch["kind"],
                        f_path=ch["path"],
                        f_page=ch["page"],
                        f_state=ch["state"],
                        f_priority=ch["priority"],
                        f_ord=ch["ord"],
                        f_attempt=attempt,
                        f_should_retry=ch["should_retry"],
                        # children inherit the parent's engine (shared-
                        # frontier crawls mix engines in one wave)
                        f_engine=r["engine"],
                    )

                # one-shot cache emulation: a row carrying a cached body is a
                # reference cache HIT (session.py:105-111) — no fetch, no
                # trace row, but parsing still happens; the cached key's
                # eviction is flagged at seed time (evict_probe_urls)
                cached_b64 = row["state"].get("cached_body_b64")
                if cached_b64 is not None:
                    import base64 as _b64

                    body = _b64.b64decode(cached_b64)
                    engine = ENGINES[r["engine"]]
                    items, children = engine.parse(row, 200, body, row["url"])
                    for it in items:
                        emit(rec="item", **it)
                    for ch in children:
                        emit_frontier("next", ch, 0)
                    continue

                if halted and halt_flag:
                    # a halt-flagged row earlier in this partition hit its
                    # halt condition: defer the rest of the flagged batch
                    # (re-enqueued untouched; the engine's post_wave decides)
                    fr = dict(row)
                    fr["priority"] = int(r["priority"])
                    fr["should_retry"] = int(r["should_retry"])
                    emit_frontier("retry", fr, int(r["attempt"]))
                    continue

                try:
                    status, ctype, body = server.get(eff_url, params=None, attempt=int(r["attempt"]))
                except FetchError:
                    # lineage row for the failed attempt (the reference
                    # prints/logs every attempt, session.py:163-166)
                    emit(
                        rec="pfail",
                        p_url=row["url"],
                        p_params=row["params"],
                        p_status=-1,
                        p_kind=row["kind"],
                        p_attempt=int(r["attempt"]),
                        p_engine=r["engine"],
                        ord=row["ord"],
                    )
                    nxt = int(r["attempt"]) + 1
                    if r["should_retry"] and nxt < retries:
                        fr = dict(row)
                        fr["priority"] = int(r["priority"])
                        fr["should_retry"] = int(r["should_retry"])
                        emit_frontier("retry", fr, nxt)
                    else:
                        emit(
                            rec="failed",
                            p_url=row["url"],
                            p_params=row["params"],
                            p_status=-1,
                            p_kind=row["kind"],
                            p_attempt=int(r["attempt"]),
                            p_engine=r["engine"],
                            ord=row["ord"],
                        )
                    continue

                emit(
                    rec="page",
                    p_url=row["url"],
                    p_params=row["params"],
                    p_status=int(status),
                    p_content_type=ctype,
                    p_body=bytes(body) if keep_bodies else None,
                    p_kind=row["kind"],
                    p_attempt=int(r["attempt"]),
                    p_engine=r["engine"],
                    p_seen_evict=int(row["state"].get("seen_evict", "0")),
                    ord=row["ord"],
                )
                if halt_flag and bytes(body) == b"null":
                    halted = True
                    continue
                engine = ENGINES[r["engine"]]
                items, children = engine.parse(row, int(status), body, row["url"])
                for it in items:
                    emit(rec="item", **it)
                for ch in children:
                    emit_frontier("next", ch, 0)
            res = pd.DataFrame(out, columns=parsed_cols)
            if len(res):
                res["creation_time"] = pd.to_datetime(res["creation_time"])
            yield res

    return fn


def _atomic_write(df: DataFrame, path: Path) -> None:
    df.write.mode("overwrite").parquet(str(path))


def _empty(spark: SparkSession, schema) -> DataFrame:
    return spark.createDataFrame([], schema)


def run_crawl(
    spark: SparkSession,
    server: object,
    seed_url: str,
    workdir: str,
    config: CrawlConfig | None = None,
) -> CrawlResult:
    config = config or CrawlConfig()
    _validate_config(config)
    wd = Path(workdir)
    if wd.exists():
        shutil.rmtree(wd)
    (wd / "steps").mkdir(parents=True)

    # --- step 0: detection (driver-side probe cascade, ≤11 fetches/seed) ---
    det = detect_engine(server, seed_url)
    if det is None:
        raise ValueError(f"no engine detected for {seed_url}")
    engine_mod = ENGINES[det.engine]

    if config.fetch_robots:
        from urllib.parse import urlparse as _up

        from .politeness import fetch_robots as _fetch_robots

        from .politeness import host_key as _host_key

        u = _up(seed_url)
        explicit = {_host_key(hb["host"]) for hb in config.host_budgets or ()}
        fetched_rules = [
            hb
            for hb in _fetch_robots(
                server,
                [u.netloc],
                scheme=u.scheme or "https",
                # the agent the fetches actually present — so robots groups
                # targeting this crawler (not just '*') apply
                user_agent=getattr(server, "user_agent", "*") or "*",
            )
            if _host_key(hb["host"]) not in explicit
        ]
        if fetched_rules:
            config = dataclasses.replace(
                config, host_budgets=(config.host_budgets or []) + fetched_rules
            )
        # the merged rules persist in meta.json below → a bare resume
        # reuses them without refetching (bit-identical)

    probe_pages = [
        {
            "rec": "page" if pf.status >= 0 else "pfail",
            "p_url": pf.url,
            "p_params": pf.params,
            "p_status": pf.status,
            "p_content_type": pf.content_type,
            "p_body": bytes(pf.body),
            "ord": f"{i:08x}",
            "p_attempt": 0,
            "p_engine": det.engine,
            "p_kind": "probe",
        }
        for i, pf in enumerate(det.fetches)
    ]
    plan = engine_mod.seed(det.base_url, len(det.fetches), det.fetches, seed_url=seed_url)
    evict_urls = set(plan.get("evict_probe_urls", ()))
    probe_seen = [
        {
            "seen_key": pf.url if not pf.params else f"{pf.url}\x00{pf.params}",
            "url": pf.url,
            "status": "ok" if pf.status >= 0 else "failed",
            "superstep": 0,
            # eviction matched on the full seen_key (url + params); engine
            # evict lists are param-less URLs == their seen_key
            "evict": 1
            if (pf.url if not pf.params else f"{pf.url}\x00{pf.params}") in evict_urls
            else 0,
        }
        for pf in det.fetches
    ]
    frontier_rows = [
        {**row, "attempt": 0, "engine": det.engine} for row in plan["frontier"]
    ]
    seed_items = [{"rec": "item", **it} for it in plan["items"]]

    step0 = wd / "steps" / "00000"
    step0.mkdir(parents=True)
    probe_rows = [
        tuple(r.get(f.name) for f in schemas.PARSED.fields)
        for r in probe_pages + seed_items
    ]
    _atomic_write(
        spark.createDataFrame(probe_rows, schemas.PARSED).withColumn(
            "superstep", F.lit(0)
        ),
        step0 / "parsed",
    )
    seen0 = (
        spark.createDataFrame(pd.DataFrame(probe_seen), schemas.SEEN)
        if probe_seen
        else _empty(spark, schemas.SEEN)
    )
    _atomic_write(
        seen0.withColumn(
            "shard",
            F.pmod(F.xxhash64(F.col("seen_key")), F.lit(config.shards)).cast("int"),
        ),
        step0 / "seen",
    )
    frontier = _with_derived(
        spark.createDataFrame(
            [
                tuple(
                    [
                        r["url"],
                        r["params"],
                        r["url"] if not r["params"] else f"{r['url']}\x00{r['params']}",
                        "",
                        r["engine"],
                        r["kind"],
                        r["path"],
                        r["page"],
                        r["state"],
                        r["priority"],
                        r["ord"],
                        r["attempt"],
                        r["should_retry"],
                    ]
                )
                for r in frontier_rows
            ],
            schemas.FRONTIER,
        ).drop("seen_key", "host"),
        config.shards,
    )
    _atomic_write(frontier, step0 / "frontier")
    (step0 / "metrics.json").write_text(
        json.dumps({"superstep": 0, "popped": len(probe_pages), "new_frontier": len(frontier_rows)})
    )
    (step0 / "_COMPLETE").write_text("ok")
    (wd / "meta.json").write_text(
        json.dumps(
            {
                "seed_url": seed_url,
                "base_url": det.base_url,
                "engine": det.engine,
                # full config: a bare resume must reproduce EVERY knob
                # (robots rules, bloom, shards, body retention) — restoring
                # only retries would re-enqueue previously-disallowed URLs
                "config": dataclasses.asdict(config),
            }
        )
    )

    return _loop(spark, server, wd, det.engine, det.base_url, config, start_step=1)


def _validate_config(config: CrawlConfig) -> None:
    if config.host_budget is not None and config.host_budget < 1:
        raise ValueError(
            f"host_budget must be >= 1 (got {config.host_budget}): a 0 budget "
            "would never drain that host's frontier"
        )
    for hb in config.host_budgets or ():
        if hb.get("max_fetches_per_superstep", 1) < 1:
            raise ValueError(
                f"max_fetches_per_superstep must be >= 1 for host "
                f"{hb.get('host')!r}"
            )
    if config.shards < 1:
        raise ValueError("shards must be >= 1")
    if config.sketch not in ("bloom", "cuckoo"):
        raise ValueError(f"sketch must be 'bloom' or 'cuckoo' (got {config.sketch!r})")
    if config.salt_pop < 0:
        raise ValueError("salt_pop must be >= 0")


def run_crawl_multi(
    spark: SparkSession,
    server: object,
    seed_urls: list[str],
    workdir: str,
    config: CrawlConfig | None = None,
) -> list[CrawlResult]:
    """Crawl a seed LIST with the reference's semantics: one independent
    crawl — fresh seen set, fresh state — per seed URL, in order
    (forumdl.py:15–31 builds a fresh Session per URL). Each seed gets its
    own subdirectory of ``workdir``; results come back in seed order, so
    trace/seen/items of each element are bit-identical to a standalone
    ``run_crawl`` of that seed."""
    return [
        run_crawl(spark, server, url, f"{workdir}/seed-{i:03d}", config)
        for i, url in enumerate(seed_urls)
    ]


def run_crawl_shared(
    spark: SparkSession,
    server: object,
    seed_urls: list[str],
    workdir: str,
    config: CrawlConfig | None = None,
) -> CrawlResult:
    """Crawl N seeds with ONE shared frontier and ONE shared seen set —
    the shape a real 100 TB crawl runs (run_crawl_multi is the reference's
    per-seed-isolated semantics; this is the beyond-reference scale mode).

    Semantics:
    - every wave pops from the union frontier under the same per-host
      politeness budgets, so hosts progress fairly regardless of which
      seed discovered them;
    - the URL-seen gate spans all seeds: a URL discovered by two seeds is
      fetched once (first discovery in ord order wins, the same rule as
      the in-wave dedup);
    - duplicate seeds — same detected engine AND base_url — collapse to
      the first occurrence at seeding time (the whole second crawl would
      be redundant under a shared seen set);
    - per-seed ord keys get the seed's index prepended as an extra 8-hex
      segment, so emission order is (seed, per-seed DFS order) and each
      seed's subtree ordering is bit-identical to its standalone run.

    Engines with driver wave hooks (hackernews) participate through their
    ``post_wave_shared`` / ``finalize_shared`` variants: the loop invokes
    them per hooked seed with the seed's ord prefix, so hook-generated
    frontier rows and reconstructed trace ords sort into that seed's
    subtree exactly as in a standalone run. A hooked engine WITHOUT the
    _shared variants still raises (use run_crawl_multi).
    """
    config = config or CrawlConfig()
    _validate_config(config)
    wd = Path(workdir)
    if wd.exists():
        shutil.rmtree(wd)
    (wd / "steps").mkdir(parents=True)

    probe_pages: list[dict] = []
    probe_seen: list[dict] = []
    frontier_rows: list[dict] = []
    seed_items: list[dict] = []
    seen_bases: set[tuple[str, str]] = set()
    engines_used: list[str] = []
    robots_hosts: list[tuple[str, str]] = []
    # seeds whose engine needs driver wave hooks (hackernews): the loop
    # invokes <engine>.post_wave_shared / finalize_shared per seed with the
    # seed's ord prefix, so hook-generated rows sort into the seed's subtree
    hooked_seeds: list[dict] = []
    for si, seed_url in enumerate(seed_urls):
        det = detect_engine(server, seed_url)
        if det is None:
            raise ValueError(f"no engine detected for {seed_url}")
        if (det.engine, det.base_url) in seen_bases:
            continue  # duplicate seed: redundant under the shared seen set
        seen_bases.add((det.engine, det.base_url))
        engine_mod = ENGINES[det.engine]
        if hasattr(engine_mod, "post_wave") and not hasattr(
            engine_mod, "post_wave_shared"
        ):
            raise NotImplementedError(
                f"shared-frontier mode does not support engine "
                f"{det.engine!r} (driver wave hooks without a _shared "
                f"variant); use run_crawl_multi"
            )
        from urllib.parse import urlparse as _urlparse

        u = _urlparse(seed_url)
        robots_hosts.append((u.netloc, u.scheme or "https"))
        pre = f"{si:08x}"
        if hasattr(engine_mod, "post_wave_shared"):
            hooked_seeds.append(
                {
                    "pre": pre,
                    "engine": det.engine,
                    "seed_url": seed_url,
                    "base_url": det.base_url,
                }
            )
        plan = engine_mod.seed(
            det.base_url, len(det.fetches), det.fetches, seed_url=seed_url
        )
        evict_urls = set(plan.get("evict_probe_urls", ()))
        probe_pages += [
            {
                "rec": "page" if pf.status >= 0 else "pfail",
                "p_url": pf.url,
                "p_params": pf.params,
                "p_status": pf.status,
                "p_content_type": pf.content_type,
                "p_body": bytes(pf.body),
                "ord": pre + f"{i:08x}",
                "p_attempt": 0,
                "p_engine": det.engine,
                "p_kind": "probe",
            }
            for i, pf in enumerate(det.fetches)
        ]
        probe_seen += [
            {
                "seen_key": pf.url if not pf.params else f"{pf.url}\x00{pf.params}",
                "url": pf.url,
                "status": "ok" if pf.status >= 0 else "failed",
                "superstep": 0,
                "evict": 1
                if (pf.url if not pf.params else f"{pf.url}\x00{pf.params}")
                in evict_urls
                else 0,
            }
            for pf in det.fetches
        ]
        for row in plan["frontier"]:
            row = dict(row, ord=pre + row["ord"], attempt=0, engine=det.engine)
            state = dict(row.get("state") or {})
            # every ord-carrying state key gets the per-seed prefix (parse
            # kernels emit item/frontier ords from these)
            for k in ("dfs", "dfs_root", "b_ord", "t_ord"):
                if k in state:
                    state[k] = pre + state[k]
            row["state"] = state
            frontier_rows.append(row)
        seed_items += [
            {"rec": "item", **it, "ord": pre + it["ord"]} for it in plan["items"]
        ]
        engines_used.append(det.engine)

    if config.fetch_robots:
        from .politeness import fetch_robots as _fetch_robots

        from .politeness import host_key as _host_key

        explicit = {_host_key(hb["host"]) for hb in config.host_budgets or ()}
        fetched_rules: list[dict] = []
        for host, scheme in dict.fromkeys(robots_hosts):
            fetched_rules += [
                hb
                for hb in _fetch_robots(
                    server, [host], scheme=scheme,
                    user_agent=getattr(server, "user_agent", "*") or "*",
                )
                if _host_key(hb["host"]) not in explicit
            ]
        if fetched_rules:
            config = dataclasses.replace(
                config, host_budgets=(config.host_budgets or []) + fetched_rules
            )

    # cross-seed URL dedup over the initial frontier (the wave gate only
    # sees CANDIDATES; the seeded rows bypass it): first discovery in ord
    # order wins, rows carrying cached bodies are per-seed cache hits and
    # always kept
    best: dict[str, dict] = {}
    kept_cached: list[dict] = []
    for row in frontier_rows:
        sk = row["url"] if not row["params"] else f"{row['url']}\x00{row['params']}"
        if (row.get("state") or {}).get("cached_body_b64") is not None:
            kept_cached.append(row)
        elif sk not in best or row["ord"] < best[sk]["ord"]:
            best[sk] = row
    frontier_rows = sorted(
        list(best.values()) + kept_cached, key=lambda r: r["ord"]
    )

    step0 = wd / "steps" / "00000"
    step0.mkdir(parents=True)
    parsed_rows = [
        tuple(r.get(f.name) for f in schemas.PARSED.fields)
        for r in probe_pages + seed_items
    ]
    _atomic_write(
        spark.createDataFrame(parsed_rows, schemas.PARSED).withColumn(
            "superstep", F.lit(0)
        ),
        step0 / "parsed",
    )
    seen0 = (
        spark.createDataFrame(pd.DataFrame(probe_seen), schemas.SEEN)
        if probe_seen
        else _empty(spark, schemas.SEEN)
    )
    _atomic_write(
        seen0.withColumn(
            "shard",
            F.pmod(F.xxhash64(F.col("seen_key")), F.lit(config.shards)).cast("int"),
        ),
        step0 / "seen",
    )
    frontier = _with_derived(
        spark.createDataFrame(
            [
                tuple(
                    [
                        r["url"],
                        r["params"],
                        r["url"] if not r["params"] else f"{r['url']}\x00{r['params']}",
                        "",
                        r["engine"],
                        r["kind"],
                        r["path"],
                        r["page"],
                        r["state"],
                        r["priority"],
                        r["ord"],
                        r["attempt"],
                        r["should_retry"],
                    ]
                )
                for r in frontier_rows
            ],
            schemas.FRONTIER,
        ).drop("seen_key", "host"),
        config.shards,
    )
    _atomic_write(frontier, step0 / "frontier")
    (step0 / "metrics.json").write_text(
        json.dumps(
            {
                "superstep": 0,
                "popped": len(probe_pages),
                "new_frontier": len(frontier_rows),
            }
        )
    )
    (step0 / "_COMPLETE").write_text("ok")
    (wd / "meta.json").write_text(
        json.dumps(
            {
                "seed_url": seed_urls[0],
                "seed_urls": seed_urls,
                "base_url": seed_urls[0],
                "engine": "shared",
                "engines": engines_used,
                "hooked_seeds": hooked_seeds,
                "config": dataclasses.asdict(config),
            }
        )
    )
    return _loop(spark, server, wd, "shared", seed_urls[0], config, start_step=1)


def resume_crawl(
    spark: SparkSession, server: object, workdir: str, config: CrawlConfig | None = None
) -> CrawlResult:
    """Resume from the last complete superstep (north_rule: bit-identical).

    The full CrawlConfig is restored from meta.json unless an explicit
    override is passed."""
    wd = Path(workdir)
    meta = json.loads((wd / "meta.json").read_text())
    if config is None:
        stored = meta.get("config")
        if stored is not None:
            # max_supersteps bounds a single INVOCATION (it is how a run is
            # killed mid-crawl); a bare resume continues to completion
            config = CrawlConfig(
                **{**stored, "max_supersteps": CrawlConfig.max_supersteps}
            )
        else:  # pre-full-config checkpoint layout
            config = CrawlConfig(
                retries=meta["retries"], host_budget=meta["host_budget"]
            )
    _validate_config(config)
    done = sorted(p for p in (wd / "steps").glob("*") if (p / "_COMPLETE").exists())
    if not done:
        raise ValueError(
            f"nothing to resume in {workdir}: no superstep has a _COMPLETE "
            "marker (the crawl died before its first checkpoint — rerun "
            "run_crawl)"
        )
    # drop any incomplete step dirs (killed mid-write)
    for p in (wd / "steps").glob("*"):
        if not (p / "_COMPLETE").exists():
            shutil.rmtree(p)
    last = int(done[-1].name)
    return _loop(
        spark, server, wd, meta["engine"], meta["base_url"], config, start_step=last + 1
    )


def recrawl_reopen(
    spark: SparkSession,
    server: object,
    workdir: str,
    reopen_keys: list[str],
    config: CrawlConfig | None = None,
) -> CrawlResult:
    """TTL-style incremental recrawl (round-4 verdict ask #6): re-open
    already-seen URLs on a FINISHED crawl and continue the superstep log,
    so ``diff(old_last_step, new_last_step)`` yields exactly the delta the
    refresh produced.

    Mechanism: the reopened pages' ORIGINAL frontier rows (first-discovery
    ord, attempt reset) are injected as a synthetic step's pending
    frontier — injected rows bypass the URL-seen gate the way seed rows
    do, while everything they re-discover still faces it, so unchanged
    children are dropped and only genuinely NEW keys (e.g. a post chunk
    that did not exist last crawl) are fetched. The seen set is NOT
    rewritten — re-fetched pages just append fresh seen rows at the new
    superstep (the anti-join is duplicate-insensitive), which keeps every
    pre-recrawl snapshot bit-identical under ``as_of``. A policy layer
    that re-opens keys via the CANDIDATE path instead (e.g. age-based TTL
    over 10^10 keys) would additionally delete them from the cuckoo sketch
    (CuckooState.delete exists for exactly that); the injection path here
    doesn't need it because injected rows never meet the gate.

    Works for engines without post-wave hooks (the hooked engines — HN —
    recover order post-hoc and would need their finalize replayed; not
    wired here)."""
    wd = Path(workdir)
    meta = json.loads((wd / "meta.json").read_text())
    if config is None:
        stored = meta.get("config")
        config = (
            CrawlConfig(**{**stored, "max_supersteps": CrawlConfig.max_supersteps})
            if stored is not None
            else CrawlConfig()
        )
    _validate_config(config)
    done = sorted(p for p in (wd / "steps").glob("*") if (p / "_COMPLETE").exists())
    if not done:
        raise ValueError(f"nothing to recrawl in {workdir}: no completed superstep")
    last = int(done[-1].name)
    fr_paths = [str(p / "frontier") for p in done if (p / "frontier").exists()]
    hist = spark.read.parquet(*fr_paths)
    keys_df = spark.createDataFrame([(k,) for k in reopen_keys], "seen_key string")
    w = Window.partitionBy("seen_key").orderBy("ord")
    reopened = (
        hist.join(F.broadcast(keys_df), "seen_key")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("attempt", F.lit(0))
    )
    found = reopened.count()
    if found != len(set(reopen_keys)):
        raise ValueError(
            f"recrawl_reopen: {len(set(reopen_keys)) - found} of "
            f"{len(set(reopen_keys))} keys never appeared in this crawl's "
            "frontier — nothing to re-open for them"
        )
    inject = wd / "steps" / f"{last + 1:05d}"
    inject.mkdir(parents=True)
    _atomic_write(reopened, inject / "frontier")
    (inject / "metrics.json").write_text(
        json.dumps({"superstep": last + 1, "reopened": found})
    )
    (inject / "_COMPLETE").write_text("ok")
    return _loop(
        spark, server, wd, meta["engine"], meta["base_url"], config,
        start_step=last + 2,
    )


def _loop(
    spark: SparkSession,
    server: object,
    wd: Path,
    engine: str,
    base_url: str,
    config: CrawlConfig,
    start_step: int,
) -> CrawlResult:
    fetch_parse = _make_fetch_parse(server, config.retries, config.keep_bodies)
    step = start_step
    bloom_state = None
    prev_frontier_size = None
    # crawl-delay pacing state: measured wall of the previous wave (incl.
    # any politeness sleep) scales the next wave's per-host delay budgets
    prev_wall: float | None = None
    # keys canonicalized with host_key so they match the port-stripped
    # parse_url(HOST) grouping below; duplicate rows merge to max delay
    from .politeness import host_key as _hk

    delay_hosts: dict[str, float] = {}
    for hb in config.host_budgets or ():
        if hb.get("crawl_delay"):
            h = _hk(hb["host"])
            delay_hosts[h] = max(delay_hosts.get(h, 0.0), float(hb["crawl_delay"]))
    # shared crawls carry per-seed driver-hook contexts in meta.json
    hooked_seeds: list[dict] = []
    if engine == "shared":
        meta_path = wd / "meta.json"
        if meta_path.exists():
            hooked_seeds = json.loads(meta_path.read_text()).get("hooked_seeds", [])
    seen_total = _read_seen_sofar(spark, wd, start_step).count()
    frontier = spark.read.parquet(str(wd / "steps" / f"{start_step - 1:05d}" / "frontier"))

    while step < config.max_supersteps:
        if frontier.isEmpty():
            break
        t0 = time.time()
        # --- politeness pop: per-host window rank (SURVEY §4 item 2-3) ---
        from .politeness import apply_robots, budgeted_pop

        budgets_df = None
        if config.host_budgets:
            from .politeness import effective_budgets

            budgets_df = spark.createDataFrame(
                pd.DataFrame(effective_budgets(config.host_budgets, prev_wall)),
                schemas.HOST_BUDGETS,
            )
        popped, remaining = budgeted_pop(
            frontier, budgets_df, config.host_budget, salts=config.salt_pop
        )

        # --- fused fetch+parse, materialized ONCE as the step's parsed delta.
        # Everything downstream (seen, frontier tail, metrics, and the
        # pages/items/documents projections in CrawlResult) is a column-
        # pruned JVM-side read over this parquet — page bodies are written
        # once and never shuffled or re-read by the scheduler.
        step_dir = wd / "steps" / f"{step:05d}"
        step_dir.mkdir(parents=True, exist_ok=True)
        _atomic_write(
            # rows keep their own engine (shared-frontier waves mix them);
            # the crawl-level engine is only the fallback for legacy rows
            popped.withColumn(
                "engine", F.coalesce(F.col("engine"), F.lit(engine))
            )
            .mapInPandas(fetch_parse, schemas.PARSED)
            .withColumn("superstep", F.lit(step)),
            step_dir / "parsed",
        )
        parsed = spark.read.parquet(str(step_dir / "parsed"))

        # seen status comes from FINAL outcomes only: any HTTP response is a
        # visited key (reference records even 4xx/5xx responses as past
        # requests, session.py:143-148); 'failed' only after retries are
        # exhausted (session.py:137-141)
        seen_delta = _with_derived(
            parsed.filter(F.col("rec").isin("page", "failed")).select(
                F.col("p_url").alias("url"),
                F.col("p_params").alias("params"),
                F.when(F.col("rec") == "failed", F.lit("failed"))
                .otherwise(F.lit("ok"))
                .alias("status"),
                F.lit(step).alias("superstep"),
                F.coalesce(F.col("p_seen_evict"), F.lit(0)).alias("evict"),
            ),
            config.shards,
        ).select("seen_key", "url", "status", "superstep", "evict", "shard")

        def _fr(prefix: str, rec: str) -> DataFrame:
            return _with_derived(
                parsed.filter(F.col("rec") == rec).select(
                    F.col(f"{prefix}url").alias("url"),
                    F.col(f"{prefix}params").alias("params"),
                    F.coalesce(F.col("f_engine"), F.lit(engine)).alias("engine"),
                    F.col(f"{prefix}kind").alias("kind"),
                    F.col(f"{prefix}path").alias("path"),
                    F.col(f"{prefix}page").alias("page"),
                    F.col(f"{prefix}state").alias("state"),
                    F.col(f"{prefix}priority").alias("priority"),
                    F.col(f"{prefix}ord").alias("ord"),
                    F.col(f"{prefix}attempt").alias("attempt"),
                    F.col(f"{prefix}should_retry").alias("should_retry"),
                ),
                config.shards,
            )

        retries_df = _fr("f_", "retry")
        candidates = _fr("f_", "next")

        # dedup within the wave: first discovery (min ord) wins — matches the
        # reference where the first DFS occurrence fetches and later ones hit
        # the seen gate (session.py:112-113)
        w_dd = Window.partitionBy("seen_key").orderBy("ord")
        candidates = (
            candidates.withColumn("_rn", F.row_number().over(w_dd))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        # anti-join against everything already seen or pending; rows carrying
        # a cached body bypass the gate — they ARE the cache hit for an
        # already-seen key (session.py:105-111)
        cached_rows = candidates.filter(
            F.col("state").getItem("cached_body_b64").isNotNull()
        )
        candidates = candidates.filter(
            F.col("state").getItem("cached_body_b64").isNull()
        )
        if budgets_df is not None:
            candidates = apply_robots(candidates, budgets_df)
        seen_sofar = _read_seen_sofar(spark, wd, step)
        # evicted keys do NOT gate: a one-shot cache consume deletes the
        # entry WITHOUT recording a past request (session.py:105-111 vs
        # 145-148), so the reference will fetch such a key once more (e.g.
        # a pipermail thread.html seed: the consumed period page is
        # re-fetched by the first thread's posts read). A later real fetch
        # writes an evict=0 record for the same key, which gates again.
        seen_all = (
            seen_sofar.filter(F.col("evict") == 0)
            .select("seen_key")
            .union(seen_delta.filter(F.col("evict") == 0).select("seen_key"))
        )
        use_bloom = (
            config.use_bloom
            if config.use_bloom is not None
            else seen_total >= BLOOM_AUTO_KEYS
        )
        if use_bloom and config.sketch == "cuckoo":
            # cuckoo prefilter (crawl/cuckoo.py): same no-false-negative
            # (definitely_new, maybe_seen) contract as bloom, but the
            # sketch tracks exactly the GATING set — evicted one-shot keys
            # are never inserted — and supports deletion (TTL recrawl).
            from .cuckoo import CuckooState
            from .cuckoo import split_candidates as _cuckoo_split

            def _gating_keys():
                return (
                    seen_sofar.filter(F.col("evict") == 0)
                    .select("seen_key", "shard")
                    .union(
                        seen_delta.filter(F.col("evict") == 0)
                        .select("seen_key", "shard")
                    )
                )

            if (
                bloom_state is None
                or not isinstance(bloom_state, CuckooState)
                or bloom_state.over_capacity()
            ):
                bloom_state = CuckooState.build(_gating_keys())
            elif not bloom_state.update(seen_delta):
                bloom_state = CuckooState.build(_gating_keys())  # kick limit
            definitely_new, maybe = _cuckoo_split(
                candidates, bloom_state.tables, bloom_state.n_buckets
            )
            gated = definitely_new.unionByName(_anti_join_gate(maybe, seen_all))
        elif use_bloom:
            # bloom prefilter: definitely-new candidates skip the exact
            # anti-join; only the maybe-seen residue shuffles (crawl/bloom.py).
            # The sketch is INCREMENTAL: built once, then only the current
            # delta's shards are OR-ed in each wave; a full rebuild happens
            # only when the key count outgrows the sized capacity.
            from .bloom import BloomState, split_candidates

            if bloom_state is None or bloom_state.over_capacity():
                seen_keys_df = seen_sofar.select("seen_key", "shard").union(
                    seen_delta.select("seen_key", "shard")
                )
                bloom_state = BloomState.build(seen_keys_df)
            else:
                bloom_state.update(seen_delta)
            definitely_new, maybe = split_candidates(
                candidates, bloom_state.blooms, bloom_state.n_bits
            )
            gated = definitely_new.unionByName(
                _anti_join_gate(maybe, seen_all)
            )
        else:
            gated = _anti_join_gate(candidates, seen_all)
        pending = remaining.select("seen_key").union(retries_df.select("seen_key"))
        new_frontier_rows = _anti_join_gate(gated, pending).unionByName(cached_rows)

        next_frontier = remaining.unionByName(retries_df).unionByName(new_frontier_rows)

        # --- checkpoint the rest of the superstep ---
        _atomic_write(seen_delta.repartition("shard"), step_dir / "seen")
        if config.compact_every and step % config.compact_every == 0:
            # periodic merge: everything <= this step into one table, so the
            # next waves' anti-join reads O(compact_every) files, not O(steps)
            _atomic_write(
                _read_seen_sofar(spark, wd, step)
                .unionByName(spark.read.parquet(str(step_dir / "seen")))
                .repartition("shard"),
                step_dir / "seen_compact",
            )
        # engine-specific driver hook (e.g. hackernews descending id scan);
        # shared (multi-seed) crawls dispatch the per-seed _shared variant
        # with the seed's ord prefix instead
        engine_mod = ENGINES.get(engine)
        if hasattr(engine_mod, "post_wave"):
            next_frontier = engine_mod.post_wave(spark, wd, step, parsed, next_frontier)
        for hs in hooked_seeds:
            next_frontier = ENGINES[hs["engine"]].post_wave_shared(
                spark, wd, step, parsed, next_frontier,
                pre=hs["pre"], seed_url=hs["seed_url"],
            )
        _atomic_write(next_frontier, step_dir / "frontier")

        rec_counts = {r["rec"]: r["count"] for r in parsed.groupBy("rec").agg(F.count("*").alias("count")).collect()}
        frontier = spark.read.parquet(str(step_dir / "frontier"))
        frontier_size = frontier.count()
        metrics = {
            "superstep": step,
            "popped": int(rec_counts.get("page", 0) + rec_counts.get("failed", 0) + rec_counts.get("retry", 0)),
            "fetched_ok": int(rec_counts.get("page", 0)),
            "fetched_failed": int(rec_counts.get("failed", 0)),
            "items": int(rec_counts.get("item", 0)),
            "new_frontier": int(rec_counts.get("next", 0)),
            "frontier_size": int(frontier_size),
            "seen_size": int(
                seen_total + rec_counts.get("page", 0) + rec_counts.get("failed", 0)
            ),
            "wall_sec": round(time.time() - t0, 3),
        }
        seen_total = metrics["seen_size"]
        (step_dir / "metrics.json").write_text(json.dumps(metrics))
        (step_dir / "_COMPLETE").write_text("ok")
        # crawl-delay enforcement: a host that asked for one fetch per D
        # seconds and got k fetches this wave must not see the next wave
        # start before k*D has elapsed — sleep out the remainder when the
        # wave finished faster (waves on small hosts run well under 1 s)
        if delay_hosts:
            fetched_per_host = {
                r["h"]: r["cnt"]
                for r in parsed.filter(F.col("rec").isin("page", "pfail"))
                .groupBy(F.parse_url(F.col("p_url"), F.lit("HOST")).alias("h"))
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
            wall = time.time() - t0
            owe = max(
                (
                    d * fetched_per_host.get(h, 0) - wall
                    for h, d in delay_hosts.items()
                ),
                default=0.0,
            )
            if owe > 0:
                time.sleep(owe)
        prev_wall = time.time() - t0
        # spin-guard: nothing parsed (not even a cached-row consume shrank
        # the frontier) while rows remain — e.g. a zero budget would
        # otherwise write empty step dirs until max_supersteps
        if (
            sum(rec_counts.values()) == 0
            and frontier_size > 0
            and prev_frontier_size is not None
            and frontier_size >= prev_frontier_size
        ):
            raise RuntimeError(
                f"superstep {step}: nothing popped while {frontier_size} "
                "frontier rows remain — the crawl cannot make progress "
                "(check host_budgets)"
            )
        prev_frontier_size = frontier_size
        step += 1

    # finalize ONLY when the crawl actually drained its frontier: a run
    # killed by max_supersteps must NOT freeze a premature ord_fix — the
    # resume (which skips finalize when ord_fix exists) would otherwise
    # inherit trace positions reconstructed from a half-fetched graph
    completed = frontier.isEmpty()
    if completed:
        engine_mod = ENGINES.get(engine)
        if hasattr(engine_mod, "finalize"):
            engine_mod.finalize(spark, wd, base_url, step)
            step += 1
        for hs in hooked_seeds:
            ENGINES[hs["engine"]].finalize_shared(
                spark, wd, hs["base_url"], step, pre=hs["pre"]
            )
            step += 1

    return CrawlResult(
        workdir=str(wd),
        base_url=base_url,
        engine=engine,
        supersteps=step,
        spark=spark,
    )


def _seen_paths_sofar(wd: Path, upto_step: int) -> list[str]:
    """Latest compact (if any) + the deltas after it — O(compact_every)
    files regardless of crawl length."""
    compacts = sorted(
        p
        for p in Path(wd, "steps").glob("*/seen_compact")
        if int(p.parent.name) < upto_step
    )
    base = int(compacts[-1].parent.name) if compacts else -1
    paths = ([str(compacts[-1])] if compacts else []) + [
        str(p)
        for p in sorted(Path(wd, "steps").glob("*/seen"))
        if base < int(p.parent.name) < upto_step
    ]
    return paths


def _read_seen_sofar(spark: SparkSession, wd: Path, upto_step: int) -> DataFrame:
    return spark.read.parquet(*_seen_paths_sofar(wd, upto_step))
