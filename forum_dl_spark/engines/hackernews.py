"""Hacker News engine — id-range frontier + iterative tree resolution.

The reference's full-site crawl is a strictly sequential descending id scan
with per-item parent walks and kids-BFS (forum_dl/extractors/hackernews.py:
189-260). The Spark-native re-expression:

- the id range becomes frontier batches fetched in parallel (SURVEY.md P8:
  "Id-range frontier = spark.range partitions");
- thread structure (roots, subpaths, BFS order) is recovered AFTER fetching
  via label propagation over the kids arrays (iterative join supersteps) +
  per-thread ``applyInPandas`` — tree assembly as dataflow, not recursion;
- the reference's exact trace/emission order is reconstructed as data: a
  ``finalize`` step computes each fetch's reference-trace position and
  seen-set eviction status into an ``ord_fix`` table (walk-chain items are
  cached then consumed once → evicted, session.py:105-111), so sorting by
  ord still reproduces the sequential reference exactly;
- the null-abort quirk (a deleted item ends the whole scan, via
  common.py:334-346 — see oracle/refsim_hn.py) is honored exactly in
  strict mode: scan rows carry ``halt_batch_on=null_body`` and are
  coalesced into one partition, so the fetch stage stops at the first null
  and defers the rest; ``post_wave`` then truncates the scan and the
  targeted closure rows (parents/kids of fetched items) finish the
  already-triggered threads. At 10^10 scale one would run non-strict
  (fully parallel scan; deliberately crawls past deleted items).

Specific-list mode (topstories etc., hackernews.py:263-324) emits thread
items only; the posts BFS dies on the root re-fetch (AlreadyVisitedError)
in the reference, which the engine reproduces naturally: the thread-page
candidate has the same URL as the list-item fetch and is anti-joined away
by the seen gate.
"""

from __future__ import annotations

import base64
import json
from datetime import datetime, timezone
from pathlib import Path
from urllib.parse import parse_qs, urlparse

from ..spans import extract_spans
from .discourse import _item
from .ordkey import child

FIREBASE = "https://hacker-news.firebaseio.com"
BASE = "https://news.ycombinator.com/"
SCAN_ORD = "00000001"  # pages subtree for the id scan (maxitem is 00000000)
SCAN_BATCH = 1000  # mirrors the reference's synthetic 1000-id pages

_LIST_URLS = {
    "/newest": "newstories", "/news": "topstories", "/best": "beststories",
    "/ask": "askstories", "/show": "showstories", "/jobs": "jobstories",
}

KIND_PRIORITY = {"hn_maxitem": 0, "hn_list": 1, "hn_list_item": 2,
                 "hn_item": 2, "hn_thread_page": 3, "hn_walk": 1, "hn_bfs": 2}


def _row(url: str, kind: str, state: dict, ord_: str, page: int = 1,
         path: list[str] | None = None) -> dict:
    return {
        "url": url, "params": "", "kind": kind, "path": path or [],
        "page": page, "state": state, "priority": KIND_PRIORITY[kind],
        "ord": ord_, "should_retry": 1,
    }


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    parsed_seed = urlparse(seed_url or base_url)
    if parsed_seed.path == "/item":
        # node_from_url thread seed (hackernews.py:121-136): maxitem is
        # still fetched (_fetch_top_boards), then the parent walk ascends
        # to the root story; write(url) on a Thread emits no board item
        tid = parse_qs(parsed_seed.query)["id"][0]
        frontier = [
            _row(f"{FIREBASE}/v0/maxitem.json", "hn_maxitem",
                 {"mode": "item"}, f"{next_index:08x}"),
            # every walk fetch is should_cache=True and consumed exactly
            # once by the posts BFS → evicted from the final seen set
            _row(_item_url(int(tid)), "hn_walk",
                 {"mode": "item", "bodies": "{}", "seen_evict": "1"},
                 f"{next_index + 1:08x}"),
        ]
        return {"frontier": frontier, "items": []}
    mode = _LIST_URLS.get(parsed_seed.path.rstrip() or "/", None)
    items = [_item("board", [], BASE, BASE, f"{next_index + 1:08x}", title="")]
    if mode is None:  # full-site scan
        frontier = [
            _row(f"{FIREBASE}/v0/maxitem.json", "hn_maxitem",
                 {"mode": "full"}, f"{next_index:08x}")
        ]
    else:
        frontier = [
            _row(f"{FIREBASE}/v0/maxitem.json", "hn_maxitem",
                 {"mode": mode}, f"{next_index:08x}"),
            _row(f"{FIREBASE}/v0/{mode}.json", "hn_list",
                 {"mode": mode}, f"{next_index + 1:08x}"),
        ]
    return {"frontier": frontier, "items": items}


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "hn_maxitem":
        return [], []  # full-mode scan is driven by post_wave (driver-side)
    if kind == "hn_item":
        return _parse_scan_item(row, body)
    if kind == "hn_list":
        return _parse_list(row, body)
    if kind == "hn_list_item":
        return _parse_list_item(row, body, resp_url)
    if kind == "hn_thread_page":
        return [], []  # only reachable if the seen gate failed — no-op
    if kind == "hn_walk":
        return _parse_walk(row, body, resp_url)
    if kind == "hn_bfs":
        return _parse_bfs(row, body, resp_url)
    raise ValueError(f"unknown kind {kind}")


def _item_url(i: int) -> str:
    return f"{FIREBASE}/v0/item/{i}.json"


def _url_id(url: str) -> int:
    return int(url.rsplit("/", 1)[-1].removesuffix(".json"))


def _parse_scan_item(row: dict, body: bytes):
    """Targeted-closure children: the parent and kids of a fetched item.
    In a clean scan these all dedup against the pending/seen sets; after a
    null-abort they are what completes the already-triggered threads."""
    data = json.loads(body)
    children = []
    if data:
        idx = 0
        refs = []
        if "parent" in data:
            refs.append(int(data["parent"]))
        refs.extend(int(k) for k in data.get("kids", []))
        for ref in refs:
            children.append(
                _row(_item_url(ref), "hn_item",
                     {"mode": "full", "targeted": "1"},
                     child(row["ord"], idx))
            )
            idx += 1
    return [], children


def _parse_walk(row: dict, body: bytes, resp_url: str):
    """Parent walk step (hackernews.py:164-187): one superstep per hop —
    the walk is inherently sequential (each hop's target is in the previous
    response). Bodies accumulate in state so the posts BFS can serve the
    walk-chain items as one-shot cache hits."""
    data = json.loads(body)
    if data is None:
        # reference: `"parent" in None` → TypeError out of node_from_url
        raise TypeError("null item in parent walk (hackernews.py:170)")
    bodies = json.loads(row["state"]["bodies"])
    sid = str(data["id"])
    bodies[sid] = base64.b64encode(bytes(body)).decode()
    if "parent" in data:
        return [], [
            _row(_item_url(int(data["parent"])), "hn_walk",
                 {"mode": "item", "bodies": json.dumps(bodies),
                  "seen_evict": "1"},
                 child(row["ord"], 0))
        ]
    # root story reached: the Thread node (hackernews.py:176-187), then the
    # posts BFS. BFS ords are level-prefixed (child(bfs_base, level) + one
    # fixed-width index per tree level), which string-sorts in exactly the
    # reference's FIFO queue order: level-major, then parent-order + kid
    # index within a level.
    items = [
        _item("thread", [sid], f"{BASE}item?id={sid}", resp_url,
              child(row["ord"], 0), title=data.get("title"), data=data)
    ]
    bfs_base = child(row["ord"], 1)
    children = [
        _row(row["url"], "hn_bfs",
             {"mode": "item", "tid": sid, "subids": "[]",
              "bodies": json.dumps({k: v for k, v in bodies.items() if k != sid}),
              "level": "0", "seq": "", "bfs_base": bfs_base,
              # the root re-fetch is the first one-shot cache consume
              "cached_body_b64": bodies[sid]},
             child(bfs_base, 0))
    ]
    return items, children


def _parse_bfs(row: dict, body: bytes, resp_url: str):
    """Kids-BFS node (hackernews.py:222-260): emit the post, enqueue kids.
    Walk-chain kids carry their cached body (cache consume, no fetch);
    null kids are fetched, warned about and skipped."""
    data = json.loads(body)
    if not data:
        return [], []
    st = row["state"]
    tid = st["tid"]
    subids = json.loads(st["subids"])
    ct = datetime.fromtimestamp(data["time"], tz=timezone.utc).replace(tzinfo=None)
    post = _item(
        "post", [tid], f"{BASE}item?id={tid}", resp_url, row["ord"],
        subpath=[str(s) for s in subids], author=data.get("by", ""),
        creation_time=ct, content=data.get("text", ""), data=data,
    )
    post["spans"] = [
        {"kind": s.kind, "text": s.text, "media_ref": s.media_ref,
         "offset": s.offset}
        for s in extract_spans(data.get("text", ""), resp_url)
    ]
    bodies = json.loads(st["bodies"])
    level = int(st["level"])
    seq = st["seq"]
    bfs_base = st["bfs_base"]
    children = []
    for j, kid in enumerate(data.get("kids", [])):
        kid_s = str(kid)
        kseq = seq + f"{j:08x}"
        kst = {"mode": "item", "tid": tid,
               "subids": json.dumps(subids + [kid_s]),
               "bodies": "{}", "level": str(level + 1), "seq": kseq,
               "bfs_base": bfs_base}
        if kid_s in bodies:
            # walk-chain descendant: one-shot cache consume, no fetch
            kst["cached_body_b64"] = bodies[kid_s]
            kst["bodies"] = json.dumps(
                {k: v for k, v in bodies.items() if k != kid_s}
            )
        children.append(
            _row(_item_url(int(kid)), "hn_bfs", kst,
                 child(bfs_base, level + 1) + kseq)
        )
    return [post], children


def _parse_list(row: dict, body: bytes):
    ids = json.loads(body)
    children = [
        _row(_item_url(int(sid)), "hn_list_item",
             {"mode": row["state"]["mode"], "tk": child(row["ord"], i)},
             child(row["ord"], i))
        for i, sid in enumerate(ids)
    ]
    return [], children


def _parse_list_item(row: dict, body: bytes, resp_url: str):
    data = json.loads(body)
    if not data:
        return [], []
    sid = str(data["id"])
    tk = row["state"]["tk"]
    items = [
        _item("thread", [sid], f"{BASE}item?id={sid}", resp_url,
              child(tk, 0), title=data.get("title", ""), data=data)
    ]
    # the reference's posts BFS re-fetches the root item and dies on
    # AlreadyVisitedError (hackernews.py:222-236 + session.py:112-113);
    # this candidate has the same URL as the row we just fetched, so the
    # seen anti-join drops it — zero posts, exactly like the reference
    children = [
        _row(row["url"], "hn_thread_page", {"mode": row["state"]["mode"]},
             child(tk, 1), path=[sid])
    ]
    return items, children


# ---------------------------------------------------------------------------
# Driver-side hooks (full-site mode)
# ---------------------------------------------------------------------------


def _scan_rows(max_id: int, next_id: int, lo: int, pre: str = "") -> list[dict]:
    rows = []
    for i in range(next_id, lo - 1, -1):
        rows.append(
            _row(_item_url(i), "hn_item",
                 {"mode": "full", "scan": "1", "halt_batch_on": "null_body"},
                 pre + child(SCAN_ORD, max_id - i) + "ffffffff")  # provisional
        )
    return rows


def post_wave(spark, wd: Path, step: int, parsed, next_frontier):
    """Drives the descending id scan and applies null-abort truncation."""
    meta = json.loads((Path(wd) / "meta.json").read_text())
    return _post_wave(spark, wd, step, parsed, next_frontier,
                      seed_url=meta.get("seed_url", ""), pre="")


def post_wave_shared(spark, wd: Path, step: int, parsed, next_frontier,
                     pre: str, seed_url: str):
    """Shared-frontier variant: same scan driver, but every generated ord
    carries the seed's per-seed prefix ``pre`` (so emission order stays
    (seed, per-seed order)) and the scan state lives in a per-seed file.
    At most one HN seed exists per shared crawl (duplicate (engine,
    base_url) seeds collapse at seeding time), so scan filters keyed on
    p_kind cannot cross-talk."""
    return _post_wave(spark, wd, step, parsed, next_frontier,
                      seed_url=seed_url, pre=pre)


def _scan_state_name(pre: str) -> str:
    return f"hn_scan_{pre}.json" if pre else "hn_scan.json"


def _read_scan_state(wd: Path, pre: str) -> dict | None:
    """Latest scan state from the COMPLETED step checkpoints.

    The state file lives INSIDE the step dir it was advanced in, so it
    commits or dies atomically with that step: a crash between the state
    write and the step's ``_COMPLETE`` marker leaves a dir that resume
    purges — state included — instead of an orphaned workdir-level file
    whose ``next_id`` had advanced past waves that never checkpointed
    (which would silently drop scan rows on resume)."""
    name = _scan_state_name(pre)
    cands = sorted(Path(wd, "steps").glob(f"*/{name}"))
    if cands:
        return json.loads(cands[-1].read_text())
    legacy = Path(wd) / name  # pre-round-4 checkpoint layout
    return json.loads(legacy.read_text()) if legacy.exists() else None


def _post_wave(spark, wd: Path, step: int, parsed, next_frontier,
               seed_url: str, pre: str):
    from pyspark.sql import functions as F

    seed_path = urlparse(seed_url or "").path
    if _LIST_URLS.get(seed_path.rstrip() or "/"):
        return next_frontier  # list mode: no id scan
    if seed_path == "/item":
        return next_frontier  # thread seed: walk+BFS frontier, no id scan

    state_path = Path(wd) / "steps" / f"{step:05d}" / _scan_state_name(pre)
    state = _read_scan_state(wd, pre)

    if state is None:
        mx = (
            parsed.filter(
                (F.col("rec") == "page") & (F.col("p_kind") == "hn_maxitem")
            )
            .select("p_body")
            .collect()
        )
        if not mx:
            return next_frontier  # list mode: nothing to drive
        max_id = int(bytes(mx[0][0]))
        state = {"max_id": max_id, "next_id": max_id, "abort": 0}

    if not state.get("abort"):
        nulls = (
            parsed.filter(
                (F.col("rec") == "page")
                & (F.col("p_kind") == "hn_item")
                & (F.col("p_body").cast("string") == "null")
            )
            .select("p_url")
            .collect()
        )
        null_ids = [_url_id(r[0]) for r in nulls]
        if null_ids:
            state["abort"] = max(null_ids)

    if state["abort"]:
        # truncate: deferred/pending scan rows below the abort id are never
        # fetched by the reference (common.py:334-346 ends the scan)
        next_frontier = next_frontier.filter(
            ~(
                (F.col("engine") == "hackernews")
                & (F.col("kind") == "hn_item")
                & F.col("state").getItem("scan").isNotNull()
            )
        )
        state["next_id"] = 0
        # re-inject the targeted closure: parents∪kids of every fetched item
        # not yet fetched (candidates may have been anti-joined away against
        # the now-truncated deferred scan rows). Idempotent across waves;
        # the loop ends when the closure is complete.
        from .. import schemas
        from ..crawl.superstep import _with_derived

        parsed_all = spark.read.parquet(
            *[str(p) for p in sorted(Path(wd, "steps").glob("*/parsed"))]
        )
        fetched = parsed_all.filter(
            (F.col("rec") == "page") & (F.col("p_kind") == "hn_item")
        ).select(
            F.from_json(F.col("p_body").cast("string"), _ITEM_FIELDS).alias("pl")
        ).filter(F.col("pl").isNotNull())
        refs = (
            fetched.select(F.explode(F.concat(
                F.coalesce(F.col("pl.kids"), F.array()),
                F.when(F.col("pl.parent").isNotNull(),
                       F.array(F.col("pl.parent"))).otherwise(F.array()),
            )).alias("rid"))
            .distinct()
        )
        cand = refs.select(
            F.concat(F.lit(f"{FIREBASE}/v0/item/"), F.col("rid").cast("string"),
                     F.lit(".json")).alias("url"),
            F.lit("").alias("params"),
            F.lit("hackernews").alias("engine"),
            F.lit("hn_item").alias("kind"),
            F.array().cast("array<string>").alias("path"),
            F.lit(1).alias("page"),
            F.create_map(F.lit("mode"), F.lit("full"),
                         F.lit("targeted"), F.lit("1")).alias("state"),
            F.lit(KIND_PRIORITY["hn_item"]).alias("priority"),
            F.concat(F.lit(pre + child(SCAN_ORD, 0)), F.lit("ee"),
                     F.lpad(F.hex(F.col("rid")), 14, "0")).alias("ord"),
            F.lit(0).alias("attempt"),
            F.lit(1).alias("should_retry"),
        )
        cand = _with_derived(cand)
        seen_keys = (
            spark.read.parquet(
                *[str(p) for p in sorted(Path(wd, "steps").glob("*/seen"))]
            ).select("seen_key").distinct()
        )
        cand = cand.join(seen_keys, "seen_key", "left_anti").join(
            next_frontier.select("seen_key").distinct(), "seen_key", "left_anti"
        )
        next_frontier = next_frontier.unionByName(cand)
    elif state["next_id"] > 0:
        lo = max(1, state["next_id"] - SCAN_BATCH + 1)
        batch = [
            tuple(
                [r["url"], r["params"],
                 r["url"], "", "hackernews", r["kind"], r["path"], r["page"],
                 r["state"], r["priority"], r["ord"], 0, r["should_retry"]]
            )
            for r in _scan_rows(state["max_id"], state["next_id"], lo, pre=pre)
        ]
        from .. import schemas
        from ..crawl.superstep import _with_derived

        batch_df = _with_derived(
            spark.createDataFrame(batch, schemas.FRONTIER).drop("seen_key", "host")
        )
        # scan rows already fetched via targeted closure are skipped
        seen_keys = (
            spark.read.parquet(
                *[str(p) for p in sorted(Path(wd, "steps").glob("*/seen"))]
            ).select("seen_key").distinct()
        )
        batch_df = batch_df.join(seen_keys, "seen_key", "left_anti").join(
            next_frontier.select("seen_key").distinct(), "seen_key", "left_anti"
        )
        # strict abort semantics need the scan sequential: one partition,
        # processed in ord order by the fetch stage
        next_frontier = next_frontier.repartition(8).unionByName(
            batch_df.coalesce(1)
        )
        state["next_id"] = lo - 1

    state_path.write_text(json.dumps(state))
    return next_frontier


_ITEM_FIELDS = "id LONG, parent LONG, kids ARRAY<LONG>, by STRING, time LONG, text STRING, title STRING, type STRING"


def finalize(spark, wd: Path, base_url: str, next_step: int) -> None:
    """Reconstruct threads, reference-trace ords and seen evictions."""
    _finalize(spark, wd, base_url, next_step, pre="")


def finalize_shared(spark, wd: Path, base_url: str, next_step: int,
                    pre: str) -> None:
    """Shared-frontier finalize: reconstructed trace ords carry the seed's
    prefix, scan state comes from the per-seed file. ord_fix joins by URL,
    which stays unambiguous because a shared crawl admits at most one HN
    seed (duplicate (engine, base_url) seeds collapse)."""
    _finalize(spark, wd, base_url, next_step, pre=pre)


def _finalize(spark, wd: Path, base_url: str, next_step: int, pre: str) -> None:
    from pyspark.sql import functions as F

    from .. import schemas
    from ..crawl.superstep import _atomic_write

    state = _read_scan_state(wd, pre)
    if state is None:
        return  # list mode: items were emitted inline
    if list(Path(wd, "steps").glob("*/ord_fix")):
        return  # already finalized (resume path)

    parsed_paths = [str(p) for p in sorted(Path(wd, "steps").glob("*/parsed"))]
    pages = (
        spark.read.parquet(*parsed_paths)
        .filter((F.col("rec") == "page") & (F.col("p_kind") == "hn_item"))
        .select(
            F.col("p_url").alias("url"),
            F.col("p_body").cast("string").alias("body"),
        )
        .dropDuplicates(["url"])
    )
    df = pages.withColumn(
        "id", F.regexp_extract("url", r"/item/(\d+)\.json", 1).cast("long")
    ).withColumn("payload", F.from_json("body", _ITEM_FIELDS))
    df = df.select(
        "url", "body", "id",
        F.col("payload.parent").alias("parent"),
        F.col("payload.kids").alias("kids"),
        (F.col("body") == "null").alias("is_null"),
    ).cache()

    # --- label propagation over kids edges: root(id) -----------------------
    # (iterative join supersteps; at HN depth this converges in < tree-depth
    # rounds — path doubling would make it log-depth at extreme scale)
    edges = df.select(F.col("id").alias("src"), F.explode_outer("kids").alias("dst")) \
              .filter(F.col("dst").isNotNull())
    labels = df.filter(~F.col("is_null") & F.col("parent").isNull()).select(
        F.col("id"), F.col("id").alias("root")
    )
    frontier_lbl = labels
    for _ in range(200):
        nxt = (
            edges.join(frontier_lbl, edges.src == frontier_lbl.id)
            .select(F.col("dst").alias("id"), F.col("root"))
        )
        nxt = nxt.join(labels, "id", "left_anti").distinct().cache()
        if nxt.isEmpty():
            break
        labels = labels.unionByName(nxt)
        frontier_lbl = nxt

    abort_id = int(state.get("abort") or 0)

    member = df.join(labels, "id", "left")
    tmax = member.groupBy("root").agg(F.max("id").alias("tmax"))
    triggered = tmax.filter(F.col("tmax") > abort_id)
    from pyspark.sql import Window

    ranked = triggered.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("tmax"))) - 1
    )
    groups = member.join(ranked, "root", "inner")

    # --- per-thread assembly: walk chain, BFS order, ords, items -----------
    out_schema = (
        "rec STRING, url STRING, ord STRING, evict INT, item_json STRING"
    )

    def assemble(pdf):
        import pandas as pd

        rank = int(pdf["rank"].iloc[0])
        tmax_id = int(pdf["tmax"].iloc[0])
        root = int(pdf["root"].iloc[0])
        t_k = pre + child(SCAN_ORD, rank)
        by_id = {int(r["id"]): r for _, r in pdf.iterrows()}
        payload = {
            i: (json.loads(r["body"]) if r["body"] != "null" else None)
            for i, r in by_id.items()
        }
        # walk chain: trigger -> ... -> root (hackernews.py:164-187)
        chain = []
        cur = tmax_id
        while True:
            chain.append(cur)
            p = payload[cur]
            if p is None or "parent" not in p:
                break
            cur = int(p["parent"])
        chain_set = set(chain)
        rows = []
        for j, cid in enumerate(chain):
            rows.append({"rec": "fix", "url": _item_url(cid),
                         "ord": child(t_k, j), "evict": 1, "item_json": None})
        # BFS (hackernews.py:222-260): root first, kids order; walk items
        # are cache hits (no fetch); nulls fetched but not emitted
        queue = [(root, ())]
        fetch_idx = len(chain)
        post_idx = 0
        root_payload = payload.get(root)
        thread_item = _item(
            "thread", [str(root)], f"{BASE}item?id={root}",
            _item_url(root), child(t_k, 0),
            title=(root_payload or {}).get("title"), data=root_payload,
        )
        rows.append({"rec": "item", "url": thread_item["url"],
                     "ord": thread_item["ord"], "evict": 0,
                     "item_json": json.dumps(_jsonable(thread_item))})
        qi = 0
        while qi < len(queue):
            nid, subpath = queue[qi]
            qi += 1
            if nid not in chain_set:
                rows.append({"rec": "fix", "url": _item_url(nid),
                             "ord": child(t_k, fetch_idx), "evict": 0,
                             "item_json": None})
                fetch_idx += 1
            p = payload.get(nid)
            if not p:
                continue  # null kid: fetched, warned, skipped
            ct = datetime.fromtimestamp(p["time"], tz=timezone.utc).replace(tzinfo=None)
            post = _item(
                "post", [str(root)], thread_item["url"], _item_url(nid),
                child(t_k, 1 + post_idx), subpath=list(subpath),
                author=p.get("by", ""), creation_time=ct,
                content=p.get("text", ""), data=p,
            )
            post["spans"] = [
                {"kind": s.kind, "text": s.text, "media_ref": s.media_ref,
                 "offset": s.offset}
                for s in extract_spans(p.get("text", ""), _item_url(nid))
            ]
            post_idx += 1
            rows.append({"rec": "item", "url": post["url"], "ord": post["ord"],
                         "evict": 0, "item_json": json.dumps(_jsonable(post))})
            for kid in p.get("kids", []):
                queue.append((int(kid), subpath + (str(kid),)))
        return pd.DataFrame(rows, columns=["rec", "url", "ord", "evict", "item_json"])

    assembled = groups.groupBy("root").applyInPandas(assemble, out_schema).cache()

    n_triggered = ranked.count()
    fix = assembled.filter(F.col("rec") == "fix").select("url", "ord", "evict")
    if abort_id:
        abort_fix = spark.createDataFrame(
            [(_item_url(abort_id), pre + child(SCAN_ORD, n_triggered), 0)],
            ["url", "ord", "evict"],
        )
        fix = fix.unionByName(abort_fix)

    items = assembled.filter(F.col("rec") == "item").select(
        F.from_json("item_json", _ITEMS_JSON_SCHEMA).alias("it")
    ).select("it.*")
    parsed_items = items.select(
        F.lit("item").alias("rec"), *[F.col(c) for c in items.columns]
    )

    step_dir = Path(wd) / "steps" / f"{next_step:05d}"
    step_dir.mkdir(parents=True, exist_ok=True)
    # pad parsed_items to the PARSED schema
    full = parsed_items
    for f in schemas.PARSED.fields:
        if f.name not in full.columns:
            full = full.withColumn(f.name, F.lit(None).cast(f.dataType))
    full = full.select(*[f.name for f in schemas.PARSED.fields]).withColumn(
        "superstep", F.lit(next_step)
    )
    _atomic_write(full, step_dir / "parsed")
    _atomic_write(fix, step_dir / "ord_fix")
    _atomic_write(
        spark.createDataFrame([], schemas.SEEN).withColumn(
            "shard", F.lit(0).cast("int")
        ),
        step_dir / "seen",
    )
    (step_dir / "metrics.json").write_text(
        json.dumps({"superstep": next_step, "finalize": True,
                    "threads": int(n_triggered)})
    )
    (step_dir / "_COMPLETE").write_text("ok")


_ITEMS_JSON_SCHEMA = (
    "type STRING, path ARRAY<STRING>, subpath ARRAY<STRING>, url STRING, "
    "origin STRING, title STRING, author STRING, creation_time TIMESTAMP, "
    "content STRING, content_type STRING, data STRING, ord STRING, "
    "spans ARRAY<STRUCT<kind: STRING, text: STRING, media_ref: STRING, offset: INT>>"
)


def _jsonable(item: dict) -> dict:
    out = dict(item)
    out.pop("content_bytes", None)
    ct = out.get("creation_time")
    if ct is not None:
        out["creation_time"] = ct.isoformat()
    return out
