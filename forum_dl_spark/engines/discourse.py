"""Discourse engine — pure parse functions for the Spark crawl.

Re-expresses forum_dl/extractors/discourse.py as stateless page→rows
functions (run inside ``mapInPandas`` Arrow batches). Page kinds:

- ``board_index`` — ``site.json`` (discourse.py:74-107): emits the whole
  board tree (root + categories + subcategories) as board items and one
  ``board_page`` frontier row per non-root board (the root never fetches
  topics: discourse.py:166-173 returns for paths of ≤1 segment);
- ``board_page`` — topic list (discourse.py:166-198): thread items +
  ``thread_page`` rows + optional next ``board_page`` from
  ``more_topics_url`` (with ``.json`` appended to its path, 189-198);
- ``thread_page`` — ``t/{slug}/{id}.json`` (discourse.py:200-219): first
  ≤20 posts + a ``post_page`` chunk row when the stream has more;
- ``post_page`` — ``posts.json?post_ids[]=...`` chunks of 20
  (discourse.py:210-219, chunk at 213).

Ord-key allocation (see ordkey.py): a board's children are
[page-chain (idx 0), subboard_1 (idx 1), ...]; a page's children are its
document-order rows, with the next page at index n_children; a thread's
page 1 is its child 0. This reproduces the reference's DFS fetch/emission
order under BFS supersteps.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from urllib.parse import urlencode, urljoin, urlparse, urlunparse

from ..spans import extract_spans
from .ordkey import child

POSTS_PER_FETCH = 20  # discourse.py:213

KIND_PRIORITY = {"board_index": 0, "board_page": 1, "thread_page": 2, "post_page": 3}


def _board_page_row(base: str, board_path: list[str], board_url: str, ord_: str) -> dict:
    return {
        "url": f"{board_url}.json",
        "params": "",
        "kind": "board_page",
        "path": board_path,
        "page": 1,
        "state": {"base": base, "board_url": board_url},
        "priority": KIND_PRIORITY["board_page"],
        "ord": ord_,
        "should_retry": 1,
    }


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    """site.json frontier row; a seed below the root (``/c/<slug>/...`` or
    ``/t/<id>...``) rides along as ``state.sub`` so ``board_index`` parsing
    restricts the crawl to that node's subtree — the reference's
    ``write(url) → node_from_url`` semantics (writers/common.py:72-80,
    discourse.py:112-157)."""
    state = {"base": base_url}
    evict: list[str] = []
    if seed_url:
        from ..urls import get_relative_url

        u = seed_url.removesuffix(".json")  # discourse.py:113
        rel = get_relative_url(u, base_url)
        parts = [p for p in rel.split("/") if p]
        if len(parts) > 1 and parts[0] in ("c", "t"):
            state["sub"] = f"{parts[0]}/{parts[1]}"
            if parts[0] == "t":
                # the Thread node keeps the seed-form URL (discourse.py:150)
                state["seed_thread_url"] = u
            if seed_url.endswith(".json"):
                # a *.json seed was already fetched by the detection
                # cascade (should_cache=True): the crawl's read of that
                # page is a CACHE HIT — no refetch, consumed once ->
                # evicted from the final seen set (session.py:105-111)
                import base64 as _b64

                for pf in probes:
                    if pf.status == 200 and pf.url == seed_url:
                        state[f"pc:{pf.url}"] = _b64.b64encode(
                            bytes(pf.body)
                        ).decode()
                        evict.append(pf.url)
                        if parts[0] == "t":
                            # t/<id>.json seed: node_from_url consumes the
                            # cache; the post walk's SECOND access hits the
                            # seen gate -> the reference emits the thread
                            # with ZERO posts (session one-shot semantics)
                            state["no_posts"] = "1"
                        break
    return {
        "frontier": [
            {
                "url": urljoin(base_url, "site.json"),
                "params": "",
                "kind": "board_index",
                "path": [],
                "page": 1,
                "state": state,
                "priority": KIND_PRIORITY["board_index"],
                "ord": f"{next_index:08x}",
                "should_retry": 1,
            }
        ],
        "items": [],
        "evict_probe_urls": evict,
    }


def _item(
    type_: str,
    path: list[str],
    url: str,
    origin: str,
    ord_: str,
    *,
    subpath: list[str] | None = None,
    title: str | None = None,
    author: str | None = None,
    creation_time=None,
    content: str | None = None,
    data: dict | None = None,
    spans=None,
) -> dict:
    return {
        "type": type_,
        "path": path,
        "subpath": subpath,
        "url": url,
        "origin": origin,
        "title": title,
        "author": author,
        "creation_time": creation_time,
        "content": content,
        "content_type": None,
        "content_bytes": None,
        "data": json.dumps(data, sort_keys=True) if data is not None else None,
        "ord": ord_,
        "spans": spans,
    }


def parse(row: dict, status: int, body: bytes, resp_url: str):
    """→ (items, children). ``row`` carries url/kind/path/state/ord/page."""
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "board_index":
        return _parse_board_index(row, body, resp_url)
    if kind == "board_page":
        return _parse_board_page(row, body, resp_url)
    if kind == "thread_page":
        return _parse_thread_page(row, body, resp_url, first=True)
    if kind == "post_page":
        return _parse_thread_page(row, body, resp_url, first=False)
    raise ValueError(f"unknown kind {kind}")


def _parse_board_index(row: dict, body: bytes, resp_url: str):
    base = row["state"]["base"]
    site = json.loads(body)
    items: list[dict] = []
    children: list[dict] = []

    sub = row["state"].get("sub") or ""
    if sub.startswith("t/"):
        # thread seed: no board items at all; one thread_page row for
        # t/<id>.json whose parse emits the Thread node + posts
        # (node_from_url, discourse.py:131-155 + write_thread). The
        # reference fetches it should_cache=True and the post walk
        # consumes it once -> evicted from the final seen set.
        tid = sub[2:]
        top_cats = ",".join(
            str(c["id"]) for c in site["categories"]
            if "parent_category_id" not in c
        )
        t_url = urljoin(base, f"t/{tid}.json")
        t_state = {
            "base": base,
            "thread_seed": "1",
            "seen_evict": "1",
            "seed_thread_url": row["state"].get("seed_thread_url")
            or urljoin(base, f"t/{tid}"),
            "top_cats": top_cats,
        }
        if (b64 := row["state"].get(f"pc:{t_url}")) is not None:
            t_state["cached_body_b64"] = b64
            if row["state"].get("no_posts"):
                t_state["no_posts"] = "1"
        children.append(
            {
                "url": t_url,
                "params": "",
                "kind": "thread_page",
                "path": [],
                "page": 1,
                "state": t_state,
                "priority": KIND_PRIORITY["thread_page"],
                "ord": child(row["ord"], 0),
                "should_retry": 1,
            }
        )
        return items, children

    root_ord = child(row["ord"], 0)
    items.append(_item("board", [], base, base, root_ord, title="", data={}))

    # two passes, mirroring registration order (discourse.py:79-107); the
    # subboard iteration order of the reference is dict insertion order.
    sub_count: dict[str, int] = {}
    board_ords: dict[str, str] = {"": root_ord}
    for cat in site["categories"]:
        if "parent_category_id" not in cat:
            cid = str(cat["id"])
            i = sub_count.setdefault("", 0) + 1
            sub_count[""] = i
            b_ord = child(root_ord, i)  # idx 0 is the (empty) root page chain
            board_ords[cid] = b_ord
            url = urljoin(base, f"c/{cat['slug']}/{cid}")
            items.append(_item("board", [cid], url, resp_url, b_ord, title=cat["name"], data=cat))
            children.append(_board_page_row(base, [cid], url, child(b_ord, 0)))
    for cat in site["categories"]:
        if "parent_category_id" in cat:
            cid = str(cat["id"])
            pid = str(cat["parent_category_id"])
            i = sub_count.setdefault(pid, 0) + 1
            sub_count[pid] = i
            b_ord = child(board_ords[pid], i)
            board_ords[cid] = b_ord
            url = urljoin(base, f"c/{cat['slug']}/{cid}")
            items.append(
                _item("board", [pid, cid], url, resp_url, b_ord, title=cat["name"], data=cat)
            )
            children.append(_board_page_row(base, [pid, cid], url, child(b_ord, 0)))

    if sub.startswith("c/"):
        # board seed: restrict to the matched board's subtree. Slug search
        # order mirrors _get_node_from_url (discourse.py:121-130): top-level
        # boards in registration order, each followed by its own
        # subcategories. Global-DFS ord keys restricted to a subtree sort
        # in exactly the subtree's DFS order, so no re-keying is needed.
        slug = sub[2:]
        nested_by_pid: dict[str, list[dict]] = {}
        for cat in site["categories"]:
            if "parent_category_id" in cat:
                nested_by_pid.setdefault(
                    str(cat["parent_category_id"]), []
                ).append(cat)
        target: list[str] | None = None
        for cat in site["categories"]:
            if "parent_category_id" in cat:
                continue
            if cat["slug"] == slug:
                target = [str(cat["id"])]
                break
            for sc in nested_by_pid.get(str(cat["id"]), ()):
                if sc["slug"] == slug:
                    target = [str(cat["id"]), str(sc["id"])]
                    break
            if target:
                break
        if target is None:
            # reference raises ValueError out of node_from_url
            # (discourse.py:157)
            raise ValueError(f"no board with slug {slug!r} under {base}")
        keep = lambda p: list(p[: len(target)]) == target
        items = [it for it in items if keep(it["path"])]
        children = [ch for ch in children if keep(ch["path"])]
        for ch in children:
            # *.json seed == this board page: consume the probe's cached
            # body instead of refetching (one-shot cache semantics)
            if (b64 := row["state"].get(f"pc:{ch['url']}")) is not None:
                ch["state"]["cached_body_b64"] = b64
    return items, children


def _parse_board_page(row: dict, body: bytes, resp_url: str):
    base = row["state"]["base"]
    page_json = json.loads(body)
    items: list[dict] = []
    children: list[dict] = []
    idx = 0
    for data in page_json["topic_list"]["topics"]:
        tid = str(data["id"])
        t_ord = child(row["ord"], idx)
        idx += 1
        t_url = urljoin(base, f"t/{data['slug']}/{tid}")
        t_path = list(row["path"]) + [tid]
        items.append(_item("thread", t_path, t_url, resp_url, t_ord, title=data["title"], data=data))
        children.append(
            {
                "url": f"{t_url}.json",
                "params": "",
                "kind": "thread_page",
                "path": t_path,
                "page": 1,
                "state": {"base": base},
                "priority": KIND_PRIORITY["thread_page"],
                "ord": child(t_ord, 0),
                "should_retry": 1,
            }
        )
    if more := page_json["topic_list"].get("more_topics_url"):
        p = urlparse(str(more))
        next_url = urljoin(base, urlunparse(p._replace(path=f"{p.path}.json")))
        children.append(
            {
                "url": next_url,
                "params": "",
                "kind": "board_page",
                "path": list(row["path"]),
                "page": row["page"] + 1,
                # one-shot keys (probe-cache body, eviction flags) must NOT
                # ride into the next page: a cached body is consumed exactly
                # once (session.py:105-111) — propagating it would make every
                # later page re-parse page 1's body and never drain
                "state": {
                    k: v
                    for k, v in row["state"].items()
                    if k not in ("cached_body_b64", "seen_evict", "no_posts")
                },
                "priority": KIND_PRIORITY["board_page"],
                "ord": child(row["ord"], idx),
                "should_retry": 1,
            }
        )
    return items, children


def _chunk_params(ids: list[int]) -> str:
    return urlencode(sorted({"post_ids[]": tuple(ids)}.items()), doseq=True)


def _parse_thread_page(row: dict, body: bytes, resp_url: str, first: bool):
    base = row["state"]["base"]
    page_json = json.loads(body)
    items: list[dict] = []
    children: list[dict] = []

    if first and row["state"].get("thread_seed"):
        # seeded directly at a topic: THIS parse emits the Thread node
        # (board-page parses emit it otherwise). Path = (category_id, id)
        # only for TOP-LEVEL categories — the reference's nested-category
        # search loop can never match (discourse.py:143-148 re-tests the
        # root's subboards inside the loop) and raises; quirk preserved.
        cat = str(page_json["category_id"])
        top_cats = (row["state"].get("top_cats") or "").split(",")
        if cat not in top_cats:
            raise ValueError(
                f"topic {page_json['id']} sits in non-top-level category "
                f"{cat}: the reference's node_from_url raises here "
                "(discourse.py:143-148)"
            )
        t_path = [cat, str(page_json["id"])]
        row = dict(row, path=t_path)
        items.append(
            _item(
                "thread",
                t_path,
                row["state"]["seed_thread_url"],
                resp_url,
                row["ord"],  # strict prefix of every post ord below it
                title=page_json.get("title"),
                data={
                    k: v for k, v in page_json.items()
                },
            )
        )
        if row["state"].get("no_posts"):
            # t/<id>.json seed: the post walk's re-access of the consumed
            # cache entry hits the seen gate in the reference -> thread
            # emitted with zero posts (session.py one-shot semantics)
            return items, children

    if first:
        stream = list(page_json["post_stream"]["stream"])
    else:
        stream = [int(x) for x in row["state"]["stream"].split(",") if x]

    idx = 0
    for data in page_json["post_stream"]["posts"]:
        stream.pop(0)
        p_ord = child(row["ord"], idx)
        idx += 1
        cooked = data.get("cooked")
        created = data.get("created_at")
        ct = datetime.fromisoformat(created) if created else None
        if ct is not None and ct.tzinfo is not None:
            # normalize to naive UTC for Spark TimestampType (session TZ=UTC)
            ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
        spans = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in extract_spans(cooked or "", resp_url)
        ]
        items.append(
            _item(
                "post",
                list(row["path"]),
                urljoin(base, f"t/{data['topic_slug']}/{data['topic_id']}/{data['post_number']}"),
                resp_url,
                p_ord,
                subpath=[str(data["id"])],
                author=data.get("username"),
                creation_time=ct,
                content=cooked,
                data=data,
                spans=spans,
            )
        )

    if stream:
        tid = page_json["id"]
        next_ids = stream[:POSTS_PER_FETCH]
        children.append(
            {
                "url": urljoin(base, f"t/{tid}/posts.json"),
                "params": _chunk_params(next_ids),
                "kind": "post_page",
                "path": list(row["path"]),
                "page": row["page"] + 1,
                "state": {"base": base, "stream": ",".join(str(x) for x in stream), "tid": str(tid)},
                "priority": KIND_PRIORITY["post_page"],
                "ord": child(row["ord"], idx),
                "should_retry": 1,
            }
        )
    return items, children
