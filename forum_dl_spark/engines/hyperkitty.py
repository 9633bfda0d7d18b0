"""HyperKitty engine — mail-archive parse branches (see
oracle/refsim_hyperkitty.py for the mirrored semantics: chunk-wide
first-match time/messagelink bugs, per-chunk replay reset, page-link
pagination).

Kinds: ``hk_index`` (archive index pagination — the root-seed
``_fetch_lazy_subboards`` walk, hyperkitty.py:182-201) → ``hk_list``
(list-page board registration; for a list seed this is the raw node fetch
and the lazy re-read is a cache hit on the same key) → ``hk_latest``
(thread listings) → ``hk_thread`` (root post page) → ``hk_replies`` (JSON
chunks). ``hk_node_thread`` is the thread-seed ``_get_node_from_url``
fetch (hyperkitty.py:130-158): when the normalized thread URL equals the
raw seed key, the posts crawl consumes that cache entry one-shot
(``seen_evict``) and parses inline.
"""

from __future__ import annotations

import base64
import json
import re
from pathlib import PurePosixPath
from urllib.parse import urljoin, urlparse

from ..htmlmini import parse_html
from ..mailthread import replay_subpaths
from ..oracle.refsim_hyperkitty import _LATEST_PAGE, _REPLY_LEVEL, parse_sender_time
from ..spans import extract_spans
from ..urls import normalize_url
from .discourse import _item
from .ordkey import child

KIND_PRIORITY = {"hk_index": 0, "hk_node_thread": 0, "hk_list": 0,
                 "hk_latest": 1, "hk_thread": 2, "hk_replies": 3}


def _row(url, kind, path, page, state, ord_):
    return {"url": url, "params": "", "kind": kind, "path": path, "page": page,
            "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
            "should_retry": 1}


def _probe_body(probes: list, key: str) -> bytes | None:
    body = None
    for pf in probes:
        if pf.url == key and pf.status == 200:
            body = pf.body
    return body


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    resolved = normalize_url(seed_url)
    probe_key = normalize_url(seed_url, append_slash=False)
    node_key = seed_url  # _resolve_url is the identity (common.py:246-247)
    parts = PurePosixPath(urlparse(resolved).path).parts

    if resolved == base_url:
        return _seed_root(base_url, next_index, probes, node_key, probe_key)
    if len(parts) >= 4 and parts[-2] == "thread":
        return _seed_thread(base_url, next_index, probes, node_key, probe_key,
                            resolved, parts[-3], parts[-1])

    # list seed (hyperkitty.py:155-156): node_from_url fetches the raw
    # seed; the lazy-subboard re-read of the slash-normalized URL is a
    # cache hit on the same key
    list_id = parts[-1]
    return {
        "frontier": [
            _row(seed_url, "hk_list", [list_id], 1,
                 {"base": base_url, "list": list_id,
                  "dfs_root": f"{next_index + 1:08x}"},
                 f"{next_index:08x}")
        ],
        "items": [],
    }


def _seed_root(base_url, next_index, probes, node_key, probe_key) -> dict:
    a_ord = f"{next_index:08x}"
    b_ord = f"{next_index + 1:08x}"
    idx_state = {"base": base_url, "reg_start": "0", "b_ord": b_ord}
    rows = []
    if node_key != probe_key:
        if base_url == node_key:
            # the raw node fetch doubles as index page 1 (the walk's
            # should_cache re-read of base_url hits the node entry)
            rows.append(_row(node_key, "hk_index", [], 1, idx_state, a_ord))
        else:
            rows.append(_row(node_key, "hk_node_root", [], 1,
                             {"base": base_url}, a_ord))
            st = dict(idx_state)
            if base_url == probe_key:
                pb = _probe_body(probes, probe_key)
                if pb is not None:
                    st["cached_body_b64"] = base64.b64encode(pb).decode()
            rows.append(_row(base_url, "hk_index", [], 1, st, child(a_ord, 1)))
    else:
        st = dict(idx_state)
        if base_url == probe_key:
            pb = _probe_body(probes, probe_key)
            if pb is not None:
                st["cached_body_b64"] = base64.b64encode(pb).decode()
        rows.append(_row(base_url, "hk_index", [], 1, st, a_ord))
    # write_board(root) emits the root board object first
    # (writers/common.py:101-108; root fields per common.py:152-154)
    items = [_item("board", [], base_url, base_url, b_ord, title="")]
    return {"frontier": rows, "items": items}


def _seed_thread(base_url, next_index, probes, node_key, probe_key,
                 resolved, board_id, thread_id) -> dict:
    t_ord = f"{next_index:08x}"
    if node_key == probe_key:
        # node fetch is a should_cache cache hit on the detection probe —
        # no trace row; the probe body gives the title driver-side
        pb = _probe_body(probes, probe_key) or b""
        doc = parse_html(pb.decode("utf-8", "replace"))
        h3 = doc.find("div", class_="thread-header").find("h3")
        items = [_item("thread", [board_id, thread_id], resolved, resolved,
                       t_ord, title=h3.string())]
        evict = []
        if resolved == probe_key:
            # posts crawl consumes the probe entry one-shot
            st = {"base": base_url, "thread_url": resolved,
                  "cached_body_b64": base64.b64encode(pb).decode()}
            frontier = [_row(resolved, "hk_thread", [board_id, thread_id], 1,
                             st, child(t_ord, 0))]
            evict = [probe_key]
        else:
            frontier = [_row(resolved, "hk_thread", [board_id, thread_id], 1,
                             {"base": base_url, "thread_url": resolved},
                             child(t_ord, 0))]
        return {"frontier": frontier, "items": items,
                "evict_probe_urls": evict}

    posts_inline = resolved == node_key
    st = {"base": base_url, "thread_url": resolved,
          "board_id": board_id, "thread_id": thread_id,
          "t_ord": t_ord, "posts_inline": "1" if posts_inline else "0"}
    if posts_inline:
        # the posts crawl's get(thread.url) consumes the node fetch's
        # cache entry (should_cache=False, session.py:105-111) — the key
        # is traced but evicted from the final seen set
        st["seen_evict"] = "1"
    return {"frontier": [_row(node_key, "hk_node_thread",
                              [board_id, thread_id], 1, st, t_ord)],
            "items": []}


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "hk_index":
        return _parse_index(row, body, resp_url)
    if kind == "hk_node_root":
        return [], []  # fetch-only: confirms resolved == base (root node)
    if kind == "hk_node_thread":
        return _parse_node_thread(row, body, resp_url)
    if kind == "hk_list":
        return _parse_list(row, body, resp_url)
    if kind == "hk_latest":
        return _parse_latest(row, body, resp_url)
    if kind == "hk_thread":
        return _parse_thread(row, body, resp_url)
    if kind == "hk_replies":
        return _parse_replies(row, body, resp_url)
    raise ValueError(f"unknown kind {kind}")


def _parse_index(row, body, resp_url):
    """One ``_fetch_lazy_subboards`` index page (hyperkitty.py:182-201):
    ``a.list-name`` anchors register boards (each a real ``list/<id>``
    fetch); ``page_link_anchors[-1]``'s href chains the walk until ``#``.
    Registration-trace ords chain under the index row; board subtrees get
    item-phase ords under ``b_ord`` so every registration fetch sorts
    before every board-crawl fetch, matching the reference's
    walk-then-write order."""
    base = row["state"]["base"]
    reg_start = int(row["state"]["reg_start"])
    b_ord = row["state"]["b_ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    anchors = doc.find_all("a", class_="list-name")
    children = []
    for i, a in enumerate(anchors):
        lid = PurePosixPath(urlparse(a.get("href")).path).parts[-1]
        lurl = normalize_url(urljoin(base, f"list/{lid}"))
        children.append(
            _row(lurl, "hk_list", [lid], 1,
                 {"base": base, "list": lid,
                  "dfs_root": child(b_ord, reg_start + i)},
                 child(row["ord"], i))
        )
    page_links = doc.find_all("a", class_="page-link")
    href = page_links[-1].get("href")
    if href != "#":
        children.append(
            _row(urljoin(base, href), "hk_index", [], row["page"] + 1,
                 {"base": base, "reg_start": str(reg_start + len(anchors)),
                  "b_ord": b_ord},
                 child(row["ord"], len(anchors)))
        )
    return [], children


def _parse_node_thread(row, body, resp_url):
    """Thread-seed ``_get_node_from_url`` fetch (hyperkitty.py:136-153):
    emits the Thread node item; when the normalized thread URL equals this
    row's key the posts crawl is a one-shot cache hit on this very fetch
    (parsed inline, entry evicted via ``seen_evict``), otherwise the posts
    page is a real fetch."""
    st = row["state"]
    thread_url = st["thread_url"]
    t_ord = st["t_ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    h3 = doc.find("div", class_="thread-header").find("h3")
    items = [_item("thread", [st["board_id"], st["thread_id"]], thread_url,
                   thread_url, t_ord, title=h3.string())]
    sub_row = {"url": thread_url, "params": "", "kind": "hk_thread",
               "path": [st["board_id"], st["thread_id"]], "page": 1,
               "state": {"base": st["base"], "thread_url": thread_url},
               "priority": KIND_PRIORITY["hk_thread"],
               "ord": child(t_ord, 0), "should_retry": 1}
    if st["posts_inline"] == "1":
        p_items, p_children = _parse_thread(sub_row, body, resp_url)
        return items + p_items, p_children
    return items, [sub_row]


def _parse_list(row, body, resp_url):
    base = row["state"]["base"]
    list_id = row["state"]["list"]
    dfs_root = row["state"]["dfs_root"]
    doc = parse_html(body.decode("utf-8", "replace"))
    title = ""
    sect = doc.find("section", attrs={"id": "title"})
    if sect is not None:
        h = sect.find("h1") or sect.find("h2")
        if h is not None:
            title = h.string().strip()
    board_url = normalize_url(urljoin(base, f"list/{list_id}"))
    items = [_item("board", [list_id], board_url, board_url, dfs_root, title=title)]
    children = [
        _row(urljoin(board_url, "latest"), "hk_latest", [list_id], 1,
             {"base": base, "list": list_id}, child(dfs_root, 0))
    ]
    return items, children


def _parse_latest(row, body, resp_url):
    base = row["state"]["base"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items, children, idx = [], [], 0
    for a in doc.find_all("a", class_="thread-title"):
        tid = a.get("name")
        t_ord = child(row["ord"], idx)
        idx += 1
        t_url = urljoin(row["url"], a.get("href"))
        t_path = list(row["path"]) + [tid]
        title = str(a.children[-1]).strip() if a.children else ""
        items.append(_item("thread", t_path, t_url, row["url"], t_ord, title=title))
        children.append(
            _row(t_url, "hk_thread", t_path, 1,
                 {"base": base, "thread_url": t_url}, child(t_ord, 0))
        )
    page_links = [n for n in doc.iter() if "page-link" in n.classes()]
    if page_links:
        m = _LATEST_PAGE.match(row["url"])
        cur_page = int(m.group(1)) if m else 1
        last_page = int(page_links[-2].string())
        if cur_page < last_page:
            n_ord = child(row["ord"], idx)
            children.append(
                _row(urljoin(row["url"], f"latest?page={cur_page + 1}"), "hk_latest",
                     list(row["path"]), row["page"] + 1, dict(row["state"]), n_ord)
            )
    return items, children


def _spans_of(content: str, base_url: str):
    return [
        {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
        for s in extract_spans(content, base_url)
    ]


def _parse_thread(row, body, resp_url):
    base = row["state"]["base"]
    thread_url = row["state"]["thread_url"]
    doc = parse_html(body.decode("utf-8", "replace"))
    author = doc.find("div", class_="email-author").find("a").string()
    time_span = doc.find("div", class_="time").find("span")
    content = doc.find("div", class_="email-body").inner_html()
    link = doc.find("div", class_="messagelink").find("a").get("href")
    items = [
        _item("post", list(row["path"]), urljoin(thread_url, link), thread_url,
              child(row["ord"], 0), subpath=[],
              author=author, creation_time=parse_sender_time(time_span.get("title")),
              content=content, spans=_spans_of(content, thread_url))
    ]
    children = [
        _row(urljoin(thread_url, "replies?sort=thread"), "hk_replies",
             list(row["path"]), row["page"] + 1,
             {"base": base, "thread_url": thread_url}, child(row["ord"], 1))
    ]
    return items, children


def _parse_replies(row, body, resp_url):
    base = row["state"]["base"]
    payload = json.loads(body)
    d = parse_html(payload["replies_html"])
    blocks = [
        n for n in d.iter()
        if n.tag == "div" and ("even" in n.classes() or "odd" in n.classes())
    ]
    items, children = [], []
    if blocks:
        first_time = d.find("div", class_="time").find("span").get("title")
        first_link = d.find("div", class_="messagelink").find("a").get("href")
        entries = []
        for b in blocks:
            level = 0
            for klass in b.classes():
                lm = _REPLY_LEVEL.match(klass)
                if lm:
                    level = int(lm.group(1))
                    break
            entries.append((level, b.find("div", class_="email-header").get("id")))
        url = urljoin(row["url"], first_link)
        ct = parse_sender_time(first_time)
        for i, (b, sp) in enumerate(zip(blocks, replay_subpaths(entries))):
            content = b.find("div", class_="email-body").inner_html()
            items.append(
                _item("post", list(row["path"]), url, row["url"],
                      child(row["ord"], i), subpath=list(sp),
                      author=b.find("div", class_="email-author").find("a").string(),
                      creation_time=ct, content=content,
                      spans=_spans_of(content, row["url"]))
            )
    if payload["more_pending"]:
        children.append(
            _row(urljoin(row["url"], f"replies?sort=thread&offset={payload['next_offset']}"),
                 "hk_replies", list(row["path"]), row["page"] + 1,
                 dict(row["state"]), child(row["ord"], len(blocks)))
        )
    return items, children
