"""HyperKitty engine — mail-archive parse branches (see
oracle/refsim_hyperkitty.py for the mirrored semantics: chunk-wide
first-match time/messagelink bugs, per-chunk replay reset, page-link
pagination).

Kinds: ``hk_list`` (the raw-seed node fetch; the lazy subboard
registration is a cache hit on the same key) → ``hk_latest`` (thread
listings) → ``hk_thread`` (root post page) → ``hk_replies`` (JSON chunks).
"""

from __future__ import annotations

import json
import re
from urllib.parse import urljoin

from ..htmlmini import parse_html
from ..mailthread import replay_subpaths
from ..oracle.refsim_hyperkitty import _LATEST_PAGE, _REPLY_LEVEL, parse_sender_time
from ..spans import extract_spans
from ..urls import normalize_url
from .discourse import _item
from .ordkey import child

KIND_PRIORITY = {"hk_list": 0, "hk_latest": 1, "hk_thread": 2, "hk_replies": 3}


def _row(url, kind, path, page, state, ord_):
    return {"url": url, "params": "", "kind": kind, "path": path, "page": page,
            "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
            "should_retry": 1}


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    from pathlib import PurePosixPath
    from urllib.parse import urlparse

    list_id = PurePosixPath(urlparse(normalize_url(seed_url)).path).parts[-1]
    # node_from_url fetches the raw seed; the lazy-subboard re-read of the
    # slash-normalized URL is a cache hit on the same key
    return {
        "frontier": [
            _row(seed_url, "hk_list", [list_id], 1,
                 {"base": base_url, "list": list_id,
                  "dfs_root": f"{next_index + 1:08x}"},
                 f"{next_index:08x}")
        ],
        "items": [],
    }


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "hk_list":
        return _parse_list(row, body, resp_url)
    if kind == "hk_latest":
        return _parse_latest(row, body, resp_url)
    if kind == "hk_thread":
        return _parse_thread(row, body, resp_url)
    if kind == "hk_replies":
        return _parse_replies(row, body, resp_url)
    raise ValueError(f"unknown kind {kind}")


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
