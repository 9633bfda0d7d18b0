"""Hypermail engine — threaded mail-archive parse branches.

Mirrors forum_dl/extractors/hypermail.py as stateless page→rows functions,
quirks included (see oracle/refsim_hypermail.py for the full list):

- board mode: archive index → period chain (each period row carries the
  remaining period list in state, mirroring HypermailPageState,
  hypermail.py:17-18,158-164); "threads" from every descendant <ul>;
  thread URLs joined against the BASE (hypermail.py:152) so the posts
  candidate is the already-seen index and gets anti-joined away — zero
  posts, like the reference;
- thread mode (post-page seed): directory listing → stack-replay subpaths
  (mailthread.replay_subpaths) → one ``hm_post`` fetch per post; the
  seed's own page is served from the detection cache (cached_body rows,
  one-shot eviction).
"""

from __future__ import annotations

import base64
import re
from datetime import datetime, timezone
from pathlib import PurePosixPath
from urllib.parse import urljoin, urlparse

from ..htmlmini import parse_html
from ..mailthread import address_content, anchor_depth, replay_subpaths
from ..spans import extract_spans
from ..urls import normalize_url
from .discourse import _item
from .ordkey import child

_PAGE_HREF = re.compile(r"^(\d+)/index.html$")
_POST_HREF = re.compile(r"^(\d+).html$")

KIND_PRIORITY = {"hm_index": 0, "hm_period": 1, "hm_thread_page": 2, "hm_post": 3}


def _row(url: str, kind: str, path: list[str], state: dict, ord_: str,
         page: int = 1) -> dict:
    return {
        "url": url, "params": "", "kind": kind, "path": path, "page": page,
        "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
        "should_retry": 1,
    }


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    probe_key = normalize_url(seed_url, remove_suffixes=(), append_slash=False)
    probe_body = b""
    for pf in probes:
        if pf.url == probe_key and pf.status == 200:
            probe_body = pf.body
    b64 = base64.b64encode(probe_body).decode()

    parts = PurePosixPath(urlparse(probe_key).path).parts
    if parts and _POST_HREF.match(parts[-1]):
        # thread mode (node_from_url → Thread, hypermail.py:94-102)
        tid = parts[-1].removesuffix(".html")
        t_ord = f"{next_index:08x}"
        items = [_item("thread", [tid], seed_url, probe_key, t_ord, title="")]
        frontier = [
            _row(urljoin(seed_url, "."), "hm_thread_page", [tid],
                 {"base": base_url, "thread_url": seed_url,
                  "cached_url": probe_key, "cached_b64": b64},
                 child(t_ord, 0))
        ]
        return {"frontier": frontier, "items": items,
                "evict_probe_urls": [probe_key]}

    # board mode
    r_ord = f"{next_index:08x}"
    items = [_item("board", [], base_url, base_url, r_ord, title="")]
    state = {"base": base_url, "cached_url": probe_key, "cached_b64": b64}
    row = _row(base_url, "hm_index", [], state, child(r_ord, 0))
    evict = [probe_key]
    if base_url == probe_key:  # degenerate bare-archive seed
        row["state"]["cached_body_b64"] = b64
    return {"frontier": [row], "items": items, "evict_probe_urls": evict}


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "hm_index":
        return _parse_index(row, body, resp_url)
    if kind == "hm_period":
        return _parse_period(row, body, resp_url)
    if kind == "hm_thread_page":
        return _parse_thread_page(row, body, resp_url)
    if kind == "hm_post":
        return _parse_post(row, body, resp_url)
    raise ValueError(f"unknown kind {kind}")


def _parse_index(row: dict, body: bytes, resp_url: str):
    base = row["state"]["base"]
    doc = parse_html(body.decode("utf-8", "replace"))
    rel = [a.get("href") for a in doc.find_all("a")
           if _PAGE_HREF.match(a.get("href") or "")]
    if not rel:
        return [], []
    first, remaining = rel[0], rel[1:]
    url = urljoin(base, first)
    state = {
        "base": base,
        "periods": ";".join(remaining),
        "cached_url": row["state"].get("cached_url", ""),
        "cached_b64": row["state"].get("cached_b64", ""),
    }
    if url == state["cached_url"]:
        state["cached_body_b64"] = state["cached_b64"]
    return [], [_row(url, "hm_period", [], state, child(row["ord"], 0),
                     page=row["page"] + 1)]


def _parse_period(row: dict, body: bytes, resp_url: str):
    base = row["state"]["base"]
    doc = parse_html(body.decode("utf-8", "replace"))
    mdiv = doc.find("div", class_="messages-list")
    items: list[dict] = []
    children: list[dict] = []
    idx = 0
    if mdiv is not None and (root_ul := mdiv.find("ul")) is not None:
        for child_ul in root_ul.find_all("ul"):
            anchor = next(
                (a for a in child_ul.find_all("a")
                 if _POST_HREF.match(a.get("href") or "")),
                None,
            )
            if anchor is None:
                continue
            href = anchor.get("href")
            tid = _POST_HREF.match(href).group(1)
            t_ord = child(row["ord"], idx)
            idx += 1
            t_url = urljoin(base, href)  # base-join quirk (hypermail.py:152)
            items.append(_item("thread", [tid], t_url, resp_url, t_ord, title=""))
            children.append(
                _row(urljoin(t_url, "."), "hm_thread_page", [tid],
                     {"base": base, "thread_url": t_url}, child(t_ord, 0))
            )
    remaining = [p for p in row["state"].get("periods", "").split(";") if p]
    if remaining:
        url = urljoin(base, remaining[0])
        state = {
            "base": base,
            "periods": ";".join(remaining[1:]),
            "cached_url": row["state"].get("cached_url", ""),
            "cached_b64": row["state"].get("cached_b64", ""),
        }
        if url == state["cached_url"]:
            state["cached_body_b64"] = state["cached_b64"]
        children.append(
            _row(url, "hm_period", [], state, child(row["ord"], idx),
                 page=row["page"] + 1)
        )
    return items, children


def _parse_thread_page(row: dict, body: bytes, resp_url: str):
    tid = row["path"][-1]
    thread_url = row["state"]["thread_url"]
    doc = parse_html(body.decode("utf-8", "replace"))
    root_anchor = doc.find("a", attrs={"href": f"{tid}.html"})
    if root_anchor is None:
        return [], []
    root_pos = anchor_depth(root_anchor)
    children: list[dict] = []
    base_state = {"base": row["state"]["base"]}

    def post_row(url: str, subpath: list[str], i: int) -> dict:
        st = dict(base_state)
        st["subpath"] = ",".join(subpath)
        if url == row["state"].get("cached_url"):
            st["cached_body_b64"] = row["state"].get("cached_b64", "")
        return _row(url, "hm_post", list(row["path"]), st, child(row["ord"], i))

    children.append(post_row(urljoin(thread_url, root_anchor.get("href")), [], 0))

    # find_next("ul") after the root anchor (hypermail.py:179)
    child_ul = None
    seen_anchor = False
    for n in doc.iter():
        if n is root_anchor:
            seen_anchor = True
            continue
        if seen_anchor and n.tag == "ul":
            child_ul = n
            break
    if child_ul is not None:
        anchors = [a for a in child_ul.find_all("a")
                   if _POST_HREF.match(a.get("href") or "")]
        entries = [
            ((anchor_depth(a) - root_pos) // 2,
             _POST_HREF.match(a.get("href")).group(1))
            for a in anchors
        ]
        for i, (a, sp) in enumerate(zip(anchors, replay_subpaths(entries))):
            children.append(post_row(urljoin(resp_url, a.get("href")), list(sp), 1 + i))
    return [], children


def _parse_post(row: dict, body: bytes, resp_url: str):
    doc = parse_html(body.decode("utf-8", "replace"))
    author = None
    ct = None
    for m in doc.find_all("meta"):
        if m.get("name") == "Author":
            author = m.get("content")
        elif m.get("name") == "Date" and m.get("content"):
            ct = datetime.fromisoformat(m.get("content"))
            if ct.tzinfo is not None:
                ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
    content = address_content(doc)
    subpath = [s for s in row["state"].get("subpath", "").split(",") if s]
    spans = [
        {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
        for s in extract_spans(content, resp_url)
    ]
    return [
        _item("post", list(row["path"]), row["url"], resp_url, row["ord"],
              subpath=subpath, author=author, creation_time=ct,
              content=content, spans=spans)
    ], []
