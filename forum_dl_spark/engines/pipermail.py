"""Pipermail engine — mail-archive parse branches
(see oracle/refsim_pipermail.py for the mirrored reference semantics and
quirks; the stack replay shares mailthread.replay_subpaths with hypermail,
driven by comment-marker long-id chain lengths).

Kinds: ``pm_listinfo`` (board registration fetch) → ``pm_index`` (archive
index, no trailing slash) → ``pm_period`` (thread.html pages chained via
state) → ``pm_thread`` (thread-seed only: the period page re-read; in
board mode this candidate is the already-visited period page and is
anti-joined away → zero posts, like the reference) → ``pm_post``.
"""

from __future__ import annotations

import base64
import re
from datetime import datetime, timezone
from pathlib import PurePosixPath
from urllib.parse import urljoin, urlparse

from ..htmlmini import Comment, Node, parse_html
from ..mailthread import replay_subpaths
from ..oracle.refsim_pipermail import (
    _CHILD_COMMENT,
    _LISTINFO_TITLE,
    _PAGE_HREF,
    _POST_HREF,
    _ROOT_COMMENT,
    strip_quotes,
)
from ..spans import extract_spans
from ..urls import normalize_url
from .discourse import _item
from .ordkey import child

KIND_PRIORITY = {"pm_root_index": 0, "pm_listinfo": 0, "pm_index": 1,
                 "pm_period": 1, "pm_thread": 2, "pm_post": 3}


def _row(url, kind, path, page, state, ord_):
    return {"url": url, "params": "", "kind": kind, "path": path, "page": page,
            "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
            "should_retry": 1}


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    """``_get_node_from_url`` dispatch (pipermail.py:120-164), branch order
    preserved: base → thread/thread.html under a pipermail period → period
    URL → mailman/listinfo/<list> → pipermail/<list> → any other 2+-part
    path falls back to the ROOT crawl. The node fetch of the raw seed is
    always a cache hit on pipermail's own detection probe (same raw key,
    pipermail.py:64, 121)."""
    probe_key = normalize_url(seed_url, append_slash=False)
    probe_body = b""
    for pf in probes:
        if pf.url == probe_key and pf.status == 200:
            probe_body = pf.body
    resolved = normalize_url(seed_url)
    parts = PurePosixPath(urlparse(resolved).path).parts

    if resolved == base_url:
        return _seed_root(base_url, next_index)

    if len(parts) >= 4 and parts[-4] == "pipermail" and parts[-1] != "thread.html":
        # thread-seed mode
        tid = parts[-1].removesuffix(".html")
        list_id = parts[-3]
        doc = parse_html(probe_body.decode("utf-8", "replace"))
        t_ord = f"{next_index:08x}"
        items = [_item("thread", [list_id, tid], seed_url, probe_key, t_ord,
                       title=doc.find("title").string())]
        frontier = [
            _row(urljoin(seed_url, "thread.html"), "pm_thread", [list_id, tid], 1,
                 {"base": base_url, "thread_url": seed_url,
                  "cached_url": probe_key,
                  "cached_b64": base64.b64encode(probe_body).decode()},
                 child(t_ord, 0))
        ]
        return {"frontier": frontier, "items": items,
                "evict_probe_urls": [probe_key]}

    if len(parts) >= 4 and parts[-4] == "pipermail":
        # thread.html seed → its board; the board crawl's read of this
        # very period page is a one-shot cache hit on the probe
        list_id = parts[-3]
        evict = [probe_key]
    elif len(parts) >= 3 and parts[-3] == "pipermail":
        # period URL seed → its board; probe never re-read (stays seen)
        list_id = parts[-2]
        evict = []
    elif len(parts) >= 3 and parts[-3] == "mailman" and parts[-2] == "listinfo":
        # listinfo URL seed → that list; the registration fetch uses the
        # slash-normalized key, so the probe stays cached
        list_id = parts[-1]
        evict = []
    elif len(parts) >= 2 and parts[-2] == "pipermail":
        # archive-index seed: the board crawl's index read IS the probed
        # page — a one-shot cache hit (no trace row)
        list_id = parts[-1]
        evict = [probe_key]
    elif len(parts) >= 2:
        # any other path falls back to the root (pipermail.py:162)
        return _seed_root(base_url, next_index)
    else:
        raise ValueError(f"pipermail node_from_url: unresolvable {seed_url}")

    li_url = normalize_url(
        urljoin(base_url, f"mailman/listinfo/{list_id.replace('@', '_')}")
    )
    st = {"base": base_url, "list": list_id,
          "dfs_root": f"{next_index + 1:08x}",
          "cached_url": probe_key,
          "cached_b64": base64.b64encode(probe_body).decode()}
    if li_url == probe_key:
        st["cached_body_b64"] = st["cached_b64"]
    frontier = [
        _row(li_url, "pm_listinfo", [list_id], 1, st, f"{next_index:08x}")
    ]
    return {"frontier": frontier, "items": [], "evict_probe_urls": evict}


def _seed_root(base_url: str, next_index: int) -> dict:
    """Root crawl: write_board(root) → no root threads (pipermail.py:199-
    200), then the ``_fetch_lazy_subboards`` registration walk (one
    ``mailman/listinfo/`` index fetch + one listinfo page per list,
    pipermail.py:186-197), then each board written in registration order."""
    a_ord = f"{next_index:08x}"
    b_ord = f"{next_index + 1:08x}"
    reg_url = normalize_url(urljoin(base_url, "mailman/listinfo"))
    rows = [_row(reg_url, "pm_root_index", [], 1,
                 {"base": base_url, "b_ord": b_ord}, a_ord)]
    items = [_item("board", [], base_url, base_url, b_ord, title="")]
    return {"frontier": rows, "items": items}


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "pm_root_index":
        return _parse_root_index(row, body, resp_url)
    if kind == "pm_listinfo":
        return _parse_listinfo(row, body, resp_url)
    if kind == "pm_index":
        return _parse_index(row, body, resp_url)
    if kind == "pm_period":
        return _parse_period(row, body, resp_url)
    if kind == "pm_thread":
        return _parse_thread(row, body, resp_url)
    if kind == "pm_post":
        return _parse_post(row, body, resp_url)
    raise ValueError(f"unknown kind {kind}")


_LISTINFO_HREF = re.compile(r"^listinfo/(.+)$")


def _parse_root_index(row, body, resp_url):
    """The ``_fetch_lazy_subboards`` registry page (pipermail.py:186-197):
    one listinfo-page registration fetch per ``listinfo/<id>`` anchor, in
    anchor order. Registration trace ords chain under this row; each
    board's subtree gets an item-phase ord under ``b_ord`` so every
    registration fetch sorts before every board-crawl fetch."""
    base = row["state"]["base"]
    b_ord = row["state"]["b_ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    children = []
    i = 0
    for a in doc.find_all("a"):
        m = _LISTINFO_HREF.match(a.get("href") or "")
        if not m:
            continue
        list_id = m.group(1)
        li_url = normalize_url(
            urljoin(base, f"mailman/listinfo/{list_id.replace('@', '_')}")
        )
        children.append(
            _row(li_url, "pm_listinfo", [list_id], 1,
                 {"base": base, "list": list_id, "dfs_root": child(b_ord, i)},
                 child(row["ord"], i))
        )
        i += 1
    return [], children


def _parse_listinfo(row, body, resp_url):
    base = row["state"]["base"]
    list_id = row["state"]["list"]
    dfs_root = row["state"]["dfs_root"]
    doc = parse_html(body.decode("utf-8", "replace"))
    title = _LISTINFO_TITLE.match(doc.find("title").string()).group(1)
    items = [_item("board", [list_id], row["url"], resp_url, dfs_root, title=title)]
    idx_url = urljoin(base, f"pipermail/{list_id}")
    st = {"base": base, "list": list_id}
    if "cached_url" in row["state"]:
        st["cached_url"] = row["state"]["cached_url"]
        st["cached_b64"] = row["state"].get("cached_b64", "")
    if idx_url == row["state"].get("cached_url"):
        st["cached_body_b64"] = row["state"].get("cached_b64", "")
    children = [_row(idx_url, "pm_index", [list_id], 1, st, child(dfs_root, 0))]
    return items, children


def _parse_index(row, body, resp_url):
    base = row["state"]["base"]
    list_id = row["state"]["list"]
    doc = parse_html(body.decode("utf-8", "replace"))
    rel = [a.get("href") for a in doc.find_all("a")
           if _PAGE_HREF.match(a.get("href") or "")]
    if not rel:
        return [], []
    url = urljoin(urljoin(base, f"pipermail/{list_id}/"), rel[0])
    state = {"base": base, "list": list_id, "periods": ";".join(rel[1:])}
    if "cached_url" in row["state"]:
        state["cached_url"] = row["state"]["cached_url"]
        state["cached_b64"] = row["state"].get("cached_b64", "")
        if url == state["cached_url"]:
            # a thread.html seed: this period read is a one-shot cache
            # hit on the probed page (session.py:105-111)
            state["cached_body_b64"] = state["cached_b64"]
    return [], [_row(url, "pm_period", [list_id], row["page"] + 1, state,
                     child(row["ord"], 0))]


def _parse_period(row, body, resp_url):
    base = row["state"]["base"]
    list_id = row["state"]["list"]
    doc = parse_html(body.decode("utf-8", "replace"))
    walked = list(doc.walk())
    items, children, idx = [], [], 0
    for i, n in enumerate(walked):
        if isinstance(n, Comment) and _ROOT_COMMENT.match(n):
            anchor = next(
                (m for m in walked[i + 1:]
                 if isinstance(m, Node) and m.tag == "a"
                 and _POST_HREF.match(m.get("href") or "")),
                None,
            )
            if anchor is None:
                continue
            href = anchor.get("href")
            tid = _POST_HREF.match(href).group(1)
            t_ord = child(row["ord"], idx)
            idx += 1
            t_url = urljoin(row["url"], href)
            t_path = [list_id, tid]
            items.append(_item("thread", t_path, t_url, resp_url, t_ord,
                               title=anchor.string()))
            # posts target the SAME period page → seen-gated in board mode
            children.append(
                _row(urljoin(t_url, "thread.html"), "pm_thread", t_path, 1,
                     {"base": base, "thread_url": t_url}, child(t_ord, 0))
            )
    remaining = [p for p in row["state"].get("periods", "").split(";") if p]
    if remaining:
        url = urljoin(urljoin(base, f"pipermail/{list_id}/"), remaining[0])
        nstate = {"base": base, "list": list_id,
                  "periods": ";".join(remaining[1:])}
        if "cached_url" in row["state"]:
            nstate["cached_url"] = row["state"]["cached_url"]
            nstate["cached_b64"] = row["state"].get("cached_b64", "")
            if url == nstate["cached_url"]:
                nstate["cached_body_b64"] = nstate["cached_b64"]
        children.append(
            _row(url, "pm_period", [list_id], row["page"] + 1, nstate,
                 child(row["ord"], idx))
        )
    return items, children


def _parse_thread(row, body, resp_url):
    base = row["state"]["base"]
    thread_url = row["state"]["thread_url"]
    tid = row["path"][-1]
    doc = parse_html(body.decode("utf-8", "replace"))
    walked = list(doc.walk())
    try:
        anchor_i = next(
            i for i, n in enumerate(walked)
            if isinstance(n, Node) and n.tag == "a"
            and n.get("href") == f"{tid}.html"
        )
    except StopIteration:
        return [], []
    root_comment = next(
        n for n in reversed(walked[:anchor_i]) if isinstance(n, Comment)
    )
    long_id = _ROOT_COMMENT.match(str(root_comment)).group(1)

    def post_row(url, subpath, i):
        st = {"base": base, "subpath": ",".join(subpath)}
        if url == row["state"].get("cached_url"):
            st["cached_body_b64"] = row["state"].get("cached_b64", "")
        return _row(url, "pm_post", list(row["path"]), 1, st, child(row["ord"], i))

    children = [post_row(thread_url, [tid], 0)]
    entries, anchors = [], []
    for i, n in enumerate(walked):
        if isinstance(n, Comment) and _CHILD_COMMENT.match(n) and any(
            n.startswith(f"{d} {long_id}-") for d in "123"
        ):
            chain = _CHILD_COMMENT.match(n).group(3).split("-")
            a = next(
                (m for m in walked[i + 1:]
                 if isinstance(m, Node) and m.tag == "a"
                 and _POST_HREF.match(m.get("href") or "")),
                None,
            )
            if a is None:
                continue
            entries.append((len(chain), _POST_HREF.match(a.get("href")).group(1)))
            anchors.append(a)
    for i, (a, sp) in enumerate(zip(anchors, replay_subpaths(entries))):
        children.append(post_row(urljoin(resp_url, a.get("href")), list(sp), 1 + i))
    return [], children


def _parse_post(row, body, resp_url):
    doc = parse_html(body.decode("utf-8", "replace"))
    content = strip_quotes(doc.find("pre").inner_html())
    author = doc.find("b").string()
    ct = datetime.fromisoformat(doc.find("i").string())
    if ct.tzinfo is not None:
        ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
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
