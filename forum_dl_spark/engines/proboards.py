"""ProBoards engine — HtmlExtractor family (see engines/phpbb.py).

Per forum_dl/extractors/proboards.py: detection is fetchless (netloc), so
the board tree is built from a bootstrap ``board_index`` fetch of the
homepage (try_get cached, later consumed by the root page read → one-shot
evicted); every board (category fragment URLs included) is prefetched and
evicted. Thread rows are ``a.thread-link.thread-T`` minus the
``/threads/recent`` link; posts are ``tr.item#post-P`` with epoch-ms
timestamps and synthesized ``post/{id}/thread`` URLs.

Fixture shape note: multi-category sites trigger the reference's emergent
cross-registration (global ``tr#board-`` parse on category pages); the
oracle models it, the fixtures default to one category.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..htmlmini import Node, parse_html
from ..oracle.refsim_proboards import ts_ms_to_dt
from ..spans import extract_file_refs, extract_spans
from .discourse import _item
from .ordkey import child

_CAT_NAME = re.compile(r"^category-(\d+)$")
_BOARD_ID = re.compile(r"^board-(\d+)$")
_THREAD_CLASS = re.compile(r"^thread-(\d+)$")
_POST_ID = re.compile(r"^post-(\d+)$")

KIND_PRIORITY = {"board_index": 0, "board_page": 1, "thread_page": 2, "file": 4}


def _row(url, kind, path, page, state, ord_):
    return {"url": url, "params": "", "kind": kind, "path": path, "page": page,
            "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
            "should_retry": 1}


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    # subtree seeding is unsupported by the REFERENCE itself
    # (proboards.py:283-322): at node_from_url time only the root and the
    # category stubs are registered (proboards.py:211-236), so the thread
    # branch's breadcrumb board-URL match can never succeed, and the board
    # branch compares cur_board.path[-1] against the literal string
    # "board" (proboards.py:317-318) — starting with root's EMPTY path
    # (IndexError). Any non-root seed crashes the reference; mirror that
    # with a clear error.
    from pathlib import PurePosixPath
    from urllib.parse import urlparse

    if seed_url:
        parts = PurePosixPath(urlparse(seed_url).path).parts
        if len(parts) > 1:
            raise ValueError(
                "proboards supports only root seeds: the reference's "
                "node_from_url cannot resolve board or thread URLs "
                "(proboards.py:283-322 — boards are unregistered at node "
                "time and the board branch matches the literal 'board')"
            )
    # the pre-proboards probes already fetched the homepage; fetch_top_boards
    # is a cache hit (one-shot evicted later by the root page read)
    import base64

    body = b""
    for pf in probes:
        if pf.status == 200 and pf.url.rstrip("/") == base_url.rstrip("/"):
            body = pf.body
    state = {
        "base": base_url,
        "start": str(next_index),
        "cached_body_b64": base64.b64encode(body).decode(),
    }
    return {
        "frontier": [
            _row(base_url, "board_index", [], 1, state, f"{next_index:08x}")
        ],
        "items": [],
        "evict_probe_urls": [base_url],
    }


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "board_index":
        return _parse_index(row, body, resp_url)
    if kind == "board_page":
        return _parse_board_page(row, body, resp_url)
    if kind == "thread_page":
        return _parse_thread_page(row, body, resp_url)
    if kind == "file":
        return [], []
    raise ValueError(f"unknown kind {kind}")


def _parse_index(row: dict, body: bytes, resp_url: str):
    base = row["state"]["base"]
    doc = parse_html(body.decode("utf-8", "replace"))
    boards: list[tuple[list[str], str, str]] = []
    for ca in doc.find_all("a"):
        m = _CAT_NAME.match(ca.get("name") or "")
        if m is None:
            continue
        cid = m.group(1)
        title, boards_div, seen = None, None, False
        for n in doc.iter():
            if n is ca:
                seen = True
                continue
            if seen and n.tag == "div" and "title_wrapper" in n.classes() and title is None:
                title = n.string()
            if seen and n.tag == "div" and "boards" in n.classes() and boards_div is None:
                boards_div = n
            if title is not None and boards_div is not None:
                break
        boards.append(([cid], urljoin(resp_url, f"#category-{cid}"), title or ""))
        for tr in (boards_div.find_all("tr") if boards_div is not None else []):
            bm = _BOARD_ID.match(tr.get("id") or "")
            if bm is None:
                continue
            anchor = next(
                (a for a in tr.find_all("a")
                 if any(_BOARD_ID.match(c) for c in a.classes())),
                None,
            )
            if anchor is None:
                continue
            boards.append(
                ([cid, bm.group(1)], urljoin(base, anchor.get("href")),
                 anchor.string())
            )

    # prefetch positions continue right after the detection probes
    start = int(row["state"]["start"])
    dfs_root = f"{start + len(boards):08x}"
    items = [_item("board", [], base, base, dfs_root, title="")]
    board_ord: dict[tuple, str] = {(): dfs_root}
    child_count: dict[tuple, int] = {}
    children = []
    for i, (path, url, title) in enumerate(boards):
        parent = tuple(path[:-1])
        j = child_count.get(parent, 0) + 1
        child_count[parent] = j
        b_ord = child(board_ord[parent], j)
        board_ord[tuple(path)] = b_ord
        # board origin: depth-2 boards are re-registered (updated) during
        # their category's prefetch → origin = the category page URL
        origin = urljoin(resp_url, f"#category-{path[0]}") if len(path) == 2 else resp_url
        items.append(_item("board", path, url, origin, b_ord, title=title))
        children.append(
            _row(url, "board_page", path, 1,
                 {"base": base, "dfs": child(b_ord, 0), "seen_evict": "1"},
                 f"{start + i:08x}")
        )
    return items, children


def _next_href(doc: Node) -> str | None:
    for n in doc.iter():
        if "next" in n.classes():
            a = n if n.tag == "a" else n.find("a")
            if a is not None and a.get("href"):
                return a.get("href")
    return None


def _parse_board_page(row, body, resp_url):
    base = row["state"]["base"]
    dfs = row["state"].get("dfs") or row["ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items, children, idx = [], [], 0
    for a in doc.find_all("a", class_="thread-link"):
        if (a.get("href") or "").startswith("/threads/recent"):
            continue
        m = next((mm for c in a.classes() if (mm := _THREAD_CLASS.match(c))), None)
        if m is None:
            continue
        tid = m.group(1)
        href = urljoin(base, a.get("href"))
        t_ord = child(dfs, idx)
        idx += 1
        t_path = list(row["path"]) + [tid]
        items.append(_item("thread", t_path, href, resp_url, t_ord, title=a.string()))
        children.append(_row(href, "thread_page", t_path, 1,
                             {"base": base, "dfs": child(t_ord, 0)}, child(t_ord, 0)))
    if nxt := _next_href(doc):
        n_ord = child(dfs, idx)
        children.append(_row(urljoin(resp_url, nxt), "board_page",
                             list(row["path"]), row["page"] + 1,
                             {"base": base, "dfs": n_ord}, n_ord))
    return items, children


def _parse_thread_page(row, body, resp_url):
    base = row["state"]["base"]
    dfs = row["state"].get("dfs") or row["ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items, children, idx = [], [], 0
    for tr in doc.find_all("tr", class_="item"):
        pm = _POST_ID.match(tr.get("id") or "")
        if pm is None:
            continue
        pid = pm.group(1)
        user = tr.find("a", class_="o-user-link")
        abbr = tr.find("abbr", class_="time")
        content = tr.find("div", class_="message").inner_html()
        p_ord = child(dfs, idx)
        idx += 1
        p_path = list(row["path"])
        spans = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in extract_spans(content, resp_url)
        ]
        items.append(
            _item("post", p_path, urljoin(base, f"post/{pid}/thread"), resp_url,
                  p_ord, subpath=[pid],
                  author=user.string() if user is not None else "",
                  creation_time=ts_ms_to_dt(int(abbr.get("data-timestamp"))),
                  content=content, spans=spans)
        )
        for ref in extract_file_refs(content, resp_url):
            f_ord = child(dfs, idx)
            idx += 1
            if ref.content is not None:
                it = _item("file", p_path, ref.url, resp_url, f_ord, subpath=[pid])
                it["content_type"] = ref.content_type
                it["content_bytes"] = ref.content
                items.append(it)
            else:
                items.append(_item("file", p_path, ref.url, resp_url, f_ord,
                                   subpath=[pid, ref.url]))
                if not ref.url.startswith("data:"):
                    # data-URI media decode at export time — never fetched
                    # (writers/common.py:162-167,178-181)
                    children.append(_row(ref.url, "file", p_path, 1,
                                         {"base": base}, f_ord))
    if nxt := _next_href(doc):
        n_ord = child(dfs, idx)
        children.append(_row(urljoin(resp_url, nxt), "thread_page",
                             list(row["path"]), row["page"] + 1,
                             {"base": base, "dfs": n_ord}, n_ord))
    return items, children
