"""vBulletin engine — HtmlExtractor family (see engines/phpbb.py).

Per forum_dl/extractors/vbulletin.py: base from ``<base href>``; NO board
prefetch on a base seed (node_from_url returns root before the board
branch, vbulletin.py:295-301) — all board/category pages are fetched fresh
at their DFS positions; comment rows (``li.b-post.b-comment``) are
selected but skipped (vbulletin.py:352-354).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from urllib.parse import urljoin

from ..htmlmini import Node, parse_html
from ..spans import extract_file_refs, extract_spans
from .discourse import _item
from .ordkey import child

_FORUM_ID = re.compile(r"^forum(\d+)$")
KIND_PRIORITY = {"home": 0, "board_page": 1, "thread_page": 2, "file": 4}


def _row(url, kind, path, page, state, ord_):
    return {"url": url, "params": "", "kind": kind, "path": path, "page": page,
            "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
            "should_retry": 1}


def _board_tree(doc: Node) -> list[tuple[list[str], str, str]]:
    boards: list[tuple[list[str], str, str]] = []
    cat_id = None
    for tr in doc.find_all("tr"):
        cls = tr.classes()
        if "category-header" in cls:
            cat_id = _FORUM_ID.match(tr.get("id") or "").group(1)
            a = tr.find("a", class_="category")
            boards.append(([cat_id], a.get("href"), a.string()))
        elif "forum-item" in cls and cat_id is not None:
            bid = _FORUM_ID.match(tr.get("id") or "").group(1)
            a = tr.find("a", class_="forum-title")
            boards.append(([cat_id, bid], a.get("href"), a.string()))
    return boards


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    if seed_url and seed_url.rstrip("/") != base_url.rstrip("/"):
        return _seed_via_home(base_url, next_index, probes, seed_url)
    body = None
    for pf in probes:
        if pf.status == 200 and pf.url.rstrip("/") == base_url.rstrip("/"):
            body = pf.body
            break
    assert body is not None
    boards = _board_tree(parse_html(body.decode("utf-8", "replace")))

    dfs_root = f"{next_index:08x}"
    items, board_ord = _board_items_and_ords(boards, base_url, dfs_root)
    frontier = []
    for path, url, title in boards:
        dfs = child(board_ord[tuple(path)], 0)
        frontier.append(_row(url, "board_page", path, 1,
                             {"base": base_url, "dfs": dfs}, dfs))
    return {"frontier": frontier, "items": items, "evict_probe_urls": [base_url]}


def _board_items_and_ords(
    boards: list[tuple[list[str], str, str]], base_url: str, dfs_root: str
) -> tuple[list[dict], dict[tuple, str]]:
    items = [_item("board", [], base_url, base_url, dfs_root, title="")]
    board_ord: dict[tuple, str] = {(): dfs_root}
    child_count: dict[tuple, int] = {}
    for path, url, title in boards:
        parent = tuple(path[:-1])
        i = child_count.get(parent, 0) + 1
        child_count[parent] = i
        b_ord = child(board_ord[parent], i)
        board_ord[tuple(path)] = b_ord
        items.append(_item("board", path, url, base_url, b_ord, title=title))
    return items, board_ord


def _seed_via_home(base_url: str, next_index: int, probes: list, seed_url: str) -> dict:
    """node_from_url seeding below the root (vbulletin.py:294-330): mode is
    decided from the probe's cached seed page; the homepage (fetch_top_boards)
    becomes a ``home`` frontier row. vB has NO board prefetch, so only the
    seeded subtree's pages are ever fetched."""
    import base64

    pc = next((pf for pf in probes if pf.status == 200 and pf.url == seed_url), None)
    assert pc is not None, "below-root seed must be among the detection probes"
    doc = parse_html(bytes(pc.body).decode("utf-8", "replace"))
    anchors = doc.find_all("a", class_="crumb-link")
    state: dict[str, str] = {
        "base": base_url,
        "pc_url": pc.url,
        "pc_b64": base64.b64encode(bytes(pc.body)).decode(),
    }
    evict: list[str] = []
    if len(anchors) <= 1:
        state["mode"] = "root"
        state["seen_evict"] = "1"  # homepage consumed by the root page-1 read
    elif doc.find("h2", class_="b-post__title") is not None:
        state["mode"] = "thread"
        state["crumbs"] = "\x00".join(a.get("href") or "" for a in anchors)
        state["tid"] = doc.find("input", attrs={"name": "nodeid"}).get("value")
        state["title"] = doc.find("h1", class_="main-title").string()
        evict.append(pc.url)  # thread page 1 consumes the probe cache
    else:
        # board matched by the LAST crumb's TITLE (vbulletin.py:324-328)
        state["mode"] = "board"
        state["btitle"] = anchors[-1].string()
        evict.append(pc.url)  # the board's page-1 read consumes it
    frontier = [
        {
            "url": base_url, "params": "", "kind": "home", "path": [],
            "page": 1, "state": state, "priority": KIND_PRIORITY["home"],
            "ord": f"{next_index:08x}", "should_retry": 1,
        }
    ]
    return {"frontier": frontier, "items": [], "evict_probe_urls": evict}


def _parse_home(row: dict, body: bytes, resp_url: str):
    base = row["state"]["base"]
    mode = row["state"]["mode"]
    boards = _board_tree(parse_html(body.decode("utf-8", "replace")))
    home_ord = row["ord"]
    children: list[dict] = []

    if mode == "thread":
        crumb_urls = (row["state"]["crumbs"] or "").split("\x00")
        subs_of: dict[tuple, list[tuple[tuple, str]]] = {}
        for path, url, _t in boards:
            subs_of.setdefault(tuple(path[:-1]), []).append((tuple(path), url))
        cur: tuple = ()
        for cu in crumb_urls[2:]:
            for p, u in subs_of.get(cur, ()):
                if u == cu:
                    cur = p
        t_path = list(cur) + [row["state"]["tid"]]
        t_ord = child(home_ord, 0)
        items = [
            _item("thread", t_path, row["state"]["pc_url"], row["state"]["pc_url"],
                  t_ord, title=row["state"]["title"])
        ]
        children.append(
            _row(row["state"]["pc_url"], "thread_page", t_path, 1,
                 {"base": base, "dfs": child(t_ord, 0),
                  "cached_body_b64": row["state"]["pc_b64"],
                  "seen_evict": "1"},
                 child(t_ord, 0))
        )
        return items, children

    dfs_root = child(home_ord, 0)
    all_items, board_ord = _board_items_and_ords(boards, base, dfs_root)
    target: tuple | None = None
    if mode == "board":
        bt = row["state"]["btitle"]
        target = next((tuple(p) for p, _u, t in boards if t == bt), None)
        if target is None:
            raise ValueError(f"no board titled {bt!r}")
    keep = lambda p: target is None or tuple(p[: len(target)]) == target
    items = [it for it in all_items if keep(it["path"])]
    for path, url, _t in boards:
        if not keep(path):
            continue  # never fetched: vB has no prefetch
        dfs = child(board_ord[tuple(path)], 0)
        st = {"base": base, "dfs": dfs}
        if row["state"].get("pc_url") == url:
            st["cached_body_b64"] = row["state"]["pc_b64"]
            st["seen_evict"] = "1"
        children.append(_row(url, "board_page", list(path), 1, st, dfs))
    return items, children


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "home":
        return _parse_home(row, body, resp_url)
    if kind == "board_page":
        return _parse_board_page(row, body, resp_url)
    if kind == "thread_page":
        return _parse_thread_page(row, body, resp_url)
    if kind == "file":
        return [], []
    raise ValueError(f"unknown kind {kind}")


def _next_href(doc: Node) -> str | None:
    for n in doc.iter():
        if n.tag == "a" and "right-arrow" in n.classes() and n.get("href"):
            return n.get("href")
    return None


def _parse_board_page(row, body, resp_url):
    base = row["state"]["base"]
    dfs = row["state"].get("dfs") or row["ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items, children, idx = [], [], 0
    for tr in doc.find_all("tr", class_="topic-item"):
        a = tr.find("a", class_="topic-title")
        tid = tr.get("data-node-id")
        t_ord = child(dfs, idx)
        idx += 1
        t_path = list(row["path"]) + [tid]
        items.append(_item("thread", t_path, a.get("href"), resp_url, t_ord,
                           title=a.string()))
        children.append(_row(a.get("href"), "thread_page", t_path, 1,
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
    for li in doc.find_all("li", class_="b-post"):
        if "b-comment" in li.classes():
            continue  # vbulletin.py:352-354
        url_anchor = li.find("a", class_="b-post__count")
        content = li.find("div", class_="js-post__content-text").inner_html().strip()
        author = li.find("div", class_="author").find("a").string()
        ct = datetime.fromisoformat(
            li.find("time", attrs={"itemprop": "dateCreated"}).get("datetime")
        )
        if ct.tzinfo is not None:
            ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
        pid = li.get("data-node-id")
        p_ord = child(dfs, idx)
        idx += 1
        p_path = list(row["path"])
        spans = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in extract_spans(content, resp_url)
        ]
        items.append(_item("post", p_path, url_anchor.get("href"), resp_url,
                           p_ord, subpath=[pid], author=author,
                           creation_time=ct, content=content, spans=spans))
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
