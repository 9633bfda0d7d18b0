"""Invision engine — HtmlExtractor family (see engines/phpbb.py).

Per forum_dl/extractors/invision.py: EVERY board (categories included) is
prefetched by the trailing ``_fetch_lower_boards`` (invision.py:131-152)
and later one-shot evicted; board titles are first registered with the
CATEGORY title (invision.py:118-128) and corrected by the prefetch update
— the emitted value is the corrected one, which equals the board's own
grid-anchor text (taken from the homepage here). Pagination via
``link[rel=next]``; posts are ``article.ipsComment#elComment_P`` with
commentContent inner HTML (unstripped).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from urllib.parse import urljoin

from ..htmlmini import Node, parse_html
from ..spans import extract_file_refs, extract_spans
from .discourse import _item
from .ordkey import child

_EL_COMMENT = re.compile(r"^elComment_(\d+)")
KIND_PRIORITY = {"home": 0, "board_page": 1, "thread_page": 2, "file": 4}


def _row(url, kind, path, page, state, ord_):
    return {"url": url, "params": "", "kind": kind, "path": path, "page": page,
            "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
            "should_retry": 1}


def _board_tree(doc: Node) -> list[tuple[list[str], str, str]]:
    boards: list[tuple[list[str], str, str]] = []
    for li in doc.find_all("li", class_="cForumRow"):
        cid = li.get("data-categoryid")
        ca = li.find("h2").find_all("a")[1]
        boards.append(([cid], ca.get("href"), ca.string()))
        for grid in li.find_all("div", class_="cForumGrid"):
            bid = grid.get("data-forumid")
            ba = grid.find("h3", class_="cForumGrid__title").find("a")
            # emitted title = the post-prefetch corrected value (the board's
            # own anchor text); the buggy initial category-title registration
            # (invision.py:118-128) never reaches the writer
            boards.append(([cid, bid], ba.get("href"), ba.string()))
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
    doc = parse_html(body.decode("utf-8", "replace"))
    boards = _board_tree(doc)

    dfs_root = f"{next_index + len(boards):08x}"
    items, board_ord = _board_items_and_ords(boards, base_url, dfs_root)
    frontier = []
    for i, (path, url, title) in enumerate(boards):
        # prefetch row: trace ord = prefetch position; one-shot evicted
        frontier.append(
            _row(url, "board_page", path, 1,
                 {"base": base_url, "dfs": child(board_ord[tuple(path)], 0),
                  "seen_evict": "1"},
                 f"{next_index + i:08x}")
        )
    return {"frontier": frontier, "items": items, "evict_probe_urls": [base_url]}


def _board_items_and_ords(
    boards: list[tuple[list[str], str, str]], base_url: str, dfs_root: str
) -> tuple[list[dict], dict[tuple, str]]:
    items = [_item("board", [], base_url, base_url, dfs_root, title="")]
    board_ord: dict[tuple, str] = {(): dfs_root}
    board_url: dict[tuple, str] = {(): base_url}
    child_count: dict[tuple, int] = {}
    for path, url, title in boards:
        parent = tuple(path[:-1])
        j = child_count.get(parent, 0) + 1
        child_count[parent] = j
        b_ord = child(board_ord[parent], j)
        board_ord[tuple(path)] = b_ord
        board_url[tuple(path)] = url
        # depth-2 boards' origin is overwritten to their category's page
        # URL by the prefetch's re-registration update (invision.py:131-152
        # + the _set_board update branch); categories keep the homepage
        origin = board_url[parent] if len(path) > 1 else base_url
        items.append(_item("board", path, url, origin, b_ord, title=title))
    return items, board_ord


def _seed_via_home(base_url: str, next_index: int, probes: list, seed_url: str) -> dict:
    """node_from_url seeding below the root (invision.py:154-185): mode is
    decided from the probe's cached seed page; the homepage (fetch_top_boards)
    becomes a ``home`` frontier row."""
    import base64

    pc = next((pf for pf in probes if pf.status == 200 and pf.url == seed_url), None)
    assert pc is not None, "below-root seed must be among the detection probes"
    doc = parse_html(bytes(pc.body).decode("utf-8", "replace"))
    bl = doc.find("ul", attrs={"data-role": "breadcrumbList"})
    lis = bl.find_all("li") if bl is not None else []
    state: dict[str, str] = {
        "base": base_url,
        "pc_url": pc.url,
        "pc_b64": base64.b64encode(bytes(pc.body)).decode(),
    }
    evict: list[str] = []
    if len(lis) <= 2:
        state["mode"] = "root"
        state["seen_evict"] = "1"  # homepage consumed by the root page-1 read
    elif doc.find("article") is not None:
        state["mode"] = "thread"
        state["board_url"] = lis[-2].find("a").get("href")
        state["tid"] = doc.find("body").get("data-pageid")
        state["title"] = str(
            doc.find("meta", attrs={"property": "og:title"}).get("content")
        )
        evict.append(pc.url)  # thread page 1 consumes the probe cache
    else:
        state["mode"] = "board"
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
    """fetch_top_boards for a below-root seed: build the tree, emit the
    prefetch rows (EVERY board, cats included) + subtree-restricted items."""
    import base64

    base = row["state"]["base"]
    mode = row["state"]["mode"]
    doc = parse_html(body.decode("utf-8", "replace"))
    boards = _board_tree(doc)
    home_ord = row["ord"]
    children: list[dict] = []

    if mode == "thread":
        bpath = next(
            (tuple(p) for p, u, _t in boards if u == row["state"]["board_url"]),
            None,
        )
        if bpath is None:
            raise ValueError(f"thread board {row['state']['board_url']!r} unknown")
        t_path = list(bpath) + [row["state"]["tid"]]
        t_ord = child(home_ord, len(boards))
        items = [
            _item("thread", t_path, row["state"]["pc_url"], row["state"]["pc_url"],
                  t_ord, title=row["state"]["title"])
        ]
        for i, (path, url, _t) in enumerate(boards):
            # prefetched but never consumed → stays in the final seen set
            children.append(
                _row(url, "board_page", list(path), 1,
                     {"base": base, "skip": "1"}, child(home_ord, i))
            )
        children.append(
            _row(row["state"]["pc_url"], "thread_page", t_path, 1,
                 {"base": base, "dfs": child(t_ord, 0),
                  "cached_body_b64": row["state"]["pc_b64"],
                  "seen_evict": "1"},
                 child(t_ord, 0))
        )
        return items, children

    dfs_root = child(home_ord, len(boards))
    all_items, board_ord = _board_items_and_ords(boards, base, dfs_root)
    target: tuple | None = None
    if mode == "board":
        target = next(
            (tuple(p) for p, u, _t in boards if u == row["state"]["pc_url"]), None
        )
        if target is None:
            # reference: url not among _boards -> ValueError (invision.py:185)
            raise ValueError(f"no board with url {row['state']['pc_url']!r}")
    keep = lambda p: target is None or tuple(p[: len(target)]) == target
    items = [it for it in all_items if keep(it["path"])]
    for i, (path, url, _t) in enumerate(boards):
        st: dict[str, str] = {"base": base}
        if keep(path):
            st["dfs"] = child(board_ord[tuple(path)], 0)
            st["seen_evict"] = "1"
            if row["state"].get("pc_url") == url:
                st["cached_body_b64"] = row["state"]["pc_b64"]
        else:
            st["skip"] = "1"
        children.append(_row(url, "board_page", list(path), 1, st, child(home_ord, i)))
    return items, children


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
    if kind == "home":
        return _parse_home(row, body, resp_url)
    if kind == "board_page":
        if row["state"].get("skip"):
            # node_from_url prefetch outside the seeded subtree
            return [], []
        return _parse_board_page(row, body, resp_url)
    if kind == "thread_page":
        return _parse_thread_page(row, body, resp_url)
    if kind == "file":
        return [], []
    raise ValueError(f"unknown kind {kind}")


def _next_href(doc: Node) -> str | None:
    ln = doc.find("link", attrs={"rel": "next"})
    return ln.get("href") if ln is not None else None


def _parse_board_page(row, body, resp_url):
    base = row["state"]["base"]
    dfs = row["state"].get("dfs") or row["ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items, children, idx = [], [], 0
    for li in doc.find_all("li", attrs={"data-controller": "forums.frontforum.topicRow"}):
        a = li.find("h4", class_="ipsDataItem_title").find("a", attrs={"title": True})
        tid = li.get("data-rowid")
        t_ord = child(dfs, idx)
        idx += 1
        t_path = list(row["path"]) + [tid]
        items.append(_item("thread", t_path, a.get("href"), resp_url, t_ord,
                           title=a.get("title")))
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
    for art in doc.find_all("article", class_="ipsComment"):
        content = art.find("div", attrs={"data-role": "commentContent"}).inner_html()
        pane = art.find("div", class_="cAuthorPane_content")
        author = pane.find("h3", class_="cAuthorPane_author").find("a").string()
        ct = datetime.fromisoformat(pane.find("time").get("datetime"))
        if ct.tzinfo is not None:
            ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
        url = pane.find("div").find("a").get("href")
        pid = _EL_COMMENT.match(art.get("id") or "").group(1)
        p_ord = child(dfs, idx)
        idx += 1
        p_path = list(row["path"])
        spans = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in extract_spans(content, resp_url)
        ]
        items.append(_item("post", p_path, url, resp_url, p_ord, subpath=[pid],
                           author=author, creation_time=ct, content=content,
                           spans=spans))
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
