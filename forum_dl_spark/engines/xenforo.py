"""XenForo engine — HtmlExtractor family (see engines/phpbb.py).

Differences from phpBB, mirrored from forum_dl/extractors/xenforo.py:

- only SUBFORUM pages (path depth ≥ 2) are prefetched during
  ``_fetch_top_boards``'s trailing ``_fetch_lower_boards`` call
  (xenforo.py:361-370) — category pages are fetched fresh at their DFS
  position;
- thread ids from the LAST class ``js-threadListItem-N`` (xenforo.py:448);
- dual post layouts (article.message / .MessageCard, xenforo.py:468-505);
- content = ``div.bbWrapper`` inner HTML → the file pipeline (stubs +
  fetch rows + items() join) is identical to phpBB's.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from urllib.parse import urljoin

from ..htmlmini import Node, parse_html
from ..spans import extract_file_refs, extract_spans
from .discourse import _item
from .ordkey import child

_BOARD_CLASS = re.compile(r"^node--id(\d+)$")
_THREAD_CLASS = re.compile(r"^js-threadListItem-(\d+)$")
_POST_ID = re.compile(r"^post-(\d+)$")
_CAT_CLASS = re.compile(r"^block--category(\d+)$")

KIND_PRIORITY = {"home": 0, "board_page": 1, "thread_page": 2, "file": 4}


def _row(url: str, kind: str, path: list[str], page: int, state: dict,
         ord_: str) -> dict:
    return {
        "url": url, "params": "", "kind": kind, "path": path, "page": page,
        "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
        "should_retry": 1,
    }


def _board_tree(doc: Node, base_url: str) -> list[tuple[list[str], str, str]]:
    """Board tree in _boards order (cats then their subs, xenforo.py:299-360)."""
    boards: list[tuple[list[str], str, str]] = []
    for block in doc.find_all("div", class_="block"):
        header = block.find("h2", class_="block-header")
        if header is None:
            continue
        cat_m = next((m for c in block.classes() if (m := _CAT_CLASS.match(c))), None)
        if cat_m is None:
            continue
        cid = cat_m.group(1)
        a = header.find("a")
        boards.append(([cid], urljoin(base_url, a.get("href")), a.string().strip()))
        for nd in block.find_all("div"):
            m = next((mm for c in nd.classes() if (mm := _BOARD_CLASS.match(c))), None)
            if m is None:
                continue
            anchor = nd.find("a", attrs={"data-shortcut": "node-description"})
            boards.append(
                ([cid, m.group(1)], urljoin(base_url, anchor.get("href")),
                 anchor.string().strip())
            )
    return boards


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
    boards = _board_tree(doc, base_url)

    subs = [b for b in boards if len(b[0]) >= 2]
    dfs_root = f"{next_index + len(subs):08x}"
    items, board_ord = _board_items_and_ords(boards, base_url, dfs_root)

    frontier = []
    # subforum prefetch rows: trace ord = prefetch position, children get
    # DFS ords; the cached page-1 read evicts the key (session.py:105-111)
    for i, (path, url, title) in enumerate(subs):
        frontier.append(
            _row(url, "board_page", path, 1,
                 {"base": base_url, "dfs": child(board_ord[tuple(path)], 0),
                  "seen_evict": "1"},
                 f"{next_index + i:08x}")
        )
    # category pages: fresh fetches at their DFS positions
    for path, url, title in boards:
        if len(path) == 1:
            dfs = child(board_ord[tuple(path)], 0)
            frontier.append(
                _row(url, "board_page", path, 1, {"base": base_url, "dfs": dfs}, dfs)
            )
    return {"frontier": frontier, "items": items,
            "evict_probe_urls": [base_url]}


def _seed_via_home(base_url: str, next_index: int, probes: list, seed_url: str) -> dict:
    """node_from_url seeding below the root (xenforo.py:394-440): the mode
    (board subtree / single thread / root) is decided from the probe's
    cached copy of the seed page, exactly as the reference decides it from
    its should_cache fetch; the homepage (= fetch_top_boards) becomes a
    ``home`` frontier row since query seeds never probe it."""
    import base64

    pc = next((pf for pf in probes if pf.status == 200 and pf.url == seed_url), None)
    assert pc is not None, "below-root seed must be among the detection probes"
    doc = parse_html(bytes(pc.body).decode("utf-8", "replace"))
    bc = doc.find("ul", class_="p-breadcrumbs")
    anchors = bc.find_all("a", attrs={"itemprop": "item"}) if bc is not None else []
    state: dict[str, str] = {
        "base": base_url,
        "pc_url": pc.url,
        "pc_b64": base64.b64encode(bytes(pc.body)).decode(),
    }
    evict: list[str] = []
    if bc is None or len(anchors) <= 1:
        # no breadcrumbs → root (xenforo.py:398-405); the homepage IS
        # consumed (by the root board's page-1 read) → evicted
        state["mode"] = "root"
        state["seen_evict"] = "1"
    elif (
        doc.find("article") is not None
        or doc.find("div", class_="MessageCard") is not None
    ):
        state["mode"] = "thread"
        state["board_url"] = urljoin(seed_url, anchors[-2].get("href"))
        block = next(
            d for d in doc.find_all("div", class_="block-container")
            if d.get("data-lb-id")
        )
        state["tid"] = re.match(r"^thread-(\d+)$", block.get("data-lb-id")).group(1)
        state["title"] = doc.find("h1").string()
        state["t_url"] = urljoin(base_url, seed_url)
        if state["t_url"] == pc.url:
            evict.append(pc.url)  # thread page 1 consumes the probe cache
    else:
        state["mode"] = "board"
        og = doc.find("meta", attrs={"property": "og:url"}).get("content")
        state["og"] = og
        if og == pc.url:
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
    """fetch_top_boards for a below-root seed: build the board tree, then
    emit the subforum prefetch rows + items restricted to the seed node."""
    base = row["state"]["base"]
    mode = row["state"]["mode"]
    doc = parse_html(body.decode("utf-8", "replace"))
    boards = _board_tree(doc, base)
    home_ord = row["ord"]
    subs = [b for b in boards if len(b[0]) >= 2]
    children: list[dict] = []

    if mode == "thread":
        bpath = next(
            (tuple(p) for p, u, _t in boards if u == row["state"]["board_url"]),
            None,
        )
        if bpath is None:
            # reference: board not registered -> ValueError (xenforo.py:440)
            raise ValueError(f"thread board {row['state']['board_url']!r} unknown")
        t_path = list(bpath) + [row["state"]["tid"]]
        t_ord = child(home_ord, len(subs))
        items = [
            _item("thread", t_path, row["state"]["t_url"], row["state"]["pc_url"],
                  t_ord, title=row["state"]["title"])
        ]
        # every subforum is still prefetched (fetch_top_boards' trailing
        # _fetch_lower_boards) but none is ever consumed → all stay in seen
        for i, (path, url, _t) in enumerate(subs):
            children.append(
                _row(url, "board_page", list(path), 1,
                     {"base": base, "skip": "1"}, child(home_ord, i))
            )
        tstate = {"base": base, "dfs": child(t_ord, 0)}
        if row["state"]["t_url"] == row["state"]["pc_url"]:
            tstate["cached_body_b64"] = row["state"]["pc_b64"]
            tstate["seen_evict"] = "1"
        children.append(
            _row(row["state"]["t_url"], "thread_page", t_path, 1, tstate,
                 child(t_ord, 0))
        )
        return items, children

    dfs_root = child(home_ord, len(subs))
    all_items, board_ord = _board_items_and_ords(boards, base, dfs_root)
    target: tuple | None = None
    if mode == "board":
        og = row["state"]["og"]
        target = next((tuple(p) for p, u, _t in boards if u == og), None)
        if target is None:
            raise ValueError(f"no board with og:url {og!r}")
    keep = lambda p: target is None or tuple(p[: len(target)]) == target
    items = [it for it in all_items if keep(it["path"])]

    for i, (path, url, _t) in enumerate(subs):
        st: dict[str, str] = {"base": base}
        if keep(path):
            st["dfs"] = child(board_ord[tuple(path)], 0)
            st["seen_evict"] = "1"
            if row["state"].get("pc_url") == url:
                st["cached_body_b64"] = row["state"]["pc_b64"]
        else:
            st["skip"] = "1"
        children.append(_row(url, "board_page", list(path), 1, st, child(home_ord, i)))
    # category pages: fresh fetches at their DFS positions, subtree only
    for path, url, _t in boards:
        if len(path) == 1 and keep(path):
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
        if n.tag == "a" and "pageNav-jump--next" in n.classes():
            return n.get("href")
    return None


def _parse_board_page(row: dict, body: bytes, resp_url: str):
    if row["state"].get("skip"):
        # subforum prefetch outside the seeded subtree: fetched (it is in
        # the reference trace) but its threads are never written
        return [], []
    base = row["state"]["base"]
    dfs = row["state"].get("dfs") or row["ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items: list[dict] = []
    children: list[dict] = []
    idx = 0
    for tag in doc.find_all(class_="structItem--thread"):
        m = _THREAD_CLASS.match(tag.classes()[-1])
        if m is None:
            continue
        tid = m.group(1)
        ta = tag.find(class_="structItem-title").find("a", attrs={"data-tp-primary": True})
        href = urljoin(base, ta.get("href"))
        t_ord = child(dfs, idx)
        idx += 1
        t_path = list(row["path"]) + [tid]
        items.append(_item("thread", t_path, href, resp_url, t_ord, title=ta.string()))
        children.append(
            _row(href, "thread_page", t_path, 1,
                 {"base": base, "dfs": child(t_ord, 0)}, child(t_ord, 0))
        )
    if nxt := _next_href(doc):
        n_ord = child(dfs, idx)
        children.append(
            _row(urljoin(resp_url, nxt), "board_page", list(row["path"]),
                 row["page"] + 1, {"base": base, "dfs": n_ord}, n_ord)
        )
    return items, children


def _parse_thread_page(row: dict, body: bytes, resp_url: str):
    base = row["state"]["base"]
    dfs = row["state"].get("dfs") or row["ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items: list[dict] = []
    children: list[dict] = []
    idx = 0
    tags = [
        n for n in doc.iter()
        if (n.tag == "article" and "message" in n.classes())
        or "MessageCard" in n.classes()
    ]
    for tag in tags:
        attr_ul = tag.find("ul", class_="message-attribution-main")
        if attr_ul is not None:
            pid = _POST_ID.match(tag.get("data-content") or "").group(1)
            author = tag.get("data-author")
            url_anchor = attr_ul.find("a")
            time_tag = attr_ul.find("time")
        else:
            header = tag.find("header", class_="MessageCard__header")
            pid = tag.find("div", class_="MessageCard__content").get("data-post-id")
            author = tag.find("a", class_="MessageCard__user-info__name").string()
            url_anchor = header.find("a", class_="MessageCard__date-created")
            time_tag = header.find("time")
        ct = datetime.fromisoformat(time_tag.get("datetime"))
        if ct.tzinfo is not None:
            ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
        content = tag.find("div", class_="bbWrapper").inner_html()
        p_ord = child(dfs, idx)
        idx += 1
        p_path = list(row["path"])
        spans = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in extract_spans(content, resp_url)
        ]
        items.append(
            _item("post", p_path, urljoin(row["url"], url_anchor.get("href")),
                  resp_url, p_ord, subpath=[pid], author=author,
                  creation_time=ct, content=content, spans=spans)
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
                items.append(
                    _item("file", p_path, ref.url, resp_url, f_ord,
                          subpath=[pid, ref.url])
                )
                if not ref.url.startswith("data:"):
                    # data-URI media decode at export time — never fetched
                    # (writers/common.py:162-167,178-181)
                    children.append(_row(ref.url, "file", p_path, 1, {"base": base}, f_ord))
    if nxt := _next_href(doc):
        n_ord = child(dfs, idx)
        children.append(
            _row(urljoin(resp_url, nxt), "thread_page", list(row["path"]),
                 row["page"] + 1, {"base": base, "dfs": n_ord}, n_ord)
        )
    return items, children
