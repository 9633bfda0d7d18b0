"""phpBB engine — stateless page→rows functions for the Spark crawl.

Re-expresses forum_dl/extractors/phpbb.py + the HtmlExtractor machinery
(forum_dl/extractors/common.py:404-569). Fetch-schedule quirks mirrored:

- the reference's ``node_from_url`` prefetches EVERY board page via
  ``_fetch_lower_boards`` (common.py:253-259), then board page 1 is served
  from the one-shot cache (session.py:105-111). Engine equivalent: the
  seed emits one ``board_page`` frontier row per board whose *trace ord* is
  its prefetch position while its children get *DFS ords* (carried in
  ``state['dfs']``) — so both the fetch trace and the emission order sort
  correctly;
- post-content files are downloaded at emission time by the writer
  (writers/common.py:168-189): the engine emits a file item stub + a
  ``file`` fetch row per content file; duplicates dedup via the seen gate;
  ``CrawlResult.items()`` joins stubs with fetched bodies;
- page-level files (``path=()``) are dropped (outside_files defaults
  False, options.py:163-167; writers/common.py:145-146) — not emitted,
  not fetched;
- inline SVG files carry their bytes directly (common.py:555-563).

Board items are emitted at seed time (the reference registers the whole
two-level tree from the homepage, phpbb.py:282-335; deeper nesting would be
discovered from board pages — not present in phpBB fixture shapes).
"""

from __future__ import annotations

import base64
from datetime import datetime
from pathlib import PurePosixPath
from urllib.parse import parse_qs, urljoin, urlparse

from ..htmlmini import Node, parse_html
from ..spans import extract_file_refs, extract_spans
from ..urls import normalize_url
from .discourse import _item  # shared item-dict shape
from .ordkey import child

KIND_PRIORITY = {"home": 0, "board_page": 1, "thread_page": 2, "file": 4}


def _row(url: str, kind: str, path: list[str], page: int, state: dict,
         ord_: str) -> dict:
    return {
        "url": url,
        "params": "",
        "kind": kind,
        "path": path,
        "page": page,
        "state": state,
        "priority": KIND_PRIORITY[kind],
        "ord": ord_,
        "should_retry": 1,
    }


def _board_tree(doc: Node, base_url: str) -> list[tuple[list[str], str, str]]:
    """Board tree in _boards insertion order (phpbb.py:282-335):
    ``(path, url, title)`` per board, two levels from the homepage."""
    boards: list[tuple[list[str], str, str]] = []
    for block in doc.find_all("div", class_="forabg"):
        header = block.find("li", class_="header")
        cat_id = None
        if header and (a := header.find("a")):
            q = parse_qs(urlparse(a.get("href") or "").query)
            if "f" in q:
                cat_id = q["f"][0]
                boards.append(
                    ([cat_id], urljoin(base_url, f"viewforum.php?f={cat_id}"), a.string())
                )
        for sub_a in block.find_all("a", class_="forumtitle"):
            q = parse_qs(urlparse(sub_a.get("href") or "").query)
            if "f" not in q:
                continue
            sid = q["f"][0]
            path = [cat_id, sid] if cat_id else [sid]
            boards.append(
                (path, urljoin(base_url, f"viewforum.php?f={sid}"), sub_a.string())
            )
    return boards


def _board_items_and_ords(
    boards: list[tuple[list[str], str, str]], base_url: str, dfs_root: str
) -> tuple[list[dict], dict[tuple, str]]:
    """DFS item ords rooted at ``dfs_root`` + the per-board ord map."""
    items = [_item("board", [], base_url, base_url, dfs_root, title="")]
    board_ord: dict[tuple, str] = {(): dfs_root}
    board_url: dict[tuple, str] = {(): base_url}
    child_count: dict[tuple, int] = {}
    for path, url, title in boards:
        parent = tuple(path[:-1])
        i = child_count.get(parent, 0) + 1  # idx 0 is the page chain
        child_count[parent] = i
        b_ord = child(board_ord[parent], i)
        board_ord[tuple(path)] = b_ord
        board_url[tuple(path)] = url
        # subboards' origin is overwritten by _do_fetch_subboards during the
        # node_from_url prefetch (the _set_board update branch,
        # common.py:186-188, called with origin=parent-page response URL)
        origin = board_url[parent] if len(path) > 1 else base_url
        items.append(_item("board", path, url, origin, b_ord, title=title))
    return items, board_ord


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    """Driver-side seeding from the detection probes' homepage body.

    A seed at ``viewforum.php``/``viewtopic.php`` goes through a ``home``
    frontier row instead (the homepage is not among the probes for a
    query-carrying seed) — the reference's node_from_url restriction
    (phpbb.py:379-428)."""
    sp_parts = PurePosixPath(urlparse(seed_url or "").path).parts
    last = sp_parts[-1] if len(sp_parts) > 1 else ""
    if last in ("viewforum.php", "viewtopic.php"):
        return _seed_via_home(base_url, next_index, probes, seed_url, last)

    body = None
    for pf in probes:
        if pf.status == 200 and pf.url.rstrip("/") == base_url.rstrip("/"):
            body = pf.body
            break
    assert body is not None, "homepage must be among the detection probes"
    doc = parse_html(body.decode("utf-8", "replace"))
    boards = _board_tree(doc, base_url)

    # DFS item ords: root after the prefetch trace positions
    dfs_root = f"{next_index + len(boards):08x}"
    items, board_ord = _board_items_and_ords(boards, base_url, dfs_root)

    frontier = []
    for i, (path, url, title) in enumerate(boards):
        dfs_page1 = child(board_ord[tuple(path)], 0)
        frontier.append(
            _row(url, "board_page", path, 1,
                 # prefetched with should_cache=True and consumed exactly
                 # once by page-1 parsing → one-shot-evicted from the
                 # reference's final seen set (session.py:105-111)
                 {"base": base_url, "dfs": dfs_page1, "seen_evict": "1"},
                 f"{next_index + i:08x}")
        )
    # the homepage (cached by the earlier probes) is consumed once by the
    # root board's page-1 read → also evicted
    return {"frontier": frontier, "items": items, "evict_probe_urls": [base_url]}


def _seed_via_home(
    base_url: str, next_index: int, probes: list, seed_url: str, last: str
) -> dict:
    """node_from_url seeding below the root (phpbb.py:379-428): one ``home``
    row fetches the homepage (= the reference's fetch_top_boards get) and
    its parse emits the board-prefetch rows + items restricted to the seed
    node's subtree. The seed URL itself is in the probe cache (the cascade
    fetches the raw URL): a viewforum seed's board page 1 / a canonical
    viewtopic seed's thread page 1 is consumed from that cache — no refetch,
    evicted from the final seen set (session.py:105-111)."""
    q = parse_qs(urlparse(seed_url).query)
    state: dict[str, str] = {"base": base_url, "mode": "root"}
    evict: list[str] = []
    pc = next((pf for pf in probes if pf.status == 200 and pf.url == seed_url), None)
    if last == "viewforum.php" and "f" in q:
        state["mode"] = "board"
        state["sub_f"] = q["f"][0]
        board_url = urljoin(base_url, f"viewforum.php?f={q['f'][0]}")
        if pc is not None and pc.url == board_url:
            state["pc_url"] = pc.url
            state["pc_b64"] = base64.b64encode(bytes(pc.body)).decode()
            evict.append(pc.url)
    elif last == "viewtopic.php" and "t" in q:
        state["mode"] = "thread"
        state["thread_t"] = q["t"][0]
        assert pc is not None, "viewtopic seed must be among the detection probes"
        resolved = normalize_url(pc.url, keep_queries=("f", "t"))
        state["resolved"] = resolved
        state["pc_url"] = pc.url
        state["pc_b64"] = base64.b64encode(bytes(pc.body)).decode()
        if resolved == pc.url:
            evict.append(pc.url)
    st = dict(state)
    if state["mode"] == "root":
        # bare viewforum.php seed → root: the homepage IS consumed (by the
        # root board's page-1 read)
        st["seen_evict"] = "1"
    frontier = [
        {
            "url": base_url,
            "params": "",
            "kind": "home",
            "path": [],
            "page": 1,
            "state": st,
            "priority": KIND_PRIORITY["home"],
            "ord": f"{next_index:08x}",
            "should_retry": 1,
        }
    ]
    return {"frontier": frontier, "items": [], "evict_probe_urls": evict}


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
        return [], []  # completion happens via CrawlResult.items() join
    raise ValueError(f"unknown kind {kind}")


def _next_href(doc: Node) -> str | None:
    # reference CSS ".next a" (phpbb.py:203,205)
    for n in doc.iter():
        if "next" in n.classes():
            a = n if n.tag == "a" else n.find("a")
            if a is not None:
                return a.get("href")
    return None


def _parse_home(row: dict, body: bytes, resp_url: str):
    """The fetch_top_boards homepage fetch for a below-root seed; emits the
    board prefetch rows + items restricted to the seed node's subtree."""
    base = row["state"]["base"]
    mode = row["state"]["mode"]
    doc = parse_html(body.decode("utf-8", "replace"))
    boards = _board_tree(doc, base)
    home_ord = row["ord"]

    if mode == "thread":
        return _thread_seed_rows(row, boards, base, home_ord)

    # DFS item ords nested under the home row; prefetch rows at
    # child(home, i) in registration order — the reference's
    # _fetch_lower_boards trace (common.py:253-259)
    all_items, board_ord = _board_items_and_ords(
        boards, base, child(home_ord, len(boards))
    )
    target: tuple | None = None
    if mode == "board":
        f = row["state"]["sub_f"]
        for path, url, title in boards:
            if path[-1] == f:
                target = tuple(path)
                break
        if target is None:
            # reference: no board with that id -> ValueError (phpbb.py:398)
            raise ValueError(f"no board f={f!r} under {base}")
    keep = lambda p: target is None or tuple(p[: len(target)]) == target
    items = [it for it in all_items if keep(it["path"])]

    children = []
    for i, (path, url, title) in enumerate(boards):
        st: dict[str, str] = {"base": base}
        if keep(path):
            st["dfs"] = child(board_ord[tuple(path)], 0)
            # prefetched, consumed once by page-1 parsing → evicted
            st["seen_evict"] = "1"
            if row["state"].get("pc_url") == url:
                # seed board: the prefetch was a cache hit on the probe's
                # response — no fetch at all
                st["cached_body_b64"] = row["state"]["pc_b64"]
        else:
            # prefetched but never consumed by write_board: the response
            # stays in the one-shot cache → the URL REMAINS in the final
            # seen set and the page yields nothing
            st["skip"] = "1"
        children.append(_row(url, "board_page", list(path), 1, st, child(home_ord, i)))
    return items, children


def _thread_seed_rows(row: dict, boards, base: str, home_ord: str):
    """viewtopic seed: one thread (+posts/files), no boards
    (phpbb.py:400-423 + writers/common.py:79-80)."""
    st = row["state"]
    pc_body = base64.b64decode(st["pc_b64"])
    tdoc = parse_html(pc_body.decode("utf-8", "replace"))
    bc = tdoc.find("div", class_="breadcrumbs")
    anchors = bc.find_all("a", attrs={"itemprop": "item"}) if bc is not None else []
    crumb_urls = [urljoin(st["pc_url"], a.get("href") or "") for a in anchors]
    # find_board_from_urls walk (common.py:273-289): one level per crumb,
    # last matching subboard wins, no fetches (phpbb's lazy fetch is a no-op)
    subs_of: dict[tuple, list[tuple[tuple, str]]] = {}
    for path, url, _t in boards:
        subs_of.setdefault(tuple(path[:-1]), []).append((tuple(path), url))
    cur: tuple = ()
    for cu in crumb_urls[1:]:
        for p, u in subs_of.get(cur, ()):
            if u == cu:
                cur = p
    t_path = list(cur) + [st["thread_t"]]
    resolved = st["resolved"]
    title = tdoc.find("h2", class_="topic-title").find("a").string()
    t_ord = child(home_ord, 0)
    items = [_item("thread", t_path, resolved, resolved, t_ord, title=title)]
    tstate = {"base": base, "dfs": child(t_ord, 0)}
    if st.get("pc_url") == resolved:
        # canonical seed: thread page 1 is consumed from the probe cache
        tstate["cached_body_b64"] = st["pc_b64"]
        tstate["seen_evict"] = "1"
    children = [_row(resolved, "thread_page", t_path, 1, tstate, child(t_ord, 0))]
    return items, children


def _parse_board_page(row: dict, body: bytes, resp_url: str):
    if row["state"].get("skip"):
        # node_from_url prefetch outside the seeded subtree: fetched (it is
        # in the reference trace) but its threads are never written
        return [], []
    base = row["state"]["base"]
    dfs = row["state"].get("dfs") or row["ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items: list[dict] = []
    children: list[dict] = []
    idx = 0
    for a in doc.find_all("a", class_="topictitle"):
        href = urljoin(base, a.get("href") or "")
        q = parse_qs(urlparse(href).query)
        if "t" not in q:
            continue
        tid = q["t"][0]
        t_ord = child(dfs, idx)
        idx += 1
        t_path = list(row["path"]) + [tid]
        items.append(_item("thread", t_path, href, resp_url, t_ord, title=a.string()))
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
    for div in doc.find_all("div", class_="post"):
        id_div = None
        for d in div.find_all("div"):
            if (d.get("id") or "").startswith("post_content"):
                id_div = d
                break
        content_div = div.find("div", class_="content")
        author_p = div.find("p", class_="author")
        if id_div is None or content_div is None or author_p is None:
            continue
        pid = (id_div.get("id") or "")[len("post_content"):]
        username = None
        for tag in ("a", "span"):
            u = author_p.find(tag, class_="username") or author_p.find(
                tag, class_="username-coloured"
            )
            if u is not None:
                username = u.string()
                break
        time_tag = author_p.find("time")
        ct = None
        if time_tag is not None and time_tag.get("datetime"):
            ct = datetime.fromisoformat(time_tag.get("datetime"))
            if ct.tzinfo is not None:
                from datetime import timezone

                ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
        h3a = div.find("h3").find("a")
        content_html = content_div.inner_html()
        p_ord = child(dfs, idx)
        idx += 1
        p_path = list(row["path"])
        p_subpath = [pid]
        spans = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in extract_spans(content_html, resp_url)
        ]
        items.append(
            _item("post", p_path, urljoin(resp_url, h3a.get("href") or ""),
                  resp_url, p_ord, subpath=p_subpath, author=username,
                  creation_time=ct, content=content_html, spans=spans)
        )
        # post-content files in document order (common.py:451-455)
        for ref in extract_file_refs(content_html, resp_url):
            f_ord = child(dfs, idx)
            idx += 1
            if ref.content is not None:  # inline svg: complete item, no fetch
                it = _item("file", p_path, ref.url, resp_url, f_ord,
                           subpath=p_subpath)
                it["content_type"] = ref.content_type
                it["content_bytes"] = ref.content
                items.append(it)
            else:
                items.append(
                    _item("file", p_path, ref.url, resp_url, f_ord,
                          subpath=p_subpath + [ref.url])
                )
                if not ref.url.startswith("data:"):
                    # data-URI media decode at export time — never fetched
                    # (writers/common.py:162-167,178-181)
                    children.append(
                        _row(ref.url, "file", p_path, 1, {"base": base}, f_ord)
                    )
    if nxt := _next_href(doc):
        n_ord = child(dfs, idx)
        children.append(
            _row(urljoin(resp_url, nxt), "thread_page", list(row["path"]),
                 row["page"] + 1, {"base": base, "dfs": n_ord}, n_ord)
        )
    return items, children
