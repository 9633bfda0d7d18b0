"""Simple Machines engine — HtmlExtractor family (see engines/phpbb.py).

Differences from phpBB/XenForo, per forum_dl/extractors/simplemachines.py:

- board tree from ``a#cN`` anchors (title = next-sibling text) + ``a#bM``
  anchors under their parents (simplemachines.py:259-312); category URLs
  are fragment anchors into the index — fetched fresh at their DFS
  position, yielding no threads;
- depth-2 board pages are prefetched by ``node_from_url``'s board branch
  (one-shot evicted, like phpBB's prefetch);
- posts: div.post_wrapper → msg_P inner HTML (stripped), subject anchor
  URL, poster h4 author, month-name date scraped by regex
  (simplemachines.py:403-436; parse via the shared kernel in
  oracle/refsim_smf.parse_smf_date).
"""

from __future__ import annotations

import base64
import re
from urllib.parse import parse_qs, urljoin, urlparse

from ..htmlmini import Node, parse_html
from ..oracle.refsim_smf import parse_smf_date
from ..spans import extract_file_refs, extract_spans
from ..urls import normalize_url
from .discourse import _item
from .ordkey import child

_CAT_ID = re.compile(r"^c(\d+)$")
_BOARD_ID = re.compile(r"^b(\d+)$")
_MSG_ID = re.compile(r"^msg_(\d+)$")
_SUBJECT_ID = re.compile(r"^subject_(\d+)$")

KIND_PRIORITY = {"board_page": 1, "thread_page": 2, "file": 4}


def _row(url: str, kind: str, path: list[str], page: int, state: dict,
         ord_: str) -> dict:
    return {
        "url": url, "params": "", "kind": kind, "path": path, "page": page,
        "state": state, "priority": KIND_PRIORITY[kind], "ord": ord_,
        "should_retry": 1,
    }


def seed(base_url: str, next_index: int, probes: list, seed_url: str = "") -> dict:
    body = None
    for pf in probes:
        if pf.status == 200 and pf.url.rstrip("/") == base_url.rstrip("/"):
            body = pf.body
            break
    assert body is not None
    doc = parse_html(body.decode("utf-8", "replace"))

    boards: list[tuple[list[str], str, str]] = []
    for ca in doc.find_all("a"):
        m = _CAT_ID.match(ca.get("id") or "")
        if m is None:
            continue
        cid = m.group(1)
        sibs = ca.parent.children
        i = sibs.index(ca)
        nxt = sibs[i + 1] if i + 1 < len(sibs) else ""
        title = (nxt if isinstance(nxt, str) else "").strip()
        boards.append(([cid], urljoin(base_url, f"index.php#c{cid}"), title))
        parent = ca.parent
        while parent is not None:
            anchors = [a for a in parent.find_all("a")
                       if _BOARD_ID.match(a.get("id") or "")]
            if anchors:
                for ba in anchors:
                    bid = _BOARD_ID.match(ba.get("id")).group(1)
                    boards.append(([cid, bid], ba.get("href"), ba.string().strip()))
                break
            parent = parent.parent

    # node_from_url seeding (simplemachines.py:343-381): the homepage is
    # ALWAYS among the probes for SMF (the cascade's suffix-stripping
    # normalization reduces any index.php?… seed to the base URL), so no
    # extra fetch is needed to build the tree — only the subtree/thread
    # restriction changes.
    q = parse_qs(urlparse(seed_url or "").query)
    if "topic" in q:
        return _thread_seed(base_url, next_index, probes, seed_url, boards)

    target: tuple | None = None
    probe_map = {pf.url: pf for pf in probes if pf.status == 200}
    if "board" in q:
        # board branch matches _boards by the resolved breadcrumb URL —
        # canonically the board's page-1 URL (simplemachines.py:373-379)
        bid = q["board"][0].partition(".")[0]
        b_url = urljoin(base_url, f"index.php?board={bid}.0")
        target = next((tuple(p) for p, u, _t in boards if u == b_url), None)
        if target is None:
            raise ValueError(f"no board with url {b_url!r}")

    keep = lambda p: target is None or tuple(p[: len(target)]) == target
    subs = [b for b in boards if len(b[0]) >= 2]
    dfs_root = f"{next_index + len(subs):08x}"
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
    items = [it for it in items if keep(it["path"])]

    frontier = []
    evict: list[str] = [base_url] if target is None else []
    for i, (path, url, title) in enumerate(subs):
        st: dict[str, str] = {"base": base_url}
        if keep(path):
            st["dfs"] = child(board_ord[tuple(path)], 0)
            st["seen_evict"] = "1"
            if url in probe_map:
                # probed page (e.g. the seed board): its page-1 read is a
                # cache hit on the probe response, consumed once → evicted
                st["cached_body_b64"] = base64.b64encode(
                    bytes(probe_map[url].body)
                ).decode()
                evict.append(url)
        else:
            # prefetched but never consumed: stays in the final seen set
            st["skip"] = "1"
        frontier.append(_row(url, "board_page", path, 1, st,
                             f"{next_index + i:08x}"))
    for path, url, title in boards:
        if len(path) == 1 and keep(path):
            dfs = child(board_ord[tuple(path)], 0)
            st = {"base": base_url, "dfs": dfs}
            if url in probe_map:
                # e.g. an index.php#cN fragment seed: the category read
                # consumes the raw-seed probe entry
                st["cached_body_b64"] = base64.b64encode(
                    bytes(probe_map[url].body)
                ).decode()
                st["seen_evict"] = "1"
                evict.append(url)
            frontier.append(_row(url, "board_page", path, 1, st, dfs))
    return {"frontier": frontier, "items": items, "evict_probe_urls": evict}


def _thread_seed(base_url: str, next_index: int, probes: list, seed_url: str,
                 boards: list[tuple[list[str], str, str]]) -> dict:
    """Topic-page seed (#forumposts branch, simplemachines.py:355-369):
    breadcrumb walk → board path; just that thread is written, with page 1
    consumed from the probe cache."""
    pc = next((pf for pf in probes if pf.status == 200 and pf.url == seed_url), None)
    assert pc is not None, "topic seed must be among the detection probes"
    resolved = normalize_url(seed_url, append_slash=True,
                             keep_queries=("board", "topic"))
    tdoc = parse_html(bytes(pc.body).decode("utf-8", "replace"))
    bc = tdoc.find(class_="navigate_section") or tdoc.find(class_="linktree")
    anchors = [li.find("a") for li in bc.find_all("li")]
    crumb_urls = [a.get("href") for a in anchors]
    subs_of: dict[tuple, list[tuple[tuple, str]]] = {}
    for path, url, _t in boards:
        subs_of.setdefault(tuple(path[:-1]), []).append((tuple(path), url))
    cur: tuple = ()
    for cu in crumb_urls[1:-1]:
        for p, u in subs_of.get(cur, ()):
            if u == cu:
                cur = p
    tid = tdoc.find("input", attrs={"name": "topic"}).get("value")
    title = tdoc.find("title").string()
    t_path = list(cur) + [tid]
    t_ord = f"{next_index:08x}"
    items = [_item("thread", t_path, resolved, resolved, t_ord, title=title)]
    tstate = {"base": base_url, "dfs": child(t_ord, 0)}
    evict: list[str] = []
    if resolved == pc.url:
        tstate["cached_body_b64"] = base64.b64encode(bytes(pc.body)).decode()
        tstate["seen_evict"] = "1"
        evict.append(pc.url)
    frontier = [_row(resolved, "thread_page", t_path, 1, tstate, child(t_ord, 0))]
    return {"frontier": frontier, "items": items, "evict_probe_urls": evict}


def parse(row: dict, status: int, body: bytes, resp_url: str):
    if status >= 400:
        return [], []
    kind = row["kind"]
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
    for n in doc.iter():
        if n.tag == "a" and "nav_page" in n.classes():
            if n.find("span", class_="next_page") is not None:
                return n.get("href")
    return None


def _parse_board_page(row: dict, body: bytes, resp_url: str):
    base = row["state"]["base"]
    dfs = row["state"].get("dfs") or row["ord"]
    doc = parse_html(body.decode("utf-8", "replace"))
    items: list[dict] = []
    children: list[dict] = []
    idx = 0
    for span in doc.find_all("span"):
        m = _MSG_ID.match(span.get("id") or "")
        if m is None:
            continue
        a = span.find("a")
        tid = m.group(1)
        t_ord = child(dfs, idx)
        idx += 1
        t_path = list(row["path"]) + [tid]
        items.append(_item("thread", t_path, a.get("href"), resp_url, t_ord,
                           title=a.string()))
        children.append(
            _row(a.get("href"), "thread_page", t_path, 1,
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
    for wrap in doc.find_all("div", class_="post_wrapper"):
        msg_div = next(
            (d for d in wrap.find_all("div") if _MSG_ID.match(d.get("id") or "")),
            None,
        )
        subject = next(
            (h for h in wrap.iter()
             if h.tag in ("h5", "div") and _SUBJECT_ID.match(h.get("id") or "")),
            None,
        )
        if msg_div is None or subject is None:
            continue
        time_text = ""
        seen_subj = False
        for n in doc.iter():
            if n is subject:
                seen_subj = True
                continue
            if seen_subj and n.tag in ("a", "div") and "smalltext" in n.classes():
                time_text = n.string()
                break
        poster = wrap.find("div", class_="poster").find("h4")
        pa = poster.find("a")
        author = pa.string() if pa is not None else poster.string().strip()
        content = msg_div.inner_html().strip()
        pid = _MSG_ID.match(msg_div.get("id")).group(1)
        p_ord = child(dfs, idx)
        idx += 1
        p_path = list(row["path"])
        spans = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in extract_spans(content, resp_url)
        ]
        items.append(
            _item("post", p_path, subject.find("a").get("href"), resp_url, p_ord,
                  subpath=[pid], author=author,
                  creation_time=parse_smf_date(time_text), content=content,
                  spans=spans)
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
