"""Faithful sequential re-execution of the reference crawl (Simple Machines).

Follows forum_dl/extractors/simplemachines.py + HtmlExtractor:

- detection via ``link[rel=contents]`` + the simplemachines.org anchor
  (simplemachines.py:240-257); base = normalized contents href;
- the board tree comes from ``a#cN`` anchors (title = next-sibling text)
  and the ``a#bM`` anchors under their parents (simplemachines.py:259-312);
  category "URLs" are fragment anchors into the index — their board-page
  fetches hit the homepage and yield no threads (quirk preserved);
- ``node_from_url`` on the base prefetches all depth-2 board pages
  (``_fetch_lower_boards`` through the board branch,
  simplemachines.py:360-372) — later one-shot evicted;
- posts: ``div.post_wrapper`` → ``div#msg_P`` inner HTML (stripped),
  ``h5#subject_P a`` URL, poster h4 author, and the month-name date
  scraped by regex from the first ``.smalltext`` after the subject
  (simplemachines.py:403-436).
"""

from __future__ import annotations

import re
from base64 import b64decode
import re
from dataclasses import dataclass, field
from urllib.parse import urljoin

from ..htmlmini import Node, parse_html
from ..spans import extract_file_refs
from ..urls import normalize_url
from .refsim import OracleItem, OracleResult
from .session import (
    AlreadyFailedError,
    AlreadyVisitedError,
    FetchError,
    HttpStatusError,
    OracleSession,
)

_ABORTS = (AlreadyVisitedError, AlreadyFailedError, HttpStatusError, FetchError)
_CAT_ID = re.compile(r"^c(\d+)$")
_BOARD_ID = re.compile(r"^b(\d+)$")
_MSG_ID = re.compile(r"^msg_(\d+)$")
_SUBJECT_ID = re.compile(r"^subject_(\d+)$")
_DATE_RE = re.compile(
    r"(January|February|March|April|May|June|July|August|September|October|"
    r"November|December|Yesterday|Today) [a-zA-Z0-9,: ]+"
)


def parse_smf_date(text: str):
    """Shared kernel: the reference scrapes the date with _DATE_RE and
    hands it to dateparser (simplemachines.py:409-417); dateparser is not
    in this container, so the deterministic equivalent parses the fixture's
    'MonthName DD, YYYY, HH:MM:SS AM' form."""
    from datetime import datetime

    m = _DATE_RE.search(text)
    if not m:
        raise ValueError(text)
    return datetime.strptime(m.group(0).strip(), "%B %d, %Y, %I:%M:%S %p")


def _detect_smf_base(session: OracleSession, url: str) -> str | None:
    def probe(u: str):
        try:
            return session.try_get(u, should_cache=True, should_retry=False)
        except _ABORTS:
            return None

    probe(normalize_url(url, append_slash=False))  # hyperkitty
    resp = probe(url)  # pipermail (+ vbulletin/invision/smf reuse this key)
    probe(normalize_url(url, remove_suffixes=(), append_slash=False))  # hypermail/xenforo
    probe(normalize_url(url.removesuffix("/").removesuffix(".json")))  # discourse
    if resp is None:
        return None
    doc = parse_html(resp.body.decode("utf-8", "replace"))
    link = doc.find("link", attrs={"rel": "contents"})
    if link is None:
        return None
    anchor = next(
        (a for a in doc.find_all("a", attrs={"title": "Simple Machines"})
         if re.match(r"https?://www\.simplemachines\.org", a.get("href") or "")),
        None,
    )
    if anchor is None:
        return None
    return normalize_url(link.get("href"))


@dataclass
class _Board:
    path: tuple[str, ...]
    url: str
    origin: str
    title: str
    subboards: "dict[str, _Board]" = field(default_factory=dict)


class _SmfSim:
    def __init__(self, session: OracleSession, base_url: str) -> None:
        self.session = session
        self.base_url = base_url
        # root.url = _resolve_url(base) at __init__ (simplemachines.py:337-342)
        resp = session.try_get(base_url, should_cache=True)
        self.root = _Board(
            path=(),
            url=normalize_url(resp.url, keep_queries=("board", "topic")),
            origin=base_url, title="",
        )
        self.boards: list[_Board] = [self.root]
        self.items: list[OracleItem] = []

    def fetch_top_boards(self) -> None:
        resp = self.session.get(self.base_url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        for ca in doc.find_all("a"):
            m = _CAT_ID.match(ca.get("id") or "")
            if m is None:
                continue
            cid = m.group(1)
            sibs = ca.parent.children
            i = sibs.index(ca)
            nxt = sibs[i + 1] if i + 1 < len(sibs) else ""
            title = (nxt if isinstance(nxt, str) else "").strip()
            cat = _Board(
                path=(cid,), url=urljoin(resp.url, f"index.php#c{cid}"),
                origin=resp.url, title=title,
            )
            self.root.subboards[cid] = cat
            self.boards.append(cat)
            # walk parents to find the level carrying the board anchors
            parent = ca.parent
            while parent is not None:
                board_anchors = [
                    a for a in parent.find_all("a")
                    if _BOARD_ID.match(a.get("id") or "")
                ]
                if board_anchors:
                    for ba in board_anchors:
                        bid = _BOARD_ID.match(ba.get("id")).group(1)
                        b = _Board(
                            path=(cid, bid), url=ba.get("href"),
                            origin=resp.url, title=ba.string().strip(),
                        )
                        cat.subboards[bid] = b
                        self.boards.append(b)
                    break
                parent = parent.parent

    def prefetch_lower(self) -> None:
        # node_from_url board branch → _fetch_lower_boards (common.py:217-232)
        i = 0
        while i < len(self.boards):
            b = self.boards[i]
            i += 1
            if b is self.root or len(b.path) <= 1 or not b.url:
                continue
            try:
                self.session.get(b.url, should_cache=True)
            except _ABORTS:
                continue
        # _resolve_url(breadcrumb[-1]) — cache hit on the base

    @staticmethod
    def _next_href(doc: Node) -> str | None:
        for n in doc.iter():
            if n.tag == "a" and "nav_page" in n.classes():
                if n.find("span", class_="next_page") is not None:
                    return n.get("href")
        return None

    def _file_items(self, path, subpath, page_url, html, content_urls=None):
        for ref in extract_file_refs(html, page_url):
            if ref.content is not None:
                yield OracleItem(type="file", path=path, url=ref.url,
                                 origin=page_url, subpath=subpath), ref
            else:
                if content_urls is not None and ref.in_url_list:
                    content_urls.append(ref.url)
                yield OracleItem(type="file", path=path, url=ref.url,
                                 origin=page_url, subpath=subpath + (ref.url,)), ref

    def board_items(self, board: _Board):
        try:
            state_url = board.url
            while True:
                resp = self.session.get(state_url)
                doc = parse_html(resp.body.decode("utf-8", "replace"))
                for span in doc.find_all("span"):
                    m = _MSG_ID.match(span.get("id") or "")
                    if m is None:
                        continue
                    a = span.find("a")
                    yield OracleItem(
                        type="thread", path=board.path + (m.group(1),),
                        url=a.get("href"), origin=resp.url, title=a.string(),
                    )
                for f in self._file_items((), (), resp.url,
                                          resp.body.decode("utf-8", "replace")):
                    yield f
                nxt = self._next_href(doc)
                if not nxt:
                    return
                state_url = urljoin(resp.url, nxt)
        except _ABORTS:
            return

    def thread_items(self, thread: OracleItem):
        try:
            state_url = thread.url
            while True:
                resp = self.session.get(state_url)
                html = resp.body.decode("utf-8", "replace")
                doc = parse_html(html)
                content_urls: list[str] = []
                for wrap in doc.find_all("div", class_="post_wrapper"):
                    msg_div = next(
                        (d for d in wrap.find_all("div")
                         if _MSG_ID.match(d.get("id") or "")),
                        None,
                    )
                    subject = next(
                        (h for h in wrap.iter()
                         if h.tag in ("h5", "div")
                         and _SUBJECT_ID.match(h.get("id") or "")),
                        None,
                    )
                    if msg_div is None or subject is None:
                        continue
                    # find_next smalltext after the subject
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
                    post = OracleItem(
                        type="post", path=thread.path,
                        subpath=(_MSG_ID.match(msg_div.get("id")).group(1),),
                        url=subject.find("a").get("href"), origin=resp.url,
                        author=author, creation_time=parse_smf_date(time_text),
                        content=content,
                    )
                    yield post, None
                    for item, ref in self._file_items(
                        post.path, post.subpath, resp.url, content, content_urls
                    ):
                        yield item, ref
                for item, ref in self._file_items((), (), resp.url, html):
                    if ref.content is not None or item.url not in content_urls:
                        yield item, ref
                nxt = self._next_href(doc)
                if not nxt:
                    return
                state_url = urljoin(resp.url, nxt)
        except _ABORTS:
            return

    def write_file(self, item: OracleItem, ref) -> None:
        if not item.path:
            return
        if ref is not None and ref.content is not None:
            item.content_type = ref.content_type
            item.content_bytes = ref.content
        elif (m := re.match(r"data:(.+/.+);base64,(.*)", item.url)):
            # data-URI decode without a session fetch — the reference's
            # write_file regex branch (writers/common.py:162-167), with the
            # files-output-path materialization inlined into the item
            item.content_type = m.group(1)
            item.content_bytes = b64decode(m.group(2))
        else:
            try:
                r = self.session.try_get(item.url, should_cache=True)
                item.content_type = r.content_type
                item.content_bytes = r.body
            except Exception:
                pass
        self.items.append(item)

    # simplemachines.py:336-341 — _resolve_url is a FETCHING resolver
    def resolve_url(self, url: str) -> str:
        return normalize_url(
            self.session.get(url, should_cache=True).url,
            append_slash=True,
            keep_queries=("board", "topic"),
        )

    # simplemachines.py:343-381 — _get_node_from_url (+ the wrapper's
    # resolve of the seed itself, common.py:292)
    def node_from_url(self, url: str):
        resolved = self.resolve_url(url)
        resp = self.session.get(resolved, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        bc = doc.find(class_="navigate_section") or doc.find(class_="linktree")
        anchors = [li.find("a") for li in bc.find_all("li")]
        if doc.find("div", attrs={"id": "forumposts"}) is not None:
            crumb_urls = [a.get("href") for a in anchors]
            # find_board_from_urls (common.py:273-289): raw hrefs, one level
            # per crumb (home and the topic itself excluded), last match wins
            cur = self.root
            for cu in crumb_urls[1:-1]:
                for sub in cur.subboards.values():
                    if sub.url == cu:
                        cur = sub
            tid = doc.find("input", attrs={"name": "topic"}).get("value")
            title = doc.find("title").string()
            return OracleItem(
                type="thread", path=cur.path + (tid,), url=resolved,
                origin=resp.url, title=title, data={},
            )
        self.prefetch_lower()
        board_href = self.resolve_url(anchors[-1].get("href"))
        for b in self.boards:
            if b.url == board_href:
                return b
        raise ValueError(f"no board with url {board_href!r}")

    # writers/common.py:72-80 + 124-129 — write(url) thread branch
    def write_thread(self, thread: OracleItem) -> None:
        self.items.append(thread)
        for post_or_file, ref in self.thread_items(thread):
            if post_or_file.type == "post":
                self.items.append(post_or_file)
            else:
                self.write_file(post_or_file, ref)

    def write_board(self, board: _Board) -> None:
        self.items.append(
            OracleItem(type="board", path=board.path, url=board.url,
                       origin=board.origin, title=board.title)
        )
        for out in self.board_items(board):
            if isinstance(out, tuple):
                self.write_file(*out)
            else:
                self.items.append(out)
                for post_or_file, ref in self.thread_items(out):
                    if post_or_file.type == "post":
                        self.items.append(post_or_file)
                    else:
                        self.write_file(post_or_file, ref)
        for sub in board.subboards.values():
            self.write_board(sub)


def run_reference_smf(server: object, seed_url: str, retries: int = 4) -> OracleResult:
    session = OracleSession(server=server, retries=retries)
    base = _detect_smf_base(session, seed_url)
    assert base is not None
    sim = _SmfSim(session, base)
    sim.fetch_top_boards()
    # writers/common.py:72-80: root/board-page seed → that board's subtree
    # (board branch prefetches every board page); topic-page seed
    # (#forumposts) → just that thread
    node = sim.node_from_url(seed_url)
    if isinstance(node, _Board):
        sim.write_board(node)
    else:
        sim.write_thread(node)
    return OracleResult(
        base_url=base, trace=list(session.trace), seen=session.seen(), items=sim.items
    )
