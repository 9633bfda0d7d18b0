"""Faithful sequential re-execution of the reference crawl (XenForo).

Follows forum_dl/extractors/xenforo.py + the HtmlExtractor machinery:

- ``_fetch_top_boards`` parses categories + subforums from the homepage
  (served from the detection cache) and then calls ``_fetch_lower_boards``
  ITSELF (xenforo.py:361 tail) — which prefetches ONLY boards with
  ``len(path) >= 2`` (``_do_fetch_subboards`` skips root and categories,
  xenforo.py:365-370): subforum pages are cached and later one-shot
  evicted, category pages are fetched fresh during the writer DFS;
- thread ids come from the LAST class (``js-threadListItem-N``,
  xenforo.py:448-452); posts have two layouts (article.message /
  .MessageCard, xenforo.py:468-505); content = ``div.bbWrapper`` inner
  HTML (SoupTag.string joins contents, forum_dl/soup.py:160-162) so
  embedded media flows into the file pipeline exactly as phpBB's.
"""

from __future__ import annotations

import re
from base64 import b64decode
import re
from dataclasses import dataclass, field
from datetime import datetime
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
_BOARD_CLASS = re.compile(r"^node--id(\d+)$")
_THREAD_CLASS = re.compile(r"^js-threadListItem-(\d+)$")
_POST_ID = re.compile(r"^post-(\d+)$")
_CAT_CLASS = re.compile(r"^block--category(\d+)$")


def _detect_xenforo_base(session: OracleSession, url: str) -> str | None:
    def probe(u: str):
        try:
            return session.try_get(u, should_cache=True, should_retry=False)
        except _ABORTS:
            return None

    probe(normalize_url(url, append_slash=False))  # hyperkitty
    probe(url)  # pipermail
    resp = probe(normalize_url(url, remove_suffixes=(), append_slash=False))  # hypermail→xenforo
    if resp is None:
        return None
    body = resp.body.decode("utf-8", "replace")
    if not re.search(r'<html[^>]+id="XF"', body):
        return None
    doc = parse_html(body)
    nav = doc.find("a", attrs={"data-nav-id": "forums"})
    if nav is not None:
        return normalize_url(urljoin(url, nav.get("href")))
    hdr = doc.find("a", attrs={"id": "header-forum-listing"})
    return normalize_url(urljoin(url, hdr.get("href")))


@dataclass
class _Board:
    path: tuple[str, ...]
    url: str
    origin: str
    title: str
    subboards: "dict[str, _Board]" = field(default_factory=dict)


class _XenforoSim:
    def __init__(self, session: OracleSession, base_url: str) -> None:
        self.session = session
        self.base_url = base_url
        self.root = _Board(path=(), url=base_url, origin=base_url, title="")
        self.boards: list[_Board] = [self.root]
        self.items: list[OracleItem] = []

    # xenforo.py:299-389
    def fetch_top_boards(self) -> None:
        resp = self.session.get(self.base_url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        for block in doc.find_all("div", class_="block"):
            header = block.find("h2", class_="block-header")
            if header is None:
                continue
            cat_m = next(
                (m for c in block.classes() if (m := _CAT_CLASS.match(c))), None
            )
            if cat_m is None:
                continue
            cid = cat_m.group(1)
            a = header.find("a")
            cat = _Board(
                path=(cid,), url=urljoin(resp.url, a.get("href")),
                origin=resp.url, title=a.string().strip(),
            )
            self.root.subboards[cid] = cat
            self.boards.append(cat)
            for nd in block.find_all("div"):
                m = next((mm for c in nd.classes() if (mm := _BOARD_CLASS.match(c))), None)
                if m is None:
                    continue
                sid = m.group(1)
                anchor = nd.find("a", attrs={"data-shortcut": "node-description"})
                sub = _Board(
                    path=(cid, sid), url=urljoin(self.base_url, anchor.get("href")),
                    origin=resp.url, title=anchor.string().strip(),
                )
                cat.subboards[sid] = sub
                self.boards.append(sub)
        # _fetch_lower_boards(self.root) — prefetch of len(path)>=2 boards
        i = 0
        while i < len(self.boards):
            b = self.boards[i]
            i += 1
            if b is self.root or len(b.path) <= 1:
                continue
            try:
                r = self.session.get(b.url, should_cache=True)
            except _ABORTS:
                continue
            d = parse_html(r.body.decode("utf-8", "replace"))
            for nd in d.find_all("div"):
                m = next((mm for c in nd.classes() if (mm := _BOARD_CLASS.match(c))), None)
                if m is None or m.group(1) in b.subboards:
                    continue
                anchor = nd.find("a", attrs={"data-shortcut": "node-description"})
                sb = _Board(
                    path=b.path + (m.group(1),),
                    url=urljoin(self.base_url, anchor.get("href")),
                    origin=r.url, title=anchor.string().strip(),
                )
                b.subboards[m.group(1)] = sb
                self.boards.append(sb)

    @staticmethod
    def _next_href(doc: Node) -> str | None:
        for n in doc.iter():
            if n.tag == "a" and "pageNav-jump--next" in n.classes():
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
                for tag in doc.find_all(class_="structItem--thread"):
                    m = _THREAD_CLASS.match(tag.classes()[-1])
                    tid = m.group(1)
                    ta = tag.find(class_="structItem-title").find(
                        "a", attrs={"data-tp-primary": True}
                    )
                    yield OracleItem(
                        type="thread", path=board.path + (tid,),
                        url=urljoin(self.base_url, ta.get("href")),
                        origin=resp.url, title=ta.string(),
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

    # xenforo.py:468-505 — dual layout
    def thread_items(self, thread: OracleItem):
        try:
            state_url = thread.url
            while True:
                resp = self.session.get(state_url)
                html = resp.body.decode("utf-8", "replace")
                doc = parse_html(html)
                content_urls: list[str] = []
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
                        pid = tag.find("div", class_="MessageCard__content").get(
                            "data-post-id"
                        )
                        author = tag.find("a", class_="MessageCard__user-info__name").string()
                        url_anchor = header.find("a", class_="MessageCard__date-created")
                        time_tag = header.find("time")
                    content = tag.find("div", class_="bbWrapper").inner_html()
                    post = OracleItem(
                        type="post", path=thread.path, subpath=(pid,),
                        url=urljoin(state_url, url_anchor.get("href")),
                        origin=resp.url, author=author,
                        creation_time=datetime.fromisoformat(time_tag.get("datetime")),
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

    # xenforo.py:394-440 — _get_node_from_url (+ node_from_url wrapper);
    # all boards are already registered/fetched by fetch_top_boards' own
    # _fetch_lower_boards tail, so find_board is a pure walk
    def node_from_url(self, url: str):
        resp = self.session.get(url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        bc = doc.find("ul", class_="p-breadcrumbs")
        anchors = (
            bc.find_all("a", attrs={"itemprop": "item"}) if bc is not None else []
        )
        if bc is None or len(anchors) <= 1:
            return self.root
        if (
            doc.find("article") is not None
            or doc.find("div", class_="MessageCard") is not None
        ):
            board_url = urljoin(url, anchors[-2].get("href"))
            block = next(
                d for d in doc.find_all("div", class_="block-container")
                if d.get("data-lb-id")
            )
            tid = re.match(r"^thread-(\d+)$", block.get("data-lb-id")).group(1)
            title = doc.find("h1").string()
            for b in self.boards:
                if b.url == board_url:
                    return OracleItem(
                        type="thread", path=b.path + (tid,),
                        url=urljoin(self.base_url, url), origin=resp.url,
                        title=title, data={},
                    )
            raise ValueError(f"thread board {board_url!r} not registered")
        og = doc.find("meta", attrs={"property": "og:url"}).get("content")
        for b in self.boards:
            if b.url == og:
                return b
        raise ValueError(f"no board with og:url {og!r}")

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


def run_reference_xenforo(server: object, seed_url: str, retries: int = 4) -> OracleResult:
    session = OracleSession(server=server, retries=retries)
    base = _detect_xenforo_base(session, seed_url)
    assert base is not None
    sim = _XenforoSim(session, base)
    sim.fetch_top_boards()
    # writers/common.py:72-80: homepage seed has no breadcrumbs → root;
    # board-page seed (og:url match) → that subtree; thread-page seed
    # (article/MessageCard + data-lb-id) → just that thread
    node = sim.node_from_url(seed_url)
    if isinstance(node, _Board):
        sim.write_board(node)
    else:
        sim.write_thread(node)
    return OracleResult(
        base_url=base, trace=list(session.trace), seen=session.seen(), items=sim.items
    )
