"""Sequential reference simulations: vBulletin and Invision.

Shared HtmlExtractor writer/file machinery (common.py:404-569 +
writers/common.py:100-189) in a small base class; per-engine hooks mirror
forum_dl/extractors/{vbulletin,invision}.py. Notable quirks:

- vBulletin: base from the ``<base href>`` tag (vbulletin.py:232-233); NO
  board prefetch on a base seed (``node_from_url`` returns root before the
  board branch, vbulletin.py:295-301); comment rows selected but skipped
  (vbulletin.py:352-354);
- Invision: board titles initially registered with the CATEGORY title
  (invision.py:118-128), corrected by the ``_fetch_lower_boards`` prefetch
  updates; ALL boards (categories included) are prefetched
  (invision.py:131-152) and later one-shot evicted.
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


@dataclass
class _Board:
    path: tuple[str, ...]
    url: str
    origin: str
    title: str
    subboards: "dict[str, _Board]" = field(default_factory=dict)


class _HtmlSimBase:
    def __init__(self, session: OracleSession, base_url: str) -> None:
        self.session = session
        self.base_url = base_url
        self.root = _Board(path=(), url=base_url, origin=base_url, title="")
        self.boards: list[_Board] = [self.root]
        self.items: list[OracleItem] = []

    # hooks ------------------------------------------------------------------
    def next_href(self, doc: Node) -> str | None:
        raise NotImplementedError

    def board_threads_on_page(self, board, doc, resp):
        raise NotImplementedError

    def posts_on_page(self, thread, doc, resp, state_url):
        raise NotImplementedError

    # shared machinery ---------------------------------------------------------
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
                html = resp.body.decode("utf-8", "replace")
                doc = parse_html(html)
                for t in self.board_threads_on_page(board, doc, resp):
                    yield t
                for f in self._file_items((), (), resp.url, html):
                    yield f
                nxt = self.next_href(doc)
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
                for post in self.posts_on_page(thread, doc, resp, state_url):
                    yield post, None
                    for item, ref in self._file_items(
                        post.path, post.subpath, resp.url, post.content or "",
                        content_urls,
                    ):
                        yield item, ref
                for item, ref in self._file_items((), (), resp.url, html):
                    if ref.content is not None or item.url not in content_urls:
                        yield item, ref
                nxt = self.next_href(doc)
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


# -- vBulletin ----------------------------------------------------------------

_FORUM_ID = re.compile(r"^forum(\d+)$")


class _VbSim(_HtmlSimBase):
    def fetch_top_boards(self) -> None:
        resp = self.session.get(self.base_url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        cat = None
        for tr in doc.find_all("tr"):
            cls = tr.classes()
            if "category-header" in cls:
                cid = _FORUM_ID.match(tr.get("id") or "").group(1)
                a = tr.find("a", class_="category")
                cat = _Board(path=(cid,), url=a.get("href"), origin=resp.url,
                             title=a.string())
                self.root.subboards[cid] = cat
                self.boards.append(cat)
            elif "forum-item" in cls and cat is not None:
                bid = _FORUM_ID.match(tr.get("id") or "").group(1)
                a = tr.find("a", class_="forum-title")
                b = _Board(path=cat.path + (bid,), url=a.get("href"),
                           origin=resp.url, title=a.string())
                cat.subboards[bid] = b
                self.boards.append(b)

    # vbulletin.py:294-330 — _get_node_from_url; vB's _fetch_lower_boards
    # is fetch-wise a no-op (all boards register from the homepage)
    def node_from_url(self, url: str):
        resp = self.session.get(url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        anchors = doc.find_all("a", class_="crumb-link")
        if len(anchors) <= 1:
            return self.root
        if doc.find("h2", class_="b-post__title") is not None:
            crumb_urls = [a.get("href") for a in anchors]
            cur = self.root
            for cu in crumb_urls[2:]:
                for sub in cur.subboards.values():
                    if sub.url == cu:
                        cur = sub
            tid = doc.find("input", attrs={"name": "nodeid"}).get("value")
            title = doc.find("h1", class_="main-title").string()
            return OracleItem(
                type="thread", path=cur.path + (tid,),
                url=urljoin(self.base_url, url), origin=resp.url,
                title=title, data={},
            )
        # board: matched by the LAST crumb's TITLE (vbulletin.py:324-328)
        btitle = anchors[-1].string()
        for b in self.boards:
            if b.title == btitle:
                return b
        raise ValueError(f"no board titled {btitle!r}")

    def next_href(self, doc: Node) -> str | None:
        for n in doc.iter():
            if n.tag == "a" and "right-arrow" in n.classes() and n.get("href"):
                return n.get("href")
        return None

    def board_threads_on_page(self, board, doc, resp):
        for tr in doc.find_all("tr", class_="topic-item"):
            a = tr.find("a", class_="topic-title")
            yield OracleItem(
                type="thread", path=board.path + (tr.get("data-node-id"),),
                url=a.get("href"), origin=resp.url, title=a.string(),
            )

    def posts_on_page(self, thread, doc, resp, state_url):
        for li in doc.find_all("li", class_="b-post"):
            if "b-comment" in li.classes():
                continue  # vbulletin.py:352-354
            url_anchor = li.find("a", class_="b-post__count")
            content_div = li.find("div", class_="js-post__content-text")
            author = li.find("div", class_="author").find("a").string()
            time_tag = li.find("time", attrs={"itemprop": "dateCreated"})
            yield OracleItem(
                type="post", path=thread.path,
                subpath=(li.get("data-node-id"),),
                url=url_anchor.get("href"), origin=resp.url, author=author,
                creation_time=datetime.fromisoformat(time_tag.get("datetime")),
                content=content_div.inner_html().strip(),
            )


def run_reference_vbulletin(server, seed_url: str, retries: int = 4) -> OracleResult:
    session = OracleSession(server=server, retries=retries)

    def probe(u):
        try:
            return session.try_get(u, should_cache=True, should_retry=False)
        except _ABORTS:
            return None

    probe(normalize_url(seed_url, append_slash=False))  # hyperkitty
    resp = probe(seed_url)  # pipermail (vbulletin reuses this key)
    probe(normalize_url(seed_url, remove_suffixes=(), append_slash=False))  # hm/xf
    doc = parse_html(resp.body.decode("utf-8", "replace"))
    gen = doc.find("meta", attrs={"name": "generator"})
    assert gen is not None and (gen.get("content") or "").startswith("vBulletin")
    base = doc.find("base").get("href")

    sim = _VbSim(session, base)
    sim.fetch_top_boards()
    # writers/common.py:72-80: homepage (<=1 crumb-link) → root; board page
    # (last crumb TITLE match) → that subtree; topic page (b-post__title +
    # nodeid input) → just that thread
    node = sim.node_from_url(seed_url)
    if isinstance(node, _Board):
        sim.write_board(node)
    else:
        sim.write_thread(node)
    return OracleResult(base_url=base, trace=list(session.trace),
                        seen=session.seen(), items=sim.items)


# -- Invision ------------------------------------------------------------------

_EL_COMMENT = re.compile(r"^elComment_(\d+)")


class _InvSim(_HtmlSimBase):
    def fetch_top_boards(self) -> None:
        resp = self.session.get(self.base_url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        for li in doc.find_all("li", class_="cForumRow"):
            cid = li.get("data-categoryid")
            ca = li.find("h2").find_all("a")[1]
            cat = _Board(path=(cid,), url=ca.get("href"), origin=resp.url,
                         title=ca.string())
            self.root.subboards[cid] = cat
            self.boards.append(cat)
            for grid in li.find_all("div", class_="cForumGrid"):
                bid = grid.get("data-forumid")
                ba = grid.find("h3", class_="cForumGrid__title").find("a")
                # reference registers the CATEGORY title here
                # (invision.py:118-128)
                b = _Board(path=cat.path + (bid,), url=ba.get("href"),
                           origin=resp.url, title=ca.string())
                cat.subboards[bid] = b
                self.boards.append(b)
        # _fetch_lower_boards(root): prefetch EVERY board (invision.py:131-152)
        i = 0
        while i < len(self.boards):
            b = self.boards[i]
            i += 1
            if b is self.root:
                continue
            try:
                r = self.session.get(b.url, should_cache=True)
            except _ABORTS:
                continue
            d = parse_html(r.body.decode("utf-8", "replace"))
            for grid in d.find_all("div", class_="cForumGrid"):
                sid = grid.get("data-forumid")
                sa = grid.find("h3").find("a")
                if sid in b.subboards:
                    # update branch corrects the title to the board's own
                    b.subboards[sid].title = sa.string()
                    b.subboards[sid].url = sa.get("href")
                    b.subboards[sid].origin = r.url
                else:
                    nb = _Board(path=b.path + (sid,), url=sa.get("href"),
                                origin=r.url, title=sa.string())
                    b.subboards[sid] = nb
                    self.boards.append(nb)

    # invision.py:154-185 — _get_node_from_url; all boards are already
    # registered+prefetched by fetch_top_boards, so no further fetches
    def node_from_url(self, url: str):
        resp = self.session.get(url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        bl = doc.find("ul", attrs={"data-role": "breadcrumbList"})
        lis = bl.find_all("li")
        if len(lis) <= 2:
            return self.root
        if doc.find("article") is not None:
            board_href = lis[-2].find("a").get("href")
            tid = doc.find("body").get("data-pageid")
            title = doc.find("meta", attrs={"property": "og:title"}).get("content")
            for b in self.boards:
                if b.url == board_href:
                    return OracleItem(
                        type="thread", path=b.path + (tid,), url=url,
                        origin=resp.url, title=str(title), data={},
                    )
            raise ValueError(f"thread board {board_href!r} not registered")
        for b in self.boards:
            if b.url == url:
                return b
        raise ValueError(f"no board with url {url!r}")

    def next_href(self, doc: Node) -> str | None:
        ln = doc.find("link", attrs={"rel": "next"})
        return ln.get("href") if ln is not None else None

    def board_threads_on_page(self, board, doc, resp):
        for li in doc.find_all(
            "li", attrs={"data-controller": "forums.frontforum.topicRow"}
        ):
            a = li.find("h4", class_="ipsDataItem_title").find("a", attrs={"title": True})
            yield OracleItem(
                type="thread", path=board.path + (li.get("data-rowid"),),
                url=a.get("href"), origin=resp.url, title=a.get("title"),
            )

    def posts_on_page(self, thread, doc, resp, state_url):
        for art in doc.find_all("article", class_="ipsComment"):
            content_div = art.find("div", attrs={"data-role": "commentContent"})
            pane = art.find("div", class_="cAuthorPane_content")
            time_tag = pane.find("time")
            author = pane.find("h3", class_="cAuthorPane_author").find("a").string()
            url_div = pane.find("div")
            pid = _EL_COMMENT.match(art.get("id") or "").group(1)
            yield OracleItem(
                type="post", path=thread.path, subpath=(pid,),
                url=url_div.find("a").get("href"), origin=resp.url,
                author=author,
                creation_time=datetime.fromisoformat(time_tag.get("datetime")),
                content=content_div.inner_html(),
            )


def run_reference_invision(server, seed_url: str, retries: int = 4) -> OracleResult:
    session = OracleSession(server=server, retries=retries)

    def probe(u):
        try:
            return session.try_get(u, should_cache=True, should_retry=False)
        except _ABORTS:
            return None

    probe(normalize_url(seed_url, append_slash=False))
    resp = probe(seed_url)
    probe(normalize_url(seed_url, remove_suffixes=(), append_slash=False))
    doc = parse_html(resp.body.decode("utf-8", "replace"))
    bl = doc.find("ul", attrs={"data-role": "breadcrumbList"})
    lis = bl.find_all("li")
    base = seed_url if len(lis) < 2 else lis[1].find("a").get("href")
    assert doc.find("a", attrs={"title": "Invision Community"}) is not None

    sim = _InvSim(session, base)
    sim.fetch_top_boards()
    # writers/common.py:72-80: homepage (<=2 crumb lis) → root; board page
    # (url match in _boards) → that subtree; topic page (article +
    # data-pageid) → just that thread
    node = sim.node_from_url(seed_url)
    if isinstance(node, _Board):
        sim.write_board(node)
    else:
        sim.write_thread(node)
    return OracleResult(base_url=base, trace=list(session.trace),
                        seen=session.seen(), items=sim.items)
