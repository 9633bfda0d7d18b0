"""Faithful sequential re-execution of the reference crawl (phpBB).

Covers the HtmlExtractor path (forum_dl/extractors/common.py:404-569 +
forum_dl/extractors/phpbb.py) including its quirky fetch schedule:

- detection cascade probes (extractors/__init__.py:12-24) — phpBB probes an
  extra ``viewforum.php`` URL (phpbb.py:207-229);
- ``node_from_url`` on a board seed triggers ``_fetch_lower_boards`` which
  prefetches EVERY board page with ``should_cache=True``
  (common.py:253-259, 217-232; phpbb.py:337-...), so each board's page 1 is
  later served from the one-shot cache (session.py:105-111) — page 1 never
  reappears in the fetch trace, page 2+ are fresh fetches;
- the JSONL writer downloads each post-content file at emission time
  (``download_file`` with should_cache=True, writers/common.py:168-189 +
  common.py:396-401), deduped by URL via the cache; page-level files have
  ``path=()`` and are dropped without download (writers/common.py:145-146,
  ``outside_files`` defaults False, options.py:163-167);
- inline SVGs become File items with content and no fetch
  (common.py:555-563).
"""

from __future__ import annotations

import re
from base64 import b64decode
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import PurePosixPath
from urllib.parse import parse_qs, urljoin, urlparse

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


def _detect_phpbb_base(session: OracleSession, url: str) -> str | None:
    """Probe cascade up to phpbb (last in extractors/__init__.py:12-24)."""

    def probe(u: str) -> object | None:
        try:
            return session.try_get(u, should_cache=True, should_retry=False)
        except (FetchError, AlreadyVisitedError, AlreadyFailedError, HttpStatusError):
            return None

    probe(normalize_url(url, append_slash=False))  # hyperkitty
    probe(url)  # pipermail
    probe(normalize_url(url, remove_suffixes=(), append_slash=False))  # hypermail
    probe(normalize_url(url, remove_suffixes=(), append_slash=False))  # xenforo (hit)
    probe(url)  # vbulletin (hit)
    probe(url)  # invision (hit)
    u = url.removesuffix("/").removesuffix(".json")
    probe(normalize_url(u))  # discourse (hit for slash-suffixed seeds)
    probe(url)  # simplemachines (hit)

    # phpbb (phpbb.py:207-229)
    probe_url = urljoin(
        normalize_url(url, remove_suffixes=("viewforum.php", "viewtopic.php")),
        "viewforum.php",
    )
    resp = probe(probe_url)
    if resp is None:
        return None
    if not re.search(r"<html[^>]*\sdir=", resp.body.decode("utf-8", "replace")):
        return None
    return normalize_url(resp.url, remove_suffixes=("viewforum.php", "viewtopic.php"))


@dataclass
class _Board:
    path: tuple[str, ...]
    url: str
    origin: str
    title: str
    subboards: "dict[str, _Board]" = field(default_factory=dict)


class _PhpbbSim:
    def __init__(self, session: OracleSession, base_url: str) -> None:
        self.session = session
        self.base_url = base_url
        self.root = _Board(path=(), url=base_url, origin=base_url, title="")
        self.boards: list[_Board] = [self.root]  # _boards insertion order
        self.items: list[OracleItem] = []

    # phpbb.py:282-335 (two-level registration from homepage forabg blocks)
    def fetch_top_boards(self) -> None:
        resp = self.session.get(self.base_url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        for block in doc.find_all("div", class_="forabg"):
            header = block.find("li", class_="header")
            board_id = None
            if header and (a := header.find("a")):
                q = parse_qs(urlparse(a.get("href") or "").query)
                if "f" in q:
                    board_id = q["f"][0]
                    b = _Board(
                        path=(board_id,),
                        url=urljoin(self.base_url, f"viewforum.php?f={board_id}"),
                        origin=resp.url,
                        title=a.string(),
                    )
                    self.root.subboards[board_id] = b
                    self.boards.append(b)
            for sub_a in block.find_all("a", class_="forumtitle"):
                q = parse_qs(urlparse(sub_a.get("href") or "").query)
                if "f" not in q:
                    continue
                sid = q["f"][0]
                parent = self.root.subboards[board_id] if board_id else self.root
                sb = _Board(
                    path=(parent.path + (sid,)) if board_id else (sid,),
                    url=urljoin(self.base_url, f"viewforum.php?f={sid}"),
                    origin=resp.url,
                    title=sub_a.string(),
                )
                parent.subboards[sid] = sb
                self.boards.append(sb)

    # common.py:217-232 worklist over _boards + phpbb._do_fetch_subboards
    def fetch_lower_boards(self) -> None:
        i = 0
        while i < len(self.boards):
            board = self.boards[i]
            i += 1
            if board is self.root:
                continue
            try:
                resp = self.session.get(board.url, should_cache=True)
            except (AlreadyVisitedError, AlreadyFailedError, HttpStatusError, FetchError):
                continue  # _fetch_subboards swallows (common.py:234-240)
            doc = parse_html(resp.body.decode("utf-8", "replace"))
            for sub_a in doc.find_all("a", class_="forumtitle"):
                q = parse_qs(urlparse(sub_a.get("href") or "").query)
                if "f" not in q:
                    continue
                sid = q["f"][0]
                if sid in board.subboards:
                    # update branch (common.py:186-201): fields refreshed
                    board.subboards[sid].title = sub_a.string()
                    board.subboards[sid].origin = resp.url
                else:
                    sb = _Board(
                        path=board.path + (sid,),
                        url=urljoin(self.base_url, f"viewforum.php?f={sid}"),
                        origin=resp.url,
                        title=sub_a.string(),
                    )
                    board.subboards[sid] = sb
                    self.boards.append(sb)

    # common.py:253-271 — find_board triggers the one-time lower-board
    # prefetch, then walks the subboard maps
    def find_board(self, path: tuple[str, ...]) -> _Board:
        if not getattr(self, "_all_fetched", False):
            self.fetch_lower_boards()
            self._all_fetched = True
        cur = self.root
        for part in path:
            cur = cur.subboards[part]
        return cur

    # phpbb.py:379-428 — _get_node_from_url (+ the node_from_url wrapper,
    # common.py:291-298)
    def node_from_url(self, url: str):
        resp = self.session.get(url, should_cache=True)
        resolved = normalize_url(resp.url, keep_queries=("f", "t"))
        parsed = urlparse(resolved)
        parts = PurePosixPath(parsed.path).parts
        if parts and parts[-1] == "viewforum.php":
            if not getattr(self, "_all_fetched", False):
                self.fetch_lower_boards()
                self._all_fetched = True
            q = parse_qs(parsed.query)
            if "f" not in q:
                return self.root
            board_id = q["f"][0]
            for board in self.boards:
                if board is not self.root and board.path[-1] == board_id:
                    return board
            raise ValueError(f"no board f={board_id}")
        if parts and parts[-1] == "viewtopic.php":
            topic_id = parse_qs(parsed.query)["t"][0]
            doc = parse_html(resp.body.decode("utf-8", "replace"))
            bc = doc.find("div", class_="breadcrumbs")
            anchors = (
                bc.find_all("a", attrs={"itemprop": "item"}) if bc is not None else []
            )
            crumb_urls = [urljoin(url, a.get("href") or "") for a in anchors]
            # find_board_from_urls (common.py:273-289): walk down one level
            # per crumb; last matching subboard wins, no break
            cur = self.root
            for cu in crumb_urls[1:]:
                for sub in cur.subboards.values():
                    if sub.url == cu:
                        cur = sub
            title = doc.find("h2", class_="topic-title").find("a").string()
            return OracleItem(
                type="thread",
                path=cur.path + (topic_id,),
                url=resolved,
                origin=resolved,
                title=title,
                data={},
            )
        if normalize_url(resolved) == self.base_url:
            return self.root
        raise ValueError(f"unresolvable node URL {url!r}")

    # writers/common.py:72-80 + 124-129 — write(url) thread branch
    def write_thread(self, thread: OracleItem) -> None:
        self.items.append(thread)
        for post_or_file, ref in self.thread_items(thread):
            if post_or_file.type == "post":
                self.items.append(post_or_file)
            else:
                self.write_file(post_or_file, ref)

    # HtmlExtractor._fetch_board_page_threads (common.py:410-422)
    def board_items(self, board: _Board):
        try:
            state_url = board.url
            while True:
                resp = self.session.get(state_url)
                doc = parse_html(resp.body.decode("utf-8", "replace"))
                for a in doc.find_all("a", class_="topictitle"):
                    href = urljoin(self.base_url, a.get("href") or "")
                    q = parse_qs(urlparse(href).query)
                    tid = q["t"][0]
                    yield OracleItem(
                        type="thread",
                        path=board.path + (tid,),
                        url=href,
                        origin=resp.url,
                        title=a.string(),
                    )
                # page-level files (path=()) — yielded by the generator but
                # dropped by the writer without download
                for f in self._file_items((), (), resp.url, resp.body):
                    yield f
                nxt = self._next_href(doc)
                if not nxt:
                    return
                state_url = urljoin(resp.url, nxt)
        except (AlreadyVisitedError, AlreadyFailedError, HttpStatusError, FetchError):
            return

    @staticmethod
    def _next_href(doc: Node) -> str | None:
        for n in doc.iter():
            if "next" in n.classes():
                a = n.find("a") if n.tag != "a" else n
                if a is not None:
                    return a.get("href")
        return None

    def _file_items(self, path, subpath, page_url: str, body: bytes,
                    content_urls: list[str] | None = None):
        """Mirror of _extract_file_objects (common.py:480-569) yielding
        OracleItems; collects in_url_list URLs into content_urls."""
        for ref in extract_file_refs(body.decode("utf-8", "replace"), page_url):
            if ref.content is not None:  # inline svg
                yield OracleItem(
                    type="file", path=path, url=ref.url, origin=page_url,
                    subpath=subpath, content=None, data=None,
                    title=None, author=None,
                    creation_time=None,
                ), ref
            else:
                if content_urls is not None and ref.in_url_list:
                    content_urls.append(ref.url)
                yield OracleItem(
                    type="file", path=path, url=ref.url, origin=page_url,
                    subpath=subpath + (ref.url,),
                ), ref

    # HtmlExtractor._fetch_thread_page_posts (common.py:438-461) +
    # phpbb._extract_thread_page_post (phpbb.py:451-487)
    def thread_items(self, thread: OracleItem):
        try:
            state_url = thread.url
            while True:
                resp = self.session.get(state_url)
                body = resp.body.decode("utf-8", "replace")
                doc = parse_html(body)
                content_file_urls: list[str] = []
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
                    ct = (
                        datetime.fromisoformat(time_tag.get("datetime"))
                        if time_tag is not None
                        else None
                    )
                    h3a = div.find("h3").find("a")
                    content_html = content_div.inner_html()
                    post = OracleItem(
                        type="post",
                        path=thread.path,
                        subpath=(pid,),
                        url=urljoin(resp.url, h3a.get("href") or ""),
                        origin=resp.url,
                        author=username,
                        creation_time=ct,
                        content=content_html,
                    )
                    yield post, None
                    # per-post embedded files, document order
                    # (common.py:451-455)
                    for item, ref in self._file_items(
                        post.path, post.subpath, resp.url,
                        content_html.encode(), content_file_urls,
                    ):
                        yield item, ref
                # page-level files not already in content (common.py:457-459)
                for item, ref in self._file_items((), (), resp.url, resp.body):
                    if ref.content is not None or item.url not in content_file_urls:
                        yield item, ref
                nxt = self._next_href(doc)
                if not nxt:
                    return
                state_url = urljoin(resp.url, nxt)
        except (AlreadyVisitedError, AlreadyFailedError, HttpStatusError, FetchError):
            return

    # writer traversal (writers/common.py:100-189)
    def write_file(self, item: OracleItem, ref) -> None:
        if not item.path:  # outside_files=False default
            return
        if ref is not None and ref.content is not None:
            item.content_type = ref.content_type  # inline svg
            item.content_bytes = ref.content
        elif (m := re.match(r"data:(.+/.+);base64,(.*)", item.url)):
            # data-URI decode without a session fetch — the reference's
            # write_file regex branch (writers/common.py:162-167), with the
            # files-output-path materialization inlined into the item
            item.content_type = m.group(1)
            item.content_bytes = b64decode(m.group(2))
        else:
            try:
                resp = self.session.try_get(item.url, should_cache=True)
                item.content_type = resp.content_type
                item.content_bytes = resp.body
            except Exception:
                pass  # download_file swallows (common.py:396-401)
        self.items.append(item)

    def write_board(self, board: _Board) -> None:
        self.items.append(
            OracleItem(type="board", path=board.path, url=board.url,
                       origin=board.origin, title=board.title)
        )
        for out in self.board_items(board):
            if isinstance(out, tuple):
                self.write_file(*out)
            else:
                self.items.append(out)  # thread item
                for post_or_file, ref in self.thread_items(out):
                    if post_or_file.type == "post":
                        self.items.append(post_or_file)
                    else:
                        self.write_file(post_or_file, ref)
        for sub in board.subboards.values():
            self.write_board(sub)


def run_reference_phpbb(server: object, seed_url: str, retries: int = 4) -> OracleResult:
    session = OracleSession(server=server, retries=retries)
    base_url = _detect_phpbb_base(session, seed_url)
    assert base_url is not None, "fixture must be detectable as phpbb"
    sim = _PhpbbSim(session, base_url)
    sim.fetch_top_boards()
    # writers/common.py:72-80: node = node_from_url(seed); a board →
    # write_board(find_board(node.path)) (find_board prefetches every board
    # page via _fetch_lower_boards, common.py:253-259), a viewtopic URL →
    # write_thread(thread)
    node = sim.node_from_url(seed_url)
    if isinstance(node, _Board):
        sim.write_board(sim.find_board(node.path))
    else:
        sim.write_thread(node)
    return OracleResult(
        base_url=base_url, trace=list(session.trace), seen=session.seen(),
        items=sim.items,
    )
