"""Faithful sequential re-execution of the reference crawl (Hypermail).

Quirks covered (forum_dl/extractors/hypermail.py):

- detection base derivation (hypermail.py:40-76): with Author/Subject/Date
  metas or a "...by thread"-style title, the base is the URL minus two path
  segments (slash-normalized); otherwise the response URL as-is;
- board crawl (hypermail.py:112-164): the archive index lists period pages
  (processed in document order via reversed+pop); "threads" are the first
  post anchor of EVERY descendant <ul> of the messages list (so nested
  reply ULs contribute spurious thread entries — quirk preserved);
- thread URLs are joined against the BASE, not the period page
  (hypermail.py:152), losing the period directory — so the posts fetch
  (``urljoin(thread.url, ".")`` = the base index, hypermail.py:167-168)
  hits the already-visited index and aborts: board-seed crawls emit ZERO
  posts;
- thread-seed crawls (hypermail.py:166-229) do work: directory listing →
  root anchor → nested reply anchors with the indentation stack replay
  (mailthread.replay_subpaths) → one page fetch per post, with the seed's
  own page served from the detection cache (one-shot eviction).
"""

from __future__ import annotations

import re
from datetime import datetime
from pathlib import PurePosixPath
from urllib.parse import urljoin, urlparse, urlunparse

from ..htmlmini import parse_html
from ..mailthread import address_content, anchor_depth, replay_subpaths
from ..spans import extract_file_refs  # noqa: F401  (parity with other sims)
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
_PAGE_HREF = re.compile(r"^(\d+)/index.html$")
_POST_HREF = re.compile(r"^(\d+).html$")
_TITLE_RE = re.compile("^.*?(by thread)|(by author)|(with attachments)|(by date)$")


def _detect_hypermail_base(session: OracleSession, url: str) -> str | None:
    def probe(u: str):
        try:
            return session.try_get(u, should_cache=True, should_retry=False)
        except _ABORTS:
            return None

    probe(normalize_url(url, append_slash=False))  # hyperkitty
    probe(url)  # pipermail
    resp = probe(normalize_url(url, remove_suffixes=(), append_slash=False))  # hypermail
    if resp is None:
        return None
    doc = parse_html(resp.body.decode("utf-8", "replace"))
    gen = doc.find("meta", attrs={"name": "generator"})
    if gen is None or not (gen.get("content") or "").startswith("hypermail"):
        return None
    header_metas = any(
        (m.get("name") or "") in ("Author", "Subject", "Date")
        for m in doc.find_all("meta")
    )
    title = doc.find("title")
    title_hit = title is not None and _TITLE_RE.search(title.string() or "")
    if header_metas or title_hit:
        parsed = urlparse(resp.url)
        parts = PurePosixPath(parsed.path).parts
        return normalize_url(
            urlunparse(parsed._replace(path=str(PurePosixPath(*parts[:-2]))))
        )
    return resp.url


class _HypermailSim:
    def __init__(self, session: OracleSession, base_url: str) -> None:
        self.session = session
        self.base_url = base_url
        self.items: list[OracleItem] = []

    def node_from_url(self, url: str):
        resp = self.session.try_get(url, should_cache=True)
        resolved = normalize_url(resp.url, append_slash=False)
        if resolved == self.base_url:
            return None  # root
        parts = PurePosixPath(urlparse(resolved).path).parts
        if len(parts) >= 2 and _POST_HREF.match(parts[-1]):
            tid = parts[-1].removesuffix(".html")
            return OracleItem(
                type="thread", path=(tid,), url=url, origin=resolved, title=""
            )
        return None

    # hypermail.py:112-164
    def board_threads(self, root_url: str):
        try:
            resp = self.session.get(root_url)
            doc = parse_html(resp.body.decode("utf-8", "replace"))
            rel_urls = list(
                reversed(
                    [a.get("href") for a in doc.find_all("a")
                     if _PAGE_HREF.match(a.get("href") or "")]
                )
            )
            if not rel_urls:
                return
            state_url = urljoin(self.base_url, rel_urls.pop())
            while True:
                resp = self.session.get(state_url)
                doc = parse_html(resp.body.decode("utf-8", "replace"))
                mdiv = doc.find("div", class_="messages-list")
                root_ul = mdiv.find("ul")
                for child_ul in root_ul.find_all("ul"):
                    anchor = None
                    for a in child_ul.find_all("a"):
                        if _POST_HREF.match(a.get("href") or ""):
                            anchor = a
                            break
                    if anchor is None:
                        continue
                    href = anchor.get("href")
                    tid = _POST_HREF.match(href).group(1)
                    yield OracleItem(
                        type="thread", path=(tid,),
                        url=urljoin(self.base_url, href),  # base join quirk
                        origin=resp.url, title="",
                    )
                if not rel_urls:
                    return
                state_url = urljoin(self.base_url, rel_urls.pop())
        except _ABORTS:
            return

    # hypermail.py:166-229
    def thread_posts(self, thread: OracleItem):
        try:
            state_url = urljoin(thread.url, ".")
            resp = self.session.get(state_url)
            doc = parse_html(resp.body.decode("utf-8", "replace"))
            root_anchor = doc.find("a", attrs={"href": f"{thread.path[-1]}.html"})
            root_pos = anchor_depth(root_anchor)
            yield self.fetch_post(thread.path, (), urljoin(thread.url, root_anchor.get("href")))
            # find_next("ul"): first ul after the anchor in document order
            child_ul = None
            seen_anchor = False
            for n in doc.iter():
                if n is root_anchor:
                    seen_anchor = True
                    continue
                if seen_anchor and n.tag == "ul":
                    child_ul = n
                    break
            if child_ul is None:
                return
            entries = []
            anchors = [
                a for a in child_ul.find_all("a")
                if _POST_HREF.match(a.get("href") or "")
            ]
            for a in anchors:
                depth = (anchor_depth(a) - root_pos) // 2
                entries.append((depth, _POST_HREF.match(a.get("href")).group(1)))
            subpaths = replay_subpaths(entries)
            for a, sp in zip(anchors, subpaths):
                yield self.fetch_post(thread.path, sp, urljoin(state_url, a.get("href")))
        except _ABORTS:
            return

    # hypermail.py:203-229
    def fetch_post(self, path, subpath, url: str) -> OracleItem:
        resp = self.session.get(url)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        author = None
        ct = None
        for m in doc.find_all("meta"):
            if m.get("name") == "Author":
                author = m.get("content")
            elif m.get("name") == "Date":
                ct = datetime.fromisoformat(m.get("content"))
        return OracleItem(
            type="post", path=path, subpath=tuple(subpath), url=url,
            origin=resp.url, author=author, creation_time=ct,
            content=address_content(doc),
        )


def run_reference_hypermail(server: object, seed_url: str, retries: int = 4) -> OracleResult:
    session = OracleSession(server=server, retries=retries)
    base = _detect_hypermail_base(session, seed_url)
    assert base is not None
    sim = _HypermailSim(session, base)
    node = sim.node_from_url(seed_url)
    if node is None:  # root board crawl
        sim.items.append(
            OracleItem(type="board", path=(), url=base, origin=base, title="")
        )
        for thread in sim.board_threads(base):
            sim.items.append(thread)
            for post in sim.thread_posts(thread):
                sim.items.append(post)
    else:  # single thread crawl
        sim.items.append(node)
        for post in sim.thread_posts(node):
            sim.items.append(post)
    return OracleResult(
        base_url=base, trace=list(session.trace), seen=session.seen(), items=sim.items
    )
