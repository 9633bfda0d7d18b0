"""Sequential reference simulation: HyperKitty (forum_dl/extractors/hyperkitty.py).

- detection: footer "HyperKitty" anchor + navbar-brand → base
  (hyperkitty.py:108-122; the postorius branch returns False first);
- ``node_from_url`` on a list URL fetches the raw seed, then the lazy
  subboard registration re-fetches the slash-normalized list URL — a cache
  hit (hyperkitty.py:130-179);
- board pages are ``latest?page=N`` with last-page parsed from
  ``page-link`` tags[-2] (hyperkitty.py:203-241);
- thread page yields the root post with ``subpath=()``
  (hyperkitty.py:243-271), then JSON reply chunks
  (``replies?sort=thread&offset=K``): reply levels from
  ``reply-level-N`` classes with the shared stack-replay arithmetic, and
  the reference's chunk-wide first-match BUGS for the time and the
  messagelink URL (soup-wide find, hyperkitty.py:301-313) — every reply in
  a chunk gets the first one's timestamp and URL; the replay state also
  RESETS per chunk (locals of _fetch_thread_page_posts) — all preserved.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone
from urllib.parse import urljoin

from ..htmlmini import parse_html
from ..mailthread import replay_subpaths
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
_REPLY_LEVEL = re.compile(r"reply-level-(\d+)")
_LATEST_PAGE = re.compile(r"^.*latest\?page=(\d+)$")


def parse_sender_time(title: str) -> datetime:
    ct = datetime.fromisoformat(title.removeprefix("Sender's time: "))
    if ct.tzinfo is not None:
        ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
    return ct


class _HkSim:
    def __init__(self, session: OracleSession, base_url: str) -> None:
        self.session = session
        self.base_url = base_url
        self.items: list[OracleItem] = []

    def lazy_subboard(self, list_id: str) -> OracleItem:
        url = normalize_url(urljoin(self.base_url, f"list/{list_id}"))
        resp = self.session.try_get(url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        title = ""
        sect = doc.find("section", attrs={"id": "title"})
        if sect is not None:
            h = sect.find("h1") or sect.find("h2")
            if h is not None:
                title = h.string().strip()
        return OracleItem(type="board", path=(list_id,), url=url,
                          origin=resp.url, title=title)

    def fetch_lazy_subboards(self) -> list[OracleItem]:
        """The root-seed registration walk (hyperkitty.py:182-201): paginate
        the archive index from ``base_url`` (``page_link_anchors[-1]``'s
        href chains it, ``#`` terminates), fetching every ``list/<id>``
        page en route. All reads are ``should_cache`` — the per-subboard
        re-walks the writer triggers later are pure cache hits."""
        from pathlib import PurePosixPath
        from urllib.parse import urlparse

        boards: list[OracleItem] = []
        href = ""
        url = self.base_url
        while href != "#":
            resp = self.session.get(url, should_cache=True)
            doc = parse_html(resp.body.decode("utf-8", "replace"))
            for a in doc.find_all("a", class_="list-name"):
                lid = PurePosixPath(urlparse(a.get("href")).path).parts[-1]
                boards.append(self.lazy_subboard(lid))
            page_links = doc.find_all("a", class_="page-link")
            href = page_links[-1].get("href")
            url = urljoin(self.base_url, href)
        return boards

    def board_threads(self, board: OracleItem):
        try:
            state_url = urljoin(board.url, "latest")
            page = 1
            while True:
                m = _LATEST_PAGE.match(state_url)
                cur_page = int(m.group(1)) if m else 1
                resp = self.session.get(state_url)
                doc = parse_html(resp.body.decode("utf-8", "replace"))
                anchors = doc.find_all("a", class_="thread-title")
                for a in anchors:
                    yield OracleItem(
                        type="thread", path=board.path + (a.get("name"),),
                        url=urljoin(state_url, a.get("href")), origin=state_url,
                        title=str(a.children[-1]).strip() if a.children else "",
                    )
                page_links = [n for n in doc.iter() if "page-link" in n.classes()]
                if page_links:
                    last_page = int(page_links[-2].string())
                    if cur_page < last_page:
                        state_url = urljoin(state_url, f"latest?page={cur_page + 1}")
                        page += 1
                        continue
                return
        except _ABORTS:
            return

    def thread_posts(self, thread: OracleItem):
        try:
            # page 1: the thread page itself (root post, subpath=())
            resp = self.session.get(thread.url)
            doc = parse_html(resp.body.decode("utf-8", "replace"))
            author = doc.find("div", class_="email-author").find("a").string()
            time_span = doc.find("div", class_="time").find("span")
            body = doc.find("div", class_="email-body").inner_html()
            link = doc.find("div", class_="messagelink").find("a").get("href")
            yield OracleItem(
                type="post", path=thread.path, subpath=(),
                url=urljoin(thread.url, link), origin=thread.url,
                author=author,
                creation_time=parse_sender_time(time_span.get("title")),
                content=body,
            )
            state_url = urljoin(thread.url, "replies?sort=thread")
            while True:
                r = self.session.get(state_url)
                payload = json.loads(r.body)
                d = parse_html(payload["replies_html"])
                blocks = [
                    n for n in d.iter()
                    if n.tag == "div"
                    and ("even" in n.classes() or "odd" in n.classes())
                ]
                # chunk-wide first matches (reference bug, hyperkitty.py:301-313)
                first_time = d.find("div", class_="time").find("span").get("title")
                first_link = d.find("div", class_="messagelink").find("a").get("href")
                entries = []
                for b in blocks:
                    level = 0
                    for klass in b.classes():
                        lm = _REPLY_LEVEL.match(klass)
                        if lm:
                            level = int(lm.group(1))
                            break
                    entries.append(
                        (level, b.find("div", class_="email-header").get("id"))
                    )
                subpaths = replay_subpaths(entries)  # resets per chunk ✓
                for b, sp in zip(blocks, subpaths):
                    yield OracleItem(
                        type="post", path=thread.path, subpath=sp,
                        url=urljoin(state_url, first_link), origin=state_url,
                        author=b.find("div", class_="email-author").find("a").string(),
                        creation_time=parse_sender_time(first_time),
                        content=b.find("div", class_="email-body").inner_html(),
                    )
                if not payload["more_pending"]:
                    return
                state_url = urljoin(
                    state_url, f"replies?sort=thread&offset={payload['next_offset']}"
                )
        except _ABORTS:
            return


def run_reference_hyperkitty(server, seed_url: str, retries: int = 4) -> OracleResult:
    """Mirrors ``forumdl.download_url``: detect → ``fetch()`` (a no-op,
    ``_fetch_top_boards`` is ``pass``) → ``writer.write(seed)`` →
    ``node_from_url`` (hyperkitty.py:130-158) dispatching root / thread /
    list, then the writer walk (writers/common.py:72-130)."""
    from pathlib import PurePosixPath
    from urllib.parse import urlparse

    session = OracleSession(server=server, retries=retries)
    resp = session.try_get(
        normalize_url(seed_url, append_slash=False), should_cache=True,
        should_retry=False,
    )
    doc = parse_html(resp.body.decode("utf-8", "replace"))
    footer = doc.find("footer")
    assert footer is not None and any(
        a.string() == "HyperKitty" for a in footer.find_all("a")
    )
    brand = doc.find("a", class_="navbar-brand")
    base = normalize_url(urljoin(seed_url, brand.get("href")))

    sim = _HkSim(session, base)
    # node_from_url: _get_node_from_url fetches the RAW seed
    # (_resolve_url is the identity, common.py:246-247)
    node_resp = session.try_get(seed_url, should_cache=True)
    resolved = normalize_url(node_resp.url)
    parts = PurePosixPath(urlparse(resolved).path).parts

    if resolved == base:
        # root: write_board(root) — root board object, no root threads
        # (hyperkitty.py:211-212), then the _fetch_lazy_subboards index
        # walk registers every list, then each board is written in
        # registration order (writers/common.py:101-108)
        sim.items.append(OracleItem(type="board", path=(), url=base,
                                    origin=base, title=""))
        boards = sim.fetch_lazy_subboards()
        for board in boards:
            sim.items.append(board)
            for thread in sim.board_threads(board):
                sim.items.append(thread)
                for post in sim.thread_posts(thread):
                    sim.items.append(post)
        return OracleResult(base_url=base, trace=list(session.trace),
                            seen=session.seen(), items=sim.items)

    if len(parts) >= 4 and parts[-2] == "thread":
        # thread node (hyperkitty.py:138-153): title from thread-header
        # h3; write_thread only — no board objects
        ndoc = parse_html(node_resp.body.decode("utf-8", "replace"))
        h3 = ndoc.find("div", class_="thread-header").find("h3")
        thread = OracleItem(type="thread", path=(parts[-3], parts[-1]),
                            url=resolved, origin=resolved, title=h3.string())
        sim.items.append(thread)
        for post in sim.thread_posts(thread):
            sim.items.append(post)
        return OracleResult(base_url=base, trace=list(session.trace),
                            seen=session.seen(), items=sim.items)

    # list seed: find_board → lazy subboard fetch (cache hit on the node
    # fetch's slash-normalized key)
    list_id = parts[-1]
    board = sim.lazy_subboard(list_id)
    sim.items.append(board)
    for thread in sim.board_threads(board):
        sim.items.append(thread)
        for post in sim.thread_posts(thread):
            sim.items.append(post)
    return OracleResult(base_url=base, trace=list(session.trace),
                        seen=session.seen(), items=sim.items)
