"""Sequential reference simulation: Pipermail (forum_dl/extractors/pipermail.py).

- detection strips path segments after the ``pipermail``/``mailman``
  marker (pipermail.py:61-112);
- list boards are lazily registered via ``mailman/listinfo/{list}``
  (normalized URL, title from the "… Info Page" regex,
  pipermail.py:165-182);
- the archive index is fetched at ``pipermail/{list}`` (NO trailing
  slash, pipermail.py:204-206) and period pages chain via the state list;
- threads come from ``<!--0 LONGID- -->`` comment markers; board-seed
  crawls emit ZERO posts because the posts fetch targets the same
  ``thread.html`` the board loop already visited (pipermail.py:267-268 →
  AlreadyVisitedError);
- thread-seed crawls reconstruct reply chains from the child comment
  markers' long-id chain LENGTHS with the same stack-replay slice
  arithmetic as hypermail (pipermail.py:296-318; shared
  mailthread.replay_subpaths kernel), the root post getting
  ``subpath=(thread_id,)`` (pipermail.py:282);
- post pages: first <b> author, first <i> date, <pre> contents with the
  ``><i>…</i>`` quote-stripping substitution (pipermail.py:320-346).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from pathlib import PurePosixPath
from urllib.parse import urljoin, urlparse, urlunparse

from ..htmlmini import Comment, Node, parse_html
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
_PAGE_HREF = re.compile(
    r"^\d\d\d\d-(January|February|March|April|May|June|July|August|September|"
    r"October|November|December)/thread.html$"
)
_POST_HREF = re.compile(r"^(\d+).html$")
_ROOT_COMMENT = re.compile(r"^0 ([^-]+)- $")
_CHILD_COMMENT = re.compile(r"^(1|2|3) ([^-]+)-(.*?)-? $")
_LISTINFO_TITLE = re.compile(r"^(.+) Info Page$")
_LISTINFO_HREF = re.compile(r"^listinfo/(.+)$")
QUOTE_SUB = (r"><i>(.*?\n)</i>", r">\1")


def strip_quotes(content: str) -> str:
    return re.sub(QUOTE_SUB[0], QUOTE_SUB[1], content)


def detect_base(url: str, resolved: str) -> str | None:
    parsed = urlparse(resolved)
    parts = PurePosixPath(parsed.path).parts

    def cut(n: int) -> str:
        return str(urlunparse(parsed._replace(path=str(PurePosixPath(*parts[:-n])))))

    if len(parts) >= 4 and parts[-4] == "pipermail":
        return cut(4)
    if len(parts) >= 3 and parts[-3] == "pipermail":
        return cut(3)
    if len(parts) >= 2 and parts[-2] in ("pipermail", "mailman"):
        return cut(2)
    if len(parts) >= 1 and parts[-1] in ("pipermail", "mailman"):
        return cut(1)
    return None


class _PmSim:
    def __init__(self, session: OracleSession, base_url: str) -> None:
        self.session = session
        self.base_url = base_url
        self.items: list[OracleItem] = []

    def fetch_lazy_subboard(self, list_id: str) -> OracleItem:
        # pipermail.py:166-184: nice_id replaces '@' with '_' in the URL;
        # the board PATH keeps the raw id
        nice_id = list_id.replace("@", "_")
        url = normalize_url(urljoin(self.base_url, f"mailman/listinfo/{nice_id}"))
        resp = self.session.get(url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        title = _LISTINFO_TITLE.match(doc.find("title").string()).group(1)
        return OracleItem(type="board", path=(list_id,), url=url,
                          origin=resp.url, title=title)

    def fetch_lazy_subboards(self) -> list[OracleItem]:
        """Root-seed registration walk (pipermail.py:186-197): one fetch of
        the ``mailman/listinfo`` registry, then one listinfo page per
        ``listinfo/<id>`` anchor, in anchor order."""
        url = normalize_url(urljoin(self.base_url, "mailman/listinfo"))
        resp = self.session.get(url, should_cache=True)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        boards: list[OracleItem] = []
        for a in doc.find_all("a"):
            m = _LISTINFO_HREF.match(a.get("href") or "")
            if m:
                boards.append(self.fetch_lazy_subboard(m.group(1)))
        return boards

    # pipermail.py:199-263
    def board_threads(self, board: OracleItem):
        try:
            board_id = board.path[0]
            resp = self.session.get(urljoin(self.base_url, f"pipermail/{board_id}"))
            doc = parse_html(resp.body.decode("utf-8", "replace"))
            rel = list(reversed([
                a.get("href") for a in doc.find_all("a")
                if _PAGE_HREF.match(a.get("href") or "")
            ]))
            if not rel:
                return
            while rel or True:
                state_url = urljoin(
                    urljoin(self.base_url, f"pipermail/{board_id}/"), rel.pop()
                )
                r = self.session.get(state_url)
                d = parse_html(r.body.decode("utf-8", "replace"))
                walked = list(d.walk())
                for i, n in enumerate(walked):
                    if isinstance(n, Comment) and _ROOT_COMMENT.match(n):
                        anchor = next(
                            (m for m in walked[i + 1:]
                             if isinstance(m, Node) and m.tag == "a"
                             and _POST_HREF.match(m.get("href") or "")),
                            None,
                        )
                        if anchor is None:
                            continue
                        href = anchor.get("href")
                        yield OracleItem(
                            type="thread",
                            path=board.path + (_POST_HREF.match(href).group(1),),
                            url=urljoin(state_url, href), origin=r.url,
                            title=anchor.string(),
                        )
                if not rel:
                    return
        except _ABORTS:
            return

    # pipermail.py:265-318
    def thread_posts(self, thread: OracleItem):
        try:
            state_url = urljoin(thread.url, "thread.html")
            resp = self.session.get(state_url)
            doc = parse_html(resp.body.decode("utf-8", "replace"))
            walked = list(doc.walk())
            tid = thread.path[-1]
            anchor_i = next(
                i for i, n in enumerate(walked)
                if isinstance(n, Node) and n.tag == "a"
                and n.get("href") == f"{tid}.html"
            )
            root_comment = next(
                n for n in reversed(walked[:anchor_i]) if isinstance(n, Comment)
            )
            yield self.fetch_post(thread.path, (tid,), thread.url)
            long_id = _ROOT_COMMENT.match(str(root_comment)).group(1)
            entries, anchors = [], []
            for i, n in enumerate(walked):
                if isinstance(n, Comment) and _CHILD_COMMENT.match(n) and any(
                    n.startswith(f"{d} {long_id}-") for d in "123"
                ):
                    chain = _CHILD_COMMENT.match(n).group(3).split("-")
                    a = next(
                        (m for m in walked[i + 1:]
                         if isinstance(m, Node) and m.tag == "a"
                         and _POST_HREF.match(m.get("href") or "")),
                        None,
                    )
                    if a is None:
                        continue
                    entries.append((len(chain),
                                    _POST_HREF.match(a.get("href")).group(1)))
                    anchors.append(a)
            for a, sp in zip(anchors, replay_subpaths(entries)):
                yield self.fetch_post(thread.path, sp,
                                      urljoin(state_url, a.get("href")))
        except _ABORTS:
            return

    # pipermail.py:320-346
    def fetch_post(self, path, subpath, url: str) -> OracleItem:
        resp = self.session.get(url)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        content = strip_quotes(doc.find("pre").inner_html())
        author = doc.find("b").string()
        ct = datetime.fromisoformat(doc.find("i").string())
        if ct.tzinfo is not None:
            ct = ct.astimezone(timezone.utc).replace(tzinfo=None)
        return OracleItem(type="post", path=path, subpath=tuple(subpath), url=url,
                          origin=resp.url, author=author, creation_time=ct,
                          content=content)


def run_reference_pipermail(server, seed_url: str, retries: int = 4) -> OracleResult:
    session = OracleSession(server=server, retries=retries)

    def probe(u):
        try:
            return session.try_get(u, should_cache=True, should_retry=False)
        except _ABORTS:
            return None

    probe(normalize_url(seed_url, append_slash=False))  # hyperkitty
    resp = probe(seed_url)  # pipermail
    base = detect_base(seed_url, normalize_url(resp.url, append_slash=False))
    assert base is not None
    sim = _PmSim(session, base)

    def write_board(board: OracleItem):
        sim.items.append(board)
        for thread in sim.board_threads(board):
            sim.items.append(thread)
            for post in sim.thread_posts(thread):
                sim.items.append(post)

    # node_from_url (pipermail.py:120-164), branch order preserved
    r = session.try_get(seed_url, should_cache=True)
    normalized = normalize_url(r.url)
    parts = PurePosixPath(urlparse(normalized).path).parts
    if normalized == base:
        # root: root board object, no root threads (pipermail.py:199-200),
        # then the registration walk, then each board in registration order
        sim.items.append(OracleItem(type="board", path=(), url=base,
                                    origin=base, title=""))
        for board in sim.fetch_lazy_subboards():
            write_board(board)
    elif len(parts) >= 4 and parts[-4] == "pipermail" and parts[-1] != "thread.html":
        tid = parts[-1].removesuffix(".html")
        doc = parse_html(r.body.decode("utf-8", "replace"))
        thread = OracleItem(
            type="thread", path=(parts[-3], tid), url=seed_url, origin=r.url,
            title=doc.find("title").string(),
        )
        sim.items.append(thread)
        for post in sim.thread_posts(thread):
            sim.items.append(post)
    elif len(parts) >= 4 and parts[-4] == "pipermail":
        write_board(sim.fetch_lazy_subboard(parts[-3]))  # thread.html seed
    elif len(parts) >= 3 and parts[-3] == "pipermail":
        write_board(sim.fetch_lazy_subboard(parts[-2]))  # period URL seed
    elif len(parts) >= 3 and parts[-3] == "mailman" and parts[-2] == "listinfo":
        write_board(sim.fetch_lazy_subboard(parts[-1]))  # listinfo URL seed
    elif len(parts) >= 2 and parts[-2] == "pipermail":
        write_board(sim.fetch_lazy_subboard(parts[-1]))  # archive-index seed
    elif len(parts) >= 2:
        # any other 2+-part path falls back to the root (pipermail.py:162)
        sim.items.append(OracleItem(type="board", path=(), url=base,
                                    origin=base, title=""))
        for board in sim.fetch_lazy_subboards():
            write_board(board)
    else:
        raise ValueError(f"pipermail node_from_url: unresolvable {seed_url}")
    return OracleResult(base_url=base, trace=list(session.trace),
                        seen=session.seen(), items=sim.items)
