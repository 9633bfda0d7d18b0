"""Sequential reference simulation: ProBoards (forum_dl/extractors/proboards.py).

- fetchless netloc detection (proboards.py:204-209); base = url root;
- ``_fetch_top_boards`` fetches the homepage itself (try_get cached,
  proboards.py:211-217) then runs ``_fetch_lower_boards``: every non-root
  board with a URL is prefetched (category fragment URLs included —
  they serve the homepage again, and their GLOBAL ``tr#board-`` parse
  re-registers boards: the update/create semantics of ``_set_board``
  (common.py:173-215) are modeled faithfully, which with multiple
  categories cross-registers every board under every category);
- posts carry epoch-millisecond timestamps (proboards.py:359-361), an
  optional author anchor ("" fallback), and a synthesized
  ``post/{id}/thread`` URL (proboards.py:364-365).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from urllib.parse import urljoin

from ..htmlmini import Node, parse_html
from .refsim import OracleItem, OracleResult
from .refsim_vb_inv import _Board, _HtmlSimBase
from .session import (
    AlreadyFailedError,
    AlreadyVisitedError,
    FetchError,
    HttpStatusError,
    OracleSession,
)

_ABORTS = (AlreadyVisitedError, AlreadyFailedError, HttpStatusError, FetchError)
_CAT_NAME = re.compile(r"^category-(\d+)$")
_BOARD_ID = re.compile(r"^board-(\d+)$")
_THREAD_CLASS = re.compile(r"^thread-(\d+)$")
_POST_ID = re.compile(r"^post-(\d+)$")


def ts_ms_to_dt(ms: int) -> datetime:
    """datetime.fromtimestamp(ms/1000) — naive local time; this container
    runs UTC, and both sides share this kernel."""
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).replace(tzinfo=None)


class _PbSim(_HtmlSimBase):
    def _register_boards_from(self, board: _Board, doc: Node, origin: str) -> None:
        for tr in doc.find_all("tr"):
            m = _BOARD_ID.match(tr.get("id") or "")
            if m is None:
                continue
            bid = m.group(1)
            anchor = next(
                (a for a in tr.find_all("a")
                 if any(_BOARD_ID.match(c) for c in a.classes())),
                None,
            )
            if anchor is None:
                continue
            if bid in board.subboards:  # update branch (common.py:186-201)
                sb = board.subboards[bid]
                sb.url = urljoin(self.base_url, anchor.get("href"))
                sb.origin = origin
                sb.title = anchor.string()
            else:
                sb = _Board(
                    path=board.path + (bid,),
                    url=urljoin(self.base_url, anchor.get("href")),
                    origin=origin, title=anchor.string(),
                )
                board.subboards[bid] = sb
                self.boards.append(sb)

    def run_probe_cascade(self, seed_url: str) -> None:
        """Probes before proboards in the cascade (extractors/__init__.py:
        12-24): hyperkitty/pipermail/hypermail/xenforo/vbulletin — two
        distinct fetch keys, pre-caching the homepage."""
        from ..urls import normalize_url

        def probe(u: str):
            try:
                return self.session.try_get(u, should_cache=True, should_retry=False)
            except _ABORTS:
                return None

        probe(normalize_url(seed_url, append_slash=False))  # hyperkitty
        probe(seed_url)  # pipermail (hypermail/xenforo/vbulletin reuse keys)

    def fetch_top_boards(self) -> None:
        resp = self.session.try_get(self.base_url, should_cache=True,
                                    should_retry=False)
        doc = parse_html(resp.body.decode("utf-8", "replace"))
        for ca in doc.find_all("a"):
            m = _CAT_NAME.match(ca.get("name") or "")
            if m is None:
                continue
            cid = m.group(1)
            # find_next div.title_wrapper / div.boards
            title, boards_div, seen = None, None, False
            for n in doc.iter():
                if n is ca:
                    seen = True
                    continue
                if seen and n.tag == "div" and "title_wrapper" in n.classes() and title is None:
                    title = n.string()
                if seen and n.tag == "div" and "boards" in n.classes() and boards_div is None:
                    boards_div = n
                if title is not None and boards_div is not None:
                    break
            cat = _Board(
                path=(cid,), url=urljoin(resp.url, f"#category-{cid}"),
                origin=resp.url, title=title or "",
            )
            self.root.subboards[cid] = cat
            self.boards.append(cat)
            self._register_boards_from(cat, boards_div, resp.url)
        # _fetch_lower_boards(root): every non-root board with a URL
        i = 0
        while i < len(self.boards):
            b = self.boards[i]
            i += 1
            if b is self.root or not b.url:
                continue
            try:
                r = self.session.get(b.url, should_cache=True)
            except _ABORTS:
                continue
            d = parse_html(r.body.decode("utf-8", "replace"))
            self._register_boards_from(b, d, r.url)

    def next_href(self, doc: Node) -> str | None:
        for n in doc.iter():
            if "next" in n.classes():
                a = n if n.tag == "a" else n.find("a")
                if a is not None and a.get("href"):
                    return a.get("href")
        return None

    def board_threads_on_page(self, board, doc, resp):
        for a in doc.find_all("a", class_="thread-link"):
            if (a.get("href") or "").startswith("/threads/recent"):
                continue  # the :not() CSS exclusion (proboards.py:197)
            m = next((mm for c in a.classes() if (mm := _THREAD_CLASS.match(c))), None)
            if m is None:
                continue
            yield OracleItem(
                type="thread", path=board.path + (m.group(1),),
                url=urljoin(self.base_url, a.get("href")),
                origin=resp.url, title=a.string(),
            )

    def posts_on_page(self, thread, doc, resp, state_url):
        for tr in doc.find_all("tr", class_="item"):
            pid = _POST_ID.match(tr.get("id") or "").group(1)
            user = tr.find("a", class_="o-user-link")
            abbr = tr.find("abbr", class_="time")
            msg = tr.find("div", class_="message")
            yield OracleItem(
                type="post", path=thread.path, subpath=(pid,),
                url=urljoin(self.base_url, f"post/{pid}/thread"),
                origin=resp.url,
                author=user.string() if user is not None else "",
                creation_time=ts_ms_to_dt(int(abbr.get("data-timestamp"))),
                content=msg.inner_html(),
            )


def run_reference_proboards(server, seed_url: str, retries: int = 4) -> OracleResult:
    session = OracleSession(server=server, retries=retries)
    base = urljoin(seed_url, "/")
    sim = _PbSim(session, base)
    sim.run_probe_cascade(seed_url)
    sim.fetch_top_boards()
    # node_from_url(base): path parts <= 1 → root, no fetch (proboards.py:287-290)
    sim.write_board(sim.root)
    return OracleResult(base_url=base, trace=list(session.trace),
                        seen=session.seen(), items=sim.items)
