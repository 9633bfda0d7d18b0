"""Synthetic ProBoards site — per forum_dl/extractors/proboards.py:

- detection is a pure netloc check (``*.proboards.com``, proboards.py:
  204-209) — zero probe fetches;
- ``/`` homepage: ``a[name=category-N]`` anchors (title from the next
  ``div.title_wrapper``) + ``tr#board-M`` rows with ``a.board-M`` anchors
  (proboards.py:211-255); category URLs are ``#category-N`` fragments into
  the homepage;
- board pages ``/board/M``: ``a.thread-link.thread-T`` rows
  (the ``:not([href^=/threads/recent])`` CSS exclusion is exercised with a
  recent-threads link), ``.next a[href]`` pagination;
- thread pages ``/thread/T``: ``tr.item#post-P`` rows with
  ``a.o-user-link`` author (optional → "" fallback, proboards.py:344-358),
  ``abbr.time[data-timestamp]`` epoch-milliseconds dates
  (proboards.py:359-361), ``div.message`` inner HTML.

Default is ONE category: with several, the reference's global
``tr#board-`` parse during category prefetch cross-registers every board
under every category (an emergent reference behavior the oracle models but
the fixtures deliberately avoid).
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, media_bytes, words

BASE = "https://synth.proboards.com/"


class SyntheticProboards:
    base_url = BASE

    def __init__(self, seed: int = 42, n_cats: int = 1, n_boards: int = 2,
                 n_topics: int = 3, max_posts: int = 5,
                 topics_per_page: int = 2, posts_per_page: int = 3,
                 fail_urls: dict[str, int] | None = None) -> None:
        self.seed = seed
        self.n_cats = n_cats
        self.n_boards = n_boards
        self.n_topics = n_topics
        self.max_posts = max_posts
        self.topics_per_page = topics_per_page
        self.posts_per_page = posts_per_page
        self.fail_urls = fail_urls or {}

    def cat_ids(self):
        return list(range(1, self.n_cats + 1))

    def board_ids(self, cat: int):
        return [cat * 10 + j for j in range(1, self.n_boards + 1)]

    def all_board_ids(self):
        return [b for c in self.cat_ids() for b in self.board_ids(c)]

    def topic_ids(self, board: int):
        return [board * 100 + k for k in range(1, self.n_topics + 1)]

    def n_posts(self, t: int) -> int:
        return 1 + h64(self.seed, f"pb:nposts:{t}") % self.max_posts

    def title(self, t: int) -> str:
        return words(self.seed, f"pb:title:{t}", 3).title()

    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if not parsed.netloc.endswith("proboards.com"):
            return 404, "text/plain", b"wrong host"
        parts = [p for p in parsed.path.split("/") if p]
        q = parse_qs(parsed.query)
        page = int(q.get("page", ["1"])[0])
        if not parts:
            return 200, "text/html", self._homepage()
        if parts[0] == "board" and len(parts) == 2:
            return self._board(int(parts[1]), page)
        if parts[0] == "thread" and len(parts) == 2:
            return self._thread(int(parts[1]), page)
        if parsed.path.startswith(("/img/", "/a/", "/obj/", "/v/")):
            ctype, body = media_bytes(self.seed, parsed.path)
            return 200, ctype, body
        return 404, "text/plain", b"not found"

    def _homepage(self) -> bytes:
        blocks = []
        for c in self.cat_ids():
            rows = "".join(
                f'<tr id="board-{b}"><td>'
                f'<a class="board-{b}" href="/board/{b}">Board {b}</a></td></tr>'
                for b in self.board_ids(c)
            )
            blocks.append(
                f'<a name="category-{c}"></a>'
                f'<div class="title_wrapper">Category {c}</div>'
                f'<div class="boards"><table>{rows}</table></div>'
            )
        return (
            "<html><head><title>Synthetic ProBoards</title></head><body>"
            + "".join(blocks)
            + "</body></html>"
        ).encode()

    def _board(self, b: int, page: int) -> tuple[int, str, bytes]:
        if b not in self.all_board_ids():
            return 404, "text/plain", b"no board"
        tids = self.topic_ids(b)
        lo = (page - 1) * self.topics_per_page
        chunk = tids[lo : lo + self.topics_per_page]
        rows = "".join(
            f'<a class="thread-link thread-{t}" href="/thread/{t}">{self.title(t)}</a>'
            for t in chunk
        )
        # excluded by the :not([href^=/threads/recent]) selector
        rows += '<a class="thread-link thread-0" href="/threads/recent">Recent</a>'
        nxt = ""
        if lo + self.topics_per_page < len(tids):
            nxt = (
                f'<div class="next"><a href="/board/{b}?page={page + 1}">Next</a></div>'
            )
        return 200, "text/html", f"<html><body>{rows}{nxt}</body></html>".encode()

    def _thread(self, t: int, page: int) -> tuple[int, str, bytes]:
        if t // 100 not in self.all_board_ids():
            return 404, "text/plain", b"no thread"
        np = self.n_posts(t)
        lo = (page - 1) * self.posts_per_page
        posts = []
        for m in range(lo + 1, min(lo + self.posts_per_page, np) + 1):
            pid = t * 100 + m
            h = h64(self.seed, f"pb:post:{pid}")
            ts_ms = (1500000000 + pid * 60 + h % 60) * 1000
            content = interleaved_html(self.seed, 300000000 + pid)
            user = (
                f'<a class="o-user-link">pbuser{h % 5}</a>'
                if h % 7 != 0 else ""  # exercise the missing-author fallback
            )
            posts.append(
                f'<tr class="item" id="post-{pid}"><td>{user}'
                f'<abbr class="time" data-timestamp="{ts_ms}">then</abbr>'
                f'<div class="message">{content}</div></td></tr>'
            )
        nxt = ""
        if lo + self.posts_per_page < np:
            nxt = f'<div class="next"><a href="/thread/{t}?page={page + 1}">Next</a></div>'
        return 200, "text/html", (
            "<html><body><table>" + "".join(posts) + f"</table>{nxt}</body></html>"
        ).encode()
