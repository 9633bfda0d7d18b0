"""Synthetic vBulletin 5 site — per forum_dl/extractors/vbulletin.py:

- ``/`` homepage: ``meta[name=generator][content^=vBulletin]`` + ``<base>``
  (detect, vbulletin.py:223-233), ``tr.category-header``/``tr.forum-item``
  rows with ``id=forumN`` (vbulletin.py:235-291);
- board pages: ``tr.topic-item[data-node-id]`` with ``a.topic-title``;
  category pages carry no topic rows; ``a.right-arrow[href]`` pagination;
- thread pages: ``li.b-post[data-node-id]`` with ``a.b-post__count``
  permalink, ``div.js-post__content-text`` (inner HTML, stripped),
  ``div.author a``, ``time[itemprop=dateCreated]``; comment items
  (``li.b-post.b-comment``) are selected but SKIPPED by the reference
  (vbulletin.py:352-354) — quirk preserved.
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, media_bytes, words

BASE = "https://vb.example/"


class SyntheticVbulletin:
    base_url = BASE

    def __init__(self, seed: int = 42, n_cats: int = 2, n_boards: int = 2,
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
        return 1 + h64(self.seed, f"vb:nposts:{t}") % self.max_posts

    def has_comment(self, t: int) -> bool:
        return h64(self.seed, f"vb:comment:{t}") % 2 == 0

    def title(self, t: int) -> str:
        return words(self.seed, f"vb:title:{t}", 3).title()

    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if parsed.netloc != "vb.example":
            return 404, "text/plain", b"wrong host"
        parts = [p for p in parsed.path.split("/") if p]
        q = parse_qs(parsed.query)
        page = int(q.get("page", ["1"])[0])
        if not parts:
            return 200, "text/html", self._homepage()
        if parts[0] == "forum" and len(parts) == 2:
            kind, _, num = parts[1].partition("-")
            if kind == "cat":
                c = int(num)
                return 200, "text/html", (
                    f"<html>{self._head()}<body>{self._crumbs(c)}"
                    "category page</body></html>"
                ).encode()
            if kind == "board":
                return self._board(int(num), page)
            if kind == "topic":
                return self._thread(int(num), page)
        if parsed.path.startswith(("/img/", "/a/", "/obj/", "/v/")):
            ctype, body = media_bytes(self.seed, parsed.path)
            return 200, ctype, body
        return 404, "text/plain", b"not found"

    @staticmethod
    def _head() -> str:
        # every real vB page carries the generator meta + base href the
        # detection predicate reads (vbulletin.py:223-233)
        return (
            '<head><meta name="generator" content="vBulletin 5.6">'
            f'<base href="{BASE}"></head>'
        )

    def _crumbs(self, cat: int | None, board: int | None = None) -> str:
        """crumb-link trail (home, forums, category[, board]) — the markup
        _get_node_from_url walks (vbulletin.py:294-330): thread pages end at
        the board, board pages at themselves; urls[2:] is the walk list."""
        anchors = [
            f'<a class="crumb-link" href="{BASE}">Home</a>',
            f'<a class="crumb-link" href="{BASE}">Forums</a>',
        ]
        if cat is not None:
            anchors.append(
                f'<a class="crumb-link" href="{BASE}forum/cat-{cat}">Category {cat}</a>'
            )
        if board is not None:
            anchors.append(
                f'<a class="crumb-link" href="{BASE}forum/board-{board}">Board {board}</a>'
            )
        return f'<div class="breadcrumbs">{"".join(anchors)}</div>'

    def _homepage(self) -> bytes:
        rows = []
        for c in self.cat_ids():
            rows.append(
                f'<tr class="category-header" id="forum{c}">'
                f'<td><a class="category" href="{BASE}forum/cat-{c}">Category {c}</a></td></tr>'
            )
            for b in self.board_ids(c):
                rows.append(
                    f'<tr class="forum-item" id="forum{b}">'
                    f'<td><a class="forum-title" href="{BASE}forum/board-{b}">Board {b}</a></td></tr>'
                )
        return (
            "<html><head>"
            '<meta name="generator" content="vBulletin 5.6">'
            f'<base href="{BASE}">'
            "</head><body><table>"
            + "".join(rows)
            + "</table></body></html>"
        ).encode()

    def _board(self, b: int, page: int) -> tuple[int, str, bytes]:
        if b not in self.all_board_ids():
            return 404, "text/plain", b"no board"
        tids = self.topic_ids(b)
        lo = (page - 1) * self.topics_per_page
        chunk = tids[lo : lo + self.topics_per_page]
        rows = "".join(
            f'<tr class="topic-item" data-node-id="{t}">'
            f'<td><a class="topic-title" href="{BASE}forum/topic-{t}">{self.title(t)}</a></td></tr>'
            for t in chunk
        )
        nxt = ""
        if lo + self.topics_per_page < len(tids):
            nxt = f'<a class="right-arrow" href="{BASE}forum/board-{b}?page={page + 1}">&gt;</a>'
        return 200, "text/html", (
            f"<html>{self._head()}<body>{self._crumbs(b // 10, b)}"
            f"<table>{rows}</table>{nxt}</body></html>"
        ).encode()

    def _thread(self, t: int, page: int) -> tuple[int, str, bytes]:
        if t // 100 not in self.all_board_ids():
            return 404, "text/plain", b"no topic"
        np = self.n_posts(t)
        lo = (page - 1) * self.posts_per_page
        posts = []
        for m in range(lo + 1, min(lo + self.posts_per_page, np) + 1):
            pid = t * 100 + m
            h = h64(self.seed, f"vb:post:{pid}")
            iso = f"2018-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:05:00+00:00"
            content = interleaved_html(self.seed, 500000000 + pid)
            posts.append(
                f'<li class="b-post" data-node-id="{pid}">'
                f'<div class="author"><a>vbuser{h % 8}</a></div>'
                f'<a class="b-post__count" href="{BASE}forum/topic-{t}?p={pid}">#{m}</a>'
                f'<time itemprop="dateCreated" datetime="{iso}">then</time>'
                f'<div class="js-post__content-text">{content}</div></li>'
            )
        # a selected-but-skipped vB comment row (vbulletin.py:352-354)
        if self.has_comment(t) and page == 1:
            posts.append(
                '<li class="b-post b-comment" data-node-id="999">'
                '<div class="js-post__content-text">comment ignored</div></li>'
            )
        nxt = ""
        if lo + self.posts_per_page < np:
            nxt = f'<a class="right-arrow" href="{BASE}forum/topic-{t}?page={page + 1}">&gt;</a>'
        b = t // 100
        return 200, "text/html", (
            f"<html>{self._head()}<body>{self._crumbs(b // 10, b)}"
            f'<h1 class="main-title">{self.title(t)}</h1>'
            f'<h2 class="b-post__title">{self.title(t)}</h2>'
            f'<input name="nodeid" value="{t}">'
            "<ul>" + "".join(posts) + f"</ul>{nxt}</body></html>"
        ).encode()
