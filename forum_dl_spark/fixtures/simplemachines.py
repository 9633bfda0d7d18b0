"""Synthetic Simple Machines (SMF) site — pure deterministic URL→page
function, per forum_dl/extractors/simplemachines.py:

- ``/`` homepage: ``link[rel=contents]`` + simplemachines.org anchor
  (detect, simplemachines.py:240-257), ``a#cN`` category anchors whose
  NEXT SIBLING text is the title, each followed by ``a#bM`` board anchors
  with absolute hrefs (simplemachines.py:259-312), and a ``linktree``
  breadcrumb so ``_get_node_from_url`` resolves the root;
- ``/index.php#cN``: category "pages" are fragment URLs into the index —
  fetched fresh, contain no ``span[id^=msg_]`` thread rows;
- ``/index.php?board=B.K``: board pages with ``span[id=msg_T]`` thread
  rows (first child anchor = title+url) and ``a.nav_page > span.next_page``
  pagination;
- ``/index.php?topic=T.K``: thread pages with ``div.post_wrapper`` posts:
  ``div#msg_P`` content (inner HTML, stripped), ``h5#subject_P > a``,
  a ``div.smalltext`` carrying the month-name date the reference scrapes
  by regex (simplemachines.py:409-417), ``div.poster > h4 > a`` author.
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, media_bytes, words

BASE = "https://smf.example/"
_MONTHS = ["January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December"]


class SyntheticSimplemachines:
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

    def cat_ids(self) -> list[int]:
        return list(range(1, self.n_cats + 1))

    def board_ids(self, cat: int) -> list[int]:
        return [cat * 10 + j for j in range(1, self.n_boards + 1)]

    def all_board_ids(self) -> list[int]:
        return [b for c in self.cat_ids() for b in self.board_ids(c)]

    def topic_ids(self, board: int) -> list[int]:
        return [board * 100 + k for k in range(1, self.n_topics + 1)]

    def n_posts(self, t: int) -> int:
        return 1 + h64(self.seed, f"smf:nposts:{t}") % self.max_posts

    def title(self, t: int) -> str:
        return words(self.seed, f"smf:title:{t}", 3).title()

    def post_date(self, pid: int) -> str:
        h = h64(self.seed, f"smf:date:{pid}")
        ampm = "AM" if h % 2 else "PM"
        return (f"{_MONTHS[h % 12]} {1 + h % 28:02d}, 2019, "
                f"{1 + h % 12:02d}:{h % 60:02d}:00 {ampm}")

    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if parsed.netloc != "smf.example":
            return 404, "text/plain", b"wrong host"
        path = parsed.path
        q = parse_qs(parsed.query)
        if path in ("", "/", "/index.php") and not q:
            return 200, "text/html", self._homepage()
        if path == "/index.php" and "board" in q:
            b, _, start = q["board"][0].partition(".")
            return self._board(int(b), int(start or 0))
        if path == "/index.php" and "topic" in q:
            t, _, start = q["topic"][0].partition(".")
            return self._thread(int(t), int(start or 0))
        if path.startswith(("/img/", "/a/", "/obj/", "/v/")):
            ctype, body = media_bytes(self.seed, path)
            return 200, ctype, body
        return 404, "text/plain", b"not found"

    def _homepage(self) -> bytes:
        blocks = []
        for c in self.cat_ids():
            boards = "".join(
                f'<div><a id="b{b}" href="{BASE}index.php?board={b}.0">Board {b}</a></div>'
                for b in self.board_ids(c)
            )
            blocks.append(
                f'<div class="category"><h3><a id="c{c}"></a>Category {c}</h3>'
                f"{boards}</div>"
            )
        return (
            "<html><head><title>Synthetic SMF</title>"
            f'<link rel="contents" href="{BASE}">'
            "</head><body>"
            '<div class="linktree"><ul><li>'
            f'<a href="{BASE}">Home</a></li></ul></div>'
            + "".join(blocks)
            + '<a href="https://www.simplemachines.org" title="Simple Machines">SMF</a>'
            "</body></html>"
        ).encode()

    # every real SMF page carries the theme credit + contents link the
    # detection predicate needs (simplemachines.py:240-257)
    _SMF_ANCHOR = (
        '<a href="https://www.simplemachines.org" title="Simple Machines">SMF</a>'
    )

    def _linktree(self, b: int, topic: int | None = None) -> str:
        """Breadcrumb trail (home → category → board [→ topic]) — the
        markup _get_node_from_url walks (simplemachines.py:348-375)."""
        cat = b // 10
        lis = [
            f'<li><a href="{BASE}">Home</a></li>',
            f'<li><a href="{BASE}index.php#c{cat}">Category {cat}</a></li>',
            f'<li><a href="{BASE}index.php?board={b}.0">Board {b}</a></li>',
        ]
        if topic is not None:
            lis.append(
                f'<li><a href="{BASE}index.php?topic={topic}.0">{self.title(topic)}</a></li>'
            )
        return f'<div class="linktree"><ul>{"".join(lis)}</ul></div>'

    def _board(self, b: int, start: int) -> tuple[int, str, bytes]:
        if b not in self.all_board_ids():
            return 404, "text/plain", b"no board"
        tids = self.topic_ids(b)
        chunk = tids[start : start + self.topics_per_page]
        rows = "".join(
            f'<span id="msg_{t}">'
            f'<a href="{BASE}index.php?topic={t}.0">{self.title(t)}</a></span>'
            for t in chunk
        )
        nxt = ""
        if start + self.topics_per_page < len(tids):
            nxt = (
                f'<a class="nav_page" href="{BASE}index.php?board={b}.{start + self.topics_per_page}">'
                '<span class="next_page">Next</span></a>'
            )
        return 200, "text/html", (
            f'<html><head><link rel="contents" href="{BASE}"></head>'
            f"<body>{self._linktree(b)}{rows}{nxt}{self._SMF_ANCHOR}</body></html>"
        ).encode()

    def _thread(self, t: int, start: int) -> tuple[int, str, bytes]:
        if t // 100 not in self.all_board_ids() or t not in self.topic_ids(t // 100):
            return 404, "text/plain", b"no topic"
        np = self.n_posts(t)
        posts = []
        for m in range(start + 1, min(start + self.posts_per_page, np) + 1):
            pid = t * 100 + m
            h = h64(self.seed, f"smf:post:{pid}")
            content = interleaved_html(self.seed, 600000000 + pid)
            posts.append(
                '<div class="post_wrapper">'
                f'<div class="poster"><h4><a>smfuser{h % 7}</a></h4></div>'
                f'<h5 id="subject_{pid}">'
                f'<a href="{BASE}index.php?topic={t}.msg{pid}#msg{pid}">'
                f"Re: {self.title(t)}</a></h5>"
                f'<div class="smalltext">&laquo; on: {self.post_date(pid)} &raquo;</div>'
                f'<div id="msg_{pid}">{content}</div>'
                "</div>"
            )
        nxt = ""
        if start + self.posts_per_page < np:
            nxt = (
                f'<a class="nav_page" href="{BASE}index.php?topic={t}.{start + self.posts_per_page}">'
                '<span class="next_page">Next</span></a>'
            )
        return 200, "text/html", (
            f'<html><head><title>{self.title(t)}</title>'
            f'<link rel="contents" href="{BASE}"></head><body>'
            f"{self._linktree(t // 100, t)}"
            f'<input name="topic" value="{t}">'
            f'<div id="forumposts">{"".join(posts)}</div>'
            f"{nxt}{self._SMF_ANCHOR}</body></html>"
        ).encode()
