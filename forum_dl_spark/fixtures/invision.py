"""Synthetic Invision Community site — per forum_dl/extractors/invision.py:

- ``/`` homepage: ``ul[data-role=breadcrumbList]`` with ONE li (so the
  detection base stays the seed URL, invision.py:80-93) + the
  ``a[title="Invision Community"]`` marker; ``li.cForumRow`` categories
  (``data-categoryid``, SECOND anchor of the h2) with ``div.cForumGrid``
  boards (``data-forumid``, h3.cForumGrid__title a) — note the reference
  registers board titles with the CATEGORY's title (invision.py:118-128),
  later corrected by the ``_do_fetch_subboards`` update during the
  ``_fetch_lower_boards`` prefetch (invision.py:131-152 + the _set_board
  update branch) — quirk preserved;
- board pages: ``li[data-controller="forums.frontforum.topicRow"]`` rows
  (``data-rowid``, h4.ipsDataItem_title a[title]); category pages list
  their boards' cForumGrid entries (re-registration) and no topic rows;
- thread pages: ``article.ipsComment#elComment_P`` with
  ``div[data-role=commentContent]`` (inner HTML, NOT stripped),
  cAuthorPane (first div → permalink anchor, h3 a author, time[datetime]);
- pagination via ``link[rel=next]``.
"""

from __future__ import annotations

from urllib.parse import urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, media_bytes, words

BASE = "https://inv.example/"


class SyntheticInvision:
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
        return 1 + h64(self.seed, f"inv:nposts:{t}") % self.max_posts

    def title(self, t: int) -> str:
        return words(self.seed, f"inv:title:{t}", 3).title()

    def _grid(self, b: int) -> str:
        return (
            f'<div class="cForumGrid" data-forumid="{b}">'
            f'<h3 class="cForumGrid__title">'
            f'<a href="{BASE}forums/forum-{b}/">Forum {b}</a></h3></div>'
        )

    # detection marker on every page (invision.py:80-93) — base is taken
    # from the SECOND breadcrumb li's anchor when the list has >=2 entries
    _IC_ANCHOR = (
        '<a title="Invision Community" href="https://invisioncommunity.com">IC</a>'
    )

    def _crumbs(self, cat: int | None, board: int | None = None,
                topic: int | None = None) -> str:
        """Breadcrumb list: icon li, home li, then ancestors + self —
        node_from_url reads li[-2] as the thread's board and treats <=2
        lis as the root (invision.py:154-185)."""
        lis = ['<li>icon</li>', f'<li><a href="{BASE}">Forums</a></li>']
        if cat is not None:
            lis.append(
                f'<li><a href="{BASE}forums/cat-{cat}/">Category {cat}</a></li>'
            )
        if board is not None:
            lis.append(
                f'<li><a href="{BASE}forums/forum-{board}/">Forum {board}</a></li>'
            )
        if topic is not None:
            lis.append(
                f'<li><a href="{BASE}topic/{topic}-x/">{self.title(topic)}</a></li>'
            )
        return f'<ul data-role="breadcrumbList">{"".join(lis)}</ul>'

    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if parsed.netloc != "inv.example":
            return 404, "text/plain", b"wrong host"
        parts = [p for p in parsed.path.split("/") if p]
        page = 1
        if len(parts) >= 2 and parts[-2] == "page":
            page = int(parts[-1])
            parts = parts[:-2]
        if not parts:
            return 200, "text/html", self._homepage()
        if parts[0] == "forums" and len(parts) == 2:
            kind, _, num = parts[1].partition("-")
            if kind == "cat":
                return self._cat(int(num))
            if kind == "forum":
                return self._board(int(num), page)
        if parts[0] == "topic" and len(parts) == 2:
            return self._thread(int(parts[1].partition("-")[0]), page)
        if parsed.path.startswith(("/img/", "/a/", "/obj/", "/v/")):
            ctype, body = media_bytes(self.seed, parsed.path)
            return 200, ctype, body
        return 404, "text/plain", b"not found"

    def _homepage(self) -> bytes:
        rows = []
        for c in self.cat_ids():
            grids = "".join(self._grid(b) for b in self.board_ids(c))
            rows.append(
                f'<li class="cForumRow" data-categoryid="{c}">'
                f'<h2><a href="#">icon</a>'
                f'<a href="{BASE}forums/cat-{c}/">Category {c}</a></h2>'
                f"{grids}</li>"
            )
        return (
            "<html><head><title>Synthetic Invision</title></head><body>"
            '<ul data-role="breadcrumbList"><li><a href="/">Home</a></li></ul>'
            "<ul>" + "".join(rows) + "</ul>"
            '<a title="Invision Community" href="https://invisioncommunity.com">IC</a>'
            "</body></html>"
        ).encode()

    def _cat(self, c: int) -> tuple[int, str, bytes]:
        if c not in self.cat_ids():
            return 404, "text/plain", b"no cat"
        grids = "".join(self._grid(b) for b in self.board_ids(c))
        return 200, "text/html", (
            f"<html><body>{self._crumbs(c)}{grids}{self._IC_ANCHOR}</body></html>"
        ).encode()

    def _board(self, b: int, page: int) -> tuple[int, str, bytes]:
        if b not in self.all_board_ids():
            return 404, "text/plain", b"no board"
        tids = self.topic_ids(b)
        lo = (page - 1) * self.topics_per_page
        chunk = tids[lo : lo + self.topics_per_page]
        rows = "".join(
            f'<li data-controller="forums.frontforum.topicRow" data-rowid="{t}">'
            f'<h4 class="ipsDataItem_title">'
            f'<a title="{self.title(t)}" href="{BASE}topic/{t}-x/">{self.title(t)}</a>'
            "</h4></li>"
            for t in chunk
        )
        nxt = ""
        if lo + self.topics_per_page < len(tids):
            nxt = f'<link rel="next" href="{BASE}forums/forum-{b}/page/{page + 1}">'
        return 200, "text/html", (
            f"<html><head>{nxt}</head><body>{self._crumbs(b // 10, b)}"
            f"<ul>{rows}</ul>{self._IC_ANCHOR}</body></html>"
        ).encode()

    def _thread(self, t: int, page: int) -> tuple[int, str, bytes]:
        if t // 100 not in self.all_board_ids():
            return 404, "text/plain", b"no topic"
        np = self.n_posts(t)
        lo = (page - 1) * self.posts_per_page
        posts = []
        for m in range(lo + 1, min(lo + self.posts_per_page, np) + 1):
            pid = t * 100 + m
            h = h64(self.seed, f"inv:post:{pid}")
            iso = f"2017-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:25:00+00:00"
            content = interleaved_html(self.seed, 400000000 + pid)
            posts.append(
                f'<article class="ipsComment" id="elComment_{pid}">'
                f'<div class="cAuthorPane_content">'
                f'<div class="perma"><a href="{BASE}topic/{t}-x/?comment={pid}">#{m}</a></div>'
                f'<h3 class="cAuthorPane_author"><a>invuser{h % 6}</a></h3>'
                f'<time datetime="{iso}">then</time></div>'
                f'<div data-role="commentContent">{content}</div></article>'
            )
        nxt = ""
        if lo + self.posts_per_page < np:
            nxt = f'<link rel="next" href="{BASE}topic/{t}-x/page/{page + 1}">'
        b = t // 100
        return 200, "text/html", (
            f'<html><head>{nxt}'
            f'<meta property="og:title" content="{self.title(t)}"></head>'
            f'<body data-pageid="{t}">{self._crumbs(b // 10, b, t)}'
            + "".join(posts)
            + f"{self._IC_ANCHOR}</body></html>"
        ).encode()
