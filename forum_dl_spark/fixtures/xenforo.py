"""Synthetic XenForo site — pure deterministic URL→page function.

Serves the markup the reference's XenForo extractor consumes
(forum_dl/extractors/xenforo.py):

- ``/``  homepage: ``<html id="XF">``, ``a[data-nav-id=forums]`` (detect,
  xenforo.py:275-297), ``div.block.block--categoryN`` with
  ``h2.block-header a`` + ``div.node--idM`` subforum entries carrying
  ``a[data-shortcut=node-description]`` (xenforo.py:299-389);
- ``/categories/cat-N/`` and ``/forums/sub-M/`` board pages:
  ``.structItem--thread`` rows whose LAST class is ``js-threadListItem-T``
  (xenforo.py:448-466), ``a.pageNav-jump--next`` pagination;
- ``/threads/t-T/[page-K]`` thread pages with BOTH post layouts the
  reference handles (xenforo.py:468-505): ``article.message`` with
  ``ul.message-attribution-main`` and ``.MessageCard``; content =
  ``div.bbWrapper`` inner HTML (SoupTag.string is join-of-contents,
  forum_dl/soup.py:160-162) with interleaved media;
- media paths as in the other fixtures.
"""

from __future__ import annotations

from urllib.parse import urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, media_bytes, words


class SyntheticXenforo:
    base_url = "https://xen.example/"

    def __init__(self, seed: int = 42, n_cats: int = 2, n_subs: int = 2,
                 n_topics: int = 3, max_posts: int = 5,
                 topics_per_page: int = 2, posts_per_page: int = 3,
                 fail_urls: dict[str, int] | None = None) -> None:
        self.seed = seed
        self.n_cats = n_cats
        self.n_subs = n_subs
        self.n_topics = n_topics
        self.max_posts = max_posts
        self.topics_per_page = topics_per_page
        self.posts_per_page = posts_per_page
        self.fail_urls = fail_urls or {}

    # -- model -----------------------------------------------------------------
    def cat_ids(self) -> list[int]:
        return list(range(1, self.n_cats + 1))

    def sub_ids(self, cat: int) -> list[int]:
        return [cat * 10 + j for j in range(1, self.n_subs + 1)]

    def board_ids(self) -> list[int]:
        out = []
        for c in self.cat_ids():
            out.append(c)
            out.extend(self.sub_ids(c))
        return out

    def topic_ids(self, board: int) -> list[int]:
        return [board * 100 + k for k in range(1, self.n_topics + 1)]

    def n_posts(self, t: int) -> int:
        return 1 + h64(self.seed, f"xf:nposts:{t}") % self.max_posts

    def title(self, t: int) -> str:
        return words(self.seed, f"xf:title:{t}", 3).title()

    def card_layout(self, t: int) -> bool:
        return h64(self.seed, f"xf:layout:{t}") % 2 == 0

    def post_html(self, t: int, m: int) -> str:
        pid = t * 100 + m
        h = h64(self.seed, f"xf:post:{pid}")
        iso = f"2020-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:45:00+00:00"
        content = interleaved_html(self.seed, 700000000 + pid)
        if not self.card_layout(t):
            return (
                f'<article class="message" data-content="post-{pid}"'
                f' data-author="xfuser{h % 9}">'
                f'<ul class="message-attribution-main">'
                f'<li><a href="/threads/t-{t}/post-{pid}">#{m}</a></li>'
                f'<li><time datetime="{iso}">then</time></li></ul>'
                f'<div class="bbWrapper">{content}</div></article>'
            )
        return (
            '<div class="MessageCard">'
            '<header class="MessageCard__header">'
            f'<a class="MessageCard__date-created" href="/threads/t-{t}/post-{pid}">link</a>'
            f'<time datetime="{iso}">then</time></header>'
            f'<a class="MessageCard__user-info__name">xfuser{h % 9}</a>'
            f'<div class="MessageCard__content" data-post-id="{pid}">'
            f'<div class="bbWrapper">{content}</div></div></div>'
        )

    # -- pages -------------------------------------------------------------------
    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if parsed.netloc != "xen.example":
            return 404, "text/plain", b"wrong host"
        parts = [p for p in parsed.path.split("/") if p]
        if not parts:
            return 200, "text/html", self._homepage()
        if parts[0] == "categories" and len(parts) == 2:
            cid = int(parts[1].removeprefix("cat-"))
            return self._board(cid, self._page_of(parts))
        if parts[0] == "forums" and len(parts) >= 2:
            sid = int(parts[1].removeprefix("sub-"))
            return self._board(sid, self._page_of(parts))
        if parts[0] == "threads" and len(parts) >= 2:
            t = int(parts[1].removeprefix("t-"))
            return self._thread(t, self._page_of(parts))
        if parsed.path.startswith(("/img/", "/a/", "/obj/", "/v/")):
            ctype, body = media_bytes(self.seed, parsed.path)
            return 200, ctype, body
        return 404, "text/plain", b"not found"

    @staticmethod
    def _page_of(parts: list[str]) -> int:
        if parts[-1].startswith("page-"):
            return int(parts[-1].removeprefix("page-"))
        return 1

    def _homepage(self) -> bytes:
        blocks = []
        for c in self.cat_ids():
            subs = "".join(
                f'<div class="node node--id{s}">'
                f'<a data-shortcut="node-description" href="/forums/sub-{s}/">Forum {s}</a>'
                "</div>"
                for s in self.sub_ids(c)
            )
            blocks.append(
                f'<div class="block block--category{c}">'
                f'<h2 class="block-header"><a href="/categories/cat-{c}/">Category {c}</a></h2>'
                f"{subs}</div>"
            )
        return (
            '<html id="XF"><head><title>Synthetic XenForo</title></head><body>'
            '<nav><a data-nav-id="forums" href="/">Forums</a></nav>'
            + "".join(blocks)
            + "</body></html>"
        ).encode()

    def _crumbs(self, board: int, thread: int | None = None) -> str:
        """Breadcrumb trail with itemprop=item anchors — the markup the
        reference's node_from_url walks (xenforo.py:398-440): board pages
        end at the board itself; thread pages append the thread, so
        ``anchors[-2]`` is the containing board."""
        lis = ['<li><a itemprop="item" href="/">Forums</a></li>']
        if board in self.cat_ids():
            lis.append(
                f'<li><a itemprop="item" href="/categories/cat-{board}/">Category {board}</a></li>'
            )
        else:
            cat = board // 10
            lis.append(
                f'<li><a itemprop="item" href="/categories/cat-{cat}/">Category {cat}</a></li>'
            )
            lis.append(
                f'<li><a itemprop="item" href="/forums/sub-{board}/">Forum {board}</a></li>'
            )
        if thread is not None:
            lis.append(
                f'<li><a itemprop="item" href="/threads/t-{thread}/">{self.title(thread)}</a></li>'
            )
        return f'<ul class="p-breadcrumbs">{"".join(lis)}</ul>'

    _NAV = '<nav><a data-nav-id="forums" href="/">Forums</a></nav>'

    def _board(self, board: int, page: int) -> tuple[int, str, bytes]:
        if board not in self.board_ids():
            return 404, "text/plain", b"no board"
        tids = self.topic_ids(board)
        lo = (page - 1) * self.topics_per_page
        chunk = tids[lo : lo + self.topics_per_page]
        rows = "".join(
            f'<div class="structItem--thread js-threadListItem-{t}">'
            f'<div class="structItem-title">'
            f'<a data-tp-primary="on" href="/threads/t-{t}/">{self.title(t)}</a>'
            "</div></div>"
            for t in chunk
        )
        kind = "categories/cat" if board in self.cat_ids() else "forums/sub"
        nxt = ""
        if lo + self.topics_per_page < len(tids):
            nxt = f'<a class="pageNav-jump--next" href="/{kind}-{board}/page-{page + 1}">Next</a>'
        og = f"https://xen.example/{kind}-{board}/"
        return 200, "text/html", (
            f'<html id="XF"><head><meta property="og:url" content="{og}"></head>'
            f"<body>{self._NAV}{self._crumbs(board)}{rows}{nxt}</body></html>"
        ).encode()

    def _thread(self, t: int, page: int) -> tuple[int, str, bytes]:
        if t // 100 not in self.board_ids() or t not in self.topic_ids(t // 100):
            return 404, "text/plain", b"no thread"
        np = self.n_posts(t)
        lo = (page - 1) * self.posts_per_page
        posts = "".join(
            self.post_html(t, m)
            for m in range(lo + 1, min(lo + self.posts_per_page, np) + 1)
        )
        nxt = ""
        if lo + self.posts_per_page < np:
            nxt = f'<a class="pageNav-jump--next" href="/threads/t-{t}/page-{page + 1}">Next</a>'
        return 200, "text/html", (
            f"<html id=\"XF\"><body>{self._NAV}{self._crumbs(t // 100, t)}"
            f'<h1>{self.title(t)}</h1>'
            f'<div class="block-container" data-lb-id="thread-{t}">{posts}</div>'
            f"{nxt}</body></html>"
        ).encode()
