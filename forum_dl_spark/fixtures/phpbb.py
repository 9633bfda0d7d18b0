"""Synthetic phpBB site — pure deterministic URL→page function.

Serves the markup surface the reference's phpBB extractor consumes
(forum_dl/extractors/phpbb.py):

- ``/``                    homepage with ``div.forabg`` category blocks:
  ``li.header a[href*=viewforum.php?f=]`` + ``a.forumtitle`` subforum links
  (phpbb.py:283-336)
- ``/viewforum.php``       bare probe target for detection (``<html dir>``
  check, phpbb.py:207-229)
- ``/viewforum.php?f=N[&start=K]`` board pages: ``a.topictitle`` links,
  ``.next a`` pagination (CSS phpbb.py:202-205); category pages also carry
  their subforums' ``a.forumtitle`` anchors (consumed by
  ``_do_fetch_subboards``, phpbb.py:337-...)
- ``/viewtopic.php?t=T[&start=K]`` thread pages: ``div.post`` blocks with
  ``div#post_content{pid}``, ``div.content`` (interleaved text+media),
  ``p.author`` with ``span.username`` + ``time[datetime]``, ``h3 > a``
  permalink (phpbb.py:451-487)
- ``/img/... /a/... /obj/...`` media files (downloaded by the reference's
  writer via ``download_file``, forum_dl/writers/common.py:168-189)
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, media_bytes, words


class SyntheticPhpbb:
    base_url = "https://phpbb.example/"

    def __init__(
        self,
        seed: int = 42,
        n_cats: int = 2,
        n_subs: int = 2,
        n_topics: int = 4,
        max_posts: int = 7,
        topics_per_page: int = 3,
        posts_per_page: int = 3,
        fail_urls: dict[str, int] | None = None,
    ) -> None:
        self.seed = seed
        self.n_cats = n_cats
        self.n_subs = n_subs
        self.n_topics = n_topics
        self.max_posts = max_posts
        self.topics_per_page = topics_per_page
        self.posts_per_page = posts_per_page
        self.fail_urls = fail_urls or {}

    # -- content model -------------------------------------------------------
    def cat_ids(self) -> list[int]:
        return list(range(1, self.n_cats + 1))

    def sub_ids(self, cat: int) -> list[int]:
        return [cat * 10 + j for j in range(1, self.n_subs + 1)]

    def forum_ids(self) -> list[int]:
        out = []
        for c in self.cat_ids():
            out.append(c)
            out.extend(self.sub_ids(c))
        return out

    def topic_ids(self, forum: int) -> list[int]:
        return [forum * 100 + k for k in range(1, self.n_topics + 1)]

    def n_posts(self, topic: int) -> int:
        return 1 + h64(self.seed, f"phpbb:nposts:{topic}") % self.max_posts

    def topic_title(self, topic: int) -> str:
        return words(self.seed, f"phpbb:title:{topic}", 3).title()

    def post_id(self, topic: int, m: int) -> int:
        return topic * 100 + m

    def post_html(self, topic: int, m: int) -> str:
        pid = self.post_id(topic, m)
        h = h64(self.seed, f"phpbb:post:{pid}")
        iso = f"2022-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:30:00+00:00"
        content = interleaved_html(self.seed, pid)
        return (
            '<div class="post">'
            f'<div id="post_content{pid}">'
            f'<h3><a href="#p{pid}">Re: {self.topic_title(topic)}</a></h3>'
            f'<p class="author"><span class="username">user{h % 13}</span>'
            f' &raquo; <time datetime="{iso}">a date</time></p>'
            f'<div class="content">{content}</div>'
            "</div></div>"
        )

    # -- pages ----------------------------------------------------------------
    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if parsed.netloc != "phpbb.example":
            return 404, "text/plain", b"wrong host"
        path = parsed.path.rstrip("/")
        q = parse_qs(parsed.query)
        if path == "":
            return 200, "text/html", self._homepage()
        if path == "/viewforum.php":
            if "f" not in q:
                return 200, "text/html", b'<html dir="ltr"><body>index</body></html>'
            return self._viewforum(int(q["f"][0]), int(q.get("start", ["0"])[0]))
        if path == "/viewtopic.php":
            if "t" not in q:
                # detection probes strip the query (normalize_url drops it);
                # a bare viewtopic.php is an error page on real phpBB
                return 404, "text/plain", b"missing t"
            return self._viewtopic(int(q["t"][0]), int(q.get("start", ["0"])[0]))
        if path.startswith(("/img/", "/a/", "/obj/", "/v/")):
            ctype, body = media_bytes(self.seed, path)
            return 200, ctype, body
        return 404, "text/plain", b"not found"

    def _homepage(self) -> bytes:
        blocks = []
        for c in self.cat_ids():
            subs = "".join(
                f'<li><a class="forumtitle" href="./viewforum.php?f={s}">'
                f"Forum {s}</a></li>"
                for s in self.sub_ids(c)
            )
            blocks.append(
                '<div class="forabg"><ul>'
                f'<li class="header"><a href="./viewforum.php?f={c}">Category {c}</a></li>'
                f"{subs}</ul></div>"
            )
        return (
            "<html><head><title>Synthetic phpBB</title></head><body>"
            + "".join(blocks)
            + "</body></html>"
        ).encode()

    def _viewforum(self, f: int, start: int) -> tuple[int, str, bytes]:
        if f not in self.forum_ids():
            return 404, "text/plain", b"no forum"
        subs = ""
        if f in self.cat_ids():
            subs = "".join(
                f'<a class="forumtitle" href="./viewforum.php?f={s}">Forum {s}</a>'
                for s in self.sub_ids(f)
            )
        tids = self.topic_ids(f)
        chunk = tids[start : start + self.topics_per_page]
        topics = "".join(
            f'<a class="topictitle" href="./viewtopic.php?t={t}">{self.topic_title(t)}</a>'
            for t in chunk
        )
        nxt = ""
        if start + self.topics_per_page < len(tids):
            nxt = (
                f'<div class="pagination"><span class="next">'
                f'<a href="./viewforum.php?f={f}&amp;start={start + self.topics_per_page}">Next</a>'
                f"</span></div>"
            )
        return 200, "text/html", (
            f'<html dir="ltr"><body>{subs}{topics}{nxt}</body></html>'
        ).encode()

    def _viewtopic(self, t: int, start: int) -> tuple[int, str, bytes]:
        forum = t // 100
        if forum not in self.forum_ids() or t not in self.topic_ids(forum):
            return 404, "text/plain", b"no topic"
        np = self.n_posts(t)
        posts = "".join(
            self.post_html(t, m)
            for m in range(start + 1, min(start + self.posts_per_page, np) + 1)
        )
        nxt = ""
        if start + self.posts_per_page < np:
            nxt = (
                f'<div class="pagination"><span class="next">'
                f'<a href="./viewtopic.php?t={t}&amp;start={start + self.posts_per_page}">Next</a>'
                f"</span></div>"
            )
        # breadcrumb trail (home → [category →] forum), the markup the
        # reference's viewtopic node_from_url walks to locate the board
        # (phpbb.py:404-412: a[itemprop=item] inside .breadcrumbs)
        crumb_parts = ['<a itemprop="item" href="./">Home</a>']
        if forum not in self.cat_ids():
            cat = forum // 10
            crumb_parts.append(
                f'<a itemprop="item" href="./viewforum.php?f={cat}">Category {cat}</a>'
            )
        crumb_parts.append(
            f'<a itemprop="item" href="./viewforum.php?f={forum}">Forum {forum}</a>'
        )
        crumbs = f'<div class="breadcrumbs">{"".join(crumb_parts)}</div>'
        return 200, "text/html", (
            f'<html dir="ltr"><body>{crumbs}<h2 class="topic-title">'
            f'<a href="./viewtopic.php?t={t}">{self.topic_title(t)}</a></h2>'
            f"{posts}{nxt}</body></html>"
        ).encode()
