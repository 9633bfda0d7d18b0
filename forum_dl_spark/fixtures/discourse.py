"""Synthetic Discourse site — a pure deterministic URL→page function.

Serves the JSON API surface the reference's Discourse extractor consumes
(forum_dl/extractors/discourse.py):

- ``/``            homepage with ``nav.crawler-nav`` (detect, discourse.py:58-72)
- ``/site.json``   category tree (discourse.py:74-107)
- ``/c/{slug}/{id}.json[?page=N]`` topic lists with ``more_topics_url``
  (discourse.py:166-198)
- ``/t/{slug}/{id}.json`` / ``/t/{id}.json`` topic with post_stream
  (discourse.py:200-244)
- ``/t/{id}/posts.json?post_ids[]=...`` post chunks (discourse.py:210-219)

All content derives from ``md5(seed:key)`` — no RNG state — so executors and
the oracle see identical bytes. ``fail_urls`` maps URL → number of attempts
that raise a transport error before success (exercises the retry path, which
in the reference applies only to transport exceptions,
forum_dl/session.py:117-141; purity is kept by making failure a function of
the ``attempt`` number).
"""

from __future__ import annotations

import json
from urllib.parse import parse_qs, urlparse

from ..oracle.session import FetchError
from .content import h64 as _h
from .content import interleaved_html, words as _shared_words

POSTS_PER_FETCH = 20  # reference chunk size, discourse.py:213


class SyntheticDiscourse:
    base_url = "https://forum.example/"

    def __init__(
        self,
        seed: int = 42,
        n_cats: int = 2,
        n_subcats: int = 2,
        n_topics: int = 3,
        max_posts: int = 45,
        topics_per_page: int = 2,
        duplicate_topic: bool = True,
        fail_urls: dict[str, int] | None = None,
        edited_posts: dict[int, str] | None = None,
    ) -> None:
        self.seed = seed
        self.n_cats = n_cats
        self.n_subcats = n_subcats
        self.n_topics = n_topics
        self.max_posts = max_posts
        self.topics_per_page = topics_per_page
        self.duplicate_topic = duplicate_topic
        self.fail_urls = fail_urls or {}
        # post_id -> replacement cooked HTML, mutable BETWEEN crawls — the
        # content-edit hook the incremental-recrawl tests flip
        # (tests/test_recrawl_diff.py); empty = pristine deterministic model
        self.edited_posts = edited_posts or {}

    # -- deterministic content model --------------------------------------
    def categories(self) -> list[dict]:
        cats: list[dict] = []
        for i in range(1, self.n_cats + 1):
            cats.append({"id": 100 + i, "slug": f"cat{i}", "name": f"Category {i}"})
        for i in range(1, self.n_cats + 1):
            for j in range(1, self.n_subcats + 1):
                cats.append(
                    {
                        "id": 1000 + i * 10 + j,
                        "slug": f"cat{i}-sub{j}",
                        "name": f"Category {i} / Sub {j}",
                        "parent_category_id": 100 + i,
                    }
                )
        return cats

    def board_ids(self) -> list[int]:
        return [c["id"] for c in self.categories()]

    def topic_ids(self, board_id: int) -> list[int]:
        own = [board_id * 1000 + t for t in range(1, self.n_topics + 1)]
        # a topic listed in two boards exercises the URL-seen gate
        # (reference: AlreadyVisitedError aborts the duplicate's post fetch,
        # forum_dl/session.py:112-113 + extractors/common.py:354-366)
        if self.duplicate_topic and board_id == 102:
            own.append(101 * 1000 + 1)
        return own

    def n_posts(self, topic_id: int) -> int:
        # ≥1; deterministically includes >20 and >40 cases when max_posts
        # allows, exercising the 20-id chunk loop (discourse.py:210-219)
        return 1 + _h(self.seed, f"nposts:{topic_id}") % self.max_posts

    def topic_slug(self, topic_id: int) -> str:
        return f"topic-{topic_id}"

    def topic_title(self, topic_id: int) -> str:
        from .content import _WORDS

        h = _h(self.seed, f"title:{topic_id}")
        return " ".join(_WORDS[(h >> (6 * k)) % len(_WORDS)] for k in range(3)).title()

    def post_id(self, topic_id: int, n: int) -> int:
        return topic_id * 100 + n

    def cooked(self, post_id: int) -> str:
        """Post HTML with interleaved text and media embeds (shared
        renderer, fixtures/content.py)."""
        if post_id in self.edited_posts:
            return self.edited_posts[post_id]
        return interleaved_html(self.seed, post_id)

    def post_json(self, topic_id: int, n: int) -> dict:
        pid = self.post_id(topic_id, n)
        h = _h(self.seed, f"post:{pid}")
        return {
            "id": pid,
            "topic_slug": self.topic_slug(topic_id),
            "topic_id": topic_id,
            "post_number": n,
            "username": f"user{h % 17}",
            "created_at": f"2023-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:00:00+00:00",
            "cooked": self.cooked(pid),
        }

    # -- the URL→page function ---------------------------------------------
    def get(
        self, url: str, params: dict | None = None, attempt: int = 0
    ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")

        parsed = urlparse(url)
        if parsed.netloc != urlparse(self.base_url).netloc:
            return 404, "text/plain", b"wrong host"
        path = parsed.path.rstrip("/")
        query = parse_qs(parsed.query)
        if params:
            for k, v in params.items():
                vals = list(v) if isinstance(v, (list, tuple)) else [v]
                query.setdefault(k, []).extend(str(x) for x in vals)

        if path == "":
            return 200, "text/html", self._homepage()
        if path == "/site.json":
            return 200, "application/json", json.dumps(
                {"categories": self.categories()}
            ).encode()
        if path.startswith("/c/") and path.endswith(".json"):
            return self._topic_list(path, query)
        if path.startswith("/t/") and path.endswith("/posts.json"):
            return self._post_chunk(path, query)
        if path.startswith("/t/") and path.endswith(".json"):
            return self._topic(path)
        if path.startswith("/c/") or path.startswith("/t/"):
            # every real Discourse page carries the crawler-nav; the HTML
            # variants of category/topic URLs serve the detection probes
            # when a crawl is seeded below the root (node_from_url,
            # discourse.py:112-157)
            return 200, "text/html", self._homepage()
        return 404, "text/plain", b"not found"

    def _homepage(self) -> bytes:
        # minimal page: crawler-nav for discourse detect (discourse.py:66-70);
        # deliberately free of hypermail/xenforo/vbulletin/invision markers so
        # the earlier probes in the reference cascade
        # (extractors/__init__.py:12-24) fall through without extra fetches.
        return (
            "<html><head><title>Synthetic Forum</title></head><body>"
            '<nav class="crawler-nav"><a href="/">home</a></nav>'
            "</body></html>"
        ).encode()

    def _topic_list(self, path: str, query: dict) -> tuple[int, str, bytes]:
        segs = path[1:].removesuffix(".json").split("/")
        if len(segs) != 3:
            return 404, "text/plain", b"bad board"
        _, slug, sid = segs
        board_id = int(sid)
        if board_id not in self.board_ids():
            return 404, "text/plain", b"no board"
        page = int(query.get("page", ["1"])[0])
        tids = self.topic_ids(board_id)
        lo = (page - 1) * self.topics_per_page
        chunk = tids[lo : lo + self.topics_per_page]
        topics = [
            {"id": t, "slug": self.topic_slug(t), "title": self.topic_title(t)}
            for t in chunk
        ]
        out: dict = {"topic_list": {"topics": topics}}
        if lo + self.topics_per_page < len(tids):
            out["topic_list"]["more_topics_url"] = f"/c/{slug}/{sid}?page={page + 1}"
        return 200, "application/json", json.dumps(out).encode()

    def _topic(self, path: str) -> tuple[int, str, bytes]:
        segs = path[1:].removesuffix(".json").split("/")
        tid = int(segs[-1])
        board_id = tid // 1000
        if board_id not in self.board_ids():
            return 404, "text/plain", b"no topic"
        np = self.n_posts(tid)
        stream = [self.post_id(tid, n) for n in range(1, np + 1)]
        posts = [self.post_json(tid, n) for n in range(1, min(np, POSTS_PER_FETCH) + 1)]
        out = {
            "id": tid,
            "slug": self.topic_slug(tid),
            "category_id": board_id,
            "title": self.topic_title(tid),
            "post_stream": {"stream": stream, "posts": posts},
        }
        return 200, "application/json", json.dumps(out).encode()

    def _post_chunk(self, path: str, query: dict) -> tuple[int, str, bytes]:
        tid = int(path[1:].split("/")[1])
        ids = [int(x) for x in query.get("post_ids[]", [])]
        posts = [self.post_json(tid, pid - tid * 100) for pid in ids]
        out = {"id": tid, "post_stream": {"posts": posts}}
        return 200, "application/json", json.dumps(out).encode()
