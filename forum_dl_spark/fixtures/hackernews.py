"""Synthetic Hacker News Firebase API — pure deterministic URL→page function.

Serves the endpoints the reference consumes (forum_dl/extractors/hackernews.py):

- ``/v0/maxitem.json``           int (hackernews.py:114-117)
- ``/v0/item/{id}.json``         {id, by, time, text|title, kids, parent}
                                 or ``null`` for deleted items
- ``/v0/topstories.json`` etc.   [ids] (hackernews.py:291-324)

Structure: deterministic forest over ids 1..n_items; parents always have
smaller ids than children (as on the real site); ``kids`` are listed in
ascending id order. ``allow_nulls`` injects deleted items, which in the
reference ABORT the descending full-site scan at the highest null id
(the TypeError/AlreadyVisitedError path through
extractors/common.py:334-346 — see oracle/refsim_hn.py).
"""

from __future__ import annotations

import json
from urllib.parse import urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, words

FIREBASE = "https://hacker-news.firebaseio.com"
SITE = "https://news.ycombinator.com"


class SyntheticHackerNews:
    base_url = SITE + "/"
    # every netloc this fixture answers for (MultiHost routing): the HN
    # engine fetches from the Firebase API host, not the site host
    extra_hosts = ("hacker-news.firebaseio.com",)

    def __init__(self, seed: int = 42, n_items: int = 120,
                 allow_nulls: bool = False,
                 fail_urls: dict[str, int] | None = None) -> None:
        self.seed = seed
        self.n_items = n_items
        self.allow_nulls = allow_nulls
        self.fail_urls = fail_urls or {}

    # -- deterministic forest -------------------------------------------------
    def is_null(self, i: int) -> bool:
        return self.allow_nulls and i > 1 and h64(self.seed, f"hn:null:{i}") % 17 == 0

    def is_story(self, i: int) -> bool:
        if self.is_null(i):
            return False  # nulls are deleted comments
        return i == 1 or h64(self.seed, f"hn:story:{i}") % 4 == 0

    def parent(self, i: int) -> int | None:
        if self.is_story(i):
            return None
        # parent < i, never null (nulls have no kids listed under them)
        p = 1 + h64(self.seed, f"hn:parent:{i}") % (i - 1)
        while self.is_null(p):
            p = 1 + (p % (i - 1))
        return p

    def kids(self, i: int) -> list[int]:
        # null (deleted) kids stay listed, as on the real site — the
        # reference's BFS fetches them and skips with a warning
        # (hackernews.py:239,255-256)
        return [
            k
            for k in range(i + 1, self.n_items + 1)
            if not self.is_story(k) and self.parent(k) == i
        ]

    def item_json(self, i: int):
        if self.is_null(i):
            return None
        h = h64(self.seed, f"hn:item:{i}")
        out = {
            "id": i,
            "by": f"hnuser{h % 23}",
            "time": 1600000000 + i * 60 + h % 60,
        }
        if self.is_story(i):
            out["type"] = "story"
            out["title"] = words(self.seed, f"hn:title:{i}", 4).title()
            out["url"] = f"https://example.com/story/{i}"
        else:
            out["type"] = "comment"
            out["parent"] = self.parent(i)
            out["text"] = interleaved_html(self.seed, 900000000 + i)
        ks = self.kids(i)
        if ks:
            out["kids"] = ks
        return out

    def top_ids(self, which: str) -> list[int]:
        stories = [i for i in range(1, self.n_items + 1)
                   if self.is_story(i) and not self.is_null(i)]
        h = h64(self.seed, f"hn:list:{which}")
        return sorted(stories, key=lambda s: h64(self.seed, f"hn:rank:{which}:{s}"))[
            : 5 + h % 5
        ]

    # -- URL→page ---------------------------------------------------------------
    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        path = parsed.path
        if parsed.netloc == "hacker-news.firebaseio.com":
            if path == "/v0/maxitem.json":
                return 200, "application/json", str(self.n_items).encode()
            if path.startswith("/v0/item/") and path.endswith(".json"):
                i = int(path[len("/v0/item/"):-len(".json")])
                if i < 1 or i > self.n_items:
                    return 200, "application/json", b"null"
                return 200, "application/json", json.dumps(self.item_json(i)).encode()
            for which in ("top", "new", "best", "ask", "show", "job"):
                if path == f"/v0/{which}stories.json":
                    return 200, "application/json", json.dumps(self.top_ids(which)).encode()
            return 404, "text/plain", b"not found"
        if parsed.netloc == "news.ycombinator.com":
            return 200, "text/html", b"<html><body>hn</body></html>"
        return 404, "text/plain", b"wrong host"
