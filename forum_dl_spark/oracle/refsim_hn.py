"""Faithful sequential re-execution of the reference crawl (Hacker News).

Full-site semantics (forum_dl/extractors/hackernews.py):

- detect: netloc check only, no fetch (hackernews.py:84-106);
- ``fetch()``: GET maxitem.json (hackernews.py:114-117);
- board scan: synthetic 1000-id pages iterated DESCENDING
  (hackernews.py:189-220); an unregistered id triggers
  ``_fetch_item_thread`` — a parent walk with ``should_cache=True``
  (hackernews.py:164-187) — then a kids-BFS emitting posts
  (hackernews.py:222-260). BFS re-requests walk-chain items with
  ``should_cache=False`` → one-shot cache hits (session.py:105-111):
  no trace row, and the key is EVICTED from the final seen set;
- **null-item abort quirk**: a deleted item reached by the scan raises
  (TypeError via ``"parent" in None``, hackernews.py:170, or
  AlreadyVisitedError if it was BFS-fetched earlier) and the exception is
  swallowed by the board-threads wrapper (common.py:334-346) — which ENDS
  the entire scan. Everything below the highest null id is never crawled
  unless it belongs to an already-triggered thread;
- null items reached by BFS are fetched, warned about and skipped
  (hackernews.py:239,255-256) — they never register, posts are not
  emitted for them;
- specific-list extractors (topstories etc., hackernews.py:263-324):
  list fetch + one item fetch per story, thread items only — the posts
  BFS immediately hits AlreadyVisitedError on the root re-fetch and
  aborts, so NO posts are emitted (quirk preserved).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from .refsim import OracleItem, OracleResult
from .session import (
    AlreadyFailedError,
    AlreadyVisitedError,
    FetchError,
    HttpStatusError,
    OracleSession,
)

FIREBASE = "https://hacker-news.firebaseio.com"
BASE = "https://news.ycombinator.com/"

_ABORTS = (TypeError, AlreadyVisitedError, AlreadyFailedError, HttpStatusError, FetchError)


def _utcfromts(ts: int) -> datetime:
    return datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None)


class _HnSim:
    def __init__(self, session: OracleSession) -> None:
        self.session = session
        self.registered: set[int] = set()
        self.items: list[OracleItem] = []

    def fetch_item_thread(self, item_id: int) -> OracleItem:
        # hackernews.py:164-187 — parent walk, caching every item
        while True:
            resp = self.session.get(
                f"{FIREBASE}/v0/item/{item_id}.json", should_cache=True
            )
            data = json.loads(resp.body)
            if "parent" in data:  # TypeError on null data — the abort path
                item_id = data["parent"]
            else:
                self.registered.add(item_id)
                return OracleItem(
                    type="thread",
                    path=(str(item_id),),
                    url=f"{BASE}item?id={item_id}",
                    origin=resp.url,
                    title=data.get("title"),
                    data=data,
                )

    def thread_posts(self, thread: OracleItem):
        # hackernews.py:222-260 — kids BFS
        try:
            post_paths: list[tuple[str, ...]] = [()]
            i = 0
            while True:
                post_path = post_paths[i]
                post_id = post_path[-1] if post_path else thread.path[-1]
                resp = self.session.get(f"{FIREBASE}/v0/item/{post_id}.json")
                data = json.loads(resp.body)
                if data:
                    self.registered.add(int(post_id))
                    yield OracleItem(
                        type="post",
                        path=thread.path,
                        subpath=post_path,
                        url=thread.url,
                        origin=resp.url,
                        author=data.get("by", ""),
                        creation_time=_utcfromts(data["time"]),
                        content=data.get("text", ""),
                        data=data,
                    )
                    for kid in data.get("kids", []):
                        post_paths.append(post_path + (str(kid),))
                i += 1
                if i == len(post_paths):
                    break
        except _ABORTS:
            return

    def scan(self, max_id: int) -> None:
        # pages are a pure loop construct (no fetch); descending id order
        # (hackernews.py:193-220); exceptions end the WHOLE scan
        # (common.py:334-346)
        try:
            for item_id in range(max_id, 0, -1):
                if item_id in self.registered:
                    continue
                thread = self.fetch_item_thread(item_id)
                self.items.append(thread)
                for post in self.thread_posts(thread):
                    self.items.append(post)
        except _ABORTS:
            return


def run_reference_hackernews(server: object, seed_url: str, retries: int = 4) -> OracleResult:
    """Full-site crawl from the base URL."""
    session = OracleSession(server=server, retries=retries)
    max_id = int(session.get(f"{FIREBASE}/v0/maxitem.json").body)
    sim = _HnSim(session)
    sim.items.append(
        OracleItem(type="board", path=(), url=BASE, origin=BASE, title="")
    )
    sim.scan(max_id)
    return OracleResult(
        base_url=BASE, trace=list(session.trace), seen=session.seen(), items=sim.items
    )


def run_reference_hackernews_item(
    server: object, seed_url: str, retries: int = 4
) -> OracleResult:
    """Thread seed via node_from_url (hackernews.py:121-136 +
    writers/common.py:72-80): maxitem fetch, parent walk to the root story,
    then write_thread — NO board item, no id scan."""
    from urllib.parse import parse_qs, urlparse

    session = OracleSession(server=server, retries=retries)
    int(session.get(f"{FIREBASE}/v0/maxitem.json").body)
    sim = _HnSim(session)
    item_id = int(parse_qs(urlparse(seed_url).query)["id"][0])
    thread = sim.fetch_item_thread(item_id)
    items = [thread]
    for post in sim.thread_posts(thread):
        items.append(post)
    return OracleResult(
        base_url=BASE, trace=list(session.trace), seen=session.seen(), items=items
    )


_LIST_URLS = {
    "new": "newstories", "top": "topstories", "best": "beststories",
    "ask": "askstories", "show": "showstories", "job": "jobstories",
}


def run_reference_hackernews_list(server: object, which: str, retries: int = 4) -> OracleResult:
    """Specific-list crawl (hackernews.py:263-324)."""
    session = OracleSession(server=server, retries=retries)
    # SpecificExtractor inherits _fetch_top_boards → maxitem fetched
    int(session.get(f"{FIREBASE}/v0/maxitem.json").body)
    items = [OracleItem(type="board", path=(), url=BASE, origin=BASE, title="")]
    sim = _HnSim(session)
    try:
        resp = session.get(f"{FIREBASE}/v0/{_LIST_URLS[which]}.json")
        for story_id in json.loads(resp.body):
            r2 = session.get(f"{FIREBASE}/v0/item/{story_id}.json")
            data = json.loads(r2.body)
            thread = OracleItem(
                type="thread",
                path=(str(story_id),),
                url=f"{BASE}item?id={story_id}",
                origin=r2.url,
                title=data.get("title", ""),
                data=data,
            )
            items.append(thread)
            # write_thread → posts BFS → root re-fetch → AlreadyVisited →
            # aborted before any yield: no posts (quirk)
            for post in sim.thread_posts(thread):
                items.append(post)
    except _ABORTS:
        pass
    return OracleResult(
        base_url=BASE, trace=list(session.trace), seen=session.seen(), items=items
    )
