"""Faithful sequential re-execution of the reference crawl (Discourse).

Produces the oracle traces the Spark engine is tested against
(FIXTURES.md §5):

- ``trace``  — the exact fetch sequence ``[(url, params_key)]``, i.e. the
  reference's ``--get-urls`` frontier trace (forum_dl/session.py:163-166);
- ``seen``   — final URL-seen set with status (forum_dl/session.py:50-59);
- ``items``  — emitted items in JSONL writer order
  (forum_dl/writers/common.py:100-129: board obj → its threads, each thread
  fully (thread obj → posts DFS) → then subboards recursively).

Control flow re-implemented from the cited reference sources; nothing is
copied. Only the engines our fixtures cover are simulated; engines earlier
in the detection cascade (forum_dl/extractors/__init__.py:12-24) are
simulated to the extent they affect the trace/seen set (their probe
fetches + first-matching-marker predicates).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import PurePosixPath
from urllib.parse import urljoin, urlparse, urlunparse

from ..urls import get_relative_url, normalize_url
from .session import (
    AlreadyFailedError,
    AlreadyVisitedError,
    FetchError,
    HttpStatusError,
    OracleSession,
)

POSTS_PER_FETCH = 20  # discourse.py:213


@dataclass
class OracleItem:
    type: str
    path: tuple[str, ...]
    url: str
    origin: str
    subpath: tuple[str, ...] = ()
    title: str | None = None
    author: str | None = None
    creation_time: datetime | None = None
    content: str | None = None
    data: dict | None = None
    content_type: str | None = None
    content_bytes: bytes | None = None


@dataclass
class OracleResult:
    base_url: str
    trace: list[tuple[str, str]]
    seen: dict[str, str]
    items: list[OracleItem]
    # discovered-link lineage (src seen-key -> dst seen-key); see
    # OracleSession.links
    links: list[tuple[str, str]] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Detection cascade (forum_dl/extractors/__init__.py:12-24 order). Each probe
# replicates the reference _detect's fetch keys and match predicate.
# ---------------------------------------------------------------------------


def _detect_discourse_base(session: OracleSession, url: str) -> str | None:
    """Run the probe cascade up to discourse; return resolved base_url.

    Probe fetch keys per engine (all ``should_cache=True, should_retry=False``):
    hackernews: none (netloc check, hackernews.py:84-106);
    hyperkitty: ``normalize_url(url, append_slash=False)`` (hyperkitty.py:73-122);
    pipermail: raw ``url`` (pipermail.py:61-112, path-suffix predicate);
    hypermail: ``normalize_url(url, remove_suffixes=[], append_slash=False)``
    (hypermail.py:40-76); xenforo: same key (xenforo.py:275-297);
    vbulletin/invision: raw ``url`` (vbulletin.py:223-233, invision.py:80-93);
    proboards: none (netloc, proboards.py:204-209);
    discourse: ``normalize_url(url.removesuffix('/').removesuffix('.json'))``
    (discourse.py:58-72).
    """
    parsed = urlparse(url)
    # hackernews / proboards netloc checks — no fetch
    if parsed.netloc == "news.ycombinator.com" or parsed.netloc.endswith(
        "proboards.com"
    ):
        raise NotImplementedError("fixture seeds never match these netlocs")

    def probe(u: str, marker: re.Pattern[str] | None) -> str | None:
        try:
            resp = session.try_get(u, should_cache=True, should_retry=False)
        except (FetchError, AlreadyVisitedError, AlreadyFailedError, HttpStatusError):
            return None
        body = resp.body.decode("utf-8", "replace")
        if marker and marker.search(body):
            return body
        return None

    # hyperkitty (markers: postorius/hyperkitty footers, hyperkitty.py:73-122)
    probe(normalize_url(url, append_slash=False), re.compile(r"data-hyperkitty"))
    # pipermail: fetch + path predicate (never matches discourse fixture paths)
    probe(url, None)
    # hypermail
    probe(
        normalize_url(url, remove_suffixes=(), append_slash=False),
        re.compile(r'name="generator" content="hypermail'),
    )
    # xenforo (regex on html tag, xenforo.py:281-283)
    probe(
        normalize_url(url, remove_suffixes=(), append_slash=False),
        re.compile(r'<html[^>]+id="XF"'),
    )
    # vbulletin
    probe(url, re.compile(r'content="vBulletin'))
    # invision
    probe(url, re.compile(r'data-role="breadcrumbList"'))

    # discourse (discourse.py:58-72)
    u = url.removesuffix("/").removesuffix(".json")
    try:
        resp = session.try_get(normalize_url(u), should_cache=True, should_retry=False)
    except (FetchError, AlreadyVisitedError, AlreadyFailedError):
        return None
    body = resp.body.decode("utf-8", "replace")
    m = re.search(r'<nav class="crawler-nav">.*?<a href="([^"]*)"', body, re.S)
    if not m:
        return None
    return normalize_url(urljoin(resp.url, m.group(1)))


# ---------------------------------------------------------------------------
# Discourse extractor simulation (forum_dl/extractors/discourse.py)
# ---------------------------------------------------------------------------


@dataclass
class _Board:
    path: tuple[str, ...]
    url: str
    origin: str
    title: str
    data: dict = field(default_factory=dict)
    subboards: "dict[str, _Board]" = field(default_factory=dict)


class _DiscourseSim:
    def __init__(self, session: OracleSession, base_url: str) -> None:
        self.session = session
        self.base_url = base_url
        self.root = _Board(path=(), url=base_url, origin=base_url, title="")
        self.items: list[OracleItem] = []

    # discourse.py:74-107 — two passes over site.json categories
    def fetch_top_boards(self) -> None:
        resp = self.session.get(urljoin(self.base_url, "site.json"))
        site = json.loads(resp.body)
        by_id: dict[str, _Board] = {}
        for cat in site["categories"]:
            if "parent_category_id" not in cat:
                cid = str(cat["id"])
                b = _Board(
                    path=(cid,),
                    url=urljoin(self.base_url, f"c/{cat['slug']}/{cid}"),
                    origin=resp.url,
                    title=cat["name"],
                    data=cat,
                )
                self.root.subboards[cid] = b
                by_id[cid] = b
        for cat in site["categories"]:
            if "parent_category_id" in cat:
                cid = str(cat["id"])
                pid = str(cat["parent_category_id"])
                b = _Board(
                    path=(pid, cid),
                    url=urljoin(self.base_url, f"c/{cat['slug']}/{cid}"),
                    origin=resp.url,
                    title=cat["name"],
                    data=cat,
                )
                by_id[pid].subboards[cid] = b

    # extractors/common.py:334-346 + discourse.py:166-198
    def board_threads(self, board: _Board):
        try:
            state_url, page = board.url, 1
            # lineage: page 1 was discovered when site.json's categories
            # yielded this board (board.origin); page N+1 from page N's
            # more_topics_url — mirrors which fetched BODY produced the URL
            src = board.origin
            while True:
                if state_url == board.url:
                    rel = get_relative_url(state_url, self.base_url)
                    parts = PurePosixPath(rel).parts
                    if len(parts) <= 1 or parts[0] != "c":
                        return
                    state_url = f"{state_url}.json"
                resp = self.session.get(state_url, discovered_from=src)
                src = resp.key
                page_json = json.loads(resp.body)
                for data in page_json["topic_list"]["topics"]:
                    tid = str(data["id"])
                    yield OracleItem(
                        type="thread",
                        path=board.path + (tid,),
                        url=urljoin(self.base_url, f"t/{data['slug']}/{tid}"),
                        origin=resp.url,
                        title=data["title"],
                        data=data,
                    )
                more = page_json["topic_list"].get("more_topics_url")
                if not more:
                    return
                p = urlparse(str(more))
                state_url = urljoin(self.base_url, urlunparse(p._replace(path=f"{p.path}.json")))
                page += 1
        except (AlreadyVisitedError, AlreadyFailedError, HttpStatusError, FetchError):
            return  # warn-and-continue (extractors/common.py:343-346)

    # extractors/common.py:354-366 + discourse.py:200-244
    def thread_posts(self, thread: OracleItem):
        try:
            state_url = thread.url
            stream: list[int] = []
            first = True
            # lineage: the thread's first .json fetch was discovered by the
            # board page that listed it (thread.origin); each posts.json
            # chunk by the response whose body supplied its id window
            src = thread.origin
            while True:
                if first:
                    resp = self.session.get(f"{state_url}.json", discovered_from=src)
                    page_json = json.loads(resp.body)
                    stream = list(page_json["post_stream"]["stream"])
                    state_url = resp.url
                    first = False
                else:
                    ids = tuple(stream[:POSTS_PER_FETCH])
                    resp = self.session.get(
                        state_url,
                        params={"post_ids[]": ids},
                        should_cache=False,
                        discovered_from=src,
                    )
                    page_json = json.loads(resp.body)
                src = resp.key
                for data in page_json["post_stream"]["posts"]:
                    stream.pop(0)
                    yield OracleItem(
                        type="post",
                        path=thread.path,
                        subpath=(str(data["id"]),),
                        url=urljoin(
                            self.base_url,
                            f"t/{data['topic_slug']}/{data['topic_id']}/{data['post_number']}",
                        ),
                        origin=resp.url,
                        author=data.get("username"),
                        creation_time=datetime.fromisoformat(data["created_at"])
                        if data.get("created_at")
                        else None,
                        content=data.get("cooked"),
                        data=data,
                    )
                if not stream:
                    return
                state_url = urljoin(self.base_url, f"t/{page_json['id']}/posts.json")
        except (AlreadyVisitedError, AlreadyFailedError, HttpStatusError, FetchError):
            return

    # discourse.py:112-157 — node_from_url
    def node_from_url(self, url: str):
        url = url.removesuffix(".json")
        rel = get_relative_url(url, self.base_url)
        parts = PurePosixPath(rel).parts
        if len(parts) <= 1:
            return self.root
        if parts[0] == "c":
            slug = parts[1]
            for board in self.root.subboards.values():
                if board.data.get("slug") == slug:
                    return board
                for sub in board.subboards.values():
                    if sub.data.get("slug") == slug:
                        return sub
            raise ValueError(f"no board with slug {slug!r}")
        if parts[0] == "t":
            topic_id = parts[1]
            resp = self.session.get(
                urljoin(self.base_url, f"t/{topic_id}.json"), should_cache=True
            )
            data = json.loads(resp.body)
            cat = str(data["category_id"])
            if cat in self.root.subboards:
                path = (cat, str(topic_id))
            else:
                # the reference's nested-category loop re-tests the ROOT's
                # subboards and can never break -> ValueError
                # (discourse.py:143-148); quirk preserved
                raise ValueError(
                    f"topic {topic_id} in non-top-level category {cat}"
                )
            return OracleItem(
                type="thread",
                path=path,
                url=url,
                origin=resp.url,
                title=data["title"],
                data=data,
            )
        raise ValueError(f"unresolvable node URL {url!r}")

    # writers/common.py:79-80 + 124-129
    def write_thread(self, thread: OracleItem) -> None:
        self.items.append(thread)
        for post in self.thread_posts(thread):
            self.items.append(post)

    # writers/common.py:100-129 emission order
    def write_board(self, board: _Board) -> None:
        self.items.append(
            OracleItem(
                type="board",
                path=board.path,
                url=board.url,
                origin=board.origin,
                title=board.title,
                data=board.data,
            )
        )
        for thread in self.board_threads(board):
            self.items.append(thread)
            for post in self.thread_posts(thread):
                self.items.append(post)
        for sub in board.subboards.values():
            self.write_board(sub)


def run_reference_discourse(server: object, seed_url: str, retries: int = 4) -> OracleResult:
    """Full reference run: detect → fetch() → node_from_url → write."""
    session = OracleSession(server=server, retries=retries)
    base_url = _detect_discourse_base(session, seed_url)
    assert base_url is not None, "fixture must be detectable as discourse"
    sim = _DiscourseSim(session, base_url)
    sim.fetch_top_boards()
    # node_from_url(seed): root/category URL → that board's subtree;
    # topic URL → just that thread (discourse.py:112-157 + write(),
    # writers/common.py:72-80). find_board's _fetch_lower_boards is a
    # no-op fetch-wise for discourse (_do_fetch_subboards: pass).
    node = sim.node_from_url(seed_url)
    if isinstance(node, _Board):
        sim.write_board(node)
    else:
        sim.write_thread(node)
    return OracleResult(
        base_url=base_url, trace=list(session.trace), seen=session.seen(),
        items=sim.items, links=list(session.links),
    )
