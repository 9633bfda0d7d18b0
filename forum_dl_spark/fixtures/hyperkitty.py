"""Synthetic HyperKitty archive — per forum_dl/extractors/hyperkitty.py:

- ``/`` (and ``/?page=N``) archive index: ``a.list-name`` anchors (one per
  list, href ``list/{id}/``) + ``a.page-link`` pagination where the LAST
  anchor's href chains the walk and ``#`` terminates it
  (``_fetch_lazy_subboards``, hyperkitty.py:182-201 — the reference indexes
  ``page_link_anchors[-1]`` unconditionally, so even a single-page index
  must carry the widget);
- ``/list/{id}/`` list page: footer "HyperKitty" link + ``a.navbar-brand``
  (detection, hyperkitty.py:108-122), ``section#title h1`` board title
  (hyperkitty.py:160-179);
- ``/list/{id}/latest[?page=N]``: ``a.thread-title`` anchors (``name`` =
  thread id, title = last anchor content) + ``a.page-link`` pagination
  where tags[-2] is the last page number (hyperkitty.py:203-241);
- ``/list/{id}/thread/{tid}/``: first post (``div.email-author a``,
  ``div.time span[title="Sender's time: ..."]``, ``div.email-body``,
  ``div.messagelink a``) (hyperkitty.py:243-271);
- ``/list/{id}/thread/{tid}/replies?sort=thread[&offset=K]``: JSON
  ``{replies_html, more_pending, next_offset}`` chunks of replies as
  ``div.even/odd.reply-level-N`` blocks with ``div.email-header[id]``
  post ids (hyperkitty.py:273-331). The reference takes the TIME and the
  MESSAGELINK from the first occurrence in each chunk for EVERY reply in
  the chunk (soup-wide find, hyperkitty.py:301-304,311-313) — bugs the
  fixtures exercise and both sides preserve.
"""

from __future__ import annotations

import json
from urllib.parse import parse_qs, urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, words

BASE = "https://hk.example/"
REPLIES_PER_CHUNK = 2


class SyntheticHyperkitty:
    base_url = BASE

    def __init__(self, seed: int = 42, lists: tuple[str, ...] = ("mylist.example",),
                 n_threads: int = 3, max_replies: int = 5,
                 threads_per_page: int = 2, lists_per_page: int = 2,
                 fail_urls: dict[str, int] | None = None,
                 postorius: bool = False) -> None:
        self.seed = seed
        self.lists = lists
        self.lists_per_page = lists_per_page
        self.n_threads = n_threads
        self.max_replies = max_replies
        self.threads_per_page = threads_per_page
        self.fail_urls = fail_urls or {}
        # Postorius front-end variant: same HyperKitty archive behind a
        # Postorius list page (reference detect_postorius,
        # hyperkitty.py:93-106 — footer "Postorius Documentation" anchor,
        # base from the SECOND a.nav-link)
        self.postorius = postorius

    def thread_ids(self, list_id: str) -> list[str]:
        return [f"T{k}" for k in range(1, self.n_threads + 1)]

    def replies(self, tid: str) -> list[tuple[int, str]]:
        n = 1 + h64(self.seed, f"hk:nrep:{tid}") % self.max_replies
        out, level = [], 1
        for k in range(1, n + 1):
            out.append((level, f"{tid}R{k}"))
            h = h64(self.seed, f"hk:lvl:{tid}:{k}")
            if h % 3 == 0:
                level += 1
            elif h % 3 == 1 and level > 1:
                level -= 1
        return out

    def subject(self, tid: str) -> str:
        return words(self.seed, f"hk:subj:{tid}", 3).title()

    def sender_time(self, pid: str) -> str:
        h = h64(self.seed, f"hk:time:{pid}")
        return f"2022-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:35:00+00:00"

    def _email_block(self, pid: str, level: int | None) -> str:
        h = h64(self.seed, f"hk:post:{pid}")
        cls = "even" if h % 2 else "odd"
        lvl = f" reply-level-{level}" if level else ""
        body = interleaved_html(self.seed, 200000000 + h % 10**6)
        return (
            f'<div class="{cls}{lvl}">'
            f'<div class="email-header" id="{pid}"></div>'
            f'<div class="email-author"><a>hkuser{h % 7}</a></div>'
            f'<div class="time"><span title="Sender\'s time: {self.sender_time(pid)}">ago</span></div>'
            f'<div class="messagelink"><a href="message/{pid}/">link</a></div>'
            f'<div class="email-body">{body}</div></div>'
        )

    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if parsed.netloc != "hk.example":
            return 404, "text/plain", b"wrong host"
        parts = [p for p in parsed.path.split("/") if p]
        q = parse_qs(parsed.query)
        if not parts:
            return 200, "text/html", self._index(int(q.get("page", ["1"])[0]))
        if len(parts) >= 2 and parts[0] == "list" and parts[1] in self.lists:
            lid = parts[1]
            if len(parts) == 2:
                return 200, "text/html", self._list_page(lid)
            if parts[2] == "latest":
                return 200, "text/html", self._latest(lid, int(q.get("page", ["1"])[0]))
            if parts[2] == "thread" and len(parts) >= 4:
                tid = parts[3]
                if tid not in self.thread_ids(lid):
                    return 404, "text/plain", b"no thread"
                if len(parts) == 4:
                    return 200, "text/html", self._thread(lid, tid)
                if parts[4] == "replies":
                    off = int(q.get("offset", ["0"])[0])
                    return 200, "application/json", self._replies(tid, off)
        return 404, "text/plain", b"not found"

    def _nav(self) -> str:
        if self.postorius:
            return ('<nav><a class="nav-link" href="/accounts/">Account</a>'
                    '<a class="nav-link" href="/">Archives</a></nav>')
        return '<nav><a class="navbar-brand" href="/">HK</a></nav>'

    def _footer(self) -> str:
        if self.postorius:
            return ('<footer><a href="https://docs.mailman3.org">'
                    "Postorius Documentation</a></footer>")
        return ('<footer><a href="https://hyperkitty.rtfd.org">'
                "HyperKitty</a></footer>")

    def _list_page(self, lid: str) -> bytes:
        return (
            "<html><head><title>List</title></head><body>"
            + self._nav()
            + f'<section id="title"><h1>{lid} archive</h1></section>'
            + self._footer()
            + "</body></html>"
        ).encode()

    def _index(self, page: int) -> bytes:
        lo = (page - 1) * self.lists_per_page
        chunk = self.lists[lo : lo + self.lists_per_page]
        anchors = "".join(
            f'<a class="list-name" href="list/{lid}/">{lid}</a>' for lid in chunk
        )
        n_pages = max(1, (len(self.lists) + self.lists_per_page - 1)
                      // self.lists_per_page)
        nums = "".join(f'<a class="page-link">{p}</a>' for p in range(1, n_pages + 1))
        nxt = "#" if page >= n_pages else f"?page={page + 1}"
        links = f'<div>{nums}<a class="page-link" href="{nxt}">Next</a></div>'
        return (
            "<html><head><title>Archives</title></head><body>"
            + self._nav() + anchors + links + self._footer() + "</body></html>"
        ).encode()

    def _latest(self, lid: str, page: int) -> bytes:
        tids = self.thread_ids(lid)
        lo = (page - 1) * self.threads_per_page
        chunk = tids[lo : lo + self.threads_per_page]
        anchors = "".join(
            f'<a class="thread-title" name="{t}" href="thread/{t}/">{self.subject(t)}</a>'
            for t in chunk
        )
        n_pages = (len(tids) + self.threads_per_page - 1) // self.threads_per_page
        links = ""
        if n_pages > 1:
            nums = "".join(f'<a class="page-link">{p}</a>' for p in range(1, n_pages + 1))
            links = f'<div>{nums}<a class="page-link" href="#">Next</a></div>'
        return f"<html><body>{anchors}{links}</body></html>".encode()

    def _thread(self, lid: str, tid: str) -> bytes:
        # thread pages carry the site chrome (real installs do) so a
        # thread-URL seed is detectable by the cascade
        return (
            "<html><body>" + self._nav()
            + f'<div class="thread-header"><h3>{self.subject(tid)}</h3></div>'
            + self._email_block(f"{tid}R0", None)
            + self._footer()
            + "</body></html>"
        ).encode()

    def _replies(self, tid: str, offset: int) -> bytes:
        reps = self.replies(tid)
        chunk = reps[offset : offset + REPLIES_PER_CHUNK]
        html = "".join(self._email_block(pid, lvl) for lvl, pid in chunk)
        more = offset + REPLIES_PER_CHUNK < len(reps)
        out = {"replies_html": html, "more_pending": more}
        if more:
            out["next_offset"] = offset + REPLIES_PER_CHUNK
        return json.dumps(out).encode()
