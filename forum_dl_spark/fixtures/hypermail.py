"""Synthetic Hypermail mail archive — pure deterministic URL→page function.

Serves the markup the reference's Hypermail extractor consumes
(forum_dl/extractors/hypermail.py):

- ``/archive/``                 index with ``a[href="NN/index.html"]``
  period links (hypermail.py:112-127); title deliberately NOT matching the
  by-thread detection regex;
- ``/archive/NN/index.html``    period page: ``div.messages-list`` with one
  flat ``<ul>`` per thread, first anchor = thread root
  (hypermail.py:129-156); title matches "... by thread" (detection,
  hypermail.py:54-74); also the by-thread page used by thread-seed crawls
  (root anchor + nested reply ULs, hypermail.py:166-201);
- ``/archive/NN/NNNN.html``     post pages: ``meta generator=hypermail``,
  ``meta Author/Date``, ``<address>`` followed by the body siblings
  (hypermail.py:203-229) with interleaved media;
- media under ``/img/`` etc.

Reply tree per thread is deterministic: depths walk 0→1→2… with
deterministic variation, exercising the stack-replay arithmetic.
"""

from __future__ import annotations

from urllib.parse import urlparse

from ..oracle.session import FetchError
from .content import h64, interleaved_html, words

BASE = "https://mail.example/archive/"


class SyntheticHypermail:
    base_url = BASE

    def __init__(self, seed: int = 42, n_periods: int = 2, n_threads: int = 3,
                 max_replies: int = 6,
                 fail_urls: dict[str, int] | None = None) -> None:
        self.seed = seed
        self.n_periods = n_periods
        self.n_threads = n_threads
        self.max_replies = max_replies
        self.fail_urls = fail_urls or {}

    # -- model ---------------------------------------------------------------
    def periods(self) -> list[str]:
        return [f"{i:02d}" for i in range(1, self.n_periods + 1)]

    def thread_root(self, period: str, t: int) -> str:
        return f"{int(period)}{t:03d}"  # e.g. '1001'

    def replies(self, root_id: str) -> list[tuple[int, str]]:
        """[(depth>=1, post_id)] in page order."""
        n = 1 + h64(self.seed, f"hm:nrep:{root_id}") % self.max_replies
        out = []
        depth = 1
        for k in range(1, n + 1):
            pid = f"{root_id}{k:02d}"
            out.append((depth, pid))
            h = h64(self.seed, f"hm:depth:{root_id}:{k}")
            if h % 3 == 0:
                depth += 1
            elif h % 3 == 1 and depth > 1:
                depth -= 1
        return out

    def post_ids(self, period: str) -> list[str]:
        out = []
        for t in range(1, self.n_threads + 1):
            r = self.thread_root(period, t)
            out.append(r)
            out.extend(pid for _, pid in self.replies(r))
        return out

    # -- pages ------------------------------------------------------------------
    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if parsed.netloc != "mail.example":
            return 404, "text/plain", b"wrong host"
        path = parsed.path
        if path in ("/archive", "/archive/"):
            return 200, "text/html", self._index()
        parts = [p for p in path.split("/") if p]
        # directory URL serves the period index (as real servers do); the
        # reference fetches it via urljoin(thread.url, "."),
        # hypermail.py:167-168
        if len(parts) == 2 and parts[0] == "archive" and parts[1] in self.periods():
            return 200, "text/html", self._period(parts[1])
        if len(parts) == 3 and parts[0] == "archive" and parts[2] == "index.html":
            if parts[1] in self.periods():
                return 200, "text/html", self._period(parts[1])
        if len(parts) == 3 and parts[0] == "archive" and parts[2].endswith(".html"):
            pid = parts[2].removesuffix(".html")
            if parts[1] in self.periods() and pid in self.post_ids(parts[1]):
                return 200, "text/html", self._post(parts[1], pid)
        if path.startswith(("/img/", "/a/", "/obj/", "/v/")):
            from .content import media_bytes

            ctype, body = media_bytes(self.seed, path)
            return 200, ctype, body
        return 404, "text/plain", b"not found"

    def _index(self) -> bytes:
        links = "".join(
            f'<li><a href="{p}/index.html">Period {p}</a></li>' for p in self.periods()
        )
        return (
            "<html><head><title>Synthetic Mail Archive Index</title>"
            '<meta name="generator" content="hypermail 2.4">'
            f"</head><body><ul>{links}</ul></body></html>"
        ).encode()

    def _thread_ul(self, period: str, t: int, for_thread_page: bool) -> str:
        """Flat UL on period listing; nested per-depth ULs on thread pages."""
        root = self.thread_root(period, t)
        if not for_thread_page:
            lis = f'<li><a href="{root}.html">{self.subject(root)}</a></li>'
            lis += "".join(
                f'<li><a href="{pid}.html">{self.subject(pid)}</a></li>'
                for _, pid in self.replies(root)
            )
            return f"<ul>{lis}</ul>"
        # thread page: root anchor, then nested reply tree (ul per level)
        html = [f'<li><a href="{root}.html">{self.subject(root)}</a>']
        prev = 0
        for depth, pid in self.replies(root):
            if depth > prev:
                html.append("<ul>" * (depth - prev))
            elif depth < prev:
                html.append("</li></ul>" * (prev - depth) + "</li>")
            else:
                html.append("</li>")
            html.append(f'<li><a href="{pid}.html">{self.subject(pid)}</a>')
            prev = depth
        html.append("</li>" + "</ul></li>" * prev)
        return "<ul>" + "".join(html) + "</ul>"

    def subject(self, pid: str) -> str:
        return words(self.seed, f"hm:subj:{pid}", 3).title()

    def _period(self, period: str) -> bytes:
        uls = "".join(
            self._thread_ul(period, t, for_thread_page=True)
            for t in range(1, self.n_threads + 1)
        )
        return (
            f"<html><head><title>Archive {period} messages by thread</title>"
            '<meta name="generator" content="hypermail 2.4">'
            f'</head><body><div class="messages-list"><ul>{uls}</ul></div>'
            "</body></html>"
        ).encode()

    def _post(self, period: str, pid: str) -> bytes:
        h = h64(self.seed, f"hm:post:{pid}")
        iso = f"2021-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:15:00+00:00"
        content = interleaved_html(self.seed, 800000000 + int(pid))
        return (
            f"<html><head><title>{self.subject(pid)}</title>"
            '<meta name="generator" content="hypermail 2.4">'
            f'<meta name="Author" content="mailuser{h % 11}">'
            f'<meta name="Date" content="{iso}">'
            "</head><body>"
            f"<address>mailuser{h % 11}</address>\n"
            f"<div>{content}</div>"
            "</body></html>"
        ).encode()
