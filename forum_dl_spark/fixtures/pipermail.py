"""Synthetic Pipermail/Mailman archive — per forum_dl/extractors/pipermail.py:

- ``/pipermail/{list}`` archive index: ``a[href=YYYY-Month/thread.html]``
  period anchors (pipermail.py:208-225);
- ``/pipermail/{list}/{period}/thread.html``: threads marked by HTML
  comments ``<!--0 LONGID- -->`` (roots) and
  ``<!--D LONGID-C1-...-CN- -->`` (children, D = min(depth,3)), each
  followed by the post anchor (pipermail.py:236-316, regexes 58-59);
- ``/pipermail/{list}/{period}/NNNN.html`` post pages: ``<title>``,
  first ``<b>`` author, first ``<i>`` date, ``<pre>`` body with
  ``&gt;<i>quoted</i>`` lines that the reference strips
  (pipermail.py:332);
- ``/mailman/listinfo[/{list}]``: list registry with
  ``... Info Page`` titles (pipermail.py:165-189).
"""

from __future__ import annotations

from urllib.parse import urlparse

from ..oracle.session import FetchError
from .content import h64, words

BASE = "https://pm.example/"
_MONTHS = ["January", "February", "March", "April", "May", "June"]


class SyntheticPipermail:
    base_url = BASE

    def __init__(self, seed: int = 42, lists: tuple[str, ...] = ("mylist",),
                 n_periods: int = 2, n_threads: int = 2, max_replies: int = 5,
                 fail_urls: dict[str, int] | None = None) -> None:
        self.seed = seed
        self.lists = lists
        self.n_periods = n_periods
        self.n_threads = n_threads
        self.max_replies = max_replies
        self.fail_urls = fail_urls or {}

    # -- model --------------------------------------------------------------
    def periods(self) -> list[str]:
        return [f"2021-{_MONTHS[i]}" for i in range(self.n_periods)]

    def thread_root(self, period: str, t: int) -> str:
        return f"{_MONTHS.index(period.split('-')[1]) + 1}{t:03d}"

    def long_id(self, pid: str) -> str:
        return f"L{h64(self.seed, f'pm:long:{pid}') % 10**6:06d}"

    def replies(self, root_id: str) -> list[tuple[int, str]]:
        n = 1 + h64(self.seed, f"pm:nrep:{root_id}") % self.max_replies
        out, depth = [], 1
        for k in range(1, n + 1):
            out.append((depth, f"{root_id}{k:02d}"))
            h = h64(self.seed, f"pm:depth:{root_id}:{k}")
            if h % 3 == 0:
                depth += 1
            elif h % 3 == 1 and depth > 1:
                depth -= 1
        return out

    def subject(self, pid: str) -> str:
        return words(self.seed, f"pm:subj:{pid}", 3).title()

    def post_ids(self, period: str) -> list[str]:
        out = []
        for t in range(1, self.n_threads + 1):
            r = self.thread_root(period, t)
            out.append(r)
            out.extend(p for _, p in self.replies(r))
        return out

    # -- pages -----------------------------------------------------------------
    def get(self, url: str, params: dict | None = None, attempt: int = 0
            ) -> tuple[int, str, bytes]:
        if url in self.fail_urls and attempt < self.fail_urls[url]:
            raise FetchError(f"synthetic transport failure: {url}")
        parsed = urlparse(url)
        if parsed.netloc != "pm.example":
            return 404, "text/plain", b"wrong host"
        parts = [p for p in parsed.path.split("/") if p]
        if parts[:1] == ["mailman"] and parts[1:2] == ["listinfo"]:
            if len(parts) == 2:
                links = "".join(
                    f'<a href="listinfo/{l}">{l}</a>' for l in self.lists
                )
                return 200, "text/html", (
                    f"<html><head><title>Mailing Lists</title></head>"
                    f"<body>{links}</body></html>"
                ).encode()
            if parts[2] in self.lists:
                return 200, "text/html", (
                    f"<html><head><title>{parts[2].title()} Info Page</title>"
                    f"</head><body>about {parts[2]}</body></html>"
                ).encode()
        if parts[:1] == ["pipermail"] and len(parts) >= 2 and parts[1] in self.lists:
            if len(parts) == 2:
                return 200, "text/html", self._index()
            if len(parts) == 3 and parts[2] in self.periods():
                # bare period directory (real archives serve an index
                # listing here); seeding it resolves to the BOARD
                return 200, "text/html", (
                    f"<html><head><title>{parts[2]} directory</title></head>"
                    '<body><a href="thread.html">Thread</a>'
                    '<a href="date.html">Date</a></body></html>'
                ).encode()
            if len(parts) == 4 and parts[3] == "thread.html" and parts[2] in self.periods():
                return 200, "text/html", self._thread_page(parts[2])
            if len(parts) == 4 and parts[3].endswith(".html"):
                pid = parts[3].removesuffix(".html")
                if parts[2] in self.periods() and pid in self.post_ids(parts[2]):
                    return 200, "text/html", self._post(parts[2], pid)
        return 404, "text/plain", b"not found"

    def _index(self) -> bytes:
        links = "".join(
            f'<li><a href="{p}/thread.html">{p}</a></li>' for p in self.periods()
        )
        return (
            "<html><head><title>Archive</title></head>"
            f"<body><ul>{links}</ul></body></html>"
        ).encode()

    def _thread_page(self, period: str) -> bytes:
        out = []
        for t in range(1, self.n_threads + 1):
            root = self.thread_root(period, t)
            lid = self.long_id(root)
            out.append(f"<!--0 {lid}- -->")
            out.append(f'<li><a href="{root}.html">{self.subject(root)}</a></li>')
            chain: list[str] = []
            prev = 0
            for depth, pid in self.replies(root):
                if depth > len(chain):
                    chain.append(self.long_id(pid))
                else:
                    chain[depth - 1:] = [self.long_id(pid)]
                d = min(depth, 3)
                out.append(f"<!--{d} {lid}-{'-'.join(chain)}- -->")
                out.append(f'<li><a href="{pid}.html">{self.subject(pid)}</a></li>')
                prev = depth
        return (
            "<html><head><title>Threads</title></head><body><ul>"
            + "".join(out)
            + "</ul></body></html>"
        ).encode()

    def _post(self, period: str, pid: str) -> bytes:
        h = h64(self.seed, f"pm:post:{pid}")
        iso = f"2021-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:55:00+00:00"
        body = words(self.seed, f"pm:body:{pid}", 12)
        quoted = words(self.seed, f"pm:quote:{pid}", 5)
        return (
            f"<html><head><title>{self.subject(pid)}</title></head><body>"
            f"<b>pmuser{h % 9}</b> <i>{iso}</i>"
            f"<pre>{body}\n&gt;<i>{quoted}\n</i>postscript {pid}</pre>"
            "</body></html>"
        ).encode()
