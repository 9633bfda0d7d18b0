"""Serve a fixture (which answers for its canonical host) at a different
base URL — e.g. behind a localhost HTTP bridge in integration tests."""

from __future__ import annotations

from urllib.parse import urlparse


class MultiHost:
    """Dispatch by netloc so one server object serves several sites —
    the transport for multi-seed crawls over synthetic fixtures."""

    def __init__(self, *servers):
        self._by_host = {urlparse(s.base_url).netloc: s for s in servers}
        for s in servers:  # fixtures may answer for extra hosts (HN API)
            for h in getattr(s, "extra_hosts", ()):
                self._by_host[h] = s

    def get(self, url: str, params=None, attempt: int = 0):
        srv = self._by_host.get(urlparse(url).netloc)
        if srv is None:
            return 404, "text/plain", b"unknown host"
        return srv.get(url, params=params, attempt=attempt)


class WithRobots:
    """Overlay a /robots.txt onto a fixture host (the fixtures themselves
    404 unknown paths, which means 'no restrictions')."""

    def __init__(self, inner, robots_txt: str):
        self.inner = inner
        self.base_url = inner.base_url
        self.robots_txt = robots_txt

    def get(self, url: str, params=None, attempt: int = 0):
        if urlparse(url).path == "/robots.txt":
            return 200, "text/plain", self.robots_txt.encode()
        return self.inner.get(url, params=params, attempt=attempt)


class HostRemap:
    def __init__(self, inner, public_base: str):
        self.inner = inner
        self.public = urlparse(public_base).netloc
        self.canon = urlparse(inner.base_url).netloc
        self.scheme = urlparse(inner.base_url).scheme

    def get(self, url: str, params=None, attempt: int = 0):
        u = urlparse(url)
        if u.netloc == self.public:
            url = f"{self.scheme}://{self.canon}{u.path}" + (
                f"?{u.query}" if u.query else ""
            )
        return self.inner.get(url, params=params, attempt=attempt)
