"""Serve a fixture (which answers for its canonical host) at a different
base URL — e.g. behind a localhost HTTP bridge in integration tests."""

from __future__ import annotations

from urllib.parse import urlparse


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
