"""Real-HTTP fetch backend: a ``requests``-based implementation of the
server protocol the crawl engine consumes.

The whole engine is written against one tiny protocol —
``server.get(url, params, attempt) -> (status_code, content_type,
body_bytes)``, raising ``FetchError`` for transport-level failures — so the
same superstep/fetch/parse machinery runs against in-process synthetic
fixtures (tests, bench) and against live sites (this module). Semantics
mirror the reference session (forum_dl/session.py:155–187):

- a ``User-Agent`` header on every request (options.py:72–78),
- a connect/read timeout (options.py:44–49, default 5 s),
- transport exceptions (connection refused, timeout, DNS) are the retryable
  kind → ``FetchError``; the superstep re-enqueues the row with
  ``attempt+1`` into the next wave, which also realizes the reference's
  between-retry sleep (session.py:117–141) as *scheduling delay* instead of
  blocking an executor core — plus an optional in-worker backoff sleep for
  strict pacing,
- HTTP status codes are returned to the caller; non-2xx handling is the
  engine's job exactly as the reference's ``raise_for_status``
  (session.py:86) surfaces status to the extractor layer.

Scale note: one ``requests.Session`` per executor worker process (lazily
created, never pickled) gives per-worker connection pooling/keep-alive; at
1000 executors that is 1000 independent connection pools, with per-host
politeness enforced upstream by the frontier's host budgets — the fetch
layer itself never coordinates across workers.
"""

from __future__ import annotations

import time
from urllib.parse import urlparse

from ..oracle.session import FetchError

DEFAULT_TIMEOUT = 5.0  # reference default, forum_dl/options.py:44-49
DEFAULT_UA = "Forum-dl 0.3.0 (spark)"  # shape of options.py:72-78
MAX_BACKOFF_SEC = 60.0


def validate_url(url: str) -> bool:
    """Reference ``Session.validate_url`` (session.py:189–195): is this a
    URL our transport has an adapter for? requests mounts http:// and
    https:// only."""
    try:
        scheme = urlparse(url).scheme.lower()
    except ValueError:
        return False
    return scheme in ("http", "https") and bool(urlparse(url).netloc)


class HttpServer:
    """``requests``-backed server. Picklable: the underlying session is
    per-process state, rebuilt lazily on first use inside each worker."""

    def __init__(
        self,
        timeout: float = DEFAULT_TIMEOUT,
        user_agent: str = DEFAULT_UA,
        retry_sleep: float = 0.0,
        retry_sleep_multiplier: float = 2.0,
    ) -> None:
        self.timeout = timeout
        self.user_agent = user_agent
        # in-worker backoff before a retry attempt; 0 disables (the BSP
        # superstep boundary is already a between-attempt delay)
        self.retry_sleep = retry_sleep
        self.retry_sleep_multiplier = retry_sleep_multiplier
        self._session = None

    # -- pickling: never ship a live socket pool through a closure ---------
    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state["_session"] = None
        return state

    def _sess(self):
        if self._session is None:
            import requests

            s = requests.Session()
            s.headers["User-Agent"] = self.user_agent
            self._session = s
        return self._session

    def get(
        self, url: str, params: dict | None = None, attempt: int = 0
    ) -> tuple[int, str, bytes]:
        if not validate_url(url):
            # non-http(s) scheme: not a transport failure, a caller bug —
            # the reference refuses these before fetching (session.py:189)
            raise ValueError(f"invalid or non-http(s) URL: {url!r}")
        if attempt > 0 and self.retry_sleep > 0:
            time.sleep(
                min(
                    self.retry_sleep * self.retry_sleep_multiplier ** (attempt - 1),
                    MAX_BACKOFF_SEC,
                )
            )
        import requests

        try:
            resp = self._sess().get(url, params=params, timeout=self.timeout)
        except requests.RequestException as e:
            raise FetchError(f"transport failure for {url}: {e}") from e
        return (
            resp.status_code,
            resp.headers.get("Content-Type", ""),
            resp.content,
        )
