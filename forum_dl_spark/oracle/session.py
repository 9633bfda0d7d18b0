"""Sequential session with the reference's URL-seen semantics.

Mirrors forum_dl/session.py:

- response cache with one-shot eviction: a cached entry is returned and
  *deleted* when requested with ``should_cache=False`` (session.py:105-111);
- revisiting a non-cached past request raises ``AlreadyVisitedError``
  (session.py:112-113); a past failure raises ``AlreadyFailedError``
  (session.py:114-115);
- retry applies ONLY to transport-level exceptions (tenacity wraps
  ``_do_get``, session.py:117-135; ``requests`` does not raise on HTTP
  error statuses). Up to ``retries`` total attempts, each one recorded in
  the trace (the reference logs/prints the URL per attempt,
  session.py:163-166); exhausted retries record the key into the failed
  set and re-raise (session.py:137-141);
- an HTTP 4xx/5xx *response* is recorded as a normal past request; the
  caller's ``get`` raises via ``raise_for_status`` (session.py:86-88),
  which the extractor generators catch and swallow
  (extractors/common.py:334-346) — so the subtree is abandoned but the
  URL counts as visited;
- seen keys are ``(url, params)`` — headers are constant here
  (session.py:102-103).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlencode


class AlreadyVisitedError(Exception):
    pass


class AlreadyFailedError(Exception):
    pass


class HttpStatusError(Exception):
    pass


class FetchError(Exception):
    """Transport-level failure (connection/timeout) — the retryable kind."""


def params_key_doseq(params: dict | None) -> str:
    if not params:
        return ""
    return urlencode(sorted(params.items()), doseq=True)


def join_seen_key(url: str, pkey: str) -> str:
    return url if not pkey else f"{url}\x00{pkey}"


@dataclass
class Response:
    status_code: int
    content_type: str
    body: bytes
    url: str
    params: str = ""

    def raise_for_status(self) -> None:
        if self.status_code >= 400:
            raise HttpStatusError(f"{self.status_code} {self.url}")

    @property
    def key(self) -> str:
        """Canonical fetch identity (seen-key format) of this response —
        callers pass it as ``discovered_from`` for link-lineage capture."""
        return join_seen_key(self.url, self.params)


@dataclass
class OracleSession:
    server: object  # .get(url, params, attempt) -> (status, ctype, body) | raises FetchError
    retries: int = 4
    trace: list[tuple[str, str]] = field(default_factory=list)
    cache: dict[tuple[str, str], Response] = field(default_factory=dict)
    past_requests: set[tuple[str, str]] = field(default_factory=set)
    past_failed: set[tuple[str, str]] = field(default_factory=set)
    # discovered-link lineage (src seen-key -> dst seen-key), recorded for
    # every attempted fetch carrying ``discovered_from`` — BEFORE the
    # cache/visited gates, because discovery happens whether or not the
    # fetch is then suppressed (the Spark engine likewise logs 'next'
    # candidate records before the seen anti-join). Oracle for
    # CrawlResult.link_edges / pagerank_crawl (tests/test_graph_crawl.py).
    links: list[tuple[str, str]] = field(default_factory=list)

    def _do_get(self, url: str, params: dict | None, attempt: int) -> Response:
        pkey = params_key_doseq(params)
        self.trace.append((url, pkey))
        status, ctype, body = self.server.get(url, params=params, attempt=attempt)
        return Response(status, ctype, body, url, pkey)

    def try_get(
        self,
        url: str,
        *,
        params: dict | None = None,
        should_cache: bool = False,
        should_retry: bool = True,
        discovered_from: str | None = None,
    ) -> Response:
        key = (url, params_key_doseq(params))
        if discovered_from is not None:
            self.links.append((discovered_from, join_seen_key(*key)))
        if key in self.cache:
            resp = self.cache[key]
            if not should_cache:
                del self.cache[key]
            return resp
        if key in self.past_requests:
            raise AlreadyVisitedError(url)
        if key in self.past_failed:
            raise AlreadyFailedError(url)

        attempts = self.retries if should_retry else 1
        resp: Response | None = None
        for attempt in range(attempts):
            try:
                resp = self._do_get(url, params, attempt)
                break
            except FetchError:
                if attempt == attempts - 1:
                    self.past_failed.add(key)
                    raise
        assert resp is not None

        if should_cache:
            self.cache[key] = resp
        else:
            self.past_requests.add(key)
        return resp

    def get(self, url: str, **kw) -> Response:
        resp = self.try_get(url, **kw)
        resp.raise_for_status()
        return resp

    def seen(self) -> dict[str, str]:
        """Final seen set: key → ok|failed (cache keys ∪ past ∪ failed)."""
        out: dict[str, str] = {}
        for url, pkey in list(self.cache) + list(self.past_requests):
            out[join_seen_key(url, pkey)] = "ok"
        for url, pkey in self.past_failed:
            out[join_seen_key(url, pkey)] = "failed"
        return out
