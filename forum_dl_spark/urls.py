"""URL canonicalization kernels.

Pure-Python kernels replicating the reference's URL semantics exactly
(reference: forum_dl/extractors/common.py:22-62), plus vectorized pandas-UDF
wrappers so the same kernels run Arrow-batched inside Spark stages.

The kernels are deliberately tiny pure functions: they are used both by the
sequential oracle simulator (tests) and by the distributed engine (inside
``mapInPandas`` batches), guaranteeing byte-identical canonicalization in
both worlds.
"""

from __future__ import annotations

from pathlib import PurePosixPath
from urllib.parse import parse_qs, urlencode, urljoin, urlparse, urlunparse

import pandas as pd

__all__ = [
    "normalize_url",
    "get_relative_url",
    "url_host",
    "seen_key",
    "params_key",
    "normalize_url_series",
    "url_host_series",
]


def normalize_url(
    url: str,
    remove_suffixes: tuple[str, ...] = ("index.php",),
    append_slash: bool = True,
    keep_queries: tuple[str, ...] = (),
) -> str:
    """Canonicalize a URL.

    Behavior-equivalent to the reference ``normalize_url``
    (forum_dl/extractors/common.py:35-62), including its quirks:

    - suffixes are removed only when ``keep_queries`` is empty OR the URL
      has no query string (line 44);
    - the trailing slash is stripped twice (lines 42, 48);
    - params/fragment are always dropped; only whitelisted query keys
      survive, re-encoded with ``doseq``;
    - a trailing slash is appended only when the final URL has no query.
    """
    parsed = urlparse(url)
    new_path = parsed.path.removesuffix("/")

    if not keep_queries or not parsed.query:
        for suffix in remove_suffixes:
            new_path = new_path.removesuffix(suffix)

    new_path = new_path.removesuffix("/")

    query = parse_qs(parsed.query)
    new_query = {key: query[key] for key in keep_queries if key in query}

    new_parsed = parsed._replace(
        path=new_path, params="", query=urlencode(new_query, doseq=True), fragment=""
    )
    new_url = urlunparse(new_parsed)

    if append_slash and not new_parsed.query:
        return f"{new_url}/"
    return str(new_url)


def get_relative_url(url: str, base_url: str) -> str:
    """Path of ``url`` relative to ``base_url``'s path.

    Equivalent to the reference (forum_dl/extractors/common.py:22-32);
    raises ``ValueError`` when ``url`` is outside the base path — used as a
    crawl-scope filter.
    """
    base_path = PurePosixPath(urlparse(base_url).path)
    path = PurePosixPath(urlparse(url).path)
    if str(base_path) == ".":
        return str(path)
    return str(path.relative_to(base_path))


def url_host(url: str) -> str:
    return urlparse(url).netloc


def params_key(params: dict[str, str] | None) -> str:
    """Canonical string form of request params for seen-set keying.

    The reference keys its seen set by ``(url, frozenset(params),
    frozenset(headers))`` (forum_dl/session.py:102-115). We key by
    ``url + "\\0" + sorted-urlencoded-params``; headers are constant in our
    engine so they do not discriminate.
    """
    if not params:
        return ""
    return urlencode(sorted(params.items()))


def seen_key(url: str, pkey: str = "") -> str:
    return url if not pkey else f"{url}\x00{pkey}"


# ---------------------------------------------------------------------------
# Vectorized (Arrow batch) wrappers — used inside mapInPandas stages.
# ---------------------------------------------------------------------------


def normalize_url_series(
    urls: pd.Series,
    remove_suffixes: tuple[str, ...] = ("index.php",),
    append_slash: bool = True,
    keep_queries: tuple[str, ...] = (),
) -> pd.Series:
    return urls.map(
        lambda u: normalize_url(
            u,
            remove_suffixes=remove_suffixes,
            append_slash=append_slash,
            keep_queries=keep_queries,
        )
    )


def url_host_series(urls: pd.Series) -> pd.Series:
    return urls.map(url_host)


def urljoin_str(base: str, href: str) -> str:
    return urljoin(base, href)
