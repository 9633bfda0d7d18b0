"""Engine detection — the probe cascade (forum_dl/extractors/__init__.py:27-37).

Probes run in the reference's fixed module order (lines 12-24) with the
reference's per-engine probe URLs and cached-session semantics, so the
probe fetches recorded into ``pages``/``seen`` match the reference trace
byte-for-byte.

Detection is per-seed and sequential by nature (first match wins, ≤11
fetches); for multi-seed crawls it is embarrassingly parallel across seeds
(each seed can run inside a ``mapInPandas`` batch). Here it runs driver-side
for the single-seed crawl entrypoint.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlparse

from ..oracle.session import FetchError
from ..urls import normalize_url

_RE_HYPERKITTY = re.compile(r"data-hyperkitty")
_RE_HYPERMAIL = re.compile(r'name="generator" content="hypermail')
_RE_XENFORO = re.compile(r'<html[^>]+id="XF"')
_RE_VBULLETIN = re.compile(r'content="vBulletin')
_RE_INVISION = re.compile(r'data-role="breadcrumbList"')
_RE_DISCOURSE_NAV = re.compile(r'<nav class="crawler-nav">.*?<a href="([^"]*)"', re.S)


@dataclass
class ProbeFetch:
    url: str
    params: str
    status: int
    content_type: str
    body: bytes


@dataclass
class DetectResult:
    engine: str
    base_url: str
    fetches: list[ProbeFetch] = field(default_factory=list)


class _ProbeCache:
    """should_cache=True semantics for detection probes (session.py:105-111,
    145-146): the first fetch of a key is real, repeats are cache hits."""

    def __init__(self, server: object) -> None:
        self.server = server
        self.cache: dict[str, ProbeFetch] = {}
        self.fetches: list[ProbeFetch] = []

    def try_get(self, url: str) -> ProbeFetch | None:
        if url in self.cache:
            return self.cache[url]
        try:
            status, ctype, body = self.server.get(url, params=None, attempt=0)
        except FetchError:
            # probes use should_retry=False (single attempt); a transport
            # failure is swallowed by Extractor.detect (common.py:132-140)
            pf = ProbeFetch(url, "", -1, "", b"")
            self.fetches.append(pf)
            return None
        pf = ProbeFetch(url, "", status, ctype, body)
        self.cache[url] = pf
        self.fetches.append(pf)
        return pf


def detect_engine(server: object, url: str) -> DetectResult | None:
    """Replicates the cascade for the engines this repo implements.

    Returns None when no engine matches (reference raises
    ExtractorNotFoundError, extractors/__init__.py:37).
    """
    probes = _ProbeCache(server)
    parsed = urlparse(url)

    # hackernews (hackernews.py:84-106): netloc check, no fetch
    if parsed.netloc == "news.ycombinator.com":
        return DetectResult("hackernews", urljoin(url, "/"), probes.fetches)

    # hyperkitty (hyperkitty.py:73-122): one probe, two footer checks in
    # reference order — Postorius first (footer "Postorius Documentation"
    # anchor, base from the SECOND a.nav-link, hyperkitty.py:93-106), then
    # HyperKitty (footer "HyperKitty" anchor + navbar-brand)
    pf = probes.try_get(normalize_url(url, append_slash=False))
    if pf and pf.status < 400:
        body = pf.body.decode("utf-8", "replace")
        if "<footer" in body:
            from ..htmlmini import parse_html as _ph

            doc = _ph(body)
            footer = doc.find("footer")
            if footer is not None and any(
                a.string() == "Postorius Documentation"
                for a in footer.find_all("a")
            ):
                nav_links = doc.find_all("a", class_="nav-link")
                # reference indexes nav_link_anchors[1] unconditionally
                # (hyperkitty.py:104); guard the <2 case instead of crashing
                if len(nav_links) >= 2:
                    return DetectResult(
                        "hyperkitty",
                        normalize_url(urljoin(url, nav_links[1].get("href"))),
                        probes.fetches,
                    )
            if footer is not None and any(
                a.string() == "HyperKitty" for a in footer.find_all("a")
            ):
                brand = doc.find("a", class_="navbar-brand")
                if brand is not None:
                    return DetectResult(
                        "hyperkitty",
                        normalize_url(urljoin(url, brand.get("href"))),
                        probes.fetches,
                    )

    # pipermail (pipermail.py:61-112): fetch + path-suffix predicate;
    # base = URL cut at the pipermail/mailman marker
    pf = probes.try_get(url)
    if pf and pf.status < 400:
        resolved = normalize_url(pf.url, append_slash=False)
        path_parts = urlparse(resolved).path.split("/")
        if "pipermail" in path_parts or "mailman" in path_parts:
            from ..oracle.refsim_pipermail import detect_base

            base = detect_base(url, resolved)
            if base is not None:
                return DetectResult("pipermail", base, probes.fetches)

    # hypermail (hypermail.py:40-76): base = URL minus two path segments when
    # header metas / a by-thread title are present, else the response URL
    pf = probes.try_get(normalize_url(url, remove_suffixes=(), append_slash=False))
    if pf and pf.status < 400 and _RE_HYPERMAIL.search(pf.body.decode("utf-8", "replace")):
        body = pf.body.decode("utf-8", "replace")
        header_metas = re.search(r'<meta name="(Author|Subject|Date)"', body)
        title_m = re.search(r"<title>([^<]*)</title>", body)
        title_hit = title_m and re.search(
            "^.*?(by thread)|(by author)|(with attachments)|(by date)$",
            title_m.group(1),
        )
        if header_metas or title_hit:
            from pathlib import PurePosixPath
            from urllib.parse import urlunparse

            parsed = urlparse(pf.url)
            parts = PurePosixPath(parsed.path).parts
            base = normalize_url(
                urlunparse(parsed._replace(path=str(PurePosixPath(*parts[:-2]))))
            )
        else:
            base = pf.url
        return DetectResult("hypermail", base, probes.fetches)

    # xenforo (xenforo.py:275-297): base from the forums nav anchor
    pf = probes.try_get(normalize_url(url, remove_suffixes=(), append_slash=False))
    if pf and pf.status < 400 and _RE_XENFORO.search(pf.body.decode("utf-8", "replace")):
        body = pf.body.decode("utf-8", "replace")
        m = re.search(r'<a[^>]+data-nav-id="forums"[^>]+href="([^"]*)"', body)
        if not m:
            m = re.search(r'<a[^>]+id="header-forum-listing"[^>]+href="([^"]*)"', body)
        if m:
            return DetectResult(
                "xenforo", normalize_url(urljoin(url, m.group(1))), probes.fetches
            )

    # vbulletin (vbulletin.py:223-233): base from the <base href> tag
    pf = probes.try_get(url)
    if pf and pf.status < 400 and _RE_VBULLETIN.search(pf.body.decode("utf-8", "replace")):
        m = re.search(r'<base href="([^"]*)"', pf.body.decode("utf-8", "replace"))
        if m:
            return DetectResult("vbulletin", m.group(1), probes.fetches)

    # proboards (proboards.py:204-209): netloc check, no fetch
    if parsed.netloc.endswith("proboards.com"):
        return DetectResult("proboards", urljoin(url, "/"), probes.fetches)

    # invision (invision.py:80-93): base from breadcrumb[1] when >=2 lis
    pf = probes.try_get(url)
    if pf and pf.status < 400 and _RE_INVISION.search(pf.body.decode("utf-8", "replace")):
        body = pf.body.decode("utf-8", "replace")
        if 'title="Invision Community"' in body:
            from ..htmlmini import parse_html as _ph

            doc = _ph(body)
            bl = doc.find("ul", attrs={"data-role": "breadcrumbList"})
            lis = bl.find_all("li") if bl is not None else []
            base = url if len(lis) < 2 else lis[1].find("a").get("href")
            return DetectResult("invision", base, probes.fetches)

    # discourse (discourse.py:58-72)
    u = url.removesuffix("/").removesuffix(".json")
    pf = probes.try_get(normalize_url(u))
    if pf and pf.status < 400:
        m = _RE_DISCOURSE_NAV.search(pf.body.decode("utf-8", "replace"))
        if m:
            base = normalize_url(urljoin(pf.url, m.group(1)))
            return DetectResult("discourse", base, probes.fetches)

    # simplemachines (simplemachines.py:240-257): link rel=contents + anchor
    pf = probes.try_get(url)
    if pf and pf.status < 400:
        body = pf.body.decode("utf-8", "replace")
        m = re.search(r'<link[^>]+rel="contents"[^>]+href="([^"]*)"', body)
        if m and re.search(r"https?://www\.simplemachines\.org", body):
            return DetectResult("simplemachines", normalize_url(m.group(1)), probes.fetches)

    # phpbb (phpbb.py:207-229): probe viewforum.php + <html dir> check
    probe_url = urljoin(
        normalize_url(url, remove_suffixes=("viewforum.php", "viewtopic.php")),
        "viewforum.php",
    )
    pf = probes.try_get(probe_url)
    if pf and pf.status < 400 and re.search(
        r"<html[^>]*\sdir=", pf.body.decode("utf-8", "replace")
    ):
        base = normalize_url(
            pf.url, remove_suffixes=("viewforum.php", "viewtopic.php")
        )
        return DetectResult("phpbb", base, probes.fetches)

    return None
