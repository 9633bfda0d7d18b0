"""Interleaved text + media span extraction from HTML.

Re-expresses the reference's embedded-file extraction
(forum_dl/extractors/common.py:480-569) as a pure kernel producing the
``spans`` payload of the ``documents`` table (BASELINE.json ``input_hint``):
``array<struct<kind:string, text:string, media_ref:string, offset:int>>``.

Semantics mirrored from the reference, including its quirks:

- embed set = ``link[rel=stylesheet], embed, audio, img, object, svg, video``
  in **document order** (common.py:494-496);
- per-tag URL attribute: link→href, embed→src, audio→nested <source> src
  (one file per source, common.py:523-532), img→src else data-src
  (common.py:533-537), object→data;
- ``svg`` yields inline content with the page URL as its ref and does NOT
  participate in the content-file URL list (common.py:555-563: ``url`` is
  never set, so common.py:566-567 skips it);
- ``video`` is *selected but has no handler branch* in the reference
  (common.py:504-563 has no video case), so it yields nothing — quirk
  preserved;
- all URLs resolved with ``urljoin`` against the response URL.

Text spans are our enrichment per the input_hint: each maximal non-empty run
of visible text between media embeds becomes one ``kind='text'`` span;
``offset`` is the 0-based document-order index over the combined sequence.

Pure stdlib (html.parser) — runs vectorized inside ``mapInPandas`` Arrow
batches; the same kernel is used by the sequential oracle simulator, so the
engine and oracle canonicalize identically. In a production deployment this
kernel would swap to lxml/selectolax behind the same signature (those libs
are not in this container).
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser
from urllib.parse import urljoin

__all__ = ["Span", "FileRef", "extract_spans", "extract_file_refs"]

_EMBED_TAGS = {"link", "embed", "audio", "img", "object", "svg", "video"}
_VOID_TAGS = {"img", "link", "embed", "source", "br", "hr", "meta", "input"}
_BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "tr", "table", "address", "br", "section", "article",
}


@dataclass(frozen=True)
class Span:
    kind: str  # 'text' | 'media'
    text: str
    media_ref: str
    offset: int


@dataclass(frozen=True)
class FileRef:
    """A File item equivalent (reference Item ``File``, common.py:122-126)."""

    url: str
    content_type: str | None
    content: bytes | None
    in_url_list: bool  # participates in content-file dedup (common.py:566-567)


class _EmbedParser(HTMLParser):
    def __init__(self, page_url: str) -> None:
        super().__init__(convert_charrefs=True)
        self.page_url = page_url
        self.events: list[tuple[str, object]] = []  # ('text', str) | ('file', FileRef)
        self._text_buf: list[str] = []
        self._audio_depth = 0
        self._svg_depth = 0
        self._svg_buf: list[str] = []

    # -- helpers ----------------------------------------------------------
    def _flush_text(self) -> None:
        txt = "".join(self._text_buf)
        self._text_buf = []
        if txt.strip():
            self.events.append(("text", " ".join(txt.split())))

    def _emit_file(self, url: str, content_type: str | None = None,
                   content: bytes | None = None, in_url_list: bool = True) -> None:
        self._flush_text()
        self.events.append(
            ("file", FileRef(url=url, content_type=content_type,
                             content=content, in_url_list=in_url_list))
        )

    # -- parser events ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if self._svg_depth > 0:
            if tag == "svg":
                self._svg_depth += 1
            attr_s = "".join(f' {k}="{v}"' for k, v in attrs)
            close = "/" if tag in _VOID_TAGS else ""
            self._svg_buf.append(f"<{tag}{attr_s}{close}>")
            return

        a = {k: v for k, v in attrs if v is not None}
        if tag == "link":
            # reference: only rel=stylesheet links (common.py:494-512)
            if a.get("rel") == "stylesheet" and "href" in a:
                self._emit_file(urljoin(self.page_url, a["href"]))
        elif tag == "embed":
            if "src" in a:
                self._emit_file(urljoin(self.page_url, a["src"]))
        elif tag == "audio":
            self._audio_depth += 1
        elif tag == "source" and self._audio_depth > 0:
            if "src" in a:
                self._emit_file(urljoin(self.page_url, a["src"]))
        elif tag == "img":
            src = a.get("src", a.get("data-src"))
            if src is not None:
                self._emit_file(urljoin(self.page_url, src))
        elif tag == "object":
            if "data" in a:
                self._emit_file(urljoin(self.page_url, a["data"]))
        elif tag == "svg":
            self._flush_text()
            self._svg_depth = 1
            self._svg_buf = []
        elif tag in _BLOCK_TAGS:
            self._text_buf.append(" ")
        # 'video': selected but unhandled in the reference → no output.

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if self._svg_depth > 0:
            if tag == "svg":
                self._svg_depth -= 1
                if self._svg_depth == 0:
                    # inline SVG content → File with page URL ref, NOT in the
                    # content-url dedup list (common.py:555-567)
                    self.events.append(
                        ("file", FileRef(url=self.page_url,
                                         content_type="image/svg+xml",
                                         content="".join(self._svg_buf).encode(),
                                         in_url_list=False))
                    )
                else:
                    self._svg_buf.append(f"</{tag}>")
            else:
                self._svg_buf.append(f"</{tag}>")
        elif tag == "audio":
            self._audio_depth = max(0, self._audio_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._text_buf.append(" ")

    def handle_data(self, data: str) -> None:
        if self._svg_depth > 0:
            self._svg_buf.append(data)
        else:
            self._text_buf.append(data)

    def close(self) -> None:  # type: ignore[override]
        super().close()
        self._flush_text()


def _parse(html: str, page_url: str) -> list[tuple[str, object]]:
    p = _EmbedParser(page_url)
    p.feed(html or "")
    p.close()
    return p.events


def extract_file_refs(html: str, page_url: str) -> list[FileRef]:
    """Ordered File-equivalents, mirroring reference common.py:480-569."""
    return [ev for kind, ev in _parse(html, page_url) if kind == "file"]  # type: ignore[misc]


def extract_spans(html: str, page_url: str) -> list[Span]:
    """Interleaved (text|media) spans in document order."""
    spans: list[Span] = []
    for kind, ev in _parse(html, page_url):
        off = len(spans)
        if kind == "text":
            spans.append(Span(kind="text", text=ev, media_ref="", offset=off))  # type: ignore[arg-type]
        else:
            ref: FileRef = ev  # type: ignore[assignment]
            spans.append(Span(kind="media", text="", media_ref=ref.url, offset=off))
    return spans
