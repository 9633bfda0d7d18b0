"""Unit tests of the interleaved span/file extraction kernel against
handwritten expectations mirroring forum_dl/extractors/common.py:480-569."""

from __future__ import annotations

from forum_dl_spark.spans import extract_file_refs, extract_spans

BASE = "https://f.example/t/x/1.json"


def test_interleaved_order_and_offsets():
    html = (
        "<p>hello world</p>"
        '<img src="/img/a.png">'
        "<p>middle</p>"
        '<object data="/obj/b.swf"></object>'
        "<p>tail</p>"
    )
    spans = extract_spans(html, BASE)
    assert [(s.kind, s.text, s.media_ref) for s in spans] == [
        ("text", "hello world", ""),
        ("media", "", "https://f.example/img/a.png"),
        ("text", "middle", ""),
        ("media", "", "https://f.example/obj/b.swf"),
        ("text", "tail", ""),
    ]
    assert [s.offset for s in spans] == list(range(5))


def test_tag_attribute_rules():
    html = (
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="icon" href="/i.ico">'  # non-stylesheet link: ignored
        '<embed src="/e.swf">'
        '<audio><source src="/a.ogg"><source src="/a.mp3"></audio>'
        '<img data-src="/lazy.png">'  # img src fallback to data-src
    )
    refs = [r.url for r in extract_file_refs(html, BASE)]
    assert refs == [
        "https://f.example/s.css",
        "https://f.example/e.swf",
        "https://f.example/a.ogg",
        "https://f.example/a.mp3",
        "https://f.example/lazy.png",
    ]


def test_video_selected_but_unhandled_quirk():
    # reference selects <video> but has no handler branch
    # (common.py:494-563) → yields nothing
    assert extract_file_refs('<video src="/v.mp4"></video>', BASE) == []
    # video contributes nothing, so the surrounding text merges into one span
    spans = extract_spans('<p>a</p><video src="/v.mp4"></video><p>b</p>', BASE)
    assert [(s.kind, s.text) for s in spans] == [("text", "a b")]


def test_inline_svg():
    html = '<p>x</p><svg viewBox="0 0 8 8"><circle cx="1" cy="4" r="2"></circle></svg>'
    refs = extract_file_refs(html, BASE)
    assert len(refs) == 1
    assert refs[0].url == BASE  # page URL, common.py:555-563
    assert refs[0].content_type == "image/svg+xml"
    assert b"circle" in refs[0].content
    assert refs[0].in_url_list is False  # not in content-file dedup list


def test_text_whitespace_normalization():
    spans = extract_spans("<p>a\n  b</p> <p>c</p>", BASE)
    assert len(spans) == 1 and spans[0].text == "a b c"
