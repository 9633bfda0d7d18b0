"""Export jobs: JSONL Entry envelope, mail messages, WARC-equivalent."""

from __future__ import annotations

import base64
import json

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.export.jsonl import export_warc_equivalent, items_to_entries
from forum_dl_spark.export.mail import build_messages, export_mbox
from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    wd = tmp_path_factory.mktemp("exports")
    srv = SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)
    return run_crawl(spark, srv, "https://phpbb.example/", str(wd / "run"), CrawlConfig())


def test_jsonl_entries(crawl):
    lines = [
        json.loads(r["line"])
        for r in items_to_entries(crawl.items(), "phpbb").orderBy("ord").collect()
    ]
    assert lines[0]["type"] == "board"
    assert lines[0]["generator"] == "forum-dl-spark"
    assert {e["type"] for e in lines} == {"board", "thread", "post", "file"}
    # emission order: every thread precedes its posts
    seen_threads = set()
    for e in lines:
        if e["type"] == "thread":
            seen_threads.add(tuple(e["item"]["path"]))
        if e["type"] == "post":
            assert tuple(e["item"]["path"]) in seen_threads
    # file entries carry base64 content (Entry JSON encoder,
    # writers/common.py:59-61)
    files = [e for e in lines if e["type"] == "file" and e["item"].get("content_b64")]
    assert files
    base64.b64decode(files[0]["item"]["content_b64"])  # valid b64


def test_mail_messages(crawl):
    msgs = build_messages(
        crawl.items(), "phpbb.example", author_as_addr_spec=True, foldered=True
    ).collect()
    assert msgs
    by_id = {m["message_id"]: m for m in msgs}
    for m in msgs:
        # Message-ID from path+subpath (writers/common.py:359-361)
        assert m["message_id"].startswith("<") and m["message_id"].endswith(">")
        if m["in_reply_to"]:
            # parent prefix relation (writers/common.py:374-375)
            child = m["message_id"][1:-1].split(".")
            parent = m["in_reply_to"][1:-1].split(".")
            assert child[:-1] == parent
        assert "@phpbb.example>" in m["from_header"]
        assert m["folder"]  # board path join (writers/common.py:410-411)
        assert "Message-ID: " in m["raw_message"]


def test_mail_textify(crawl):
    msgs = build_messages(crawl.items(), "phpbb.example", textify=True).collect()
    assert msgs and not any("<p>" in (m["body"] or "") for m in msgs)


def test_mbox_and_warc_export(crawl, tmp_path):
    export_mbox(
        build_messages(crawl.items(), "phpbb.example"), str(tmp_path / "mbox")
    )
    export_warc_equivalent(crawl.pages(), str(tmp_path / "warc"))
    spark = crawl.spark
    mbox = spark.read.text(str(tmp_path / "mbox"))
    assert mbox.count() > 0
    warc = spark.read.parquet(str(tmp_path / "warc"))
    assert warc.count() == crawl.pages().count()
    assert "body" in warc.columns


def test_textify_documented_mapping():
    """TEXTIFY.md's table, row for row: the html2text divergence is a
    SPECIFICATION — a span-kernel change that shifts any of these rows
    must update the doc, not slide silently."""
    from forum_dl_spark.export.mail import textify_html

    table = [
        ("<p>Hello world</p>", "Hello world"),
        ("<p>a <b>bold</b> word and <i>italics</i></p>",
         "a bold word and italics"),
        ('<p>see <a href="https://x/y">the docs</a> here</p>',
         "see the docs here"),
        ('<p>before</p><img src="pic.png" alt="alt text"><p>after</p>',
         "before\n\n![](pic.png)\n\nafter"),
        ("<ul><li>one</li><li>two</li></ul>", "one two"),
        ("<blockquote>quoted line</blockquote><p>reply</p>",
         "quoted line reply"),
        ("<pre>code  block</pre>", "code block"),
        ("text with <br> break", "text with break"),
    ]
    for html, expected in table:
        assert textify_html(html) == expected, html
