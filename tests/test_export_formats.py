"""Real export formats: MIME attachment join (W6), stdlib mailbox formats
(W4), WARC/1.0 records (W2), data-URI decode (U7), file materialization with
quote_plus naming (W5/U6)."""

from __future__ import annotations

import email
import mailbox as mb
from base64 import b64decode
from urllib.parse import quote_plus

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.export.files import export_files
from forum_dl_spark.export.mail import build_messages, export_mailbox
from forum_dl_spark.export.warc import export_warc, read_warc
from forum_dl_spark.fixtures.content import media_bytes
from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb

SEED = 42


@pytest.fixture(scope="module")
def server():
    return SyntheticPhpbb(seed=SEED, n_cats=1, n_subs=1, n_topics=2, max_posts=4)


@pytest.fixture(scope="module")
def crawl(spark, server, tmp_path_factory):
    wd = tmp_path_factory.mktemp("export_formats")
    return run_crawl(spark, server, "https://phpbb.example/", str(wd / "run"),
                     CrawlConfig())


@pytest.fixture(scope="module")
def messages(crawl):
    return build_messages(
        crawl.items(), "phpbb.example", foldered=True
    ).cache()


def _items(crawl):
    return {tuple((r["path"] or []) + (r["subpath"] or [])): r
            for r in crawl.items().collect()}


# --- U7: data-URI decode ------------------------------------------------------


def test_datauri_file_decoded_bytes(crawl):
    rows = [r for r in crawl.items().collect()
            if r["type"] == "file" and r["url"].startswith("data:")]
    assert rows, "fixture must contain a data-URI post"
    for r in rows:
        assert r["content_type"] == "image/png"
        # exact byte equality vs the independently decoded URL payload
        expected = b64decode(r["url"].split("base64,", 1)[1])
        assert bytes(r["content_bytes"]) == expected
        # subpath = post subpath + (url,) (extractors/common.py:536-545)
        assert r["subpath"][-1] == r["url"]


def test_datauri_never_fetched(crawl):
    fetched = {r["url"] for r in crawl.pages().collect()}
    assert not any(u.startswith("data:") for u in fetched)
    seen = {r["seen_key"] for r in crawl.seen().collect()}
    assert not any(k.startswith("data:") for k in seen)


# --- W6: attachment join ------------------------------------------------------


def test_attachments_joined_to_owner_message(crawl, messages):
    items = _items(crawl)
    files = [r for r in crawl.items().collect()
             if r["type"] == "file" and r["subpath"] and len(r["subpath"]) == 2
             and r["content_bytes"] is not None]
    assert files, "need attachable files with content"
    msgs = {m["message_id"]: m for m in messages.collect()}
    for f in files:
        owner_full = tuple(f["path"]) + tuple(f["subpath"][:-1])
        mid = "<" + ".".join(owner_full) + ">"
        m = msgs[mid]
        assert m["n_attachments"] >= 1
        parsed = email.message_from_string(m["raw_message"])
        assert parsed.get_content_type() == "multipart/mixed"
        parts = parsed.get_payload()
        # part 0 is the html body; attachments follow in crawl order
        body_part = parts[0]
        assert body_part.get_content_type() == "text/html"
        atts = parts[1:]
        match = [
            p for p in atts
            if p.get("Content-Disposition", "").endswith(
                f"filename={quote_plus(f['url'])}")
        ]
        assert match, f"attachment for {f['url']} missing"
        payload = b64decode(match[0].get_payload())
        assert payload == bytes(f["content_bytes"])


def test_posts_without_files_stay_single_part(messages):
    rows = messages.filter("n_attachments = 0").collect()
    assert rows
    for m in rows[:5]:
        parsed = email.message_from_string(m["raw_message"])
        assert parsed.get_content_type() == "text/html"


# --- W4: real mailbox formats ---------------------------------------------------


@pytest.mark.parametrize("fmt", ["maildir", "mh", "babyl", "mmdf", "mbox"])
def test_mailbox_roundtrip(messages, tmp_path, fmt):
    out = str(tmp_path / fmt)
    n = export_mailbox(messages, out, fmt=fmt)
    assert n == messages.count()

    opener = {"maildir": mb.Maildir, "mh": mb.MH, "babyl": mb.Babyl,
              "mmdf": mb.MMDF, "mbox": mb.mbox}[fmt]
    box = opener(out)
    got_ids = set()

    def _walk(b):
        for m in b:
            got_ids.add(m["Message-ID"])
        for fname in getattr(b, "list_folders", lambda: [])():
            _walk(b.get_folder(fname))

    _walk(box)
    want_ids = {m["message_id"] for m in messages.collect()}
    assert got_ids == want_ids
    if fmt in ("maildir", "mh"):
        # posts live in board folders (FolderedMailWriter,
        # writers/common.py:400-430)
        assert box.list_folders()


# --- W2: WARC/1.0 ----------------------------------------------------------------


def test_warc_roundtrip(crawl, tmp_path, server):
    paths = export_warc(crawl.pages(), str(tmp_path / "warc"))
    assert len(paths) == 1
    recs = read_warc(paths[0])
    assert recs[0]["WARC-Type"] == "warcinfo"
    responses = [r for r in recs if r["WARC-Type"] == "response"]
    assert len(responses) == crawl.pages().count()
    # byte-exact body for a known page
    by_uri = {}
    for r in responses:
        by_uri.setdefault(r["WARC-Target-URI"], r)
    url = "https://phpbb.example/"
    _, _, body = server.get(url, None, 0)
    assert by_uri[url]["http_body"] == bytes(body)
    assert by_uri[url]["http_status"] == 200


def test_warc_multifile_ordered(crawl, tmp_path):
    paths = export_warc(crawl.pages(), str(tmp_path / "warcN"), num_files=3)
    total = sum(
        len([r for r in read_warc(p) if r["WARC-Type"] == "response"])
        for p in paths
    )
    assert total == crawl.pages().count()


# --- W5/U6: file materialization --------------------------------------------------


def test_export_files_quote_plus_naming(crawl, tmp_path):
    out = tmp_path / "files"
    export_files(crawl.items(), str(out))
    rows = [r for r in crawl.items().collect()
            if r["type"] == "file" and r["content_bytes"] is not None]
    assert rows
    for r in rows:
        p = out / quote_plus(r["url"])
        assert p.exists(), r["url"]
        assert p.read_bytes() == bytes(r["content_bytes"])
    # a fetched media file's bytes equal the fixture's deterministic payload
    fetched = [r for r in rows if r["url"].endswith(".png")
               and not r["url"].startswith("data:")]
    if fetched:
        path = fetched[0]["url"].split("phpbb.example")[-1]
        _, payload = media_bytes(SEED, path)  # fixture keys by "/img/..." path
        assert (out / quote_plus(fetched[0]["url"])).read_bytes() == payload
