"""End-to-end: the Spark crawl must match the sequential reference run.

Asserts the north-rule invariants (BASELINE.json):

1. crawl-order exact match — ``pages`` sorted by ``(ord, attempt)`` equals
   the reference's fetch trace (its ``--get-urls`` sequence,
   forum_dl/session.py:163-166);
2. URL-seen-set exact match (forum_dl/session.py:50-59 semantics);
3. item emission order + field equality vs the reference JSONL writer order
   (forum_dl/writers/common.py:100-129);
4. per-row span-sequence equality ``(kind, text, media_ref, order)`` for
   every post document.
"""

from __future__ import annotations

import json
from datetime import timezone

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.fixtures import SyntheticDiscourse
from forum_dl_spark.oracle import run_reference_discourse
from forum_dl_spark.spans import extract_spans

SEED_URL = "https://forum.example/"


@pytest.fixture(scope="module")
def server():
    return SyntheticDiscourse(
        seed=42, n_cats=2, n_subcats=2, n_topics=3, max_posts=45, topics_per_page=2
    )


@pytest.fixture(scope="module")
def oracle(server):
    return run_reference_discourse(server, SEED_URL)


@pytest.fixture(scope="module")
def crawl(spark, server, tmp_path_factory):
    wd = tmp_path_factory.mktemp("crawl_discourse")
    return run_crawl(spark, server, SEED_URL, str(wd / "run"), CrawlConfig())


def test_crawl_order_exact(crawl, oracle):
    got = [
        (r["url"], r["params"] or "")
        for r in crawl.pages().orderBy("ord", "attempt").collect()
    ]
    assert got == oracle.trace


def test_seen_set_exact(crawl, oracle):
    got = {(r["seen_key"], r["status"]) for r in crawl.seen().collect()}
    want = set(oracle.seen.items())
    assert got == want


def _norm_time(dt):
    if dt is None:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def test_items_order_and_fields(crawl, oracle):
    rows = crawl.items().orderBy("ord").collect()
    assert len(rows) == len(oracle.items)
    for got, want in zip(rows, oracle.items):
        assert got["type"] == want.type
        assert tuple(got["path"]) == want.path
        assert tuple(got["subpath"] or ()) == want.subpath
        assert got["url"] == want.url
        assert got["origin"] == want.origin
        assert got["title"] == want.title
        assert got["author"] == want.author
        assert _norm_time(got["creation_time"]) == _norm_time(want.creation_time)
        assert got["content"] == want.content
        if want.data is not None:
            assert json.loads(got["data"]) == want.data


def test_span_sequence_equality(crawl, oracle):
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in crawl.documents().collect()
    }
    posts = [i for i in oracle.items if i.type == "post"]
    # the duplicate topic's posts are emitted once (seen gate) — doc_ids unique
    assert len(got) == len(posts)
    for p in posts:
        doc_id = ".".join(p.path + p.subpath)
        want = [
            (s.kind, s.text, s.media_ref, s.offset)
            for s in extract_spans(p.content or "", p.origin)
        ]
        assert got[doc_id] == want, doc_id


def test_media_spans_present(crawl):
    # the fixture interleaves media deterministically; make sure the payload
    # actually exercises the interleaved path
    from pyspark.sql import functions as F

    docs = crawl.documents()
    n_media = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .count()
    )
    assert n_media > 50


def test_metrics_recorded(crawl):
    m = crawl.metrics()
    assert len(m) >= 4  # detection + several waves
    assert sum(x.get("fetched_ok", 0) for x in m[1:]) > 0
