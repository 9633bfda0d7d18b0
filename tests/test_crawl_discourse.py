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


# --- subtree seeding: node_from_url semantics (discourse.py:112-157) --------


def _tables(res):
    pages = [
        (r["url"], r["params"] or "")
        for r in res.pages().orderBy("ord", "attempt").collect()
    ]
    seen = {(r["seen_key"], r["status"]) for r in res.seen().collect()}
    items = [
        (r["type"], tuple(r["path"]), tuple(r["subpath"] or ()), r["url"],
         r["origin"], r["title"], r["content"])
        for r in res.items().orderBy("ord").collect()
    ]
    return pages, seen, items


def _oracle_tables(o):
    items = [
        (i.type, i.path, i.subpath, i.url, i.origin, i.title, i.content)
        for i in o.items
    ]
    return o.trace, set(o.seen.items()), items


@pytest.mark.parametrize("rel", [
    "c/cat1-sub2/1012",       # subcategory board URL
    "c/cat2/102",             # top-level category board URL
    "c/cat2/102.json",        # .json form is stripped (discourse.py:113)
])
def test_board_seed_crawls_only_subtree(spark, server, tmp_path, rel):
    """A board-URL seed writes ONLY that board's subtree — trace, seen set
    and item emission all equal the reference's write(seed) run."""
    seed = f"https://forum.example/{rel}"
    oracle = run_reference_discourse(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / "sub"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    # and it is a strict subset of the full crawl's boards
    types = {r["type"] for r in res.items().collect()}
    assert "board" in types
    paths = {tuple(r["path"]) for r in res.items().collect()}
    sub_root = tuple(rel.removesuffix(".json").split("/")[-1:])
    assert all(p[: 1] == (sub_root[0],) or p[1:2] == sub_root
               for p in paths if p)


def test_thread_seed_crawls_only_thread(spark, server, tmp_path):
    """A topic-URL seed writes just that thread (+posts); the t/<id>.json
    fetch is consumed once by the post walk -> evicted from seen."""
    seed = "https://forum.example/t/101001"
    oracle = run_reference_discourse(server, seed)
    res = run_crawl(spark, server, seed, str(tmp_path / "tseed"), CrawlConfig())
    assert _tables(res) == _oracle_tables(oracle)
    items = res.items().orderBy("ord").collect()
    assert items[0]["type"] == "thread"
    assert {r["type"] for r in items} == {"thread", "post"}
    # cached-consume eviction: the topic json is absent from final seen
    assert not any(
        k.endswith("/t/101001.json") for k, _ in
        ((r["seen_key"], r["status"]) for r in res.seen().collect())
    )
