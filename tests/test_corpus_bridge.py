"""Pins for the crawl→pipeline corpus bridge (operators/corpus.py).

The driver gate records crawl_corpus_quality rows-only (the producing crawl
is iterative); these tests supply the exactness a hash row would have:

- the bridged text IS the span texts joined in span order (recomputed
  independently row-by-row from the crawl's documents table),
- doc_id is the portable md5-derived 63-bit key (recomputed with hashlib),
- the dup/quality columns agree with a python recomputation.
"""

from __future__ import annotations

import hashlib
import re
import tempfile

SF = "/root/testdata/sf0.001"


def _tiny_crawl(spark):
    from forum_dl_spark.crawl import CrawlConfig, run_crawl
    from forum_dl_spark.fixtures import SyntheticDiscourse

    srv = SyntheticDiscourse(
        seed=7, n_cats=1, n_subcats=1, n_topics=2, max_posts=25,
        topics_per_page=2, duplicate_topic=False,
    )
    wd = tempfile.mkdtemp(prefix="corpus_bridge_")
    return run_crawl(spark, srv, "https://forum.example/", wd, CrawlConfig())


def _expected_key(ord_str: str) -> int:
    return int(hashlib.md5(ord_str.encode()).hexdigest()[:15], 16)


def test_bridge_text_and_key_exact(spark):
    from forum_dl_spark.operators.corpus import corpus_from_crawl

    res = _tiny_crawl(spark)
    raw = {r.doc_id: r.spans for r in res.documents().collect()}
    assert raw, "crawl produced no documents"

    bridged = {r.crawl_doc_id: r for r in
               corpus_from_crawl(res.documents(), "discourse").collect()}
    assert set(bridged) == set(raw)
    n_media_docs = 0
    for ord_str, spans in raw.items():
        b = bridged[ord_str]
        expect_text = " ".join(s.text for s in spans if s.kind == "text")
        assert b.text == expect_text, ord_str
        assert b.doc_id == _expected_key(ord_str)
        assert b.n_chars == len(expect_text)
        assert b.source == "discourse" and b.lang == "und"
        if any(s.kind == "media" for s in spans):
            n_media_docs += 1
    # media spans are dropped from text (their refs live in items), and the
    # fixture must actually exercise that branch
    assert n_media_docs > 0


def test_crawl_corpus_quality_matches_python_recompute(spark):
    from forum_dl_spark.operators.corpus import (corpus_from_crawl,
                                                 crawl_corpus_quality)

    res = _tiny_crawl(spark)
    texts = {r.crawl_doc_id: r.text for r in
             corpus_from_crawl(res.documents(), "discourse").collect()}

    rows = {r.crawl_doc_id: r for r in crawl_corpus_quality(spark, SF).collect()}
    assert set(rows) == set(texts)

    fps: dict[str, int] = {}
    for t in texts.values():
        fp = hashlib.md5(re.sub(r"\s+", " ", t.strip()).encode()).hexdigest()
        fps[fp] = fps.get(fp, 0) + 1
    for ord_str, t in texts.items():
        r = rows[ord_str]
        assert r.n_tokens == len([x for x in re.split(r"\s+", t) if x])
        alpha = len(re.sub(r"[^a-zA-Z]", "", t))
        assert r.alpha_bp == (10000 * alpha) // max(len(t), 1)
        fp = hashlib.md5(re.sub(r"\s+", " ", t.strip()).encode()).hexdigest()
        assert r.fingerprint == fp
        assert r.n_copies == fps[fp]
