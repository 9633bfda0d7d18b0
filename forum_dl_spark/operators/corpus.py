"""Crawl→pipeline corpus bridge.

The crawl engine emits interleaved-span documents (north-rule payload:
``doc_id: string ord``, ``spans: array<struct<kind,text,media_ref,offset>>``);
the training-data operators consume the flat ``documents`` shape
(``doc_id, text, lang, source, n_chars``). ``corpus_from_crawl`` is the
bridge: one narrow projection that flattens the text spans in offset order
and derives a portable 63-bit doc key from the ord string (same
md5-substring recipe as stratified_sample — no global row_number, which
would be a total-order sort at 100 TB).

``crawl_corpus_quality`` is the end-to-end driver smoke: tiny fixture crawl
→ bridge → the same quality/fingerprint signals the corpus operators
compute — proving a user can feed the crawler's output straight into the
pipeline half of the engine. Rows-only (iterative stateful crawl, not
SQL-expressible), like the other two crawl smokes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def corpus_from_crawl(docs: DataFrame, source: str) -> DataFrame:
    """Flatten crawl documents into the pipeline ``documents`` schema.

    - ``text``: text spans concatenated in span order (media spans become
      nothing — their refs live in the items table), single-space joined
      like the reference's textified post bodies.
    - ``doc_id``: deterministic 63-bit key from md5(ord-string) — portable
      (same value in DuckDB via the conv/substring recipe) and
      shuffle-free; ``crawl_doc_id`` keeps the original ord for joins back
      to the crawl tables.
    - ``lang``: 'und' (the crawler does not language-tag; run lang_id on
      the bridged table for that).
    """
    text = F.expr(
        "concat_ws(' ', transform(filter(spans, s -> s.kind = 'text'),"
        " s -> s.text))"
    )
    return docs.select(
        F.expr(
            "cast(conv(substring(md5(doc_id), 1, 15), 16, 10) as bigint)"
        ).alias("doc_id"),
        F.col("doc_id").alias("crawl_doc_id"),
        text.alias("text"),
        F.lit("und").alias("lang"),
        F.lit(source).alias("source"),
        F.length(text).alias("n_chars"),
    )


def crawl_corpus_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny end-to-end crawl bridged into the corpus schema with quality +
    exact-dup signals computed on the REAL crawler output (not the
    synthetic parquet): per bridged document, integer-basis-point alpha
    ratio, token count, whitespace-normalized fingerprint, and whether the
    fingerprint repeats within the crawl (the exact-dedup predicate). The
    producing crawl is session-memoized and shared with
    crawl_discourse_spans / pagerank_crawl (operators/_fixture.py)."""
    from pyspark.sql import Window

    from ._fixture import fixture_discourse_crawl

    res = fixture_discourse_crawl(spark)
    corpus = corpus_from_crawl(res.documents(), source="discourse")

    fp = F.md5(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    w = Window.partitionBy("fingerprint")
    return (
        corpus.select(
            "doc_id",
            "crawl_doc_id",
            "n_chars",
            F.expr(r"size(filter(split(text, '\\s+'), x -> x != ''))")
            .cast("bigint")
            .alias("n_tokens"),
            F.expr(
                "cast((10000L * length(regexp_replace(text, '[^a-zA-Z]', '')))"
                " div greatest(length(text), 1) as bigint)"
            ).alias("alpha_bp"),
            fp.alias("fingerprint"),
        )
        .withColumn("n_copies", F.count("*").over(w).cast("bigint"))
    )


def recrawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-recrawl smoke: crawl a tiny fixture, edit exactly ONE
    post, re-open its thread page via ``recrawl_reopen``, and return
    ``CrawlResult.diff(k1, k2)`` — the Iceberg-style incremental read
    between the pre- and post-recrawl snapshots. Expected payload: exactly
    one 'changed' row for the edited post (pinned with full crawl-order
    equality in tests/test_recrawl_diff.py; the refresh fetches exactly
    one page because every unchanged child is dropped by the URL-seen
    gate). Rows-only like the other crawl smokes (two iterative stateful
    crawls); the crawl pair is session-memoized (operators/_fixture.py)."""
    from ._fixture import fixture_recrawl_pair

    res2, k1, k2 = fixture_recrawl_pair(spark)
    return res2.diff(k1, k2).select("change", "type", "url")


def sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-pair EMIT: the training-data product a forum crawl
    uniquely provides — (prompt, response) adjacent-turn pairs from the
    crawl's REAL thread structure, the raw material for SFT/dialogue
    corpora. For each thread, post k is paired with post k+1 in reference
    emission order (``ord`` — fixed-width hex, so string order == the
    reference's sequential crawl order); ``turn`` is the 0-based pair
    index. Text is the flattened text-span sequence (same kernel as
    ``corpus_from_crawl``). Discourse topics are linear reply chains so
    adjacency IS the reply relation; tree-shaped engines (the mail
    family) would instead join on the parent subpath — same plan, one
    extra projection.

    Scale shape: ONE thread-keyed exchange; both lag() columns and the
    row_number ride a single window spec (one sort). Threads are
    pagination-bounded, so per-key skew is capped by the engine itself.
    Rows-only like the other crawl smokes (iterative stateful crawl);
    the pairing is pinned against the reference simulation's item list in
    tests/test_sft_pairs.py. Reference parity: forum-dl emits posts in
    this exact order into its writers (extractors/common.py traversal);
    the pairing is the downstream-consumer step the reference stops
    short of."""
    from pyspark.sql import Window

    from ._fixture import fixture_discourse_crawl

    res = fixture_discourse_crawl(spark)
    text = F.expr(
        "concat_ws(' ', transform(filter(spans, s -> s.kind = 'text'),"
        " s -> s.text))"
    )
    posts = (
        res.items()
        .filter(F.col("type") == "post")
        .select(
            F.array_join("path", ".").alias("thread_id"),
            F.col("ord"),
            F.col("author"),
            text.alias("text"),
        )
    )
    w = Window.partitionBy("thread_id").orderBy("ord")
    return (
        posts.select(
            "thread_id",
            (F.row_number().over(w) - 2).cast("long").alias("turn"),
            F.lag("author").over(w).alias("prompt_author"),
            F.lag("text").over(w).alias("prompt_text"),
            F.col("author").alias("response_author"),
            F.col("text").alias("response_text"),
        )
        .filter(F.col("turn") >= 0)
    )


def sft_pairs_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sft_pairs``' tree-shaped sibling for the threaded-mail family:
    (prompt, response) pairs follow the REAL reply relation — each reply
    post joins its parent by subpath chain (parent = the post whose
    subpath is the reply's minus its last element; thread roots have
    empty subpaths and act only as prompts). This is the conversation
    structure the mail engines reconstruct (P9, mailthread stack
    replay), consumed as training pairs.

    Scale shape: ONE equi-join keyed (thread_id, parent_key) — reply
    depth never multiplies rows (each post has exactly one parent), and
    thread keys bound the shuffle the same way the pagination bound does
    for the linear pairing. Rows-only like the other crawl smokes;
    pinned against the HyperKitty reference simulation's subpath tree in
    tests/test_sft_pairs.py."""
    from ._fixture import fixture_hyperkitty_crawl

    res = fixture_hyperkitty_crawl(spark)
    text = F.expr(
        "concat_ws(' ', transform(filter(spans, s -> s.kind = 'text'),"
        " s -> s.text))"
    )
    posts = (
        res.items()
        .filter(F.col("type") == "post")
        .select(
            F.array_join("path", ".").alias("thread_id"),
            F.coalesce(F.col("subpath"), F.expr("array()")).alias("subpath"),
            F.col("author"),
            text.alias("text"),
        )
    )
    children = posts.filter(F.size("subpath") > 0).select(
        "thread_id",
        F.expr(
            "array_join(slice(subpath, 1, size(subpath) - 1), '.')"
        ).alias("parent_key"),
        F.expr("array_join(subpath, '.')").alias("response_key"),
        F.col("author").alias("response_author"),
        F.col("text").alias("response_text"),
    )
    parents = posts.select(
        "thread_id",
        F.expr("array_join(subpath, '.')").alias("parent_key"),
        F.col("author").alias("prompt_author"),
        F.col("text").alias("prompt_text"),
    )
    return children.join(parents, ["thread_id", "parent_key"]).select(
        "thread_id",
        "response_key",
        "prompt_author",
        "prompt_text",
        "response_author",
        "response_text",
    )


QUERIES = {
    "crawl_corpus_quality": crawl_corpus_quality,
    "recrawl_delta": recrawl_delta,
    "sft_pairs": sft_pairs,
    "sft_pairs_tree": sft_pairs_tree,
}

# rows-only: the producing crawl is iterative/stateful (see module
# docstring); the bridged columns themselves are pinned exact by
# tests/test_corpus_bridge.py against an independently-computed expectation.
ORACLES: dict[str, str] = {}
