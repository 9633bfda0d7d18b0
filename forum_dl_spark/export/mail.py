"""Mail export — RFC-822 message building as a dataflow job.

Mirrors forum_dl/writers/common.py:355-396 (MailWriter._build_message):

- ``Message-ID = "<" + ".".join(path + subpath) + ">"`` (line 361)
- ``In-Reply-To`` = parent prefix when ``len(path+subpath) >= 2`` (374-375)
- ``Date`` = RFC-2822 from creation_time (363-365)
- ``From`` = author, or ``author <author@host>`` with author_as_addr_spec
  (367-372)
- ``Subject`` = thread title (384), or the first textified content line
  with content_as_title (381-383)
- body = post HTML, or textified (391-394)
- folder (Maildir/MH/Babyl/MMDF variants) = ".".join(board path) =
  path[:-1] joined (writers/common.py:410-411) → a ``partitionBy(folder)``
  write

Everything is built with JVM-side expressions; only textify is a pandas
UDF (html2text is absent here — the reference itself import-guards it,
writers/common.py:19-22 — so a deterministic tag-stripping equivalent is
used)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def textify_html(html: str) -> str:
    """Deterministic html2text stand-in: text spans separated by blank
    lines, media as markdown images."""
    from ..spans import extract_spans

    parts = []
    for s in extract_spans(html or "", ""):
        if s.kind == "text":
            parts.append(s.text)
        else:
            parts.append(f"![]({s.media_ref})")
    return "\n\n".join(parts)


def _textify_udf():
    # built lazily: pandas_udf needs an active SparkSession
    @F.pandas_udf("string")
    def udf(html: pd.Series) -> pd.Series:
        return html.map(textify_html)

    return udf


def build_messages(
    items: DataFrame,
    base_host: str,
    *,
    textify: bool = False,
    content_as_title: bool = False,
    author_as_addr_spec: bool = False,
    foldered: bool = False,
) -> DataFrame:
    """posts (+thread titles) → one message row per post."""
    posts = items.filter(F.col("type") == "post")
    threads = items.filter(F.col("type") == "thread").select(
        F.col("path").alias("t_path"), F.col("title").alias("thread_title")
    ).dropDuplicates(["t_path"])

    msg = posts.join(threads, posts.path == threads.t_path, "left").drop("t_path")
    full_path = F.concat(F.col("path"), F.coalesce(F.col("subpath"), F.array()))
    msg = msg.withColumn("_full", full_path)
    msg = msg.withColumn(
        "message_id", F.concat(F.lit("<"), F.array_join("_full", "."), F.lit(">"))
    )
    msg = msg.withColumn(
        "in_reply_to",
        F.when(
            F.size("_full") >= 2,
            F.concat(
                F.lit("<"),
                F.array_join(F.slice("_full", 1, F.size("_full") - 1), "."),
                F.lit(">"),
            ),
        ),
    )
    msg = msg.withColumn(
        "date_rfc2822",
        F.date_format(F.col("creation_time"), "EEE, dd MMM yyyy HH:mm:ss Z"),
    )
    if author_as_addr_spec:
        msg = msg.withColumn(
            "from_header",
            F.format_string("%s <%s@%s>", F.col("author"), F.col("author"),
                            F.lit(base_host)),
        )
    else:
        msg = msg.withColumn("from_header", F.col("author"))
    tx = _textify_udf() if (content_as_title or textify) else None
    if content_as_title:
        msg = msg.withColumn(
            "subject",
            F.split(tx(F.substring(F.col("content"), 1, 98)), "\n")[0],
        )
    else:
        msg = msg.withColumn("subject", F.col("thread_title"))
    body = tx(F.col("content")) if textify else F.col("content")
    msg = msg.withColumn("body", body)
    if foldered:
        msg = msg.withColumn(
            "folder",
            F.array_join(F.slice(F.col("path"), 1, F.size("path") - 1), "."),
        )
    raw = F.concat_ws(
        "\r\n",
        F.concat(F.lit("Message-ID: "), F.col("message_id")),
        F.concat(F.lit("Content-Location: "), F.col("url")),
        F.when(F.col("in_reply_to").isNotNull(),
               F.concat(F.lit("In-Reply-To: "), F.col("in_reply_to"))),
        F.concat(F.lit("Date: "), F.coalesce(F.col("date_rfc2822"), F.lit(""))),
        F.concat(F.lit("From: "), F.coalesce(F.col("from_header"), F.lit(""))),
        F.concat(F.lit("Subject: "), F.coalesce(F.col("subject"), F.lit(""))),
        F.lit("MIME-Version: 1.0"),
        F.lit('Content-Type: text/html; charset="utf-8"'),
        F.lit(""),
        F.coalesce(F.col("body"), F.lit("")),
    )
    cols = ["ord", "message_id", "in_reply_to", "subject", "from_header",
            "date_rfc2822", "body"]
    if foldered:
        cols.append("folder")
    return msg.withColumn("raw_message", raw).select(*cols, "raw_message")


def export_mbox(messages: DataFrame, out_path: str) -> None:
    """Ordered single-file mbox-style export (verification sink)."""
    (
        messages.orderBy("ord")
        .select(F.concat(F.lit("From -\r\n"), F.col("raw_message")).alias("m"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(out_path)
    )


def export_maildir_partitioned(messages: DataFrame, out_path: str) -> None:
    """FolderedMailWriter equivalent: partitionBy(folder) columnar write."""
    messages.write.mode("overwrite").partitionBy("folder").parquet(out_path)
