"""Command-line driver: crawl arbitrary forum URLs and export.

Mirrors the reference's entry point (forum_dl/forumdl.py:15–48 +
forum_dl/options.py:11–195): ``forum-dl URL... -f FORMAT [-o PATH]``, one
independent crawl per seed URL — the reference builds a fresh ``Session``
(fresh URL-seen state) per URL, realized here as a fresh crawl workdir and
seen-set per seed. The default output path is ``quote_plus(url)``
(forumdl.py:44).

Usage:
    python -m forum_dl_spark https://forum.example/ -f jsonl
    python -m forum_dl_spark URL -f maildir -o out/ --author-as-addr-spec
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from urllib.parse import quote_plus, urlparse

OUTPUT_FORMATS = (
    "jsonl", "mbox", "maildir", "mh", "babyl", "mmdf", "warc", "parquet"
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="forum-dl-spark", add_help=True)
    general = p.add_argument_group("General Options")
    general.add_argument("--list-extractors", action="store_true",
                         help="List supported engines and exit")
    general.add_argument("--list-output-formats", action="store_true",
                         help="List output formats and exit")

    session = p.add_argument_group("Session Options")
    session.add_argument("--timeout", type=float, default=5.0,
                         help="HTTP timeout seconds (default: 5)")
    session.add_argument("-R", "--retries", type=int, default=4,
                         help="Max retries for failed requests (default: 4)")
    session.add_argument("--retry-sleep", type=float, default=0.0,
                         help="In-worker backoff base seconds (default: 0 — "
                              "the superstep boundary already spaces retries)")
    session.add_argument("--retry-sleep-multiplier", type=float, default=2.0)
    session.add_argument("--user-agent", default=None)

    output = p.add_argument_group("Output Options")
    output.add_argument("-o", "--output", default=None,
                        help="Output path (default: quote_plus(URL))")
    output.add_argument("-f", "--output-format", default="jsonl",
                        choices=OUTPUT_FORMATS)
    output.add_argument("--files-output", default="",
                        help="Also materialize embedded files into DIR")
    output.add_argument("--warc-output", default="",
                        help="Also record fetches into DIR as WARC/1.0")
    output.add_argument("--textify", action="store_true")
    output.add_argument("--content-as-title", action="store_true")
    output.add_argument("--author-as-addr-spec", action="store_true")

    sparkgrp = p.add_argument_group("Spark Options")
    sparkgrp.add_argument("--master", default="local[*]")
    sparkgrp.add_argument("--workdir", default=None,
                          help="Crawl state root (default: temp dir)")

    p.add_argument("urls", metavar="URL", nargs="*")
    return p


def _export(res, url: str, args, spark) -> str:
    from .export.files import export_files
    from .export.jsonl import export_jsonl
    from .export.mail import build_messages, export_mailbox
    from .export.warc import export_warc

    out = args.output or quote_plus(url)  # forumdl.py:44
    fmt = args.output_format
    if fmt == "jsonl":
        export_jsonl(res.items(), res.engine, out)
    elif fmt == "parquet":
        res.items().write.mode("overwrite").parquet(out)
    elif fmt == "warc":
        export_warc(res.pages(), out)
    else:
        msgs = build_messages(
            res.items(),
            urlparse(url).netloc,
            textify=args.textify,
            content_as_title=args.content_as_title,
            author_as_addr_spec=args.author_as_addr_spec,
            foldered=fmt in ("maildir", "mh", "babyl", "mmdf"),
        )
        export_mailbox(msgs, out, fmt=fmt)
    if args.files_output:
        export_files(res.items(), args.files_output)
    if args.warc_output:
        export_warc(res.pages(), args.warc_output)
    return out


def download(urls: list[str], args, server=None, spark=None) -> list[str]:
    """One fresh crawl (fresh seen set / workdir) per seed URL — the
    reference's per-URL fresh Session semantics (forumdl.py:15–31)."""
    from .crawl import CrawlConfig, run_crawl
    from .crawl.http import HttpServer, validate_url
    from .session import get_spark

    spark = spark or get_spark(master=args.master)
    written: list[str] = []
    for i, url in enumerate(urls):
        if server is None and not validate_url(url):
            print(f"skipping invalid URL {url!r}", file=sys.stderr)
            continue
        srv = server or HttpServer(
            timeout=args.timeout,
            user_agent=args.user_agent or "Forum-dl 0.3.0 (spark)",
            retry_sleep=args.retry_sleep,
            retry_sleep_multiplier=args.retry_sleep_multiplier,
        )
        root = args.workdir or tempfile.mkdtemp(prefix="forum_dl_spark_")
        try:
            res = run_crawl(
                spark, srv, url, f"{root}/crawl-{i:03d}",
                CrawlConfig(retries=args.retries),
            )
        except ValueError as e:
            # no engine detected — the reference skips silently
            # (forumdl.py:40: `if extractor:`); we at least say so
            print(f"{url}: {e}", file=sys.stderr)
            continue
        written.append(_export(res, url, args, spark))
    return written


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.list_extractors:
        from .engines import ENGINES

        print("\n".join(sorted(ENGINES)))
        return 0
    if args.list_output_formats:
        print("\n".join(OUTPUT_FORMATS))
        return 0
    if not args.urls:
        print("no URLs given (see --help)", file=sys.stderr)
        return 2
    written = download(args.urls, args)
    for w in written:
        print(w)
    return 0 if written else 1
