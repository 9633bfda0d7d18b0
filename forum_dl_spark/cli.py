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
    from . import __version__

    general = p.add_argument_group("General Options")
    general.add_argument("--version", action="version", version=__version__,
                         help="Print program version and exit")
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
    output.add_argument("-g", "--get-urls", action="store_true",
                        help="Print fetched URLs instead of writing output "
                             "(reference options.py:97-103)")
    output.add_argument("-o", "--output", default=None,
                        help="Output path; '-' writes jsonl to stdout "
                             "(default: quote_plus(URL))")
    output.add_argument("-f", "--output-format", default="jsonl",
                        choices=OUTPUT_FORMATS)
    output.add_argument("--files-output", default="",
                        help="Also materialize embedded files into DIR")
    output.add_argument("--warc-output", default="",
                        help="Also record fetches into DIR as WARC/1.0 "
                             "(per-seed subdirectories on multi-URL runs)")
    # item-class gating quartet (reference options.py:134-167; enforcement
    # writers/common.py:101-145)
    output.add_argument("--boards", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="Write board objects (--no-boards to negate)")
    output.add_argument("--threads", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="Write thread objects (--no-threads to negate)")
    output.add_argument("--posts", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="Write post objects (--no-posts to negate)")
    output.add_argument("--files", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="Write embedded files (--no-files to negate)")
    output.add_argument("--outside-files", default=False,
                        action=argparse.BooleanOptionalAction,
                        help="Write embedded files outside post content; "
                             "auto-enabled by --warc-output and -f warc "
                             "(reference __init__.py:31-32)")
    output.add_argument("--textify", action="store_true")
    output.add_argument("--content-as-title", action="store_true")
    output.add_argument("--author-as-addr-spec", action="store_true")

    sparkgrp = p.add_argument_group("Spark Options")
    sparkgrp.add_argument("--master", default="local[*]")
    sparkgrp.add_argument("--workdir", default=None,
                          help="Crawl state root (default: temp dir)")
    sparkgrp.add_argument("--shared-frontier", action="store_true",
                          help="Crawl all URLs with ONE shared frontier + "
                               "seen set (scale mode; default is the "
                               "reference's fresh-session-per-URL)")
    sparkgrp.add_argument("--seen-sketch", choices=("bloom", "cuckoo"),
                          default="bloom",
                          help="Prefilter sketch for the URL-seen anti-join "
                               "once it auto-engages (cuckoo supports "
                               "deletion and tracks the exact gating set)")
    sparkgrp.add_argument("--salt-pop", type=int, default=0, metavar="S",
                          help="Salted two-phase per-host pop: rank within "
                               "S salt partitions before the exact re-rank "
                               "(skew defense for mega-hosts; 0 = off)")

    p.add_argument("urls", metavar="URL", nargs="*")
    return p


def _gate_items(items, args, write_outside: bool):
    """Item-class gating: the reference's write_*_objects checks
    (writers/common.py:101-103, 126-127, 135-145). A file item with an
    empty ``path`` sits outside any post's content and is written only
    under --outside-files (common.py:135-137)."""
    from pyspark.sql import functions as F

    keep = F.lit(False)
    for flag, typ in ((args.boards, "board"), (args.threads, "thread"),
                      (args.posts, "post")):
        if flag:
            keep = keep | (F.col("type") == typ)
    if args.files:
        in_post = F.size(F.coalesce(F.col("path"), F.array())) > 0
        keep = keep | (
            (F.col("type") == "file")
            & (in_post if not write_outside else F.lit(True))
        )
    return items.filter(keep)


def _export(res, url: str, args, spark, seed_suffix: str = "") -> str:
    from .export.files import export_files
    from .export.jsonl import export_jsonl, items_to_entries
    from .export.mail import build_messages, export_mailbox
    from .export.warc import export_warc

    out = args.output or quote_plus(url)  # forumdl.py:44
    fmt = args.output_format
    if seed_suffix and args.output and out != "-":
        out = f"{out.rstrip('/')}/{seed_suffix}"
    # -f warc writes fetch records to -o; either WARC sink force-enables
    # outside files (reference __init__.py:31-32)
    warc_out = out if fmt == "warc" else args.warc_output
    write_outside = args.outside_files or bool(warc_out)
    items = _gate_items(res.items(), args, write_outside)
    if out == "-":
        if fmt != "jsonl":
            raise SystemExit(
                f"-o - (stdout) supports only -f jsonl, not {fmt!r}"
            )
        # stdout is a single driver-side stream by nature: iterate the
        # ordered entries without materializing them all (FileWriter's
        # stdout branch, writers/common.py:217-235)
        for row in (
            items_to_entries(items, res.engine)
            .orderBy("ord")
            .select("line")
            .toLocalIterator()
        ):
            sys.stdout.write(row["line"] + "\n")
    elif fmt == "jsonl":
        export_jsonl(items, res.engine, out)
    elif fmt == "parquet":
        items.write.mode("overwrite").parquet(out)
    elif fmt == "warc":
        export_warc(res.pages(), out)
    else:
        msgs = build_messages(
            items,
            urlparse(url).netloc,
            textify=args.textify,
            content_as_title=args.content_as_title,
            author_as_addr_spec=args.author_as_addr_spec,
            foldered=fmt in ("maildir", "mh", "babyl", "mmdf"),
        )
        export_mailbox(msgs, out, fmt=fmt)
    if args.files_output:
        export_files(items, args.files_output)
    if args.warc_output:
        # per-seed subdirectory: multi-URL runs must not clobber earlier
        # seeds' records (part files carry fixed names)
        wout = args.warc_output
        if seed_suffix:
            wout = f"{wout.rstrip('/')}/{seed_suffix}"
        export_warc(res.pages(), wout)
    return out


def download(urls: list[str], args, server=None, spark=None) -> list[str]:
    """One fresh crawl (fresh seen set / workdir) per seed URL — the
    reference's per-URL fresh Session semantics (forumdl.py:15–31)."""
    from .crawl import CrawlConfig, run_crawl
    from .crawl.http import HttpServer, validate_url
    from .session import get_spark

    spark = spark or get_spark(master=args.master)
    written: list[str] = []
    if getattr(args, "shared_frontier", False):
        from .crawl import run_crawl_shared

        urls = [u for u in urls if server is not None or validate_url(u)]
        if not urls:
            return []
        srv = server or HttpServer(
            timeout=args.timeout,
            user_agent=args.user_agent or "Forum-dl 0.3.0 (spark)",
            retry_sleep=args.retry_sleep,
            retry_sleep_multiplier=args.retry_sleep_multiplier,
        )
        root = args.workdir or tempfile.mkdtemp(prefix="forum_dl_spark_")
        res = run_crawl_shared(
            spark, srv, urls, f"{root}/crawl-shared",
            CrawlConfig(retries=args.retries, sketch=args.seen_sketch,
                        salt_pop=args.salt_pop),
        )
        if getattr(args, "get_urls", False):
            for row in (res.pages().orderBy("ord", "attempt").select("url")
                        .toLocalIterator()):
                print(row["url"])
            return ["-"]
        # one combined export: ord-sorted = (seed order, per-seed DFS)
        return [_export(res, urls[0], args, spark)]
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
                CrawlConfig(retries=args.retries, sketch=args.seen_sketch,
                        salt_pop=args.salt_pop),
            )
        except ValueError as e:
            # no engine detected — the reference skips silently
            # (forumdl.py:40: `if extractor:`); we at least say so
            print(f"{url}: {e}", file=sys.stderr)
            continue
        if getattr(args, "get_urls", False):
            # -g/--get-urls: print the fetch trace instead of writing output
            # (reference session.py:163-166 prints each URL pre-GET and
            # installs a SimulatedWriter, writers/__init__.py:22-23). The
            # BSP equivalent is the ord-sorted pages trace — one line per
            # fetch attempt, probes and retries included.
            for row in (
                res.pages().orderBy("ord", "attempt").select("url")
                .toLocalIterator()
            ):
                print(row["url"])
            written.append("-")
            continue
        # default output (quote_plus(url)) is already per-seed unique; an
        # explicit -o or --warc-output on a multi-URL run gets a per-seed
        # subdirectory so later seeds never clobber earlier ones
        suffix = quote_plus(url) if len(urls) > 1 else ""
        if not args.output and not args.warc_output:
            suffix = ""
        written.append(_export(res, url, args, spark, seed_suffix=suffix))
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
    if not args.get_urls:
        for w in written:
            if w != "-":
                print(w)
    return 0 if written else 1
