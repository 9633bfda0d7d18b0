"""Real-HTTP backend + CLI integration.

A localhost ``http.server`` serves the synthetic phpBB fixture; the crawl
runs through the requests-backed ``HttpServer`` adapter and must reproduce
the in-process fixture crawl's exact fetch trace, seen set, and items —
proving the adapter honors the server protocol (status/content-type/body,
FetchError on transport failure) byte-for-byte.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse

import pytest

from forum_dl_spark.crawl import CrawlConfig, run_crawl
from forum_dl_spark.crawl.http import HttpServer, validate_url
from forum_dl_spark.fixtures.phpbb import SyntheticPhpbb
from forum_dl_spark.fixtures.remap import HostRemap as _HostRemap
from forum_dl_spark.oracle.session import FetchError


@pytest.fixture(scope="module")
def fixture_server():
    return SyntheticPhpbb(seed=42, n_cats=1, n_subs=1, n_topics=2, max_posts=4)


@pytest.fixture(scope="module")
def http_base(fixture_server):
    """Localhost HTTP bridge over the fixture. Paths under /__fail/N/ close
    the connection N times before serving (transport-failure simulation)."""
    fail_counts: dict[str, int] = {}
    state = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            path = self.path
            if path.startswith("/__fail/"):
                _, _, n, rest = path.split("/", 3)
                key = "/" + rest
                left = fail_counts.setdefault(key, int(n))
                if left > 0:
                    fail_counts[key] = left - 1
                    self.connection.close()  # abrupt: requests -> ConnectionError
                    return
                path = key
            remap = _HostRemap(fixture_server, state["base"])
            try:
                status, ctype, body = remap.get(f"{state['base'].rstrip('/')}{path}")
            except FetchError:
                self.connection.close()
                return
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    state["base"] = f"http://127.0.0.1:{httpd.server_address[1]}/"
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield state["base"]
    httpd.shutdown()


def test_validate_url():
    assert validate_url("https://example.com/x")
    assert validate_url("http://example.com")
    assert not validate_url("ftp://example.com/x")
    assert not validate_url("data:image/png;base64,AAAA")
    assert not validate_url("not a url")


def test_http_adapter_reproduces_exact_trace(spark, fixture_server, http_base,
                                             tmp_path):
    # in-process run at the SAME base (host-remapped fixture)
    ref = run_crawl(
        spark, _HostRemap(fixture_server, http_base), http_base,
        str(tmp_path / "inproc"), CrawlConfig(),
    )
    # real-HTTP run through the requests adapter
    got = run_crawl(
        spark, HttpServer(timeout=10.0), http_base,
        str(tmp_path / "http"), CrawlConfig(),
    )
    trace = lambda c: [
        (r["url"], r["params"] or "", r["status_code"])
        for r in c.pages().orderBy("ord", "attempt").collect()
    ]
    assert trace(got) == trace(ref)
    seen = lambda c: {(r["seen_key"], r["status"]) for r in c.seen().collect()}
    assert seen(got) == seen(ref)
    it = lambda c: [
        (r["type"], tuple(r["path"] or ()), r["url"], r["content"])
        for r in c.items().orderBy("ord").collect()
    ]
    assert it(got) == it(ref)


def test_http_adapter_transport_retry(spark, http_base, tmp_path):
    # a URL that fails twice then succeeds: adapter must raise FetchError on
    # the closed connections and the superstep re-enqueues until success
    srv = HttpServer(timeout=10.0)
    url = f"{http_base}__fail/2/viewforum.php?f=1"
    with pytest.raises(FetchError):
        srv.get(url, None, 0)
    with pytest.raises(FetchError):
        srv.get(url, None, 1)
    status, ctype, body = srv.get(url, None, 2)
    assert status == 200 and body


def test_crawl_delay_applies_to_ported_host(spark, http_base, tmp_path):
    """Crawl-delay pacing must key on the port-stripped host: the bridge's
    netloc is 127.0.0.1:PORT while the wave accounting groups by
    parse_url(HOST) = 127.0.0.1 — before host_key normalization the owed
    sleep was always 0 for any ported host and pacing silently never
    applied."""
    import time as _time

    from urllib.parse import urlparse as _up

    delay = 0.2
    netloc = _up(http_base).netloc
    assert ":" in netloc  # the fixture really is a ported host
    cfg = CrawlConfig(host_budgets=[{
        "host": netloc, "robots_disallow": [], "crawl_delay": delay,
    }])
    t0 = _time.time()
    res = run_crawl(spark, HttpServer(timeout=10.0), http_base,
                    str(tmp_path / "paced_port"), cfg)
    elapsed = _time.time() - t0
    fetched = res.pages().filter("kind != 'probe'").count()
    assert fetched > 0
    assert elapsed >= delay * fetched - 0.1


def test_http_adapter_rejects_bad_scheme():
    with pytest.raises(ValueError):
        HttpServer().get("ftp://example.com/x", None, 0)


def test_cli_jsonl_end_to_end(spark, http_base, tmp_path, capsys):
    from forum_dl_spark.cli import build_parser, download

    out = str(tmp_path / "out.jsonl")
    args = build_parser().parse_args(
        [http_base, "-f", "jsonl", "-o", out, "--workdir", str(tmp_path / "wd")]
    )
    written = download(args.urls, args, spark=spark)
    assert written == [out]
    lines = [json.loads(l) for l in _read_spark_text(spark, out)]
    assert lines and lines[0]["extractor"] == "phpbb"
    assert {e["type"] for e in lines} >= {"board", "thread", "post"}


def test_cli_item_class_gating(spark, http_base, tmp_path):
    """--no-files / --no-boards drop exactly those entry classes from the
    jsonl export (reference BooleanOptionalAction quartet,
    options.py:134-167; enforcement writers/common.py:101-145)."""
    from forum_dl_spark.cli import build_parser, download

    out_all = str(tmp_path / "all.jsonl")
    out_gated = str(tmp_path / "gated.jsonl")
    base = [http_base, "-f", "jsonl", "--workdir", str(tmp_path / "wd")]
    download([http_base], build_parser().parse_args(base + ["-o", out_all]),
             spark=spark)
    download(
        [http_base],
        build_parser().parse_args(
            base + ["-o", out_gated, "--no-files", "--no-boards"]
        ),
        spark=spark,
    )
    all_e = [json.loads(l) for l in _read_spark_text(spark, out_all)]
    gated = [json.loads(l) for l in _read_spark_text(spark, out_gated)]
    assert {e["type"] for e in all_e} == {"board", "thread", "post", "file"}
    assert {e["type"] for e in gated} == {"thread", "post"}
    # gating only filters: surviving entries are unchanged and in order
    kept = [e for e in all_e if e["type"] in ("thread", "post")]
    assert gated == kept


def test_cli_outside_files_gating(spark):
    """A file item with an empty path sits outside any post's content and
    is written only under --outside-files (writers/common.py:135-137);
    --warc-output force-enables it (__init__.py:31-32)."""
    from forum_dl_spark.cli import _gate_items, build_parser

    rows = [
        ("file", [], "https://x/img.png"),
        ("file", ["1", "2"], "https://x/att.png"),
        ("post", ["1", "2"], "https://x/t"),
    ]
    df = spark.createDataFrame(rows, "type string, path array<string>, url string")
    args = build_parser().parse_args(["https://x/"])
    got = lambda a, outside: {
        r["url"] for r in _gate_items(df, a, outside).collect()
    }
    assert got(args, False) == {"https://x/att.png", "https://x/t"}
    assert got(args, True) == {
        "https://x/img.png", "https://x/att.png", "https://x/t"
    }
    args2 = build_parser().parse_args(["https://x/", "--no-files"])
    assert got(args2, True) == {"https://x/t"}


def test_cli_get_urls_trace(spark, fixture_server, http_base, tmp_path, capsys):
    """-g prints exactly the ord-sorted fetch trace — the URLs an
    uninterrupted crawl GETs, in crawl order (session.py:163-166) — and
    writes no output."""
    from forum_dl_spark.cli import build_parser, download

    args = build_parser().parse_args(
        [http_base, "-g", "--workdir", str(tmp_path / "wd")]
    )
    written = download(args.urls, args, spark=spark)
    printed = [l for l in capsys.readouterr().out.splitlines() if l]
    assert written == ["-"]
    ref = run_crawl(
        spark, _HostRemap(fixture_server, http_base), http_base,
        str(tmp_path / "ref"), CrawlConfig(),
    )
    expect = [r["url"]
              for r in ref.pages().orderBy("ord", "attempt").collect()]
    assert printed == expect
    assert not list(tmp_path.glob("*.jsonl"))  # no export written in -g mode


def test_cli_stdout_output(spark, http_base, tmp_path, capsys):
    """-o - streams the ordered jsonl entries to stdout, byte-equal to the
    file export (FileWriter stdout branch, writers/common.py:217-235)."""
    from forum_dl_spark.cli import build_parser, download

    out = str(tmp_path / "file.jsonl")
    base = [http_base, "-f", "jsonl", "--workdir", str(tmp_path / "wd")]
    download([http_base], build_parser().parse_args(base + ["-o", out]),
             spark=spark)
    capsys.readouterr()
    download([http_base], build_parser().parse_args(base + ["-o", "-"]),
             spark=spark)
    stdout_lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert stdout_lines == _read_spark_text(spark, out)
    with pytest.raises(SystemExit):
        download([http_base],
                 build_parser().parse_args(base + ["-o", "-", "-f", "mbox"]),
                 spark=spark)


def test_cli_multiseed_warc_no_clobber(spark, http_base, tmp_path):
    """Two seeds with --warc-output land in per-seed subdirectories — the
    second crawl must not overwrite the first's fixed-name part files."""
    from urllib.parse import quote_plus

    from forum_dl_spark.cli import build_parser, download
    from forum_dl_spark.export.warc import read_warc

    u1 = http_base
    u2 = http_base.rstrip("/")  # same forum, distinct seed string
    wdir = tmp_path / "warcs"
    args = build_parser().parse_args(
        [u1, u2, "-f", "jsonl", "-o", str(tmp_path / "out"),
         "--workdir", str(tmp_path / "wd"), "--warc-output", str(wdir)]
    )
    download(args.urls, args, spark=spark)
    d1, d2 = wdir / quote_plus(u1), wdir / quote_plus(u2)
    assert d1.is_dir() and d2.is_dir()

    def responses(d):
        recs = []
        for p in sorted(d.glob("*.warc")):
            recs += [r for r in read_warc(str(p))
                     if r.get("WARC-Type") == "response"]
        return recs

    # both seeds' records survive — the old fixed-name part files would
    # have left only the LAST seed's fetches on disk
    recs1, recs2 = responses(d1), responses(d2)
    assert recs1 and recs2


def test_cli_lists(capsys):
    from forum_dl_spark.cli import main

    assert main(["--list-extractors"]) == 0
    assert "phpbb" in capsys.readouterr().out
    assert main(["--list-output-formats"]) == 0
    assert "maildir" in capsys.readouterr().out


def _read_spark_text(spark, path):
    return [r["value"] for r in spark.read.text(path).collect()]
