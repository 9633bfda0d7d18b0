"""WARC/1.0 export of the fetch lineage.

The reference tees every HTTP exchange into a WARC via warcio's
``capture_http`` (forum_dl/session.py:37–46, 171–179). warcio is not in this
container, but WARC/1.0 is a plain text-framed format: this module writes
real, spec-shaped ``warcinfo`` + ``response`` records straight from the
``pages`` DataFrame, and ships a tiny reader for verification.

Scale shape: WARC files are concatenable by design, so the export is a
``mapPartitions`` — each partition writes one independent ``.warc`` file and
no data ever funnels through the driver. ``num_files`` controls the
range-partitioning on the crawl-order key so each file is internally in
crawl order.

Determinism: the reference stamps wall-clock ``WARC-Date``; exports here pin
a fixed date by default (override with ``warc_date``) and derive
``WARC-Record-ID`` from md5(url, ord, attempt) so repeated exports are
byte-identical.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame

_EPOCH = "1970-01-01T00:00:00Z"


def _record(
    url: str,
    status: int,
    ctype: str | None,
    body: bytes | None,
    ord_key: str,
    attempt: int,
    warc_date: str,
) -> bytes:
    body = body or b""
    reason = "OK" if status == 200 else ""
    http_head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {ctype or 'application/octet-stream'}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    block = http_head + body
    rid = hashlib.md5(f"{url}\x00{ord_key}\x00{attempt}".encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return head + block + b"\r\n\r\n"


def _warcinfo(warc_date: str) -> bytes:
    info = b"software: forum-dl-spark/0.1.0\r\nformat: WARC File Format 1.0\r\n"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "WARC-Record-ID: <urn:md5:warcinfo>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(info)}\r\n\r\n"
    ).encode()
    return head + info + b"\r\n\r\n"


def export_warc(
    pages: DataFrame,
    out_dir: str,
    num_files: int = 1,
    warc_date: str = _EPOCH,
) -> list[str]:
    """Write real WARC/1.0 response records from the pages table.

    Each output partition writes one self-contained file (warcinfo record
    first), crawl-ordered within the file. Returns the written paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = pages.select("url", "status_code", "content_type", "body", "ord", "attempt")
    parts = (
        cols.repartitionByRange(num_files, "ord").sortWithinPartitions("ord")
        if num_files > 1
        else cols.coalesce(1).sortWithinPartitions("ord")
    )

    def _write(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc")
        n = 0
        f = None
        try:
            for r in rows:
                if f is None:
                    os.makedirs(out_dir, exist_ok=True)
                    f = open(path, "wb")
                    f.write(_warcinfo(warc_date))
                f.write(
                    _record(
                        r["url"], int(r["status_code"]), r["content_type"],
                        r["body"], r["ord"], int(r["attempt"]), warc_date,
                    )
                )
                n += 1
        finally:
            if f is not None:
                f.close()
        if n:
            yield path

    return sorted(parts.rdd.mapPartitions(_write).collect())


def read_warc(path: str) -> list[dict]:
    """Minimal WARC/1.0 reader (verification only)."""
    out: list[dict] = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        if not data[pos:].startswith(b"WARC/1.0\r\n"):
            break
        hdr_end = data.index(b"\r\n\r\n", pos)
        headers = {}
        for line in data[pos + 10 : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b": ")
            headers[k.decode()] = v.decode()
        clen = int(headers["Content-Length"])
        block = data[hdr_end + 4 : hdr_end + 4 + clen]
        rec = dict(headers)
        if rec.get("WARC-Type") == "response":
            http_end = block.index(b"\r\n\r\n")
            status_line = block[: block.index(b"\r\n")].decode()
            rec["http_status"] = int(status_line.split(" ")[1])
            rec["http_body"] = block[http_end + 4 :]
        out.append(rec)
        pos = hdr_end + 4 + clen + 4
    return out
