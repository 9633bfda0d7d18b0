"""File materialization: write fetched/decoded file contents to disk,
named ``quote_plus(file.url)`` — the reference's ``--files-output-path``
mode (forum_dl/writers/common.py:149–159; naming also forumdl.py:44).

Scale shape: a ``foreachPartition`` sink — every executor writes its own
partition's files directly (to a shared filesystem on a cluster); nothing
funnels through the driver. Duplicate URLs collapse to one write
(the reference's session cache dedupes the download per URL,
session.py:105–111; content is identical by definition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_files(items: DataFrame, out_dir: str) -> None:
    files = (
        items.filter(
            (F.col("type") == "file") & F.col("content_bytes").isNotNull()
        )
        .select("url", "content_bytes")
        .dropDuplicates(["url"])
    )

    def _write(rows):
        from urllib.parse import quote_plus

        os.makedirs(out_dir, exist_ok=True)
        for r in rows:
            with open(os.path.join(out_dir, quote_plus(r["url"])), "wb") as f:
                f.write(r["content_bytes"])

    files.foreachPartition(_write)
