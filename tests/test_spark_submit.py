"""north_rule launch path: `spark-submit --py-files <zip>` must run the
crawl end-to-end with the package shipped as an archive (no repo on the
executors' PYTHONPATH)."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_spark_submit_pyfiles_crawl(tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    zip_base = tmp_path / "forum_dl_spark"
    shutil.make_archive(str(zip_base), "zip", str(REPO), "forum_dl_spark")

    p = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--py-files", f"{zip_base}.zip",
            str(REPO / "scripts" / "submit_crawl.py"),
            "https://forum.example/", str(tmp_path / "run"), "--fixture",
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo: the zip must be the import source
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "crawled 45 pages, 424 items, 398 documents" in p.stdout, p.stdout
