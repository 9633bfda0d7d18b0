"""spark-submit entry point: crawl a seed URL on an existing SparkSession.

Launch (north_rule: `spark-submit --py-files`):

    python -c "import shutil; shutil.make_archive('forum_dl_spark', 'zip', '.', 'forum_dl_spark')"
    spark-submit --master local[8] --py-files forum_dl_spark.zip \
        scripts/submit_crawl.py <seed_url> <workdir> [--fixture]

Unlike the CLI (`python -m forum_dl_spark`, which builds its own local
session), this script uses the session spark-submit provides — on a real
cluster that is the multi-executor session; `--py-files` ships the package
to every executor.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    seed_url, workdir = argv[0], argv[1]
    fixture = "--fixture" in argv[2:]

    spark = SparkSession.builder.appName("forum-dl-spark-crawl").getOrCreate()
    from forum_dl_spark.crawl import CrawlConfig, run_crawl

    if fixture:
        from forum_dl_spark.fixtures import SyntheticDiscourse

        server: object = SyntheticDiscourse()
    else:
        from forum_dl_spark.crawl.http import HttpServer

        server = HttpServer()
    res = run_crawl(spark, server, seed_url, workdir, CrawlConfig())
    print(
        f"crawled {res.pages().count()} pages, {res.items().count()} items, "
        f"{res.documents().count()} documents in {res.supersteps} supersteps "
        f"-> {workdir}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
