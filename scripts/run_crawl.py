"""Cluster-deployable crawl entry point.

The north rule requires the job to deploy via ``spark-submit --py-files`` on
a multi-executor cluster; this script is that entry point. Two launch modes:

- **spark-submit** (cluster or local):

      python scripts/run_crawl.py --package          # builds the zip, prints the command
      spark-submit --py-files /tmp/ospo_ghcrawler_spark_pyfiles.zip \
          scripts/run_crawl.py --corpus /data/pages --catalog /data/crawl \
          --seeds-auto 1000

  The session comes from ``SparkSession.builder.getOrCreate()`` so all
  cluster sizing (``--num-executors``, ``--executor-cores``, …) stays with
  spark-submit, and the package is re-shipped to Python workers via
  ``addPyFile`` in case ``--py-files`` was omitted.

- **plain python** (sandbox / laptop): pass ``--local-cores N`` to get the
  tuned local session from :func:`ospo_ghcrawler_spark.session.get_spark`.

The corpus is any parquet of Common-Crawl-style pages with columns
(url, warc_ts, html, text, lang) — the input_hint table shape; robots is the
per-host budget table (see sources/corpus.synth_robots). ``--synth N`` builds
both deterministically, so the script is runnable with no external data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run the PySpark crawl engine")
    p.add_argument("--package", action="store_true",
                   help="build the --py-files zip, print the spark-submit command, exit")
    p.add_argument("--corpus", help="parquet dir of pages (url, warc_ts, html, text, lang)")
    p.add_argument("--robots", help="parquet dir of per-host robots budgets (optional)")
    p.add_argument("--synth", type=int, metavar="N",
                   help="synthesize an N-page corpus instead of --corpus")
    p.add_argument("--synth-hosts", type=int, default=50)
    p.add_argument("--catalog", required=False, help="catalog root dir (tables + manifest)")
    p.add_argument("--run-id", default="run")
    p.add_argument("--seeds-file", help="newline-delimited seed URL file")
    p.add_argument("--seeds-auto", type=int, metavar="K",
                   help="seed the first K synthetic page urls (requires --synth)")
    p.add_argument("--resume", action="store_true",
                   help="reopen the catalog at its last committed superstep")
    p.add_argument("--max-supersteps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=100_000)
    p.add_argument("--host-budget", type=int, default=1_000)
    p.add_argument("--max-depth", type=int, default=64)
    p.add_argument("--local-cores", type=int,
                   help="plain-python mode: cores for the tuned local session")
    return p


def main() -> None:
    args = build_parser().parse_args()

    if args.package:
        import tempfile
        import zipfile

        import ospo_ghcrawler_spark

        pkg_dir = os.path.dirname(os.path.abspath(ospo_ghcrawler_spark.__file__))
        zpath = os.path.join(tempfile.gettempdir(), "ospo_ghcrawler_spark_pyfiles.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
        print(f"built {zpath}")
        print(f"spark-submit --py-files {zpath} {os.path.abspath(__file__)} "
              "--corpus <pages.parquet> --catalog <dir> --seeds-file <urls.txt>")
        return

    if not args.catalog:
        raise SystemExit("--catalog is required (or use --package)")
    if not args.corpus and args.synth is None:
        raise SystemExit("one of --corpus or --synth N is required")

    if args.local_cores:
        from ospo_ghcrawler_spark.session import get_spark

        spark = get_spark("run_crawl", cores=args.local_cores,
                          shuffle_partitions=args.local_cores)
    else:
        # spark-submit path: the session (master, executors, memory) is
        # whatever spark-submit configured; we only re-ship the package for
        # Python workers in case --py-files was omitted
        from pyspark.sql import SparkSession

        from ospo_ghcrawler_spark.session import ensure_shipped

        spark = SparkSession.builder.appName("ospo_ghcrawler_spark").getOrCreate()
        ensure_shipped(spark)

    from ospo_ghcrawler_spark.config import CrawlConfig
    from ospo_ghcrawler_spark.operators.engine import Crawler
    from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

    if args.synth is not None:
        corpus = synth_pages(spark, n_pages=args.synth, n_hosts=args.synth_hosts,
                             links_per_page=12)
        robots = synth_robots(spark, n_hosts=args.synth_hosts)
    else:
        corpus = spark.read.parquet(args.corpus)
        robots = (spark.read.parquet(args.robots) if args.robots
                  else synth_robots(spark, n_hosts=0))

    cfg = CrawlConfig(batch_size=args.batch_size, host_budget=args.host_budget,
                      max_depth=args.max_depth)
    if args.resume:
        crawler = Crawler.resume(spark, args.catalog, corpus, robots, cfg,
                                 run_id=args.run_id)
    else:
        crawler = Crawler(spark, args.catalog, corpus, robots, cfg,
                          run_id=args.run_id)

    seeds: list[str] = []
    if args.seeds_file:
        with open(args.seeds_file) as f:
            seeds = [ln.strip() for ln in f if ln.strip()]
    elif args.seeds_auto and args.synth is not None:
        seeds = [page_url(i, args.synth, args.synth_hosts, False)
                 for i in range(args.seeds_auto)]
    if seeds:
        crawler.seed(seeds)

    t0 = time.time()
    totals = crawler.run(max_supersteps=args.max_supersteps)
    wall = time.time() - t0
    n_seen = crawler.catalog.table("seen").read().count()
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "urls_settled": n_seen,
        **totals,
    }))


if __name__ == "__main__":
    main()
