#!/usr/bin/env python
"""Feasibility probe: does Spark's local-cluster master (real separate
executor JVMs — the closest in-sandbox shape to the north rule's "N and 4N
executors") run the crawl engine end-to-end in this environment?

    python scripts/lc_probe.py [n_execs] [cores_per_exec] [pages]

Starts local-cluster[n,c,mem], runs a small synthetic crawl through the
public Crawler API, prints the settled count and wall. Exit 0 = viable.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pages = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    mem = 4096

    from pyspark.sql import SparkSession

    from ospo_ghcrawler_spark.config import CrawlConfig
    from ospo_ghcrawler_spark.operators.engine import Crawler
    from ospo_ghcrawler_spark.session import ensure_shipped
    from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

    t0 = time.time()
    spark = (
        SparkSession.builder.master(f"local-cluster[{n},{c},{mem}]")
        .appName("lc_probe")
        .config("spark.sql.shuffle.partitions", str(n * c))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.executor.memory", f"{mem}m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_shipped(spark)
    print(f"session up in {time.time()-t0:.1f}s; defaultParallelism="
          f"{spark.sparkContext.defaultParallelism}", flush=True)

    n_hosts = 50
    work = tempfile.mkdtemp(prefix="lc_probe_")
    corpus_dir = f"{work}/pages"
    synth_pages(spark, n_pages=pages, n_hosts=n_hosts, links_per_page=8,
                partitions=4 * n * c, sentences=10).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    robots = synth_robots(spark, n_hosts=n_hosts, default_budget=1 << 30)
    cfg = CrawlConfig(
        batch_size=4 * pages, host_budget=1 << 30, compute_budget_ms=1 << 40,
        max_depth=64, frontier_partitions=n * c, bloom_shards=4,
        bloom_bits_per_shard=1 << 16, pipelined_frontier_commit=True,
        collect_stats=False, expect_failures=False,
    )
    crawler = Crawler(spark, f"{work}/cat", corpus, robots, cfg, run_id="lc")
    crawler.seed([page_url(i, pages, n_hosts, False) for i in range(pages // 2)])
    t1 = time.time()
    totals = crawler.run(max_supersteps=20)
    wall = time.time() - t1
    seen = crawler.catalog.table("seen").read().count()
    print(f"crawl ok: totals={totals} seen={seen} wall={wall:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
