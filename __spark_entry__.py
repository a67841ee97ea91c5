"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl; ``queries()``/``oracle_sql()``
expose every implemented operator from SURVEY.md §2 plus the training-data
pipeline ops, each validated against DuckDB at sf=0.01.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl a synthetic Common-Crawl-style corpus (sized from the
    sf0.001 tables) to exhaustion with the full engine — priority frontier,
    politeness budgets, bloom seen-set, vectorized extraction — and return
    the per-host harvest summary."""
    from pyspark.sql import functions as F

    from ospo_ghcrawler_spark.config import CrawlConfig
    from ospo_ghcrawler_spark.operators.engine import Crawler
    from ospo_ghcrawler_spark.session import ensure_shipped
    from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

    ensure_shipped(spark)
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    n_pages = min(int(orders.count()), 400)  # corpus sized from the sf tables
    n_hosts = 12
    corpus = synth_pages(spark, n_pages=n_pages, n_hosts=n_hosts, links_per_page=6).cache()
    robots = synth_robots(spark, n_hosts=n_hosts)
    root = tempfile.mkdtemp(prefix="crawl_entry_")
    try:
        cfg = CrawlConfig(batch_size=200, host_budget=50)
        crawler = Crawler(spark, root, corpus, robots, cfg, run_id="entry")
        crawler.seed([page_url(i, n_pages, n_hosts, False) for i in range(4)])
        crawler.run(max_supersteps=30)
        pages = crawler.catalog.table("pages").read().filter(F.col("status") == 200)
        seen = crawler.catalog.table("seen").read()
        from ospo_ghcrawler_spark.functions.urls import host_col

        seen_by_host = (
            seen.select(host_col(F.col("url")).alias("host"))
            .groupBy("host")
            .agg(F.count("*").alias("urls_settled"))
        )
        summary = (
            pages.groupBy("host")
            .agg(
                F.count("*").alias("pages_harvested"),
                F.sum("fetch_ms").alias("fetch_ms_sum"),
                F.max("depth").alias("max_depth"),
            )
            .join(seen_by_host, "host", "left")
            .orderBy("host")
        )
        # materialize DURABLY before the catalog dir is removed: a cached
        # plan can be evicted and would then recompute against deleted
        # parquet; a driver-local copy cannot
        rows = summary.collect()
        return spark.createDataFrame(rows, schema=summary.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + training-data ops).

    Wrapped so the package ships to the session's Python workers first
    (several ops use Arrow pandas UDFs)."""
    from ospo_ghcrawler_spark import queries as Q
    from ospo_ghcrawler_spark.session import ensure_shipped

    def wrap(fn):
        def g(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)
            # date_trunc/date_format parity with DuckDB's naive timestamps
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return g

    return {name: wrap(fn) for name, fn in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (rows-only ops omitted: simhash_pairs,
    ann_lsh, ann_ivf — hash/projection-dependent; their quality/recall is
    pinned by tests instead)."""
    from ospo_ghcrawler_spark import queries as Q

    return dict(Q.ORACLES)
