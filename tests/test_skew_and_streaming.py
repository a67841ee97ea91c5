"""Skew handling (hot-host salting) + streaming seed ingestion."""

import json

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.plans.selection import select_batch
from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots, page_url
from ospo_ghcrawler_spark.streaming.seeds import start_seed_stream


def test_hot_host_salting_spreads_partitions(spark, tmp_path):
    """Skew fixture: one host owns 50% of pages; its selected rows must get
    per-url fetch salt (spread over partitions), cold hosts keep per-host
    salt."""
    N, H = 600, 10
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, skew=True, links_per_page=4).cache()
    robots = synth_robots(spark, n_hosts=H, default_budget=10_000)
    cfg = CrawlConfig(
        batch_size=600, host_budget=10_000, hot_host_fanout_threshold=50,
        frontier_partitions=16,
    )
    c = Crawler(spark, str(tmp_path / "cat"), corpus, robots, cfg, run_id="skew")
    c.seed([page_url(i, N, H, True) for i in range(0, 600, 3)])
    frontier = c.catalog.table("frontier").read()
    selected, n, _wake, _tot = select_batch(frontier, c.host_budgets, cfg, 0, min_host_budget=0)
    hot = selected.filter(F.col("host") == "host0.example")
    n_hot = hot.count()
    assert n_hot > 50, "fixture: host0 must dominate the batch"
    hot_salts = hot.select("fetch_salt").distinct().count()
    assert hot_salts >= 12, f"hot host must spread over partitions, got {hot_salts}"
    cold = selected.filter(F.col("host") != "host0.example")
    per_host_salts = (
        cold.groupBy("host").agg(F.countDistinct("fetch_salt").alias("k")).agg(F.max("k"))
    ).collect()[0][0]
    assert per_host_salts == 1, "cold hosts keep a single per-host salt"


def test_skewed_crawl_completes_and_respects_budget(spark, tmp_path):
    N, H, B = 400, 8, 20
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, skew=True, links_per_page=5).cache()
    robots = synth_robots(spark, n_hosts=H, default_budget=B)
    cfg = CrawlConfig(batch_size=150, host_budget=B, hot_host_fanout_threshold=10)
    c = Crawler(spark, str(tmp_path / "cat2"), corpus, robots, cfg, run_id="skew2")
    c.seed([page_url(i, N, H, True) for i in range(6)])
    c.run(40)
    m = c.catalog.table("metrics").read().filter(F.col("host") != "__run__")
    worst = (
        m.groupBy("superstep", "host").agg(F.sum("selected").alias("n")).agg(F.max("n"))
    ).collect()[0][0]
    assert worst <= B
    assert c.catalog.table("pages").read().count() > 0


def test_streaming_seed_ingestion(spark, tmp_path):
    """JSON-lines seed files land as deduped priority-0 frontier appends via
    Structured Streaming foreachBatch (webhook/event-queue analog)."""
    from ospo_ghcrawler_spark.plans.catalog import Catalog

    N, H = 100, 3
    robots = synth_robots(spark, n_hosts=H)
    cat = Catalog(spark, str(tmp_path / "cat3"))
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    with open(seeds_dir / "batch1.json", "w") as f:
        for i in range(5):
            f.write(json.dumps({"url": page_url(i, N, H, False), "priority": 0}) + "\n")
        f.write(json.dumps({"url": page_url(0, N, H, False), "priority": 0}) + "\n")  # dup
        f.write(json.dumps({"url": "http://host1.example/private/x", "priority": 0}) + "\n")
        f.write(json.dumps({"url": "junk url", "priority": 0}) + "\n")

    q = start_seed_stream(
        spark, str(seeds_dir), cat.table("frontier"), cat.table("seen"), robots,
        checkpoint_dir=str(tmp_path / "ckpt"), partitions=8,
    )
    q.awaitTermination(60)
    rows = cat.table("frontier").read().collect()
    urls = sorted(r["url"] for r in rows)
    assert urls == sorted(page_url(i, N, H, False) for i in range(5))
    assert all(r["priority"] == 0 for r in rows)

    # second file: one new, one already-in-frontier → only the new lands
    with open(seeds_dir / "batch2.json", "w") as f:
        f.write(json.dumps({"url": page_url(50, N, H, False), "priority": 0}) + "\n")
        f.write(json.dumps({"url": page_url(1, N, H, False), "priority": 0}) + "\n")
    q2 = start_seed_stream(
        spark, str(seeds_dir), cat.table("frontier"), cat.table("seen"), robots,
        checkpoint_dir=str(tmp_path / "ckpt"), partitions=8,
    )
    q2.awaitTermination(60)
    assert cat.table("frontier").read().count() == 6
