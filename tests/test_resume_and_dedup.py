"""Exact-resume + cross-superstep dedup + retry/dead-letter scenarios
(FIXTURES.md §6; reference requestTrackerTests semantics)."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots, page_url

N, H = 300, 6


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=6).cache()


@pytest.fixture(scope="module")
def robots(spark):
    return synth_robots(spark, n_hosts=H)


def _seeds():
    return [page_url(i, N, H, False) for i in range(4)]


def test_duplicate_seed_single_fetch(spark, tmp_path, corpus, robots):
    """duplicate-push fixture: same URL seeded twice in one call and again
    later ⇒ exactly one fetch ever (attenuation + seen-filter;
    reference test/unit/requestTrackerTests.js:80-93,359-387)."""
    u = page_url(7, N, H, False)
    c = Crawler(spark, str(tmp_path / "cat"), corpus, robots,
                CrawlConfig(batch_size=50), run_id="dup")
    c.seed([u, u])
    assert c.catalog.table("frontier").read().filter(F.col("url") == u).count() == 1
    c.run(20)
    c.seed([u])  # re-push of a completed URL bounces off the seen-filter
    assert c.catalog.table("frontier").read().count() == 0
    assert c.catalog.table("pages").read().filter(F.col("url") == u).count() == 1


def test_retry_then_deadletter(spark, tmp_path, corpus, robots):
    """retry/abandon fixture: transiently failing URLs re-enter with
    attempt+1 and keep their original enqueue position (head-requeue,
    reference providers/queuing/inmemorycrawlqueue.js:54-58); at
    max_attempts they dead-letter."""
    cfg = CrawlConfig(batch_size=400, max_attempts=2, simulate_fetch_failure_every=5)
    c = Crawler(spark, str(tmp_path / "cat2"), corpus, robots, cfg, run_id="retry")
    c.seed(_seeds())
    c.run(30)
    dead = c.catalog.table("deadletters").read()
    pages = c.catalog.table("pages").read().filter(F.col("status") == 200)
    n_dead = dead.count()
    assert n_dead > 0, "failure injection must dead-letter at max_attempts=2"
    assert dead.filter(F.col("attempt") != 2).count() == 0
    # a dead-lettered url never produced content
    assert pages.join(dead, "url_hash", "inner").count() == 0


def test_exact_resume_equality(spark, tmp_path, corpus, robots):
    """resume fixture: interrupt after superstep k, resume ⇒ identical final
    seen set AND identical per-superstep crawl order vs uninterrupted."""
    cfg = CrawlConfig(batch_size=60)
    a = Crawler(spark, str(tmp_path / "a"), corpus, robots, cfg, run_id="a")
    a.seed(_seeds())
    a.run(30)
    seen_a = sorted(r["url_hash"] for r in a.catalog.table("seen").read().collect())
    order_a = sorted(
        (r["superstep"], r["url"])
        for r in a.catalog.table("pages").read().select("superstep", "url").collect()
    )

    b = Crawler(spark, str(tmp_path / "b"), corpus, robots, cfg, run_id="b")
    b.seed(_seeds())
    for _ in range(2):
        b.superstep()
    del b  # simulate crash
    b2 = Crawler.resume(spark, str(tmp_path / "b"), corpus, robots, cfg, run_id="b")
    assert b2.step == 2
    b2.run(30)
    seen_b = sorted(r["url_hash"] for r in b2.catalog.table("seen").read().collect())
    order_b = sorted(
        (r["superstep"], r["url"])
        for r in b2.catalog.table("pages").read().select("superstep", "url").collect()
    )
    assert seen_a == seen_b
    assert order_a == order_b


def test_bloom_and_exact_runs_identical(spark, tmp_path, corpus, robots):
    """bloom false positives must never change results: identical harvest
    with use_bloom on and off."""
    outs = {}
    for flag in (True, False):
        cfg = CrawlConfig(batch_size=60, use_bloom=flag, bloom_shards=4,
                          bloom_bits_per_shard=1 << 12)  # tiny → many FPs
        c = Crawler(spark, str(tmp_path / f"bl{flag}"), corpus, robots, cfg,
                    run_id=f"bl{flag}")
        c.seed(_seeds())
        c.run(30)
        outs[flag] = sorted(
            r["url_hash"] for r in c.catalog.table("seen").read().collect()
        )
    assert outs[True] == outs[False]
