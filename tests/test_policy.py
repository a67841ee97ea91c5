"""Per-request traversal policy (SURVEY §2.4 F3; reference Request.policy,
routes/requests.js:79): each seed carries a walk scope that its discovered
edges inherit."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

N, H = 200, 4


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=5).cache()


@pytest.fixture(scope="module")
def robots(spark):
    return synth_robots(spark, n_hosts=H)


def test_self_policy_fetches_without_walking(spark, tmp_path, corpus, robots):
    c = Crawler(spark, str(tmp_path / "cat"), corpus, robots,
                CrawlConfig(batch_size=100), run_id="self")
    u = page_url(3, N, H, False)
    c.seed([u], policy="self")
    c.run(10)
    pages = c.catalog.table("pages").read().filter(F.col("status") == 200)
    assert [r["url"] for r in pages.select("url").collect()] == [u]


def test_mixed_policies_scope_independently(spark, tmp_path, corpus, robots):
    """'self' and 'shallow' seeds crawl side by side: the shallow walk stops
    at depth 2; the self seed contributes exactly itself; edges inherit the
    parent's policy all the way down."""
    c = Crawler(spark, str(tmp_path / "cat2"), corpus, robots,
                CrawlConfig(batch_size=500), run_id="mix")
    u_self = page_url(0, N, H, False)
    u_shallow = page_url(1, N, H, False)
    c.seed([u_self], policy="self")
    c.seed([u_shallow], policy="shallow")
    c.run(20)
    pages = c.catalog.table("pages").read().filter(F.col("status") == 200)
    assert pages.agg(F.max("depth")).collect()[0][0] == 2
    f = c.catalog.table("frontier").read()
    assert f.count() == 0, "shallow walk must exhaust (depth-3 edges never enqueued)"
    # the self seed produced no children: every depth>0 page has policy
    # lineage from the shallow seed — verify by re-running shallow alone
    c2 = Crawler(spark, str(tmp_path / "cat3"), corpus, robots,
                 CrawlConfig(batch_size=500), run_id="sh")
    c2.seed([u_shallow], policy="shallow")
    c2.run(20)
    only_shallow = {r["url"] for r in
                    c2.catalog.table("pages").read().filter(F.col("status") == 200)
                    .select("url").collect()}
    both = {r["url"] for r in pages.select("url").collect()}
    assert both == only_shallow | {u_self}


def test_policy_ceiling_capped_by_max_depth(spark, tmp_path, corpus, robots):
    """A policy deeper than max_depth is capped by it (min semantics)."""
    cfg = CrawlConfig(batch_size=500, max_depth=1,
                      policy_depths={"self": 0, "shallow": 2})
    c = Crawler(spark, str(tmp_path / "cat4"), corpus, robots, cfg, run_id="cap")
    c.seed([page_url(1, N, H, False)], policy="shallow")
    c.run(10)
    pages = c.catalog.table("pages").read().filter(F.col("status") == 200)
    assert pages.agg(F.max("depth")).collect()[0][0] == 1
