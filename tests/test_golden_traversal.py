"""Golden traversal — port of the reference's end-to-end crawl-loop test
(/root/reference/test/unit/processingTests.js:20-44): seed one resource into a
batch=1 crawler over the 12-resource micro-site; after each superstep assert
(a) the set of stored docs so far and (b) the exact number of newly queued
child requests — counts [4,1,0,2,1,0,1,2,0,0,0]."""

import pytest

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.sources.corpus import (
    GOLDEN_POP_ORDER,
    GOLDEN_QUEUED_COUNTS,
    golden_pages,
    golden_robots,
    golden_url,
)


@pytest.fixture()
def crawler(spark, tmp_path):
    cfg = CrawlConfig(batch_size=1, host_budget=1, use_bloom=True,
                      bloom_shards=4, bloom_bits_per_shard=1 << 14)
    return Crawler(
        spark,
        str(tmp_path / "cat"),
        corpus=golden_pages(spark),
        robots=golden_robots(spark),
        cfg=cfg,
        run_id="golden",
    )


def test_golden_traversal_order_and_counts(crawler):
    crawler.seed([golden_url("p0")])
    stored = []
    for i, expected_count in enumerate(GOLDEN_QUEUED_COUNTS):
        stats = crawler.superstep()
        assert stats, f"frontier exhausted early at pop {i + 1}"
        assert stats["selected"] == 1
        assert stats["new_edges"] == expected_count, f"pop {i + 1} ({GOLDEN_POP_ORDER[i]})"
        stored.append(GOLDEN_POP_ORDER[i])
        pages = crawler.catalog.table("pages").read()
        got_urls = {r["url"] for r in pages.select("url").collect()}
        assert got_urls == {golden_url(n) for n in stored}

    # drain the one remaining resource (p10), then exhaustion
    stats = crawler.superstep()
    assert stats["selected"] == 1 and stats["new_edges"] == 0
    assert crawler.superstep() == {}

    pages = crawler.catalog.table("pages").read()
    assert pages.count() == 12
    seen = crawler.catalog.table("seen").read()
    assert seen.count() == 12
    assert crawler.catalog.table("deadletters").read().count() == 0


def test_golden_pop_order_is_fifo(crawler):
    """Selection must pop in FIFO order of (enqueue_step, seq): the exact
    GOLDEN_POP_ORDER sequence."""
    crawler.seed([golden_url("p0")])
    order = []
    while True:
        stats = crawler.superstep()
        if not stats:
            break
        step = crawler.step - 1
        pages = crawler.catalog.table("pages").read()
        row = pages.filter(pages.superstep == step).select("url").collect()
        assert len(row) == 1
        order.append(row[0]["url"])
    assert order == [golden_url(n) for n in GOLDEN_POP_ORDER]
