"""Politeness & priority semantics — ports of FIXTURES.md §6 scenarios and
the reference's rate-limiter/token tests."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.operators.politeness import (
    robots_allowed_filter,
    windowed_token_accounting,
)
from ospo_ghcrawler_spark.schemas import ROBOTS_SCHEMA
from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots, page_url


def _crawler(spark, tmp_path, corpus, robots, **cfg_kw):
    cfg = CrawlConfig(**cfg_kw)
    return Crawler(spark, str(tmp_path / "cat"), corpus, robots, cfg, run_id="t")


def test_per_host_budget_never_exceeded(spark, tmp_path):
    """politeness skew fixture: budget B per host per superstep ⇒ no
    superstep selects more than B urls of one host (InMemoryRateLimiter
    semantics, reference providers/limiting/inmemoryRateLimiter.js:17-36)."""
    N, H, B = 300, 4, 7
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=6).cache()
    robots = synth_robots(spark, n_hosts=H, default_budget=B)
    c = _crawler(spark, tmp_path, corpus, robots, batch_size=100, host_budget=B)
    c.seed([page_url(i, N, H, False) for i in range(8)])
    for _ in range(12):
        if not c.superstep():
            break
    m = c.catalog.table("metrics").read().filter(F.col("host") != "__run__")
    worst = m.groupBy("superstep", "host").agg(F.sum("selected").alias("n")).agg(
        F.max("n")
    ).collect()[0][0]
    assert worst is not None and worst <= B, f"host budget violated: {worst} > {B}"


def test_zero_budget_host_fully_benched(spark, tmp_path):
    N, H = 200, 4
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=6).cache()
    robots = synth_robots(spark, n_hosts=H, zero_budget_hosts=(2,))
    c = _crawler(spark, tmp_path, corpus, robots, batch_size=100)
    c.seed([page_url(i, N, H, False) for i in range(8)])
    c.run(15)
    fetched = c.catalog.table("pages").read().filter(F.col("host") == "host2.example")
    assert fetched.count() == 0


def test_robots_disallow_prefixes(spark):
    robots = spark.createDataFrame(
        [("h.example", ["/private/", "/tmp/"], 0, 10)], schema=ROBOTS_SCHEMA
    )
    df = spark.createDataFrame(
        [
            ("http://h.example/ok", "h.example"),
            ("http://h.example/private/x", "h.example"),
            ("http://h.example/tmp/y", "h.example"),
            ("http://h.example/private2", "h.example"),  # not a prefix match
            ("http://other.example/private/z", "other.example"),  # no rules
        ],
        ["url", "host"],
    )
    got = {r["url"] for r in robots_allowed_filter(df, robots).collect()}
    assert got == {
        "http://h.example/ok",
        "http://h.example/private2",
        "http://other.example/private/z",
    }


def test_windowed_token_accounting(spark):
    """Reference limiter contract: count per key per fixed window; over flag
    when count > limit."""
    rows = [(f"k{i % 2}", f"2024-01-01 00:0{i % 5}:00") for i in range(20)]
    df = spark.createDataFrame(rows, ["key", "ts_s"]).select(
        "key", F.to_timestamp("ts_s").alias("ts")
    )
    out = windowed_token_accounting(df, "key", "ts", "5 minutes", budget=9).collect()
    by_key = {(r["key"]): r for r in out}
    assert by_key["k0"]["used"] == 10 and bool(by_key["k0"]["over"]) is True
    assert by_key["k1"]["used"] == 10


def test_compute_limiter_benches_host(spark, tmp_path):
    """A host whose summed simulated fetch latency blows the compute budget
    gets benched the following superstep (computeLimiter.consume/exhaust,
    reference providers/limiting/computeLimiter.js:27-60)."""
    N, H = 400, 2
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=8).cache()
    robots = synth_robots(spark, n_hosts=H, default_budget=1000)
    # avg fetch_ms ≈ 110 → 50 fetches ≈ 5500ms; budget 3000 → benched
    c = _crawler(
        spark, tmp_path, corpus, robots,
        batch_size=100, host_budget=1000, compute_budget_ms=3000, bench_supersteps=1,
    )
    # seed enough that the first superstep's per-host latency blows the budget
    c.seed([page_url(i, N, H, False) for i in range(100)])
    s0 = c.superstep()
    assert s0["selected"] > 0
    m0 = (
        c.catalog.table("metrics").read()
        .filter((F.col("superstep") == 0) & (F.col("host") != "__run__"))
        .groupBy("host").agg(F.sum("fetch_ms_sum").alias("ms"))
        .collect()
    )
    over = {r["host"] for r in m0 if r["ms"] > 3000}
    assert over, "fixture should blow the budget for at least one host"
    s1 = c.superstep()
    m1 = c.catalog.table("metrics").read().filter(
        (F.col("superstep") == 1) & (F.col("host") != "__run__")
    )
    fetched_hosts = {r["host"] for r in m1.select("host").collect()}
    assert not (over & fetched_hosts), f"benched hosts fetched anyway: {over & fetched_hosts}"
    if s1.get("idle"):
        # every host was benched: the clock advanced instead of terminating
        assert c.catalog.table("frontier").read().count() > 0


def test_consume_arithmetic_reference_parity():
    """Pure re-derivation of ComputeLimiter.consume/allocate
    (computeLimiter.js:27-58): adaptive baseline, preallocation subtraction,
    overage + window/4 reset on overrun."""
    from ospo_ghcrawler_spark.operators.politeness import consume_arithmetic

    # under the limit: consumed = amount - min(amount, baseline) - prealloc
    r = consume_arithmetic(amount=700, baseline=500, preallocated=100,
                           current=0, limit=15000, window_sec=15)
    assert r["baseline"] == 500 and r["consumed"] == 100 and r["remaining"] == 14900
    # baseline adapts DOWN to a faster observation
    r = consume_arithmetic(amount=300, baseline=500, preallocated=0,
                           current=0, limit=15000, window_sec=15)
    assert r["baseline"] == 300 and r["consumed"] == 0
    # overrun: overage + reset window/4 ahead (computeLimiter.js:51-55)
    r = consume_arithmetic(amount=20500, baseline=500, preallocated=0,
                           current=0, limit=15000, window_sec=15)
    assert r["overage"] == 5000 and r["reset_delta_ms"] == 3750


def test_bench_persists_for_bench_supersteps(spark, tmp_path):
    """bench_supersteps > 1 must keep the host benched for that many steps
    even though a benched host emits no metrics while benched (ADVICE r01)."""
    N, H = 400, 2
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=0).cache()
    robots = synth_robots(spark, n_hosts=H, default_budget=1000)
    # batch 60 of 120 seeds: half the frontier stays queued while benched
    c = _crawler(
        spark, tmp_path, corpus, robots,
        batch_size=60, host_budget=1000, compute_budget_ms=1000, bench_supersteps=3,
    )
    c.seed([page_url(i, N, H, False) for i in range(120)])
    s0 = c.superstep()
    assert s0["selected"] > 0
    # both hosts blow the 1000ms budget at step 0 → benched for steps 1..3
    for expect_idle_step in (1, 2, 3):
        s = c.superstep()
        assert s.get("idle"), f"step {expect_idle_step} should be fully benched"
    s4 = c.superstep()
    assert s4.get("selected", 0) > 0, "bench must expire at step 4"


def test_priority_preemption(spark, tmp_path):
    """Events (priority 0) preempt normal work; retry of event work re-enters
    at immediate (reference _retryQueue='immediate',
    lib/crawlerFactory.js:678)."""
    N, H = 100, 3
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=0).cache()
    robots = synth_robots(spark, n_hosts=H, default_budget=1000)
    c = _crawler(spark, tmp_path, corpus, robots, batch_size=4, host_budget=1000)
    normal = [page_url(i, N, H, False) for i in range(10, 20)]
    events = [page_url(i, N, H, False) for i in range(4)]
    c.seed(normal, priority=3)
    c.seed(events, priority=0)
    c.superstep()
    got = {r["url"] for r in c.catalog.table("pages").read().select("url").collect()}
    # weighted quotas (events:10 normal:3 of Σ20): batch 4 → 3 events + 1 normal,
    # mirroring the reference's weighted interleave rather than strict priority
    assert len(got & set(events)) == 3
    assert len(got & set(normal)) == 1


def test_crawl_delay_caps_budget(spark):
    """robots Crawl-delay → per-superstep cap = floor(window/delay), min 1;
    0/null delay → no cap (effective_host_budget)."""
    from ospo_ghcrawler_spark.operators.politeness import effective_host_budget

    rows = [
        ("a.example", [], 500, 1000),    # window 2000ms / 500 → cap 4
        ("b.example", [], 0, 1000),      # no directive → config cap
        ("c.example", [], 5000, 1000),   # delay > window → still 1
        ("d.example", [], 100, 2),       # robots budget 2 binds below delay cap 20
    ]
    robots = spark.createDataFrame(rows, ROBOTS_SCHEMA)
    cfg = CrawlConfig(host_budget=50, superstep_window_ms=2000)
    got = {r["host"]: r["host_budget"] for r in effective_host_budget(robots, cfg).collect()}
    assert got == {"a.example": 4, "b.example": 50, "c.example": 1, "d.example": 2}


def test_crawl_delay_enforced_in_crawl(spark, tmp_path):
    """End-to-end: a host demanding a binding Crawl-delay never exceeds
    floor(window/delay) fetches in any superstep."""
    N, H = 200, 2
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=6).cache()
    # both hosts demand 400ms; window 1200ms → cap 3 per superstep
    robots = synth_robots(spark, n_hosts=H, default_budget=1 << 20, crawl_delay_ms=400)
    c = _crawler(spark, tmp_path, corpus, robots, batch_size=50,
                 host_budget=1 << 20, superstep_window_ms=1200)
    c.seed([page_url(i, N, H, False) for i in range(10)])
    for _ in range(6):
        if not c.superstep():
            break
    m = c.catalog.table("metrics").read().filter(F.col("host") != "__run__")
    worst = m.groupBy("superstep", "host").agg(F.sum("selected").alias("n")).agg(
        F.max("n")
    ).collect()[0][0]
    assert worst is not None and worst <= 3, f"crawl-delay cap violated: {worst} > 3"
