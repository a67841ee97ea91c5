"""Provable-termination fast stop.

When the unbound-budget selection fast path already shows the batch covered
every eligible-now row, nothing wakes at a later step, and no new edge
survived dedup, the post-commit frontier provably holds no selectable row —
``run()`` stops WITHOUT a trailing empty-check selection (pure fixed
overhead on both legs of the N→4N scaling bench). Pins: the stop triggers
exactly at exhaustion, the crawl result is identical to the non-fast-stop
path, and a superstep after the stop still (redundantly but correctly)
reports emptiness.
"""

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

N, H = 200, 5


def _cfg(**kw):
    base = dict(
        batch_size=4 * N,  # covers the frontier → unbound fast path
        host_budget=1 << 30,
        compute_budget_ms=1 << 40,
        max_depth=64,
        collect_stats=False,
        expect_failures=False,
    )
    base.update(kw)
    return CrawlConfig(**base)


def test_run_stops_on_exhausted_flag(spark, tmp_path, request):
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=4).cache()
    request.addfinalizer(corpus.unpersist)
    # unbound per-host budgets → selection's fast path, where the proof lives
    robots = synth_robots(spark, n_hosts=H, default_budget=1 << 30, crawl_delay_ms=0)
    seeds = [page_url(i, N, H, False) for i in range(0, N, 2)]

    c = Crawler(spark, str(tmp_path / "fast"), corpus, robots, _cfg(), run_id="fs")
    c.seed(seeds)
    stats = []
    while True:
        s = c.superstep(pipelined=True)
        if not s:
            break
        stats.append(s)
        if s.get("exhausted"):
            break
    c._await_pending()
    assert stats, "crawl must run at least one superstep"
    assert stats[-1]["exhausted"], "last productive superstep must prove exhaustion"
    assert all(not s["exhausted"] for s in stats[:-1]), (
        "no earlier superstep may claim exhaustion while edges are still found"
    )
    # a redundant superstep after the proof still reports true emptiness
    assert c.superstep() == {}

    # identical outcome vs the plain (non-fast-stop consuming) loop
    c2 = Crawler(spark, str(tmp_path / "plain"), corpus, robots, _cfg(), run_id="pl")
    c2.seed(seeds)
    while c2.superstep(pipelined=False):
        pass
    seen_fast = {r["url_hash"] for r in c.catalog.table("seen").read().collect()}
    seen_plain = {r["url_hash"] for r in c2.catalog.table("seen").read().collect()}
    assert seen_fast == seen_plain and len(seen_fast) > len(seeds)


def test_no_fast_stop_while_rows_deferred(spark, tmp_path, request):
    """A future-waking row (politeness defer via not_before_step) blocks the
    proof: max_wake > step ⇒ the superstep must NOT claim exhaustion even
    when it found no new edges."""
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=0).cache()
    request.addfinalizer(corpus.unpersist)
    robots = synth_robots(spark, n_hosts=H, default_budget=1 << 30, crawl_delay_ms=0)
    c = Crawler(spark, str(tmp_path / "defer"), corpus, robots, _cfg(), run_id="df")
    c.seed([page_url(0, N, H, False)])
    # hand-defer a second url two steps out (engine defer semantics)
    f_t = c.catalog.table("frontier")
    extra = f_t.read().limit(0)
    c.seed([page_url(1, N, H, False)])
    f = f_t.read()
    bumped = f.withColumn(
        "not_before_step",
        F.when(f["url"] == page_url(1, N, H, False), F.lit(2)).otherwise(
            f["not_before_step"]
        ).cast("int"),
    )
    f_t.overwrite(bumped.select(*[c_.name for c_ in f.schema]))
    del extra

    s0 = c.superstep()
    assert s0["selected"] == 1 and not s0["exhausted"], (
        "deferred row wakes later — exhaustion must not be claimed"
    )
    s1 = c.superstep()  # idle-advance to the wake step
    assert s1.get("idle") or s1.get("selected") == 1
    totals = c.run(10)
    assert c.catalog.table("frontier").read().count() == 0 or totals is not None
    assert c.catalog.table("seen").read().count() == 2
