"""Fetch stage: pluggable, default = deterministic simulated fetch.

The reference fetches through GitHubFetcher with etag support (wiring at
/root/reference/lib/crawlerFactory.js:240-246; fetch contract visible in the
test stub /root/reference/test/unit/processingTests.js:93-109 — the stub serves
a canned universe). The sandbox has no network, so the default fetcher serves
a synthetic ``pages`` corpus: a broadcast-hash join of the (small) selected
batch against the corpus scan, yielding html + status + a deterministic
simulated latency. A real ``aiohttp``-based fetcher plugs in by replacing
``simulated_fetch`` with a ``mapInPandas`` stage that performs batched async
GETs per partition — same input/output contract.

Statuses: 200 (in corpus), 404 (off corpus), 599 (injected transient failure,
exercises retry/abandon — /root/reference/providers/queuing/
inmemorycrawlqueue.js:54-58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig

FETCH_OUT_COLS = [
    "url", "url_hash", "host", "priority", "attempt", "depth",
    "enqueue_step", "seq", "fetch_salt", "html", "lang", "warc_ts",
    "status", "fetch_ms",
]


def simulated_fetch(selected: DataFrame, corpus: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Join the selected batch against the synthetic corpus.

    The batch is orders of magnitude smaller than the corpus, so Catalyst
    broadcasts it and streams the corpus scan (only url/html/lang/warc_ts
    columns are read — column pruning). Latency is a pure function of
    url_hash, so metrics/compute-limit behavior is reproducible.
    """
    body = corpus.select(
        F.col("url").alias("_curl"), "html", "lang", "warc_ts"
    )
    joined = selected.join(body, selected["url"] == body["_curl"], "left").drop("_curl")

    fetch_ms = (F.pmod(F.col("url_hash"), F.lit(180)) + F.lit(20)).cast("long")
    status = F.when(F.col("html").isNull(), F.lit(404)).otherwise(F.lit(200))
    if cfg.simulate_fetch_failure_every:
        # 1/N of urls fail permanently (dead-letter path); another 1/N fail
        # only on the first attempt (retry-then-succeed path)
        n = cfg.simulate_fetch_failure_every
        mod = F.pmod(F.col("url_hash"), F.lit(2 * n))
        permanent = mod == 0
        transient = (mod == 1) & (F.col("attempt") == 0)
        status = F.when(permanent | transient, F.lit(599)).otherwise(status)

    return (
        joined.withColumn("status", status)
        .withColumn("fetch_ms", fetch_ms)
        .withColumn("html", F.when(F.col("status") == 200, F.col("html")))
        .select(*FETCH_OUT_COLS)
    )
