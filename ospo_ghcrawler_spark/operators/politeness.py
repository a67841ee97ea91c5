"""Per-host politeness: robots gating, windowed budgets, compute limiting.

Re-expresses the reference's token machinery as per-host accounting:

- token call cap 30/1s-window (/root/reference/providers/fetcher/
  limitedTokenFactory.js:19-42, caps at lib/crawlerFactory.js:67-69)
  → per-host budget_per_window enforced by window-rank in the selection;
- token exhaust/bench until a restore time (/root/reference/providers/fetcher/
  tokenFactory.js:74-86) → ``not_before_step`` bumps on a host's rows;
- the adaptive compute limiter (15000ms consumed latency / 15s window,
  bench window/4 on overrun, /root/reference/providers/limiting/
  computeLimiter.js:27-60) → per-host sum(fetch_ms) from the previous
  superstep's metrics table throttles the next superstep's host budget;
- robots.txt disallow prefixes → JVM-side ``exists()`` prefix filter
  (the reference's org allow-list filter analog,
  /root/reference/lib/crawlerFactory.js:633-650).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig


def path_of(url: Column) -> Column:
    """Path component (with leading /) of a canonical URL."""
    after = F.substring_index(url, "://", -1)
    authority = F.substring_index(after, "/", 1)
    rest = after.substr(F.length(authority) + 1, F.lit(1 << 30))
    return F.when(F.length(rest) == 0, F.lit("/")).otherwise(rest)


def robots_allowed_filter(df: DataFrame, robots: DataFrame, url_col: str = "url") -> DataFrame:
    """Drop rows whose URL path starts with any of the host's disallow
    prefixes. Broadcast join (robots is a small dim) + JVM-side array
    ``exists`` — no Python in the path."""
    r = robots.select("host", "disallow_prefixes")
    path = path_of(F.col(url_col))
    return (
        df.join(F.broadcast(r), on="host", how="left")
        .withColumn(
            "_denied",
            F.when(
                F.col("disallow_prefixes").isNotNull(),
                F.exists("disallow_prefixes", lambda p: path.startswith(p)),
            ).otherwise(F.lit(False)),
        )
        .filter(~F.col("_denied"))
        .drop("disallow_prefixes", "_denied")
    )


def effective_host_budget(robots: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """(host, budget) dim: min(config cap, robots budget_per_window)."""
    return robots.select(
        "host",
        F.least(F.lit(cfg.host_budget), F.coalesce("budget_per_window", F.lit(cfg.host_budget))).alias(
            "host_budget"
        ),
    )


def compute_limiter_benches(metrics_prev: DataFrame, cfg: CrawlConfig, step: int) -> DataFrame:
    """Hosts whose summed fetch latency in the previous superstep window blew
    the compute budget → benched until step + bench_supersteps.

    Returns (host, not_before_step) to be merged onto the frontier.
    """
    return (
        metrics_prev.filter(F.col("superstep") == step - 1)
        .groupBy("host")
        .agg(F.sum("fetch_ms_sum").alias("spent_ms"))
        .filter(F.col("spent_ms") > cfg.compute_budget_ms)
        .select("host", F.lit(step + cfg.bench_supersteps).cast("int").alias("bench_until"))
    )


def windowed_token_accounting(
    events: DataFrame, key: str, ts_col: str, window: str, budget: int
) -> DataFrame:
    """Generic fixed-window counter — the reference's InMemoryRateLimiter
    (`count += incr` per ``ratelimit:{key}`` bucket, over = count > limit,
    /root/reference/providers/limiting/inmemoryRateLimiter.js:17-36) as one
    tumbling-window aggregation."""
    return (
        events.groupBy(key, F.window(ts_col, window).alias("w"))
        .agg(F.count("*").alias("used"))
        .select(
            F.col(key),
            F.col("w.start").alias("window_start"),
            F.col("used"),
            F.lit(budget).alias("budget"),
            (F.col("used") > budget).alias("over"),
        )
    )
