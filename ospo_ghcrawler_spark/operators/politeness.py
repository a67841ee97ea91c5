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
    """(host, budget) dim: min(config cap, robots budget_per_window, and the
    robots Crawl-delay directive re-expressed per superstep window).

    The superstep is the engine's fixed politeness window (the batch analog
    of the reference's windowed rate limiter, providers/limiting/
    inmemoryRateLimiter.js:26): a host demanding ``crawl_delay_ms`` between
    hits can absorb at most ``floor(superstep_window_ms / crawl_delay_ms)``
    fetches per window (≥1 so a delayed host still progresses). 0/null delay
    means "no directive"."""
    delay_cap = F.when(
        F.col("crawl_delay_ms") > 0,
        F.greatest(
            F.floor(F.lit(cfg.superstep_window_ms) / F.col("crawl_delay_ms")),
            F.lit(1),
        ),
    ).otherwise(F.lit(cfg.host_budget))
    return robots.select(
        "host",
        F.least(
            F.lit(cfg.host_budget),
            F.coalesce("budget_per_window", F.lit(cfg.host_budget)),
            F.coalesce(delay_cap, F.lit(cfg.host_budget)),
        )
        .cast("long")
        .alias("host_budget"),
    )


def consume_arithmetic(
    amount: float,
    baseline: float,
    preallocated: float,
    current: float,
    limit: float,
    window_sec: float,
) -> dict:
    """The reference ComputeLimiter's consume/allocate arithmetic as a pure
    function (providers/limiting/computeLimiter.js:27-58):

    - the baseline adapts down to the fastest observed call (line 30);
    - consumed = amount - baseline - preallocated (line 31);
    - over the limit → overage + a reset window/4 ahead (lines 51-55);
    - otherwise → remaining.
    """
    baseline = min(amount, baseline)
    consumed = amount - baseline - preallocated
    new_current = current + consumed
    if new_current > limit:
        return {
            "baseline": baseline,
            "consumed": consumed,
            "overage": new_current - limit,
            "reset_delta_ms": int(window_sec * 1000 // 4),
        }
    return {"baseline": baseline, "consumed": consumed, "remaining": limit - new_current}


def compute_limiter_benches(metrics_prev: DataFrame, cfg: CrawlConfig, step: int) -> DataFrame:
    """Hosts whose *effective* consumed latency in a recent superstep window
    blew the compute budget → benched until overrun_step + 1 + bench_supersteps.

    Batch re-expression of ComputeLimiter.consume (computeLimiter.js:27-33):
    per window, consumed = Σ amount − n·baseline − n·preallocated, where the
    baseline is the min observed per-call latency (the adaptive floor) and
    preallocated is the per-call amount already accounted elsewhere. The
    lookback spans ``bench_supersteps`` windows so a bench persists even
    though a benched host emits no metrics while benched.

    Returns (host, bench_until) to be merged onto the frontier.
    """
    lookback = max(cfg.bench_supersteps, 1)
    window = metrics_prev.filter(
        (F.col("superstep") >= step - lookback)
        & (F.col("superstep") < step)
        & (F.col("host") != "__run__")
    )
    per_step = window.groupBy("host", "superstep").agg(
        F.sum("fetch_ms_sum").alias("spent_ms"),
        F.sum("selected").alias("n_calls"),
    )
    # adaptive baseline: min per-call latency the host has shown in the window
    base = window.groupBy("host").agg(
        F.coalesce(F.min("fetch_ms_min"), F.lit(0)).alias("baseline_ms")
    )
    consumed = per_step.join(base, "host").withColumn(
        "consumed_ms",
        F.col("spent_ms")
        - F.col("n_calls") * (F.col("baseline_ms") + F.lit(cfg.preallocated_ms)),
    )
    return (
        consumed.filter(F.col("consumed_ms") > cfg.compute_budget_ms)
        .groupBy("host")
        .agg(F.max("superstep").alias("overrun_step"))
        .select(
            "host",
            (F.col("overrun_step") + 1 + cfg.bench_supersteps).cast("int").alias("bench_until"),
        )
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
