"""Streaming politeness monitors — the reference's limiter loop as
Structured Streaming operators.

The batch engine re-expresses the reference's rate limiter as per-superstep
window aggregation (operators/politeness.py). A live deployment ALSO wants
the limiter to run against the fetch-event stream itself, the way the
reference's Redis limiter ticks on every request
(/root/reference/providers/limiting/inmemoryRateLimiter.js:17-36) and the
compute limiter accumulates consumed latency until it benches a host
(/root/reference/providers/limiting/computeLimiter.js:27-60). Two
re-expressions:

- :func:`streaming_window_counts` — watermarked tumbling-window counts per
  host with an over-budget flag: late fetch events (stragglers reporting
  after the window closed) are bounded by the watermark, exactly the
  fixed-window `ratelimit:{key}` counter semantics;
- :func:`streaming_compute_limiter` — a CUSTOM STATEFUL operator
  (``applyInPandasWithState``): per-host running consumed-latency with the
  adaptive min-observed baseline (computeLimiter.js:30: the baseline adapts
  down to the fastest call ever seen), emitting a bench row whenever a
  host's window consumption crosses the budget. State survives micro-batches
  — the streaming analog of the engine's cross-superstep bench table.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FETCH_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("fetch_ms", T.LongType(), False),
    ]
)

BENCH_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("consumed_ms", T.LongType(), False),
        T.StructField("baseline_ms", T.LongType(), False),
        T.StructField("n_calls", T.LongType(), False),
        T.StructField("over_budget", T.BooleanType(), False),
        T.StructField("window_start_ms", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("consumed_ms", T.LongType(), False),
        T.StructField("baseline_ms", T.LongType(), False),
        T.StructField("n_calls", T.LongType(), False),
        T.StructField("window_start_ms", T.LongType(), False),
    ]
)


def streaming_window_counts(
    events: DataFrame, window: str = "1 minute", budget: int = 30,
    watermark: str = "2 minutes", host_col: str = "host", ts_col: str = "ts",
) -> DataFrame:
    """Watermarked fixed-window per-host call counts with over-budget flag —
    the InMemoryRateLimiter's `count > limit` check as a streaming windowed
    aggregation. Works identically on a batch DataFrame (watermark is a
    no-op there), which is how the oracle tests pin it."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.col(host_col), F.window(ts_col, window).alias("w"))
        .agg(F.count("*").alias("used"), F.sum("fetch_ms").alias("spent_ms"))
        .select(
            host_col,
            F.col("w.start").alias("window_start"),
            "used",
            "spent_ms",
            (F.col("used") > budget).alias("over"),
        )
    )


def streaming_compute_limiter(
    events: DataFrame, budget_ms: int, preallocated_ms: int = 0,
    window_ms: int = 60_000,
) -> DataFrame:
    """Per-host stateful compute limiter over a fetch-event stream.

    ``applyInPandasWithState`` keeps (consumed_ms, baseline_ms, n_calls,
    window_start_ms) per host; each micro-batch folds its events (in event-
    time order) with the reference's consume arithmetic: ``consumed +=
    amount − baseline − preallocated`` with the baseline adapting DOWN to
    the fastest call observed (computeLimiter.js:27-33). Consumption is
    WINDOWED, like the reference's Redis limiter whose accumulator key
    expires per window (computeLimiter.js consume → rate-limiter TTL): an
    event past ``window_ms`` from the window start opens a fresh window and
    resets consumed_ms, so ``over_budget`` reflects the current window's
    consumption and a benched host recovers once a calm window passes
    (ADVICE r02 — an unwindowed accumulator benched hosts forever). The
    baseline and the lifetime n_calls counter survive window resets (the
    reference's baseline also never resets).

    Emits one row per (host, batch) with the current-window totals and the
    over-budget flag — the caller benches the host (cf. the batch engine's
    ``compute_limiter_benches``)."""

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            consumed, baseline, n_calls, win_start = state.get
        else:
            consumed, baseline, n_calls, win_start = 0, (1 << 62), 0, -1
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("ts", kind="stable")
        for ts, amount in zip(batch["ts"], batch["fetch_ms"]):
            a = int(amount)
            t_ms = int(pd.Timestamp(ts).value // 1_000_000)
            if win_start < 0 or t_ms >= win_start + window_ms:
                win_start = t_ms  # new window opens on its first event
                consumed = 0
            baseline = min(baseline, a)  # adaptive floor, line 30
            consumed += a - baseline - preallocated_ms
            n_calls += 1
        state.update((consumed, baseline, n_calls, win_start))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "consumed_ms": [consumed],
                "baseline_ms": [baseline],
                "n_calls": [n_calls],
                "over_budget": [consumed > budget_ms],
                "window_start_ms": [win_start],
            }
        )

    return events.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=BENCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
