"""Clickstream / event-log operators over the ``events`` table.

A crawl corpus at 100 TB ships with an event side-channel (fetch logs,
user interactions, recrawl triggers — the reference emits per-request
lifecycle events through its queue wiring, crawlerFactory.js event hooks);
these operators are the standard analytics any such stream needs and that
Spark has no single built-in for:

- **sessionization** — gap-based session assignment. One shuffle on
  ``user_id``; everything after is a per-partition window scan, so the
  plan scales linearly with events and is skew-bounded by the busiest
  user (real skew defeats: salt the window by day for pathological
  single-key streams — not needed for per-user web activity).
- **as-of match** — each event of one type joined to the most recent
  prior event of another type for the same user. Implemented the
  scale-safe way: a UNION + one window with ``last(..., ignorenulls)``
  — ONE shuffle, no range join, no per-row probe. The naive correlated
  subquery the oracle uses is O(N·M) and exists only as the DuckDB
  cross-check.
- **session stats** — per-session rollup built on sessionize's output
  (composition: window → groupBy, two shuffles total, map-side combine
  on the second).

All outputs are integer/epoch-micro columns so the driver's value-hash
comparison is bit-exact (no float formatting hazards); the one double
(``total_value``) is rounded to 6 decimals in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MIN = 30


def _us(col: str):
    """Epoch microseconds of a timestamp column, tolerant of TIMESTAMP_NTZ
    (what parquet-naive columns load as). The cast NTZ→TIMESTAMP applies the
    session timezone; the driver-query wrapper pins it to UTC, which matches
    DuckDB's epoch_us over the same naive parquet values. Gap/lag outputs are
    differences, so they are timezone-invariant regardless."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _with_session(events: DataFrame, gap_minutes: int) -> DataFrame:
    """events + session_id. A session breaks when the per-user gap since
    the previous event exceeds *gap_minutes*. Deterministic total order
    inside a user: (ts, event_id) — event_id is unique, so RANGE/ROWS
    frames agree and the assignment is parallelism-invariant."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(_us("ts")).over(w)
    is_new = F.when(
        prev_us.isNull() | (_us("ts") - prev_us > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    seq = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # single bigint key: user_id * 1e6 + per-user session ordinal
    return events.withColumn(
        "session_id",
        (F.col("user_id") * F.lit(1_000_000) + seq).cast("bigint"),
    )


def sessionize(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN) -> DataFrame:
    """(event_id, user_id, session_id) — gap-based sessionization."""
    return _with_session(events, gap_minutes).select(
        "event_id", "user_id", "session_id"
    )


def session_stats(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN) -> DataFrame:
    """Per-session rollup: bounds, size, purchase count + value.

    Composition on top of :func:`sessionize`: the groupBy re-shuffles on
    ``session_id`` (which embeds user_id, so hot users spread across their
    sessions) with map-side combine; all aggregates are algebraic."""
    s = _with_session(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(_us("ts")).alias("start_us"),
        F.max(_us("ts")).alias("end_us"),
        (F.max(_us("ts")) - F.min(_us("ts"))).alias(
            "duration_us"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purchases"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    F.lit(0.0)
                )
            ),
            6,
        ).alias("total_value"),
    )


def asof_match(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "view",
) -> DataFrame:
    """Each *left_type* event matched to the most recent *right_type*
    event at-or-before it (by (ts, event_id) order, self excluded) for
    the same user; unmatched lefts kept with NULL.

    The scalable shape: filter both types, tag reference rows, ONE window
    pass with ``last(ignorenulls)`` over a rows-frame ending at the
    previous row. One shuffle on user_id; no range join, no broadcast of
    the reference side (which at 100 TB is the same order of magnitude as
    the probe side)."""
    both = events.filter(F.col("event_type").isin(left_type, right_type))
    ref0 = F.when(
        F.col("event_type") == right_type, F.col("event_id")
    ).cast("bigint")
    ref_us0 = F.when(
        F.col("event_type") == right_type, _us("ts")
    ).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = both.withColumn("ref_event_id", F.last(ref0, ignorenulls=True).over(w))
    m = m.withColumn("ref_us", F.last(ref_us0, ignorenulls=True).over(w))
    return m.filter(F.col("event_type") == left_type).select(
        "event_id",
        "user_id",
        "ref_event_id",
        (_us("ts") - F.col("ref_us")).cast("bigint").alias("lag_us"),
    )


def sessionize_sql(gap_minutes: int = DEFAULT_GAP_MIN) -> str:
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
        WITH g AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               CAST(user_id * 1000000 + SUM(is_new) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM g
    """


def session_stats_sql(gap_minutes: int = DEFAULT_GAP_MIN) -> str:
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
        WITH g AS (
          SELECT *,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT *,
                 CAST(user_id * 1000000 + SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS session_id
          FROM g
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(epoch_us(ts)) AS start_us,
               max(epoch_us(ts)) AS end_us,
               max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_purchases,
               round(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6)
                 AS total_value
        FROM s GROUP BY user_id, session_id
    """


def asof_match_sql(left_type: str = "click", right_type: str = "view") -> str:
    return f"""
        WITH both_t AS (
          SELECT event_id, user_id, ts, event_type,
                 CASE WHEN event_type = '{right_type}' THEN event_id END AS ref0,
                 CASE WHEN event_type = '{right_type}' THEN epoch_us(ts) END AS ref_us0
          FROM events WHERE event_type IN ('{left_type}', '{right_type}')
        ), m AS (
          SELECT *,
                 last_value(ref0 IGNORE NULLS) OVER w AS ref_event_id,
                 last_value(ref_us0 IGNORE NULLS) OVER w AS ref_us
          FROM both_t
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, ref_event_id,
               CAST(epoch_us(ts) - ref_us AS BIGINT) AS lag_us
        FROM m WHERE event_type = '{left_type}'
    """


def refetch_schedule(
    events: DataFrame, event_type: str = "view", min_obs: int = 3
) -> DataFrame:
    """Change-rate recrawl scheduling: per key, the mean observed
    inter-arrival interval predicts the next due time —
    ``next_due_us = last_us + floor(mean_gap_us)``. This is the adaptive
    recrawl policy a production crawler runs over its fetch/change log
    (the reference recrawls on a fixed cadence via requeue —
    providers/queuing/*; rate-adaptive scheduling is the engine-native
    upgrade); the events table stands in for the per-url change log with
    user_id as the url key.

    Shape: one shuffle (groupBy key) with map-side combine — mean gap =
    (max-min)/(n-1) telescopes, so no window pass is needed at all; keys
    with fewer than *min_obs* observations are dropped (no rate evidence).
    All outputs are integer micros ⇒ bit-exact vs the oracle."""
    g = events.filter(F.col("event_type") == event_type).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.min(_us("ts")).alias("first_us"),
        F.max(_us("ts")).alias("last_us"),
    )
    return g.filter(F.col("n_obs") >= min_obs).select(
        "user_id",
        "n_obs",
        "last_us",
        F.expr("(last_us - first_us) div (n_obs - 1)").alias("mean_gap_us"),
        (
            F.col("last_us") + F.expr("(last_us - first_us) div (n_obs - 1)")
        ).alias("next_due_us"),
    )


def refetch_schedule_sql(event_type: str = "view", min_obs: int = 3) -> str:
    return f"""
        SELECT user_id, n_obs, last_us,
               (last_us - first_us) // (n_obs - 1) AS mean_gap_us,
               last_us + (last_us - first_us) // (n_obs - 1) AS next_due_us
        FROM (
          SELECT user_id, count(*) AS n_obs,
                 min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
          FROM events WHERE event_type = '{event_type}'
          GROUP BY user_id
        ) WHERE n_obs >= {min_obs}
    """
