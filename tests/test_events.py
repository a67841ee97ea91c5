"""Event-stream operators: sessionization, session stats, as-of match."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.operators import events as EV

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, user_id, minutes_after_t0, event_type, value)"""
    data = [
        (eid, uid, T0 + dt.timedelta(minutes=m), typ, float(val), "{}")
        for (eid, uid, m, typ, val) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )


def test_sessionize_gap_semantics(spark):
    # user 1: events at 0, 10, 29, 65 min (gap=30): the 65' event starts a
    # new session ONLY because 65-29 > 30; 29-10 and 10-0 stay inside.
    # user 2: single event. Exactly-at-gap (user 3: 0 and 30') stays inside.
    df = _ev(
        spark,
        [
            (1, 1, 0, "view", 0),
            (2, 1, 10, "click", 0),
            (3, 1, 29, "view", 0),
            (4, 1, 65, "click", 0),
            (5, 2, 0, "view", 0),
            (6, 3, 0, "view", 0),
            (7, 3, 30, "view", 0),
        ],
    )
    got = {
        r["event_id"]: r["session_id"]
        for r in EV.sessionize(df, gap_minutes=30).collect()
    }
    assert got[1] == got[2] == got[3] == 1_000_001
    assert got[4] == 1_000_002
    assert got[5] == 2_000_001
    assert got[6] == got[7] == 3_000_001  # ts diff == gap is NOT a break


def test_session_stats_rollup(spark):
    df = _ev(
        spark,
        [
            (1, 1, 0, "view", 0),
            (2, 1, 5, "purchase", 10.5),
            (3, 1, 8, "purchase", 2.25),
            (4, 1, 100, "view", 0),
        ],
    )
    rows = {
        r["session_id"]: r
        for r in EV.session_stats(df, gap_minutes=30).collect()
    }
    s1, s2 = rows[1_000_001], rows[1_000_002]
    assert s1["n_events"] == 3 and s2["n_events"] == 1
    assert s1["duration_us"] == 8 * 60 * 1_000_000
    assert s1["n_purchases"] == 2 and abs(s1["total_value"] - 12.75) < 1e-9
    assert s2["n_purchases"] == 0 and s2["total_value"] == 0.0


def test_asof_match_latest_prior_view(spark):
    # user 1: view(1) @0, click(2) @5  -> matches view 1, lag 5 min
    #         view(3) @6, view(4) @7, click(5) @9 -> matches view 4 (latest)
    # user 2: click(6) @0 with no prior view -> NULL match
    # self-exclusion: click at the SAME ts as a view with a smaller
    # event_id picks that view (order is (ts, event_id)).
    df = _ev(
        spark,
        [
            (1, 1, 0, "view", 0),
            (2, 1, 5, "click", 0),
            (3, 1, 6, "view", 0),
            (4, 1, 7, "view", 0),
            (5, 1, 9, "click", 0),
            (6, 2, 0, "click", 0),
            (7, 3, 0, "view", 0),
            (8, 3, 0, "click", 0),
        ],
    )
    got = {r["event_id"]: r for r in EV.asof_match(df).collect()}
    assert got[2]["ref_event_id"] == 1
    assert got[2]["lag_us"] == 5 * 60 * 1_000_000
    assert got[5]["ref_event_id"] == 4
    assert got[6]["ref_event_id"] is None and got[6]["lag_us"] is None
    assert got[8]["ref_event_id"] == 7 and got[8]["lag_us"] == 0


def test_asof_ignores_other_event_types(spark):
    # a purchase between view and click must not shadow the view
    df = _ev(
        spark,
        [
            (1, 1, 0, "view", 0),
            (2, 1, 1, "purchase", 5.0),
            (3, 1, 2, "click", 0),
        ],
    )
    got = {r["event_id"]: r for r in EV.asof_match(df).collect()}
    assert got[3]["ref_event_id"] == 1


def test_sessionize_single_shuffle_plan(spark):
    """Scale posture: exactly one Exchange (hash on user_id) in the plan."""
    df = _ev(spark, [(1, 1, 0, "view", 0)])
    plan = EV.sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_parallelism_invariant(spark):
    rows = [
        (i, i % 7, (i * 13) % 300, ("view", "click")[i % 2], 0.0)
        for i in range(200)
    ]
    df1 = _ev(spark, rows).repartition(1)
    df2 = _ev(spark, rows).repartition(16)
    a = sorted(map(tuple, EV.sessionize(df1).collect()))
    b = sorted(map(tuple, EV.sessionize(df2).collect()))
    assert a == b


def test_refetch_schedule_telescoping_mean(spark):
    from ospo_ghcrawler_spark.operators.events import refetch_schedule

    rows = [
        # key 1: gaps 10s, 20s, 30s -> mean 20s exactly
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:00:10", "view"),
        (3, 1, "2024-01-01 00:00:30", "view"),
        (4, 1, "2024-01-01 00:01:00", "view"),
        # key 2: only 2 obs -> dropped (min_obs=3)
        (5, 2, "2024-01-01 00:00:00", "view"),
        (6, 2, "2024-01-01 00:05:00", "view"),
        # key 3: clicks only -> dropped (wrong type)
        (7, 3, "2024-01-01 00:00:00", "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts", "event_type")
    got = {r["user_id"]: r for r in refetch_schedule(ev).collect()}
    assert set(got) == {1}
    r = got[1]
    assert r["n_obs"] == 4
    assert r["mean_gap_us"] == 20_000_000
    assert r["next_due_us"] == r["last_us"] + 20_000_000
