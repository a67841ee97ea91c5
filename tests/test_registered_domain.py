"""Registered-domain extraction (public-suffix-lite) + fused refetch
priority — unit pins. Oracle parity at sf0.01 runs in test_oracle_parity.py
(`registered_domain`, `refetch_priority`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.functions.urls import registered_domain_col


CASES = {
    "www.example.com": "example.com",
    "a.b.c.example.com": "example.com",
    "example.com": "example.com",
    "deep.sub.shop.co.uk": "shop.co.uk",
    "shop.co.uk": "shop.co.uk",
    # exactly a public suffix with nothing registered under it: the
    # heuristic has no registrable label to pick, falls back to last-2
    "co.uk": "co.uk",
    "cdn1.media.com.au": "media.com.au",
    "x.co.jp": "x.co.jp",
    "localhost": "localhost",
    "intranet7": "intranet7",
    # case-insensitive suffix match, original case preserved
    "WWW.Shop.CO.UK": "Shop.CO.UK",
}


def test_registered_domain_cases(spark):
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    got = {
        r["host"]: r["domain"]
        for r in df.select(
            "host", registered_domain_col(F.col("host")).alias("domain")
        ).collect()
    }
    assert got == CASES


def test_refetch_priority_hint_bounds_gap(spark, tmp_path):
    """A hot page (observed gap < hint) keeps its observed cadence; a page
    with a tight publisher hint recrawls at the hint."""
    import datetime as dt

    from ospo_ghcrawler_spark import queries as Q

    base = dt.datetime(2026, 1, 1)
    rows = []
    # user 1 ('hourly' hint = 3600s): observed gap 60 s -> fused uses 60 s
    for i in range(4):
        rows.append((i, base + dt.timedelta(seconds=60 * i), 1, "view", 0.0, ""))
    # user 7 ('hourly' hint since 7%6=1): observed gap 7200 s -> fused uses hint
    for i in range(4):
        rows.append((10 + i, base + dt.timedelta(seconds=7200 * i), 7, "view", 0.0, ""))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["user_id"]: r for r in Q.q_refetch_priority(spark, str(tmp_path)).collect()
    }
    us = 1_000_000
    last1 = int((base + dt.timedelta(seconds=180)).timestamp()) * us
    last7 = int((base + dt.timedelta(seconds=21600)).timestamp()) * us
    assert got[1]["next_due_fused_us"] == last1 + 60 * us  # observed wins
    assert got[7]["next_due_fused_us"] == last7 + 3600 * us  # hint wins
    assert got[1]["changefreq"] == "hourly" and got[7]["changefreq"] == "hourly"
