"""Plan pin: co-bucketed tables join with ZERO shuffle exchanges (the
storage-level co-location the engine's seen/frontier joins adopt at scale),
while the identical join over plain parquet shuffles both sides."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.plans.bucketing import (
    n_shuffle_exchanges,
    read_table,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    # force a real distributed join so the exchange count is meaningful
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_cobucketed_join_is_shuffle_free(spark, no_broadcast):
    big = spark.range(0, 5000).select(
        F.col("id").alias("url_hash"), (F.col("id") % 7).alias("step")
    )
    probe = spark.range(0, 500).select(
        F.col("id").alias("url_hash"), F.lit(1).alias("flag")
    )
    write_bucketed(big, "seen_b", "url_hash", 8)
    write_bucketed(probe, "probe_b", "url_hash", 8)
    try:
        a, b = read_table(spark, "seen_b"), read_table(spark, "probe_b")
        joined = a.join(b, "url_hash")
        assert n_shuffle_exchanges(joined) == 0
        assert joined.count() == 500  # co-location must not change results

        anti = a.join(b, "url_hash", "left_anti")
        assert n_shuffle_exchanges(anti) == 0
        assert anti.count() == 4500

        # control: the same join over non-bucketed data shuffles both sides
        plain = big.join(probe, "url_hash")
        assert n_shuffle_exchanges(plain) == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS seen_b")
        spark.sql("DROP TABLE IF EXISTS probe_b")
