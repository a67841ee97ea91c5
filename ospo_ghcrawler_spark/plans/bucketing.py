"""Bucketed-table co-location — the shuffle-free join seam for 100 TB.

Every superstep joins batch-sized url sets against the corpus-sized
``seen`` table (anti-join) and the frontier (engine.py). At sandbox scale
those shuffles are cheap; at 10^10 urls the seen-side shuffle dominates the
superstep. The scale fix is storage-level co-location: persist the big
tables **bucketed by the join key** so Spark's bucketed scan satisfies the
join's distribution requirement and the Exchange disappears from the plan
(the Iceberg analog is a ``bucket(N, url_hash)`` partition transform, which
the catalog seam adopts when the runtime jar is present —
plans/catalog.py).

This module is the parquet-shim version of that contract:

- :func:`write_bucketed` — save a DataFrame as a parquet table bucketed
  (and sorted) by the key, via the session catalog;
- :func:`read_table` — read it back with bucketing metadata intact;
- the plan guarantee is pinned by ``tests/test_bucketing.py``: a
  key-equal join of two co-bucketed tables contains **zero**
  ShuffleExchange operators, while the same join over plain parquet
  contains two.

Bucket-count guidance at 100 TB: pick buckets so one bucket of the BIG
side fits an executor's shuffle memory (e.g. 2^13-2^15 for a 10^10-row
seen table); both sides must use the SAME count for co-location, and the
count is fixed at write time — resize by rewriting (Iceberg: a metadata
partition-spec evolution instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist *df* as a session-catalog parquet table bucketed and sorted
    by *key*. Sorting inside buckets additionally enables sort-merge joins
    with neither exchange NOR per-task sort."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode(mode)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count ShuffleExchange operators in the physical plan (AQE off or
    final plan) — the co-location assertion used by the plan pins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
