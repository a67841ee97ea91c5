#!/usr/bin/env python
"""Dev profiling harness: decompose the w_pages stage (selection, hits join,
extraction, misses probe, write) at a given core count over a prebuilt
corpus. Usage:
    python scripts/profile_fetch.py build N_PAGES DIR
    python scripts/profile_fetch.py run CORES DIR [variant]
variants: full (default) | nomiss | miss_only | batch4k
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOSTS, LINKS, SENTENCES = 200, 25, int(os.environ.get("SPARK_GRAFT_BENCH_SENTENCES", "40"))


def build(n_pages: int, d: str) -> None:
    from ospo_ghcrawler_spark.session import get_spark
    from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots

    spark = get_spark("prof_build", cores=32, shuffle_partitions=32)
    synth_pages(spark, n_pages=n_pages, n_hosts=N_HOSTS, links_per_page=LINKS,
                partitions=64, sentences=SENTENCES).write.mode("overwrite").parquet(f"{d}/pages")
    synth_robots(spark, n_hosts=N_HOSTS, default_budget=1 << 30).write.mode(
        "overwrite").parquet(f"{d}/robots")


def run(cores: int, d: str, variant: str) -> None:
    from pyspark.sql import functions as F

    from ospo_ghcrawler_spark.functions.extract import extract_pages_map_in_pandas
    from ospo_ghcrawler_spark.functions.urls import host_col
    from ospo_ghcrawler_spark.schemas import EXTRACT_SCHEMA
    from ospo_ghcrawler_spark.session import get_spark

    extra = {}
    if variant == "batch4k":
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = "4096"
    if variant.endswith("_mp"):  # smaller input splits: more, balanced tasks
        extra["spark.sql.files.maxPartitionBytes"] = str(24 * 1024 * 1024)
        variant = variant[:-3]
    spark = get_spark(f"prof_{cores}", cores=cores, shuffle_partitions=cores,
                      extra_conf=extra)
    corpus = spark.read.parquet(f"{d}/pages")
    n = corpus.count()
    sel_n = n  # select every page: maximal batch, like bench superstep 1

    t0 = time.time()
    selected = (
        corpus.select("url")
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", host_col(F.col("url")))
        .withColumn("priority", F.lit(3))
        .withColumn("attempt", F.lit(0))
        .withColumn("depth", F.lit(0))
        .withColumn("enqueue_step", F.lit(0))
        .withColumn("seq", F.xxhash64("url"))
        .withColumn("fetch_salt", F.pmod(F.xxhash64("host"), F.lit(2 * cores)).cast("int"))
    ).cache()
    selected.count()
    t_sel = time.time() - t0

    sel_cols = ["url", "url_hash", "host", "priority", "attempt", "depth",
                "enqueue_step", "seq", "fetch_salt"]
    sel_slim = selected.select(*sel_cols)
    body = corpus.select(F.col("url").alias("_curl"), "html", "lang", "warc_ts")
    hits = body.join(F.broadcast(sel_slim), sel_slim["url"] == body["_curl"], "inner").drop("_curl")

    t0 = time.time()
    if variant == "joinonly":
        c = hits.select("url_hash").count()
        print(f"cores={cores} joinonly: sel={t_sel:.1f}s join+count={time.time()-t0:.1f}s ({c})",
              flush=True)
        return
    if variant == "nox":  # full write, no python extraction
        harvest = hits.withColumn("status", F.lit(200)).select(
            "url", "warc_ts", "html", "url_hash", "host", "priority",
            "attempt", "depth", "enqueue_step", "seq", "status",
            F.md5("html").alias("etag"))
        harvest.write.mode("overwrite").parquet(f"{d}/out_{cores}_nox")
        print(f"cores={cores} nox: sel={t_sel:.1f}s join+write={time.time()-t0:.1f}s",
              flush=True)
        return
    if variant == "ident":  # arrow round-trip without python extract work
        cols2 = ["url", "warc_ts", "html", "url_hash", "host", "priority",
                 "attempt", "depth", "enqueue_step", "seq"]
        fetched = hits.select(*cols2)

        def _id(batches):
            yield from batches

        schema2 = fetched.schema
        out2 = fetched.mapInPandas(_id, schema=schema2)
        out2.write.mode("overwrite").parquet(f"{d}/out_{cores}_ident")
        print(f"cores={cores} ident: sel={t_sel:.1f}s arrow+write={time.time()-t0:.1f}s",
              flush=True)
        return
    if variant == "pyonly":  # python extract work, no html/write downstream
        from ospo_ghcrawler_spark.functions.extract import extract_links, extract_text
        import pandas as pd

        def _ex(batches):
            for pdf in batches:
                texts = [extract_text(h) for h in pdf["html"]]
                links = [len(extract_links(h, u)) for h, u in zip(pdf["html"], pdf["url"])]
                yield pd.DataFrame({"url_hash": pdf["url_hash"],
                                    "n": [len(t) for t in texts],
                                    "k": links})

        r = hits.select("url", "url_hash", "html").mapInPandas(
            _ex, schema="url_hash long, n int, k int").agg(F.sum("n"), F.sum("k")).collect()
        print(f"cores={cores} pyonly: extract-only={time.time()-t0:.1f}s {r}", flush=True)
        return
    if variant == "miss_only":
        from ospo_ghcrawler_spark.operators.fetch import _corpus_url_set
        bc = _corpus_url_set(corpus)
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def _in(urls: pd.Series) -> pd.Series:
            return urls.isin(bc.value)

        m = selected.filter(~_in(F.col("url"))).count()
        print(f"misses probe: {time.time()-t0:.1f}s ({m} misses)", flush=True)
        return

    fetched = hits.withColumn("status", F.lit(200)).withColumn(
        "fetch_ms", F.lit(1).cast("long"))
    extracted = fetched.mapInPandas(
        extract_pages_map_in_pandas(EXTRACT_SCHEMA), schema=EXTRACT_SCHEMA)
    harvest = extracted.select(
        "url", "warc_ts", "html", "text", "lang", "links", "url_hash", "host",
        "priority", "attempt", "depth", "enqueue_step", "seq",
        F.lit(0).alias("superstep"), "status", "fetch_ms",
        F.md5(F.encode("text", "UTF-8")).alias("etag"))
    out = f"{d}/out_{cores}_{variant}"
    harvest.write.mode("overwrite").parquet(out)
    t_write = time.time() - t0
    print(f"cores={cores} variant={variant} n={sel_n}: sel={t_sel:.1f}s "
          f"hits+extract+write={t_write:.1f}s", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build(int(sys.argv[2]), sys.argv[3])
    else:
        run(int(sys.argv[2]), sys.argv[3], sys.argv[4] if len(sys.argv) > 4 else "full")
