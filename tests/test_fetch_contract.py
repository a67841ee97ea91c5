"""Fetcher contract tests.

1. A mock NETWORK-style fetcher (mapInPandas over the selected batch,
   repartitioned by fetch_salt — the real-fetcher shape documented in
   operators/fetch.py) injecting latency spikes, per-host timeouts and
   partial-batch transient failures through the status/fetch_ms contract;
   asserts the engine's retry / dead-letter / politeness behavior off the
   injected statuses alone.
2. The scale-safe miss-detection path (corpus-side bloom,
   simulated_fetch_bloom) is equivalent to the default collected-url-set
   fetcher — no whole-corpus collect() on the demonstrated path.
"""

from collections.abc import Iterator

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.operators.fetch import (
    FETCH_OUT_COLS,
    simulated_fetch_bloom,
)
from ospo_ghcrawler_spark.schemas import EXTRACT_SCHEMA
from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

N, H = 240, 6

# non-fused fetcher output: the engine runs its own extract pass when the
# fetcher returns no text/links columns
FETCH_SCHEMA = T.StructType([f for f in EXTRACT_SCHEMA.fields if f.name not in ("text", "links")])

TIMEOUT_HOST = "host2.example"
TRANSIENT_MOD = 7


def make_flaky_network_fetch(payload_bc):
    """Network-fetcher-shaped mock: vectorized mapInPandas over `selected`
    repartitioned by fetch_salt, serving a broadcast url→payload map (the
    'remote server') with injected failure modes:

    - every url on TIMEOUT_HOST times out (status 599, fetch_ms 5000) on
      EVERY attempt → must exhaust retries and dead-letter;
    - urls with url_hash % TRANSIENT_MOD == 0 fail (599) on their first
      attempt only → must retry and then settle normally;
    - everything else: 200 with the payload (or 404 off-universe) and a
      deterministic latency.
    """

    def fetch(selected, corpus, cfg):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            server = payload_bc.value
            for pdf in batches:
                htmls, langs, tss, statuses, ms = [], [], [], [], []
                for url, h64, attempt, host in zip(
                    pdf["url"], pdf["url_hash"], pdf["attempt"], pdf["host"]
                ):
                    h64 = int(h64)
                    html = lang = ts = None
                    if host == TIMEOUT_HOST:
                        status, latency = 599, 5000  # timeout, every attempt
                    elif h64 % TRANSIENT_MOD == 0 and int(attempt) == 0:
                        status, latency = 599, 2000  # partial-batch transient
                    elif url in server:
                        html, lang, ts = server[url]
                        status, latency = 200, h64 % 180 + 20
                    else:
                        status, latency = 404, h64 % 180 + 20
                    htmls.append(html); langs.append(lang); tss.append(ts)
                    statuses.append(status); ms.append(latency)
                out = pdf[[f.name for f in FETCH_SCHEMA.fields if f.name in pdf.columns]].copy()
                out["html"] = htmls
                out["lang"] = langs
                out["warc_ts"] = tss
                out["status"] = statuses
                out["fetch_ms"] = ms
                yield out[[f.name for f in FETCH_SCHEMA.fields]]

        sel = selected.repartition(cfg.frontier_partitions, "fetch_salt")
        return sel.mapInPandas(fn, schema=FETCH_SCHEMA)

    return fetch


def test_network_fetcher_contract(spark, tmp_path):
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=5).cache()
    robots = synth_robots(spark, n_hosts=H)
    server = {
        r["url"]: (r["html"], r["lang"], r["warc_ts"])
        for r in corpus.collect()  # test-scale 'remote server'
    }
    bc = spark.sparkContext.broadcast(server)
    cfg = CrawlConfig(
        batch_size=100,
        host_budget=25,  # politeness live in the plan
        compute_budget_ms=1 << 40,
        max_attempts=3,
        expect_failures=True,
    )
    c = Crawler(
        spark, str(tmp_path / "cat"), corpus, robots, cfg,
        run_id="net", fetcher=make_flaky_network_fetch(bc),
    )
    c.seed([page_url(i, N, H, False) for i in range(12)])
    c.run(60)

    pages = c.catalog.table("pages").read().cache()
    seen = c.catalog.table("seen").read()
    dead = c.catalog.table("deadletters").read()

    # --- timeouts dead-letter after max_attempts, never settle -------------
    dl = {r["url"]: r for r in dead.collect()}
    assert dl, "timeout host must produce dead letters"
    assert all(r["host"] == TIMEOUT_HOST for r in dl.values())
    assert all(r["attempt"] == cfg.max_attempts for r in dl.values())
    assert seen.filter(F.col("url").contains(TIMEOUT_HOST)).count() == 0
    # every timeout url was attempted exactly max_attempts times, all 599
    t_rows = pages.filter(F.col("host") == TIMEOUT_HOST)
    assert t_rows.filter(F.col("status") != 599).count() == 0
    per = {r["url"]: r["n"] for r in t_rows.groupBy("url").agg(F.count("*").alias("n")).collect()}
    assert set(per) == set(dl) and all(v == cfg.max_attempts for v in per.values())

    # --- transient failures retry exactly once, then settle ----------------
    transient = pages.filter(
        (F.col("host") != TIMEOUT_HOST) & (F.col("url_hash") % TRANSIENT_MOD == 0)
    )
    t599 = transient.filter(F.col("status") == 599)
    tok = transient.filter(F.col("status") < 500)  # settle = 200, or 404 off-universe
    assert t599.count() > 0, "fixture must exercise the transient path"
    assert t599.filter(F.col("attempt") != 0).count() == 0, "only first attempts fail"
    assert tok.filter(F.col("attempt") != 1).count() == 0, "settle on the retry"
    assert t599.select("url_hash").distinct().count() == tok.select("url_hash").distinct().count()

    # --- no double-settle; seen holds exactly the settled rows -------------
    settled = pages.filter(F.col("status") < 500)
    assert settled.groupBy("url_hash").count().filter("count > 1").count() == 0
    assert settled.count() == seen.count()

    # --- politeness: per-(host, superstep) selections within budget --------
    m = c.catalog.table("metrics").read().filter(F.col("host") != "__run__")
    over = m.filter(F.col("selected") > cfg.host_budget).count()
    assert over == 0, "per-host budget must bind every superstep"

    # --- fetched content identical to the server's (network payload intact)
    got = settled.filter(F.col("status") == 200).select("url", "html").collect()
    assert got and all(bytes(r["html"]) == bytes(server[r["url"]][0]) for r in got)


def test_bloom_miss_detection_matches_default(spark, tmp_path):
    """simulated_fetch_bloom (corpus-side bloom membership, no whole-corpus
    collect) must settle the identical crawl as the default fetcher —
    including 404s for off-corpus links."""
    # links_per_page high + small N ⇒ some generated links point off-universe
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=5).cache()
    robots = synth_robots(spark, n_hosts=H)

    def run(fetcher, name):
        cfg = CrawlConfig(batch_size=100, expect_failures=False)
        kw = {"fetcher": fetcher} if fetcher else {}
        c = Crawler(spark, str(tmp_path / name), corpus, robots, cfg, run_id=name, **kw)
        c.seed([page_url(i, N, H, False) for i in range(12)])
        c.run(40)
        seen = {(r["url_hash"], r["status"]) for r in c.catalog.table("seen").read().collect()}
        n404 = c.catalog.table("pages").read().filter("status = 404").count()
        return seen, n404

    seen_a, n404_a = run(None, "default")
    seen_b, n404_b = run(simulated_fetch_bloom, "bloom")
    assert seen_a == seen_b
    assert n404_a == n404_b
    assert n404_a > 0, "fixture must exercise the miss path"


def test_minhash_at_fetch_stores_lsh_ready_signatures(spark, tmp_path):
    """cfg.minhash_at_fetch: the harvest pass stores the sparse OPH
    signature; it must equal recomputation from the stored text, and
    oph_lsh_pairs(entries_col=...) over the pages table must equal the
    text-derived pair set (the no-text-rescan candidate path)."""
    from ospo_ghcrawler_spark.functions import text as TXT
    from ospo_ghcrawler_spark.operators import dedup_docs as DD

    corpus = synth_pages(spark, n_pages=120, n_hosts=6, links_per_page=4).cache()
    robots = synth_robots(spark, n_hosts=6)
    cfg = CrawlConfig(batch_size=60, minhash_at_fetch=True)
    c = Crawler(spark, str(tmp_path / "mh"), corpus, robots, cfg, run_id="mh")
    c.seed([page_url(i, 120, 6, False) for i in range(8)])
    c.run(30)

    pages = c.catalog.table("pages").read().filter(F.col("status") == 200).cache()
    assert pages.count() > 0
    mismatch = pages.withColumn(
        "re", TXT.minhash_oph_entries(F.col("text"))
    ).filter(F.col("re") != F.col("minhash_oph")).count()
    assert mismatch == 0

    base = pages.select(F.col("url_hash").alias("doc_id"), "text", "minhash_oph")
    from_col = {(r.a_id, r.b_id) for r in
                DD.oph_lsh_pairs(base, 0.8, entries_col="minhash_oph").collect()}
    from_text = {(r.a_id, r.b_id) for r in DD.oph_lsh_pairs(base, 0.8).collect()}
    assert from_col == from_text
    pages.unpersist()
