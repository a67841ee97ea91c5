"""Fetch stage: pluggable, default = deterministic simulated fetch.

The reference fetches through GitHubFetcher with etag support (wiring at
/root/reference/lib/crawlerFactory.js:240-246; fetch contract visible in the
test stub /root/reference/test/unit/processingTests.js:93-109 — the stub serves
a canned universe). The sandbox has no network, so the default fetcher serves
a synthetic ``pages`` corpus: a broadcast-hash join of the (small) selected
batch against the corpus scan, yielding html + status + a deterministic
simulated latency. A real ``aiohttp``-based fetcher plugs in by replacing
``simulated_fetch`` with a ``mapInPandas`` stage that performs batched async
GETs per partition — same input/output contract.

Statuses: 200 (in corpus), 404 (off corpus), 599 (injected transient failure,
exercises retry/abandon — /root/reference/providers/queuing/
inmemorycrawlqueue.js:54-58).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.schemas import EXTRACT_SCHEMA

FETCH_OUT_COLS = [
    "url", "url_hash", "host", "priority", "attempt", "depth",
    "enqueue_step", "seq", "policy", "fetch_salt", "html", "lang", "warc_ts",
    "status", "fetch_ms",
]


def _status_and_latency(df: DataFrame, cfg: CrawlConfig) -> DataFrame:
    fetch_ms = (F.pmod(F.col("url_hash"), F.lit(180)) + F.lit(20)).cast("long")
    status = F.when(F.col("html").isNull(), F.lit(404)).otherwise(F.lit(200))
    if cfg.simulate_fetch_failure_every:
        # 1/N of urls fail permanently (dead-letter path); another 1/N fail
        # only on the first attempt (retry-then-succeed path)
        n = cfg.simulate_fetch_failure_every
        mod = F.pmod(F.col("url_hash"), F.lit(2 * n))
        permanent = mod == 0
        transient = (mod == 1) & (F.col("attempt") == 0)
        status = F.when(permanent | transient, F.lit(599)).otherwise(status)
    return (
        df.withColumn("status", status)
        .withColumn("fetch_ms", fetch_ms)
        .withColumn("html", F.when(F.col("status") == 200, F.col("html")))
        .select(*FETCH_OUT_COLS)
    )


# one-time per-corpus url-membership broadcasts (miss detection): keyed by
# DataFrame identity, bounded LRU — rebuilding this per superstep would add a
# full corpus scan + broadcast-hash build of fixed cost to EVERY superstep
_URL_SET_CACHE: dict[int, tuple[DataFrame, object]] = {}
_URL_SET_CACHE_MAX = 8


def _corpus_url_set(corpus: DataFrame):
    key = id(corpus)
    hit = _URL_SET_CACHE.get(key)
    if hit is not None and hit[0] is corpus:
        return hit[1]
    urls = frozenset(r["url"] for r in corpus.select("url").collect())
    bc = corpus.sparkSession.sparkContext.broadcast(urls)
    if len(_URL_SET_CACHE) >= _URL_SET_CACHE_MAX:
        _, (_, old_bc) = _URL_SET_CACHE.popitem()
        old_bc.unpersist()
    _URL_SET_CACHE[key] = (corpus, bc)
    return bc


def simulated_fetch(selected: DataFrame, corpus: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Serve the selected batch from the synthetic corpus WITHOUT ever
    shuffling html (NOT the default — ``simulated_fetch_bloom`` is; this
    variant's miss detection collects the corpus url set to the driver and is
    kept only for tiny-corpus micro-tests):

    - hits  = corpus ⋈(BHJ, broadcast selected keys) — html never leaves its
      scan partition;
    - misses = selected rows absent from a one-time url-membership broadcast
      (vectorized ``Series.isin`` probe) → status 404. Built once per corpus,
      NOT per superstep: the universe is static, so re-deriving it each step
      would be a per-step fixed cost for zero information.

    (A real network fetcher replaces this with a ``mapInPandas`` of batched
    async GETs over `selected` repartitioned by ``fetch_salt``; same output
    contract. The url-membership set is sandbox-only — the simulated universe
    is bounded, the real one is the network.)
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sel_cols = [c for c in FETCH_OUT_COLS if c not in ("html", "lang", "warc_ts", "status", "fetch_ms")]
    sel_slim = selected.select(*sel_cols)
    body = corpus.select(F.col("url").alias("_curl"), "html", "lang", "warc_ts")
    hits = body.join(
        F.broadcast(sel_slim), sel_slim["url"] == body["_curl"], "inner"
    ).drop("_curl")

    bc = _corpus_url_set(corpus)

    @pandas_udf("boolean")
    def _in_corpus(urls: pd.Series) -> pd.Series:
        # probe the broadcast set per element — O(batch) per batch. (A
        # Series.isin(set) here would rebuild a hashtable of the WHOLE
        # 400k-url set for every 1k-row Arrow batch: O(|corpus|) per batch.)
        s = bc.value
        import numpy as np

        return pd.Series(
            np.fromiter((u in s for u in urls.to_numpy()), dtype=bool, count=len(urls)),
            index=urls.index,
        )

    misses = (
        selected.filter(~_in_corpus(F.col("url")))
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("lang", F.lit(None).cast("string"))
        .withColumn("warc_ts", F.lit(None).cast("timestamp"))
    )
    joined = hits.select(*[c for c in FETCH_OUT_COLS if c not in ("status", "fetch_ms")]).unionByName(
        misses.select(*[c for c in FETCH_OUT_COLS if c not in ("status", "fetch_ms")])
    )
    return _status_and_latency(joined, cfg)


# one-time per-corpus membership BLOOM (scale path): built distributed —
# only the bitmaps (shards × bits/8 bytes) ever reach the driver, vs
# _corpus_url_set which collects every corpus url. Keyed by DataFrame
# identity like the url-set cache.
_CORPUS_BLOOM_CACHE: dict[int, tuple[DataFrame, object]] = {}


def _corpus_bloom(corpus: DataFrame, shards: int = 16, bits: int = 1 << 23, k: int = 7):
    from ospo_ghcrawler_spark.operators.dedup import build_bloom_distributed

    key = id(corpus)
    hit = _CORPUS_BLOOM_CACHE.get(key)
    if hit is not None and hit[0] is corpus:
        return hit[1]
    fam = build_bloom_distributed(
        corpus.select(F.xxhash64("url").alias("url_hash")), "url_hash", shards, bits, k
    )
    if len(_CORPUS_BLOOM_CACHE) >= _URL_SET_CACHE_MAX:
        _CORPUS_BLOOM_CACHE.popitem()
    _CORPUS_BLOOM_CACHE[key] = (corpus, fam)
    return fam


def simulated_fetch_bloom(selected: DataFrame, corpus: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """``simulated_fetch`` with SCALE-SAFE miss detection: nothing
    corpus-sized ever reaches the driver.

    - hits: unchanged — corpus ⋈(BHJ, broadcast selected keys);
    - misses: a corpus-side bloom (built distributed, one-time per corpus —
      only bitmaps ship to the driver) classifies the selected batch.
      Bloom-negatives are DEFINITE misses (no false negatives) → 404
      immediately. Bloom-positives that are false positives produce no hit
      row, so they are recovered by one anti-join against the hit keys —
      whose corpus side is pruned to the url column and whose output is
      batch-bounded. This is the miss-detection shape that holds at a 10^10-
      url universe, where collecting the url set (``_corpus_url_set``) is
      impossible. This is the DEFAULT fetcher (``Crawler(fetcher=...)``):
      the out-of-box path never drives a corpus-sized collect. The collected-
      set variant ``simulated_fetch`` remains available for micro-tests where
      the corpus is tiny and the collect is cheaper than the bloom build.
      Equivalence of the two fetchers is pinned by
      tests/test_fetch_contract.py."""
    from ospo_ghcrawler_spark.operators.dedup import bloom_flag_column

    sel_cols = [c for c in FETCH_OUT_COLS if c not in ("html", "lang", "warc_ts", "status", "fetch_ms")]
    sel_slim = selected.select(*sel_cols)
    body = corpus.select(F.col("url").alias("_curl"), "html", "lang", "warc_ts")
    hits = body.join(
        F.broadcast(sel_slim), sel_slim["url"] == body["_curl"], "inner"
    ).drop("_curl")

    fam = _corpus_bloom(corpus)
    flagged = bloom_flag_column(selected.select(*sel_cols), "url_hash", fam, "_maybe")
    definite_miss = flagged.filter(~F.col("_maybe")).drop("_maybe")
    hit_keys = corpus.select(F.xxhash64("url").alias("url_hash")).join(
        F.broadcast(selected.select("url_hash")), "url_hash", "left_semi"
    )
    fp_miss = flagged.filter(F.col("_maybe")).drop("_maybe").join(
        hit_keys, "url_hash", "left_anti"
    )
    misses = (
        definite_miss.unionByName(fp_miss)
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("lang", F.lit(None).cast("string"))
        .withColumn("warc_ts", F.lit(None).cast("timestamp"))
    )
    joined = hits.select(*[c for c in FETCH_OUT_COLS if c not in ("status", "fetch_ms")]).unionByName(
        misses.select(*[c for c in FETCH_OUT_COLS if c not in ("status", "fetch_ms")])
    )
    return _status_and_latency(joined, cfg)


def make_generator_fetch(
    n_pages: int,
    n_hosts: int,
    skew: bool = False,
    links_per_page: int = 8,
    sentences: int = 1,
):
    """Fetcher that synthesizes the page universe *inside* the fetch stage —
    the closest sandbox analog of a real network fetcher: a vectorized
    ``mapInPandas`` over the selected batch (repartitioned by ``fetch_salt``
    so a hot host spreads across tasks), no corpus scan, no broadcast, no
    html shuffle. Fuses extraction (text+links) into the same Arrow pass so
    html crosses the JVM↔Python boundary exactly once.

    A production fetcher replaces the ``render_page`` call with batched async
    GETs; everything else (partitioning, schema, status/latency contract)
    stays identical.
    """
    from ospo_ghcrawler_spark.functions.extract import extract_links, extract_text
    from ospo_ghcrawler_spark.sources.corpus import _EPOCH, page_url, render_page

    cols = [f.name for f in EXTRACT_SCHEMA.fields]

    def fetch(selected: DataFrame, corpus: DataFrame, cfg: CrawlConfig) -> DataFrame:
        fail_n = cfg.simulate_fetch_failure_every

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                htmls, langs, tss, statuses, ms, texts, links_col = [], [], [], [], [], [], []
                for url, h64, attempt in zip(pdf["url"], pdf["url_hash"], pdf["attempt"]):
                    h64 = int(h64)
                    latency = h64 % 180 + 20
                    status = 404
                    html = lang = ts = text = None
                    links: list[str] = []
                    # parse /p{pid} and validate against the deterministic universe
                    try:
                        path = url.rsplit("/", 1)[-1]
                        pid = int(path[1:]) if path.startswith("p") else -1
                    except ValueError:
                        pid = -1
                    if 0 <= pid < n_pages and page_url(pid, n_pages, n_hosts, skew) == url:
                        _, html, _golden, lang = render_page(
                            pid, n_pages, n_hosts, links_per_page, skew, sentences
                        )
                        # run the REAL extractor on the fetched bytes (the
                        # byte-identical invariant is pinned against _golden
                        # by tests; here extraction is the actual workload)
                        text = extract_text(html)
                        links = extract_links(html, url)
                        ts = datetime.fromtimestamp(_EPOCH + pid, tz=timezone.utc).replace(
                            tzinfo=None
                        )
                        status = 200
                    if fail_n:
                        mod = h64 % (2 * fail_n)
                        if mod == 0 or (mod == 1 and int(attempt) == 0):
                            status, html, text, lang, ts, links = 599, None, None, None, None, []
                    htmls.append(html); langs.append(lang); tss.append(ts)
                    statuses.append(status); ms.append(latency)
                    texts.append(text); links_col.append(links)
                out = pdf[[c for c in cols if c in pdf.columns]].copy()
                out["html"] = htmls
                out["lang"] = langs
                out["warc_ts"] = tss
                out["status"] = statuses
                out["fetch_ms"] = ms
                out["text"] = texts
                out["links"] = links_col
                yield out[cols]

        sel = selected.repartition(cfg.frontier_partitions, "fetch_salt")
        return sel.mapInPandas(fn, schema=EXTRACT_SCHEMA)

    return fetch
