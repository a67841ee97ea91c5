"""Control-plane operators — the reference's REST surface (SURVEY §2.6) as
engine calls over the snapshot tables.

| Reference endpoint                              | Here |
|---|---|
| POST /requests[/:queue]   (routes/requests.js:22-28)  | Crawler.seed(urls, priority) |
| GET/DELETE /requests/:queue?count (routes/requests.js:30-44) | peek_requests / delete_requests |
| PUT /queues/:name (flush)  (routes/queues.js:11-19)   | flush_queue |
| GET /queues/:name/info     (routes/queues.js:21-25)   | queue_info |
| HEAD/GET/DELETE /deadletters (routes/deadletters.js:13-38) | deadletters_* |
| POST deadletters requeue   (routes/deadletters.js:26-31) | requeue_deadletters |
| GET /status                (routes/status.js:10-20)   | status |
| doc get / etag / list / count / delete (storageDocStore.js:60-177) | doc_* |

All operations are snapshot-table transforms (overwrite/append), so each
control action is itself atomic and resumable, like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import PRIORITY_NAMES
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.schemas import FRONTIER_SCHEMA

_FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]


def queue_info(crawler: Crawler) -> DataFrame:
    """Queue depths by priority (GET /queues/:name/info; §2.1 Q8)."""
    crawler._await_pending()
    name_expr = F.lit("unknown")
    for p, n in PRIORITY_NAMES.items():
        name_expr = F.when(F.col("priority") == p, F.lit(n)).otherwise(name_expr)
    return (
        crawler.catalog.table("frontier")
        .read()
        .groupBy("priority")
        .agg(F.count("*").alias("depth"))
        .withColumn("queue", name_expr)
    )


def peek_requests(crawler: Crawler, priority: int, count: int = 100) -> DataFrame:
    """GET /requests/:queue?count=n — FIFO-ordered peek, capped (the
    reference caps at 100, routes/requests.js:11-14)."""
    crawler._await_pending()
    return (
        crawler.catalog.table("frontier")
        .read()
        .filter(F.col("priority") == priority)
        .orderBy("enqueue_step", "seq", "url_hash")
        .limit(min(count, 100))
    )


def delete_requests(crawler: Crawler, priority: int, count: int = 100) -> int:
    """DELETE /requests/:queue?count=n — remove up to n head requests."""
    crawler._await_pending()
    crawler._next_frontier = None
    t = crawler.catalog.table("frontier")
    head = peek_requests(crawler, priority, count).select("url_hash")
    remaining = t.read().join(head, "url_hash", "left_anti")
    t.overwrite(remaining.select(*_FRONTIER_COLS))
    return t.current_snapshot()


def flush_queue(crawler: Crawler, priority: int | None = None) -> int:
    """PUT /queues/:name — destroy a queue's contents (§2.1 Q7); None = all."""
    crawler._await_pending()
    crawler._next_frontier = None
    t = crawler.catalog.table("frontier")
    df = t.read()
    remaining = df.filter(F.col("priority") != priority) if priority is not None else df.limit(0)
    t.overwrite(remaining.select(*_FRONTIER_COLS))
    return t.current_snapshot()


def status(crawler: Crawler) -> dict:
    """GET /status — run liveness summary (loop count/delay analogs become
    superstep counters)."""
    last = crawler.manifest.last()
    return {
        "run_id": crawler.run_id,
        "next_superstep": crawler.step,
        "last_committed_superstep": last["superstep"] if last else None,
        "tables": last["tables"] if last else {},
    }


# -- dead letters -------------------------------------------------------------


def deadletters_list(crawler: Crawler) -> DataFrame:
    return crawler.catalog.table("deadletters").read()


def deadletters_count(crawler: Crawler) -> int:
    return deadletters_list(crawler).count()


def deadletters_delete(crawler: Crawler, url_hashes: list[int]) -> int:
    t = crawler.catalog.table("deadletters")
    remaining = t.read().filter(~F.col("url_hash").isin(url_hashes))
    return t.overwrite(remaining)


def requeue_deadletters(crawler: Crawler, priority: int = 2) -> int:
    """POST requeue (routes/deadletters.js:26-31): dead letters re-enter the
    frontier (reference requeues to 'soon'), attempt counter reset, and leave
    the dead-letter table. Returns the number requeued."""
    crawler._await_pending()
    crawler._next_frontier = None
    dl_t = crawler.catalog.table("deadletters")
    f_t = crawler.catalog.table("frontier")
    dead = dl_t.read()
    p = crawler.cfg.frontier_partitions
    rows = (
        dead.select(
            "url",
            "url_hash",
            "host",
            F.pmod(F.xxhash64("host"), F.lit(p)).cast("int").alias("host_salt"),
            F.lit(priority).cast("int").alias("priority"),
            F.lit(0).alias("attempt"),
            F.lit(0).alias("depth"),
            F.lit(crawler.step).cast("int").alias("enqueue_step"),
            F.lit(crawler.step).cast("int").alias("not_before_step"),
            F.xxhash64("url").alias("seq"),
            F.lit("default").alias("policy"),
        )
        .join(f_t.read().select("url_hash"), "url_hash", "left_anti")
        .select(*_FRONTIER_COLS)
    )
    n = rows.count()
    f_t.append(rows)
    dl_t.overwrite(dead.limit(0))
    return n


# -- doc store ----------------------------------------------------------------


def pages_latest(crawler: Crawler) -> DataFrame:
    """Latest-version view of the doc store: one row per url, the most recent
    successful fetch. The physical table is an append-only history (one row
    per fetch); this view gives it the reference's upsert-by-URN read
    semantics (storageDocStore.js:33-58 MERGEs on urn; mongodocstore.js:25-32
    replaceOne) without rewriting the table — at scale this is the
    Iceberg-MERGE-equivalent read path."""
    pages = crawler.catalog.table("pages").read().filter(F.col("status") == 200)
    w = Window.partitionBy("url_hash").orderBy(F.desc("superstep"))
    return pages.withColumn("_v", F.row_number().over(w)).filter(F.col("_v") == 1).drop("_v")


def export_clean_corpus(
    crawler: Crawler, lang: str = "en", min_quality: float = 0.5
) -> DataFrame:
    """Training-ready corpus straight from the crawl catalog: latest version
    of every successfully fetched page, language-filtered, quality-gated and
    exact-deduped by content fingerprint (lowest seq wins) — the C4-style
    pipeline (queries.clean_corpus) applied to the engine's own output.

    Runs entirely off the fetch-time feature columns
    (cfg.featurize_at_fetch): lang_pred / quality / fp were computed in the
    harvest-write pass, so this export never re-scans text — at 100 TB the
    scan prunes to slim columns and the only shuffles are the two windows
    (latest-version, dedup). Falls back transparently when featurization was
    off: null lang_pred/quality rows simply fail the filters."""
    latest = pages_latest(crawler).filter(
        (F.col("lang_pred") == lang) & (F.col("quality") >= min_quality)
    )
    w = Window.partitionBy("fp").orderBy("seq")
    return (
        latest.withColumn("_d", F.row_number().over(w))
        .filter(F.col("_d") == 1)
        .drop("_d")
    )


def doc_get(crawler: Crawler, url: str) -> DataFrame:
    """Doc lookup by url (storageDocStore.get via url→urn map, S3/S7 — here
    the mapping is a column, so lookup is a pruned filter). Upsert read
    semantics: exactly the latest version, even after recrawls."""
    h = crawler.catalog.table("pages").read()
    return (
        h.filter((F.col("url_hash") == F.xxhash64(F.lit(url))) & (F.col("status") == 200))
        .orderBy(F.desc("superstep"))
        .limit(1)
    )


def doc_history(crawler: Crawler, url: str) -> DataFrame:
    """All stored versions of a url, newest first (the snapshot chain is the
    reference's hourly delta trail, deltaStore.js:26-31)."""
    h = crawler.catalog.table("pages").read()
    return h.filter(
        (F.col("url_hash") == F.xxhash64(F.lit(url))) & (F.col("status") == 200)
    ).orderBy(F.desc("superstep"))


def doc_etag(crawler: Crawler, url: str) -> str | None:
    """Etag of the LATEST stored version (etag-only read, S3) —
    deterministic after recrawl: the max-superstep row wins."""
    rows = doc_get(crawler, url).select("etag").collect()
    return rows[0]["etag"] if rows else None


def doc_list_by_prefix(crawler: Crawler, url_prefix: str, cap: int = 10_000) -> DataFrame:
    """URN-prefix scan over latest versions (storageDocStore.list, cap 10000
    — S4)."""
    return pages_latest(crawler).filter(F.col("url").startswith(url_prefix)).limit(cap)


def doc_count_by_prefix(crawler: Crawler, url_prefix: str) -> int:
    """Distinct-url count under a prefix (latest-version semantics, S4)."""
    return pages_latest(crawler).filter(F.col("url").startswith(url_prefix)).count()


def doc_delete(crawler: Crawler, url: str) -> int:
    """DELETE by key (S5)."""
    t = crawler.catalog.table("pages")
    remaining = t.read().filter(F.col("url_hash") != F.xxhash64(F.lit(url)))
    return t.overwrite(remaining)


def requeue_for_refetch(
    crawler: Crawler, urls: list[str] | DataFrame, priority: int = 2
) -> int:
    """Conditional-refetch path (reference etag semantics, D3: the fetcher
    reuses the stored etag to decide 304-skips; here recrawl is explicit):
    the given already-crawled urls leave the ``seen`` table and re-enter the
    frontier at 'soon' priority. The bloom filter is NOT rebuilt (bloom bits
    can't delete) — the urls enter the RECRAWL WINDOW instead
    (Crawler.register_recrawl): a delete-capable cuckoo + exact pending set
    that seen_filter uses to route the stale bloom positives through a
    broadcast window check rather than the full-`seen` anti-join; on
    cfg.recrawl_cuckoo=False the stale positives fall back to the exact
    rescue join (correct, slower). Change detection afterwards: compare the
    new harvest row's ``etag`` (md5 of extracted text) with the previous
    snapshot's.

    *urls* is either a bounded python list OR a DataFrame with a ``url``
    column — the DataFrame form keeps a mass refetch (10⁵+ urls, e.g. "all
    urls older than 30 days" computed from pages_latest) fully distributed:
    the url STRINGS never land on the driver; only their 8-byte hashes do
    (the recrawl cuckoo window is driver-built state either way).

    Returns the number requeued."""
    from ospo_ghcrawler_spark.functions.urls import canonicalize_udf, host_col

    crawler._await_pending()
    crawler._next_frontier = None  # frontier append below invalidates the plan
    src = (
        urls.select("url")
        if isinstance(urls, DataFrame)
        else crawler.spark.createDataFrame([(u,) for u in urls], ["url"])
    )
    # canonicalize at the edge like the seed path — a non-canonical but
    # equivalent caller URL must hit the same url_hash/host identity
    cand = (
        src
        .select(canonicalize_udf("url").alias("url"))
        .filter(F.col("url").isNotNull())
        .withColumn("url_hash", F.xxhash64("url"))
        .dropDuplicates(["url_hash"])
        .cache()
    )
    seen_t = crawler.catalog.table("seen")
    seen = seen_t.read()
    keys = cand.select("url_hash")
    # membership + delete as broadcast semi/anti joins (the candidate side
    # is the caller's bounded url list) — no driver-side isin over seen
    present = [
        r["url_hash"]
        for r in seen.join(F.broadcast(keys), "url_hash", "left_semi")
        .select("url_hash")
        .collect()
    ]
    n = len(present)
    if n == 0:
        cand.unpersist()
        return 0
    seen_t.overwrite(seen.join(F.broadcast(keys), "url_hash", "left_anti"))
    # window registration strictly AFTER the seen delete (an entry whose
    # seen row survives would be confirmed fresh while still seen); only
    # hashes actually removed from `seen` enter the window
    crawler.register_recrawl(present)
    f_t = crawler.catalog.table("frontier")
    p = crawler.cfg.frontier_partitions
    # only urls that actually left `seen` re-enter the frontier — a
    # never-crawled url in the caller's set is NOT a refetch (it must come
    # in through seed()/edges, where scope and robots apply); the hashes
    # are already on the driver for the recrawl window, so the restriction
    # is a broadcast semi-join against them
    present_df = crawler.spark.createDataFrame(
        [(h,) for h in present], "url_hash long"
    )
    rows = (
        cand
        .join(F.broadcast(present_df), "url_hash", "left_semi")
        .withColumn("host", host_col(F.col("url")))
        .withColumn("host_salt", F.pmod(F.xxhash64("host"), F.lit(p)).cast("int"))
        .withColumn("priority", F.lit(priority).cast("int"))
        .withColumn("attempt", F.lit(0))
        .withColumn("depth", F.lit(0))
        .withColumn("enqueue_step", F.lit(crawler.step).cast("int"))
        .withColumn("not_before_step", F.lit(crawler.step).cast("int"))
        .withColumn("seq", F.xxhash64("url"))
        .withColumn("policy", F.lit("default"))
        .join(f_t.read().select("url_hash"), "url_hash", "left_anti")
        .select(*_FRONTIER_COLS)
    )
    f_t.append(rows)
    cand.unpersist()
    return n


def changed_since_refetch(crawler: Crawler) -> DataFrame:
    """Per-url change detection across recrawl snapshots: urls harvested more
    than once whose content etag differs between first and last fetch."""
    pages = crawler.catalog.table("pages").read().filter(F.col("status") == 200)
    w_first = F.min(F.struct("superstep", "etag")).alias("first")
    w_last = F.max(F.struct("superstep", "etag")).alias("last")
    agg = pages.groupBy("url_hash", "url").agg(
        F.count("*").alias("n_fetches"), w_first, w_last
    )
    return (
        agg.filter(F.col("n_fetches") > 1)
        .select(
            "url",
            "n_fetches",
            F.col("first.etag").alias("etag_first"),
            F.col("last.etag").alias("etag_last"),
            (F.col("first.etag") != F.col("last.etag")).alias("changed"),
        )
    )


def tracker_flush(crawler: Crawler) -> None:
    """Tracker flush (D4): drop the seen table + reset bloom and the recrawl
    cuckoo window (nothing is seen, so nothing is pending un-seen)."""
    crawler.catalog.table("seen").drop_data()
    if crawler.bloom is not None:
        crawler.bloom.bitmaps[:] = 0
        if crawler._bloom_bc is not None:
            crawler._bloom_bc.unpersist()
            crawler._bloom_bc = None
    crawler.clear_recrawl()
