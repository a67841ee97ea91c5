"""Real HTTP fetch stage behind the pluggable Fetcher seam.

The reference fetches live over HTTP (GitHubFetcher,
/root/reference/providers/fetcher/githubFetcher.js — request dispatch at
:43-80, status/etag handling at :81-120); every other bundled fetcher in
this engine simulates that contract from a corpus (operators/fetch.py).
This module is the real thing: a vectorized ``mapInPandas`` stage that
performs batched HTTP GETs from the executors — the seam
``tests/test_fetch_contract.py`` pins with a mock is exercised here against
an actual socket (tests/test_network_fetch.py drives a full crawl against a
loopback HTTP server, robots.txt and retry semantics included).

Design (the shape a 1000-executor crawl needs):

- the selected batch is repartitioned by ``fetch_salt`` BEFORE the fetch,
  so a hot host's urls spread over ``cfg.frontier_partitions`` tasks
  instead of serializing on one (the same skew-defeat the simulated
  fetchers inherit from selection);
- within a task, each Arrow batch fans out over a bounded thread pool —
  fetch latency is I/O-bound, so threads (not processes) are the right
  concurrency; the pool size bounds per-task open sockets. stdlib
  ``urllib`` keeps the sandbox dependency-free; an ``aiohttp``/HTTP-2
  session drops into ``_get_one`` without touching the Spark plumbing;
- output contract is exactly ``FETCH_OUT_COLS`` (operators/fetch.py): the
  engine's downstream extract/harvest path cannot tell this fetcher from
  the simulated ones. Transport failures map to status 599 — the
  reference's transient-failure convention (providers/queuing/
  inmemorycrawlqueue.js:54-58) — so the engine's retry/dead-letter
  routing applies unchanged;
- no driver-side state: nothing here collects, broadcasts, or sizes with
  the corpus. The only driver-side helper is :func:`fetch_robots_df`,
  which GETs ``/robots.txt`` once per HOST (control-plane cardinality)
  and hands the bodies to the RFC 9309 parser
  (functions/robots.py:parse_robots_txt) to build the robots dim the
  engine broadcasts anyway.

Politeness note: per-host budgets/windows/crawl-delay are enforced by the
SCHEDULER (plans/selection.py) before rows ever reach this stage; the
fetcher deliberately does not sleep or rate-limit — it fetches what the
politeness-bounded selection admitted, as the reference's fetcher executes
what its rate-limited queue popped.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.fetch import FETCH_OUT_COLS

NETWORK_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("enqueue_step", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("policy", T.StringType(), False),
        T.StructField("fetch_salt", T.IntegerType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("fetch_ms", T.LongType(), True),
    ]
)
assert [f.name for f in NETWORK_FETCH_SCHEMA.fields] == FETCH_OUT_COLS

# transport-level failure (DNS, refused, reset, timeout): transient per the
# reference's convention — routed to retry, then dead-letter
STATUS_TRANSPORT_ERROR = 599


def _get_one(
    url: str, timeout_s: float, max_bytes: int, user_agent: str,
    etag: str | None = None,
) -> tuple[int, bytes | None, object, int]:
    """(status, body, warc_ts, fetch_ms) for one GET. stdlib-only; swap
    this function for an aiohttp/httpx session to change transports.

    *etag* (when known from a prior fetch) is sent as ``If-None-Match`` —
    the reference's conditional-fetch semantic (its fetcher replays the
    stored payload etag; githubFetcher.js:81-120 routes 304 to the cached
    document). A 304 comes back as status 304 with no body: the engine
    settles it like any non-200 (<500) status, so the url leaves the
    frontier and ``pages_latest`` keeps serving the prior 200 version —
    exactly the reference's 304-skip."""
    import urllib.error
    import urllib.request

    t0 = time.monotonic()
    try:
        headers = {"User-Agent": user_agent, "Accept-Encoding": "identity"}
        if etag:
            headers["If-None-Match"] = etag
        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = resp.read(max_bytes)
            status = resp.status
            date_hdr = resp.headers.get("Date")
    except urllib.error.HTTPError as e:  # non-2xx WITH a response (404, 500…)
        ms = int((time.monotonic() - t0) * 1000)
        return int(e.code), None, None, ms
    except Exception:  # transport-level: timeout, refused, DNS, reset
        ms = int((time.monotonic() - t0) * 1000)
        return STATUS_TRANSPORT_ERROR, None, None, ms
    ms = int((time.monotonic() - t0) * 1000)
    ts = None
    if date_hdr:
        try:
            ts = parsedate_to_datetime(date_hdr).astimezone(timezone.utc).replace(tzinfo=None)
        except (TypeError, ValueError):
            ts = None
    if ts is None:
        ts = datetime.now(tz=timezone.utc).replace(tzinfo=None)
    return int(status), body, ts, ms


def make_network_fetch(
    max_workers_per_task: int = 16,
    timeout_s: float = 10.0,
    max_bytes: int = 4 << 20,
    user_agent: str = "ospo-crawler",
    etag_provider=None,
):
    """Fetcher over live HTTP: ``mapInPandas`` of thread-pooled GETs per
    Arrow batch, repartitioned by ``fetch_salt``. Same contract as
    ``simulated_fetch`` (FETCH_OUT_COLS) — plug into
    ``Crawler(fetcher=make_network_fetch(...))``.

    ``lang`` is left NULL (language-id runs downstream at featurize time,
    functions/text.py:lang_id_col); ``warc_ts`` is the response Date header
    (fetch wall-clock when absent) — the capture-time semantic of a WARC
    record, not a determinism input.

    *etag_provider*: optional ``url -> http_etag|None`` callable, resolved
    PER TASK inside the workers (it must be picklable and cheap — e.g. a
    closure over a broadcast dict built from the doc store's last-seen
    response etags, or a KV-store client). When it yields an etag the GET
    goes out conditional (``If-None-Match``) and an unchanged document
    returns as a bodyless 304 row — the reference fetcher's etag replay
    (payload ``{body, etag, fetchedAt}``, crawlerFactory.js:669-679).
    """

    def fetch(selected: DataFrame, corpus: DataFrame, cfg: CrawlConfig) -> DataFrame:
        del corpus  # real network — no corpus to serve from

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=max_workers_per_task) as pool:
                for pdf in batches:
                    if not len(pdf):
                        continue
                    got = list(
                        pool.map(
                            lambda u: _get_one(
                                u, timeout_s, max_bytes, user_agent,
                                etag=etag_provider(u) if etag_provider else None,
                            ),
                            pdf["url"],
                        )
                    )
                    out = pdf[
                        [c for c in FETCH_OUT_COLS if c in pdf.columns]
                    ].copy()
                    out["html"] = [b for _s, b, _t, _m in got]
                    out["lang"] = None
                    out["warc_ts"] = [t for _s, _b, t, _m in got]
                    out["status"] = [s for s, _b, _t, _m in got]
                    out["fetch_ms"] = [m for _s, _b, _t, m in got]
                    yield out[FETCH_OUT_COLS]

        sel = selected.select(
            *[c for c in FETCH_OUT_COLS if c not in ("html", "lang", "warc_ts", "status", "fetch_ms")]
        ).repartition(cfg.frontier_partitions, "fetch_salt")
        return sel.mapInPandas(fn, schema=NETWORK_FETCH_SCHEMA)

    return fetch


def fetch_robots_df(
    spark,
    base_urls: list[str],
    timeout_s: float = 5.0,
    user_agent: str = "ospo-crawler",
    budget_per_window: int | None = None,
) -> DataFrame:
    """Robots dim (schemas.ROBOTS_SCHEMA) from LIVE ``/robots.txt`` fetches.

    *base_urls* is one ``scheme://authority`` per host — O(hosts)
    control-plane work, fetched driver-side exactly like the reference
    resolves service endpoints at startup, then parsed by the RFC 9309
    matcher (functions/robots.py:parse_robots_txt: last-specific-agent
    group, Disallow prefixes, Crawl-delay). A missing or erroring
    robots.txt yields the permissive row (no prefixes), per RFC 9309 §2.3.1.
    ``budget_per_window`` overlays the operator-config budget the parser
    leaves NULL.
    """
    from ospo_ghcrawler_spark.functions.robots import parse_robots_txt
    from ospo_ghcrawler_spark.functions.urls import host_col

    rows = []
    for base in base_urls:
        status, body, _ts, _ms = _get_one(
            base.rstrip("/") + "/robots.txt", timeout_s, 1 << 20, user_agent
        )
        txt = body.decode("utf-8", "replace") if (status == 200 and body) else ""
        rows.append((base, txt))
    raw = spark.createDataFrame(rows, "base string, robots_txt string").select(
        host_col(F.col("base")).alias("host"), "robots_txt"
    )
    dim = parse_robots_txt(raw, agent=user_agent)
    if budget_per_window is not None:
        dim = dim.withColumn(
            "budget_per_window", F.lit(budget_per_window).cast("int")
        )
    return dim
