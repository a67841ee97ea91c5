"""End-to-end crawl over a REAL socket: the network fetcher
(operators/network_fetch.py) drives the unchanged engine against a loopback
HTTP server — live robots.txt, a transient 500 exercising the retry path, a
404, and a robots-disallowed page the server must never be asked for.

This exercises the one seam the simulated fetchers can't: actual transport
(connection handling, HTTPError vs transport-error mapping, Date-header
warc_ts) behind the same Fetcher contract pinned by test_fetch_contract.py.
Two loopback IPs (127.0.0.1 / 127.0.0.2) give two distinct crawl hosts on
one server socket.
"""

import hashlib
import http.server
import threading
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.functions.extract import extract_text
from ospo_ghcrawler_spark.operators.control import pages_latest
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.operators.network_fetch import (
    fetch_robots_df,
    make_network_fetch,
)
from ospo_ghcrawler_spark.schemas import PAGES_SCHEMA

H1, H2 = "127.0.0.1", "127.0.0.2"

ROBOTS = {
    H1: "User-agent: *\nDisallow: /private/\n",
    H2: "User-agent: *\nDisallow: /private/\n",
}

# 3xx map (H1 only): Location values exercise absolute-path, relative
# (RFC 9110 §10.2.2 — resolved against the request url), disallowed-target
# and cycle shapes
REDIRECTS = {
    "/r/ok": "/p1",
    "/r/rel": "../p1",
    "/r/private": "/private/secret",
    "/r/loop": "/r/loop2",
    "/r/loop2": "/r/loop",
}
BIG_BODY = b"<html><body><p>" + b"big page " * 600 + b"</p></body></html>"


def _page(links: list[str], text: str) -> bytes:
    anchors = "".join(f'<a href="{u}">x</a>' for u in links)
    return f"<html><head></head><body><p>{text}</p>{anchors}</body></html>".encode()


def _universe(port: int) -> dict[tuple[str, str], bytes]:
    u = lambda h, p: f"http://{h}:{port}{p}"  # noqa: E731
    return {
        (H1, "/p0"): _page(
            [u(H1, "/p1"), u(H1, "/private/secret"), u(H2, "/p0"), u(H1, "/missing")],
            "alpha page zero",
        ),
        (H1, "/p1"): _page([u(H1, "/flaky")], "alpha page one"),
        (H1, "/flaky"): _page([], "alpha flaky recovered"),
        (H1, "/private/secret"): _page([], "must never be fetched"),
        (H2, "/p0"): _page([u(H2, "/p1")], "beta page zero"),
        (H2, "/p1"): _page([], "beta page one"),
    }


@pytest.fixture(scope="module")
def site():
    hits: Counter = Counter()
    lock = threading.Lock()
    state = {"flaky_failures_left": 1, "universe": {}}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            host = (self.headers.get("Host") or "").split(":")[0]
            with lock:
                hits[(host, self.path)] += 1
            if self.path == "/robots.txt":
                body = ROBOTS.get(host, "").encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path in REDIRECTS and host == H1:
                self.send_response(301)
                self.send_header("Location", REDIRECTS[self.path])
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if self.path == "/big" and host == H1:
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(BIG_BODY)))
                self.end_headers()
                self.wfile.write(BIG_BODY)
                return
            if self.path == "/flaky" and host == H1:
                with lock:
                    if state["flaky_failures_left"] > 0:
                        state["flaky_failures_left"] -= 1
                        self.send_error(500, "transient")
                        return
            body = state["universe"].get((host, self.path))
            if body is None:
                self.send_error(404, "off corpus")
                return
            etag = '"' + hashlib.md5(body).hexdigest() + '"'
            if self.headers.get("If-None-Match"):
                with lock:
                    hits[(host, self.path, "conditional")] += 1
                if self.headers["If-None-Match"] == etag:
                    self.send_response(304)
                    self.send_header("ETag", etag)
                    self.end_headers()
                    return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("ETag", etag)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = http.server.ThreadingHTTPServer(("", 0), Handler)
    port = srv.server_address[1]
    state["universe"] = _universe(port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield {"port": port, "hits": hits, "universe": state["universe"]}
    finally:
        srv.shutdown()


def test_live_crawl_over_loopback_http(spark, site, tmp_path):
    port, hits, universe = site["port"], site["hits"], site["universe"]
    robots = fetch_robots_df(
        spark,
        [f"http://{H1}:{port}", f"http://{H2}:{port}"],
        budget_per_window=100,
    )
    # live robots really came over the wire and parsed to the disallow rule
    got_robots = {r["host"]: list(r["disallow_prefixes"]) for r in robots.collect()}
    assert got_robots == {H1: ["/private/"], H2: ["/private/"]}

    corpus = spark.createDataFrame([], PAGES_SCHEMA)  # network: no corpus
    cfg = CrawlConfig(
        batch_size=50,
        frontier_partitions=4,
        expect_failures=True,
        max_attempts=3,
        defer_supersteps=1,
    )
    c = Crawler(
        spark,
        str(tmp_path / "cat"),
        corpus,
        robots,
        cfg,
        run_id="net",
        fetcher=make_network_fetch(max_workers_per_task=8, timeout_s=5.0),
    )
    c.seed([f"http://{H1}:{port}/p0"])
    c.run(max_supersteps=12)

    pages = pages_latest(c)
    ok = {r["url"]: r for r in pages.filter(F.col("status") == 200).collect()}
    expect_ok = {
        f"http://{h}:{port}{p}"
        for (h, p) in universe
        if not p.startswith("/private/")
    }
    assert set(ok) == expect_ok
    # byte-identical extracted text vs the bytes the server actually served
    for (h, p), body in universe.items():
        url = f"http://{h}:{port}{p}"
        if url in ok:
            assert ok[url]["text"] == extract_text(body), url
    # the 404 settled as a 404 log row in the fetch history (seen; not
    # retried forever) — pages_latest is the 200-only doc view, so read the
    # raw append log for it
    log = c.catalog.table("pages").read()
    missing = log.filter(F.col("url") == f"http://{H1}:{port}/missing").collect()
    assert [r["status"] for r in missing] == [404]
    # robots enforced BEFORE the socket: the server never saw /private/
    assert hits[(H1, "/private/secret")] == 0
    # transient 500 -> one failed hit + one retry success, nothing more
    assert hits[(H1, "/flaky")] == 2
    # robots.txt came from the live server (driver-side, once per host)
    assert hits[(H1, "/robots.txt")] == 1 and hits[(H2, "/robots.txt")] == 1
    # no duplicate fetches anywhere (dedup invariant, live transport)
    dup = (
        pages.filter(F.col("status") == 200)
        .groupBy("url_hash")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0


def test_etag_conditional_refetch_304_skip(spark, site, tmp_path):
    """Reference F1 etag semantics over a live socket: a recrawl of an
    unchanged page goes out as a conditional GET (If-None-Match from the
    prior fetch) and settles as a bodyless 304 — the url leaves the
    frontier, and pages_latest keeps serving the prior 200 version (the
    reference fetcher's 304 → cached-document route)."""
    port, hits, universe = site["port"], site["hits"], site["universe"]
    seed = f"http://{H2}:{port}/p0"
    robots = fetch_robots_df(spark, [f"http://{H2}:{port}"], budget_per_window=100)
    corpus = spark.createDataFrame([], PAGES_SCHEMA)
    cfg = CrawlConfig(batch_size=50, frontier_partitions=4)
    root = str(tmp_path / "cat_etag")

    # first crawl: unconditional (no prior etags known)
    c = Crawler(
        spark, root, corpus, robots, cfg, run_id="etag",
        fetcher=make_network_fetch(max_workers_per_task=4, timeout_s=5.0),
    )
    c.seed([seed])
    c.run(max_supersteps=8)
    first = {r["url"]: r for r in pages_latest(c).collect()}
    assert seed in first and f"http://{H2}:{port}/p1" in first

    # the first crawl stored the SERVER's ETag header per 200 row — the
    # engine derives If-None-Match hints from the doc store itself
    # (wants_etag_hints → broadcast semi-join vs pages), so the recrawl
    # needs NO hand-built etag provider (VERDICT r4 #4)
    stored = {
        r["url"]: r["http_etag"]
        for r in pages_latest(c).select("url", "http_etag").collect()
    }
    assert stored[seed] == '"' + hashlib.md5(universe[(H2, "/p0")]).hexdigest() + '"'
    c2 = Crawler.resume(
        spark, root, corpus, robots, cfg, run_id="etag",
        fetcher=make_network_fetch(max_workers_per_task=4, timeout_s=5.0),
    )
    from ospo_ghcrawler_spark.operators.control import requeue_for_refetch

    assert requeue_for_refetch(c2, [seed]) == 1
    c2.run(max_supersteps=4)

    # the refetch went out conditional and the server answered 304
    assert hits[(H2, "/p0", "conditional")] >= 1
    log = c2.catalog.table("pages").read()
    statuses = sorted(
        r["status"] for r in log.filter(F.col("url") == seed).collect()
    )
    assert statuses == [200, 304]
    # latest view still serves the original 200 document
    after = {r["url"]: r for r in pages_latest(c2).collect()}
    assert after[seed]["text"] == first[seed]["text"]
    assert after[seed]["superstep"] == first[seed]["superstep"]


def test_redirects_settle_and_reenter_via_frontier(spark, site, tmp_path):
    """3xx is never followed in-transport: it settles under the ORIGINAL url
    with its own status + redirect_to, and the target re-enters through the
    normal canonicalize → robots → selection path (ADVICE r4) — so a 301 to
    a robots-disallowed page is NEVER fetched, a relative Location resolves
    against the request url, and a redirect cycle terminates via url-seen."""
    port, hits, universe = site["port"], site["hits"], site["universe"]
    u = lambda p: f"http://{H1}:{port}{p}"  # noqa: E731
    robots = fetch_robots_df(spark, [f"http://{H1}:{port}"], budget_per_window=100)
    corpus = spark.createDataFrame([], PAGES_SCHEMA)
    cfg = CrawlConfig(batch_size=50, frontier_partitions=4)
    c = Crawler(
        spark, str(tmp_path / "cat_redir"), corpus, robots, cfg, run_id="redir",
        fetcher=make_network_fetch(max_workers_per_task=4, timeout_s=5.0),
    )
    private_hits_before = hits[(H1, "/private/secret")]
    c.seed([u("/r/ok"), u("/r/rel"), u("/r/private"), u("/r/loop")])
    c.run(max_supersteps=8)

    log = c.catalog.table("pages").read()
    rows = {r["url"]: r for r in log.collect()}
    # every 3xx settled under its original url, Location surfaced ABSOLUTE
    assert rows[u("/r/ok")]["status"] == 301
    assert rows[u("/r/ok")]["redirect_to"] == u("/p1")
    assert rows[u("/r/ok")]["html"] is None
    # relative Location resolved against the request url: ../p1 from /r/rel
    assert rows[u("/r/rel")]["redirect_to"] == u("/p1")
    # targets re-entered through the frontier: /p1 fetched exactly once
    # (two redirects point at it; seen-dedup collapses them)
    p1 = log.filter(F.col("url") == u("/p1")).collect()
    assert [r["status"] for r in p1] == [200]
    assert p1[0]["text"] == extract_text(universe[(H1, "/p1")])
    # the disallowed target was enqueued through robots and REJECTED —
    # the server never saw the request
    assert rows[u("/r/private")]["redirect_to"] == u("/private/secret")
    assert hits[(H1, "/private/secret")] == private_hits_before
    assert u("/private/secret") not in rows
    # the cycle terminated: each loop url settled exactly once (the back
    # edge died in the seen anti-join), supersteps bounded
    assert rows[u("/r/loop")]["status"] == 301
    assert rows[u("/r/loop2")]["status"] == 301
    assert log.filter(F.col("url").startswith(u("/r/loop"))).count() == 2


def test_truncated_body_settles_distinctly(spark, site, tmp_path):
    """A body longer than max_bytes settles as STATUS_TRUNCATED (498) with
    the clipped body — never a silent 200 (ADVICE r4) — and is not retried
    (<500: a retry cannot shrink the document)."""
    from ospo_ghcrawler_spark.operators.network_fetch import STATUS_TRUNCATED

    port, hits, _ = site["port"], site["hits"], site["universe"]
    url = f"http://{H1}:{port}/big"
    robots = fetch_robots_df(spark, [f"http://{H1}:{port}"], budget_per_window=100)
    corpus = spark.createDataFrame([], PAGES_SCHEMA)
    cap = 512
    c = Crawler(
        spark, str(tmp_path / "cat_big"), corpus, robots,
        CrawlConfig(batch_size=10, frontier_partitions=2), run_id="big",
        fetcher=make_network_fetch(max_workers_per_task=2, timeout_s=5.0, max_bytes=cap),
    )
    c.seed([url])
    c.run(max_supersteps=4)
    rows = c.catalog.table("pages").read().filter(F.col("url") == url).collect()
    assert [r["status"] for r in rows] == [STATUS_TRUNCATED]
    assert len(rows[0]["html"]) == cap
    assert rows[0]["html"] == BIG_BODY[:cap]
    assert hits[(H1, "/big")] == 1  # settled, not retried


def test_fetch_robots_df_distributed_path(spark, site):
    """Above the driver host-count threshold the robots fetch distributes
    (mapInPandas over >=2 partitions of hosts) and produces the identical
    dim the driver loop does (VERDICT r4 #3)."""
    port = site["port"]
    bases = [f"http://{H1}:{port}", f"http://{H2}:{port}"]
    via_driver = fetch_robots_df(spark, bases, budget_per_window=7)
    via_cluster = fetch_robots_df(
        spark, bases, budget_per_window=7, driver_max_hosts=1
    )
    def norm(df):
        return sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.collect()
        )

    assert norm(via_driver) == norm(via_cluster)
    assert {r["host"]: list(r["disallow_prefixes"]) for r in via_cluster.collect()} == {
        H1: ["/private/"],
        H2: ["/private/"],
    }
