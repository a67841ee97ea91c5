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

    # reopen the run with an etag-aware fetcher (provider = the server's
    # strong etags, as a doc store would have recorded them) and recrawl p0
    etags = {
        f"http://{h}:{p_port}{p}": '"' + hashlib.md5(body).hexdigest() + '"'
        for (h, p), body in universe.items()
        for p_port in (port,)
    }
    c2 = Crawler.resume(
        spark, root, corpus, robots, cfg, run_id="etag",
        fetcher=make_network_fetch(
            max_workers_per_task=4, timeout_s=5.0,
            etag_provider=lambda u: etags.get(u),
        ),
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
