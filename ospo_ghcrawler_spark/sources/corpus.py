"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the BASELINE.json ``input_hint`` table
``pages(url, warc_ts, html, text, lang)`` at any scale, fully distributed
(``spark.range`` → arithmetic link graph → ``mapInPandas`` html assembly) and
fully deterministic (pure hash arithmetic, no RNG state, independent of
partitioning). The ``text`` column is the **golden extraction target**: the
generator composes it from the same strings it embeds in ``html``, and
``tests/test_extract.py`` pins ``extract_text(html) == text`` byte-identically
for every row (the input_hint per-row invariant).

Link graph knobs (all deterministic in page_id):

- K outlinks per page to other corpus pages (plus one duplicate of link 0 —
  exercises within-page dedup);
- every 17th link points off-corpus (a 404 — exercises dead fetches);
- every 13th link points into ``/private/`` (robots-disallowed);
- skew mode: ``host0.example`` owns half of all pages (exercises salting).

Reference analog: the fetch fixtures of
/root/reference/test/unit/processingTests.js:93-238 play this role for the
reference (a canned universe the stubbed fetcher serves).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ospo_ghcrawler_spark.schemas import PAGES_SCHEMA, ROBOTS_SCHEMA

_LANGS = ["en", "de", "fr", "es", "it"]
_WORDS = (
    "crawl frontier queue host page link fetch robots budget priority "
    "superstep snapshot shard filter bloom cuckoo salt skew batch commit "
    "lineage metric token window delta resume seed depth edge"
).split()

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp()

# splitmix64-ish integer mixers (pure arithmetic → identical everywhere)
_M1 = 0x9E3779B97F4A7C15
_M2 = 0xBF58476D1CE4E5B9
_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    x = (x * _M1 + 0x12345) & _MASK
    x ^= x >> 30
    x = (x * _M2) & _MASK
    x ^= x >> 27
    return x


def page_host(pid: int, n_pages: int, n_hosts: int, skew: bool) -> int:
    """host id of page pid; skew mode gives host 0 half of all pages."""
    if skew and pid < n_pages // 2:
        return 0
    return _mix(pid) % n_hosts


def page_url(pid: int, n_pages: int, n_hosts: int, skew: bool) -> str:
    h = page_host(pid, n_pages, n_hosts, skew)
    return f"http://host{h}.example/p{pid}"


def page_links(pid: int, n_pages: int, n_hosts: int, k: int, skew: bool) -> list[str]:
    """Deterministic outlink URLs of page pid (raw hrefs as they appear in
    html — the extractor canonicalizes)."""
    links = []
    for j in range(k):
        if (pid + j) % 17 == 0:
            # off-corpus 404 target — drawn from a bounded dead-link pool
            # (~n_pages/10) so dead urls repeat across pages like real rot
            dead = _mix(pid * 7 + j) % (n_pages // 10 + 1)
            links.append(f"http://host{_mix(dead) % n_hosts}.example/missing{dead}")
        elif (pid + j) % 13 == 0:
            h = page_host(pid, n_pages, n_hosts, skew)
            links.append(f"http://host{h}.example/private/s{pid}_{j}")
        else:
            target = _mix(pid * 31 + j) % n_pages
            links.append(page_url(target, n_pages, n_hosts, skew))
    if k > 0:
        links.append(links[0])  # duplicate link — within-page dedup exercise
    return links


def _sentence(pid: int) -> str:
    n = 8 + _mix(pid + 7) % 24
    return " ".join(_WORDS[_mix(pid * 131 + i) % len(_WORDS)] for i in range(n)) + "."


def render_page(
    pid: int, n_pages: int, n_hosts: int, k: int, skew: bool, sentences: int = 1
) -> tuple[str, bytes, str, str]:
    """(url, html, golden_text, lang) of page pid."""
    h = page_host(pid, n_pages, n_hosts, skew)
    url = page_url(pid, n_pages, n_hosts, skew)
    title = f"Page {pid} on host{h}.example"
    heading = f"Page {pid}"
    body = " ".join(_sentence(pid * 97 + s) for s in range(sentences))
    links = page_links(pid, n_pages, n_hosts, k, skew)
    anchors = "".join(
        f'<a href="{u}">anchor {i} of {pid}</a>\n' for i, u in enumerate(links)
    )
    html = (
        f"<html><head><title>{title}</title>"
        f"<script>var x = {pid}; // not text</script>"
        f"<style>.c{{color:red}}</style></head>"
        f"<!-- comment {pid} -->"
        f"<body><h1>{heading}</h1>\n<p>{body}</p>\n{anchors}</body></html>"
    ).encode("utf-8")
    golden_lines = [title, heading, body] + [f"anchor {i} of {pid}" for i in range(len(links))]
    text = "\n".join(golden_lines)
    return url, html, text, _LANGS[h % len(_LANGS)]


def synth_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 50,
    links_per_page: int = 8,
    skew: bool = False,
    partitions: int = 32,
    sentences: int = 1,
) -> DataFrame:
    """Distributed corpus build: ``spark.range`` drives page ids; html/text
    assembly happens in parallel Arrow batches via ``mapInPandas``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid in pdf["id"]:
                pid = int(pid)
                url, html, text, lang = render_page(
                    pid, n_pages, n_hosts, links_per_page, skew, sentences
                )
                ts = datetime.fromtimestamp(_EPOCH + pid, tz=timezone.utc).replace(tzinfo=None)
                rows.append((url, ts, html, text, lang))
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(build, schema=PAGES_SCHEMA)
    )


def synth_robots(
    spark: SparkSession,
    n_hosts: int,
    default_budget: int = 30,
    crawl_delay_ms: int = 100,
    zero_budget_hosts: tuple[int, ...] = (),
) -> DataFrame:
    """Per-host robots rules: every host disallows ``/private/``; selected
    hosts get budget 0 (fully benched — the reference's exhausted token,
    /root/reference/providers/fetcher/tokenFactory.js:74-86)."""
    rows = [
        (
            f"host{i}.example",
            ["/private/"],
            crawl_delay_ms,
            0 if i in zero_budget_hosts else default_budget,
        )
        for i in range(n_hosts)
    ]
    return spark.createDataFrame(rows, schema=ROBOTS_SCHEMA)


# ---------------------------------------------------------------------------
# Golden micro-site — port of the reference's golden traversal
# (/root/reference/test/unit/processingTests.js:20-44): 12 resources, child
# queue counts [4,1,0,2,1,0,1,2,0,0,0] over 11 asserted pops.
# ---------------------------------------------------------------------------

GOLDEN_HOST = "golden.example"

# page name -> list of linked page names (order matters: FIFO tie-break)
GOLDEN_GRAPH: dict[str, list[str]] = {
    "p0": ["p1", "p2", "p3", "p4"],  # org -> user, repos, members, teams
    "p1": ["p2b"],                   # user -> repos page 2
    "p2": [],                        # repos page (first copy)
    "p3": ["p5", "p6"],              # members page -> 2 members
    "p4": ["p7"],                    # teams page -> team
    "p2b": [],                       # repos page 2
    "p5": ["p8"],                    # member -> its user page
    "p6": ["p9", "p10"],             # member -> user + repos listing
    "p7": [],                        # team (empty listings)
    "p8": [],
    "p9": [],
    "p10": [],
}

GOLDEN_POP_ORDER = ["p0", "p1", "p2", "p3", "p4", "p2b", "p5", "p6", "p7", "p8", "p9", "p10"]
GOLDEN_QUEUED_COUNTS = [4, 1, 0, 2, 1, 0, 1, 2, 0, 0, 0]  # per asserted pop


def golden_url(name: str) -> str:
    return f"http://{GOLDEN_HOST}/{name}"


def golden_pages(spark: SparkSession) -> DataFrame:
    rows = []
    for i, (name, children) in enumerate(GOLDEN_GRAPH.items()):
        anchors = "".join(f'<a href="/{c}">to {c}</a>' for c in children)
        html = (
            f"<html><head><title>{name}</title></head>"
            f"<body><h1>{name}</h1>{anchors}</body></html>"
        ).encode()
        text = "\n".join([name, name] + [f"to {c}" for c in children])
        ts = datetime.fromtimestamp(_EPOCH + i, tz=timezone.utc).replace(tzinfo=None)
        rows.append((golden_url(name), ts, bytearray(html), text, "en"))
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def golden_robots(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(GOLDEN_HOST, [], 0, 1_000_000)], schema=ROBOTS_SCHEMA
    )
