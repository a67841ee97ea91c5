"""Meta-robots directive extraction + cfg-gated nofollow at expansion."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.functions.extract import meta_robots_col, meta_robots_flags
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.schemas import PAGES_SCHEMA
from ospo_ghcrawler_spark.sources.corpus import synth_robots


def test_meta_robots_extraction_variants(spark):
    rows = [
        (0, b'<html><head><meta name="robots" content="noindex, nofollow"></head></html>'),
        (1, b"<meta content='noai' name='robots'>"),          # content-first order
        (2, b'<meta name=robots content="NOARCHIVE">'),        # unquoted name, caps
        (3, b"<html><meta name='viewport' content='w'></html>"),  # no robots tag
        (4, b'<meta name="robots" content="all">'),
        # ADVICE r3: prefix names must NOT match as the robots tag
        (5, b'<meta name="robots-something" content="noindex">'),
        (6, b'<meta name=robotsfoo content="nofollow">'),
        # apostrophe inside a double-quoted value must not truncate capture
        (7, b'<meta name="robots" content="noindex, it\'s nofollow">'),
        # unquoted content value (delimited by whitespace/>)
        (8, b'<meta name=robots content=noindex>'),
    ]
    df = spark.createDataFrame(rows, "i long, html binary")
    flags = meta_robots_flags(F.col("html"))
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            meta_robots_col(F.col("html")).alias("raw"),
            *[c.alias(d) for d, c in flags.items()],
        ).collect()
    }
    assert out[0]["raw"] == "noindex, nofollow"
    assert out[0]["noindex"] and out[0]["nofollow"] and not out[0]["noai"]
    assert out[1]["noai"] and not out[1]["nofollow"]
    assert out[2]["noarchive"]
    assert out[3]["raw"] is None and not any(
        out[3][d] for d in ("noindex", "nofollow", "noarchive", "noai")
    )
    assert not out[4]["noindex"]
    assert out[5]["raw"] is None and not out[5]["noindex"]
    assert out[6]["raw"] is None and not out[6]["nofollow"]
    assert out[7]["raw"] == "noindex, it's nofollow" and out[7]["noindex"]
    assert out[8]["raw"] == "noindex" and out[8]["noindex"]


def _corpus(spark, nofollow_seed: bool):
    meta = '<meta name="robots" content="nofollow">' if nofollow_seed else ""
    def page(url, links, i):
        anchors = "".join(f'<a href="{u}">x</a>' for u in links)
        html = f"<html><head>{meta if url == SEED else ''}</head><body>{anchors}</body></html>".encode()
        ts = datetime.fromtimestamp(1_600_000_000 + i, tz=timezone.utc).replace(tzinfo=None)
        return (url, ts, bytearray(html), f"page {url}", "en")
    return spark.createDataFrame(
        [page(SEED, CHILDREN, 0)] + [page(u, [], i + 1) for i, u in enumerate(CHILDREN)],
        schema=PAGES_SCHEMA,
    )


SEED = "http://m.example/s0"
CHILDREN = [f"http://m.example/c{i}" for i in range(3)]


def test_nofollow_page_contributes_no_edges(spark, tmp_path):
    robots = synth_robots(spark, n_hosts=1).limit(0)
    for tag, respect, want in (
        ("on", True, 1),       # only the seed is ever fetched
        ("off", False, 4),     # nofollow ignored -> children crawled
    ):
        cfg = CrawlConfig(batch_size=10, host_budget=100, respect_meta_robots=respect)
        c = Crawler(
            spark, str(tmp_path / tag), _corpus(spark, True), robots, cfg, run_id=tag
        )
        c.seed([SEED])
        c.run(max_supersteps=10)
        n = c.catalog.table("pages").read().count()
        assert n == want, f"{tag}: fetched {n}, want {want}"
