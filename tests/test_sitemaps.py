"""Sitemap parser: tolerated-forms unit pins + plan shape.

Oracle parity at sf0.01 is covered by test_oracle_parity.py
(`sitemap_parse`); here the parser's documented tolerance contract is
pinned on handwritten bodies, and the plan is pinned zero-shuffle."""

from __future__ import annotations

from ospo_ghcrawler_spark.functions.sitemaps import (
    CHANGEFREQ_S,
    parse_sitemap_entries,
)


def _parse(spark, xml: str):
    raw = spark.createDataFrame([("h.example", xml)], "host string, sitemap_xml string")
    return {
        (r["loc"], r["is_index"]): r for r in parse_sitemap_entries(raw).collect()
    }


def test_urlset_fields_and_tolerance(spark):
    got = _parse(
        spark,
        """<urlset>
         <url>
           <loc>  http://h.example/a?x=1&amp;y=2  </loc>
           <lastmod> 2026-03-15 </lastmod>
           <changefreq>WEEKLY</changefreq>
           <priority>0.8</priority>
         </url>
         <url><loc>http://h.example/&lt;b&gt;</loc></url>
        </urlset>""",
    )
    a = got[("http://h.example/a?x=1&y=2", False)]
    assert a["lastmod"] == "2026-03-15"
    assert a["changefreq"] == "weekly"
    assert a["changefreq_s"] == CHANGEFREQ_S["weekly"]
    assert a["priority"] == 0.8
    b = got[("http://h.example/<b>", False)]
    assert b["lastmod"] is None and b["changefreq"] is None
    assert b["changefreq_s"] is None and b["priority"] is None


def test_sitemapindex_children_flagged(spark):
    got = _parse(
        spark,
        "<sitemapindex><sitemap><loc>http://h.example/s1.xml</loc>"
        "<lastmod>2026-07-01</lastmod></sitemap>"
        "<sitemap>\n<loc>http://h.example/s2.xml</loc>\n</sitemap></sitemapindex>",
    )
    assert set(got) == {
        ("http://h.example/s1.xml", True),
        ("http://h.example/s2.xml", True),
    }
    assert got[("http://h.example/s1.xml", True)]["lastmod"] == "2026-07-01"


def test_entries_without_loc_dropped(spark):
    got = _parse(spark, "<urlset><url><lastmod>2026-01-01</lastmod></url></urlset>")
    assert got == {}


def test_full_changefreq_vocabulary(spark):
    xml = "<urlset>" + "".join(
        f"<url><loc>http://h.example/{w}</loc><changefreq>{w}</changefreq></url>"
        for w in CHANGEFREQ_S
    ) + "</urlset>"
    got = _parse(spark, xml)
    for w, secs in CHANGEFREQ_S.items():
        assert got[(f"http://h.example/{w}", False)]["changefreq_s"] == secs


def test_sitemap_parse_zero_exchange(spark):
    """Pure projection + explode — must ride the scan with no shuffle."""
    from ospo_ghcrawler_spark import queries as Q

    df = Q.QUERIES["sitemap_parse"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_discovery_handoff_robots_to_sitemap_to_crawl(spark, tmp_path):
    """The full discovery loop: robots.txt names the sitemaps
    (robots_sitemaps), the sitemap bodies yield locs (parse_sitemap_entries),
    the locs seed the crawler, and the crawl settles exactly those pages
    (max_depth=0: no link expansion)."""
    from pyspark.sql import functions as F

    from ospo_ghcrawler_spark.config import CrawlConfig
    from ospo_ghcrawler_spark.functions.robots import robots_sitemaps
    from ospo_ghcrawler_spark.operators.engine import Crawler
    from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

    N, H = 120, 6
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=4)
    robots_dim = synth_robots(spark, n_hosts=H)

    # robots bodies: each host advertises one sitemap
    raw_robots = spark.createDataFrame(
        [(f"host{h}.example",
          f"User-agent: *\nDisallow: /private/\nSitemap: http://host{h}.example/sitemap.xml\n")
         for h in range(H)],
        "host string, robots_txt string",
    )
    maps = robots_sitemaps(raw_robots)
    assert maps.count() == H

    # sitemap bodies: the first 10 page urls, sharded across the host maps
    urls = [page_url(i, N, H, False) for i in range(10)]
    body = "<urlset>" + "".join(f"<url><loc>{u}</loc></url>" for u in urls) + "</urlset>"
    sitemap_bodies = maps.select("host", F.lit(body).alias("sitemap_xml"))
    from ospo_ghcrawler_spark.functions.sitemaps import parse_sitemap_entries

    entries = parse_sitemap_entries(sitemap_bodies)
    locs = sorted({r["loc"] for r in entries.filter(~F.col("is_index")).collect()})
    assert locs == sorted(set(urls))

    c = Crawler(
        spark, str(tmp_path / "cat"), corpus, robots_dim,
        CrawlConfig(batch_size=50, max_depth=0), run_id="smseed",
    )
    c.seed(locs)
    c.run(10)
    pages = c.catalog.table("pages").read()
    fetched = sorted(r["url"] for r in pages.select("url").collect())
    assert fetched == sorted(set(urls))
