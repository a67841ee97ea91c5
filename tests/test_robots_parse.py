"""Raw robots.txt parsing (functions/robots.py) — RFC 9309 subset.

Pins the messy-input behaviors the oracle query (queries.q_robots_parse)
can't cover because its synthetic bodies are well-formed: CRLF endings,
directives before any User-agent group (ignored), empty Disallow (allow-all,
dropped), unknown directives, stacked User-agent lines sharing one group,
agent-specific precedence shadowing ``*``, malformed Crawl-delay, and hosts
whose robots match nothing (row with empty prefixes, null delay).
"""

from __future__ import annotations

from ospo_ghcrawler_spark.functions.robots import parse_robots_txt


def _parse(spark, bodies: dict[str, str], agent: str = "ospo-crawler"):
    df = spark.createDataFrame(
        [(h, t) for h, t in bodies.items()], "host string, robots_txt string"
    )
    return {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay_ms"], r["budget_per_window"])
        for r in parse_robots_txt(df, agent=agent).collect()
    }


def test_basic_star_group_crlf_and_comments(spark):
    out = _parse(
        spark,
        {
            "a": "# hello\r\nUser-Agent: *\r\nDisallow: /x/ # inline\r\nCRAWL-DELAY: 2\r\n",
        },
    )
    assert out["a"] == (["/x/"], 2000, None)


def test_specific_group_shadows_star(spark):
    body = (
        "User-agent: *\nDisallow: /all/\nCrawl-delay: 9\n"
        "\nUser-agent: Ospo-Crawler\nDisallow: /mine/\nCrawl-delay: 0.25\n"
    )
    out = _parse(spark, {"a": body})
    # only the specific group applies: its prefix and ITS delay, not the *'s
    assert out["a"] == (["/mine/"], 250, None)


def test_stacked_user_agents_share_group(spark):
    body = (
        "User-agent: other-bot\nUser-agent: ospo-crawler\n"
        "Disallow: /shared/\nDisallow: /also/\n"
    )
    out = _parse(spark, {"a": body})
    assert out["a"] == (["/also/", "/shared/"], None, None)


def test_headless_directives_ignored_and_empty_disallow_dropped(spark):
    body = (
        "Disallow: /before-any-group/\n"  # no group yet → ignored (RFC 9309)
        "User-agent: *\nDisallow:\n"  # empty Disallow = allow all → dropped
        "Sitemap: http://a/map.xml\nNoindex: /x\n"  # unknown keys ignored
    )
    out = _parse(spark, {"a": body})
    assert out["a"] == ([], None, None)


def test_no_matching_group_and_malformed_delay(spark):
    out = _parse(
        spark,
        {
            "none": "User-agent: GoogleBot\nDisallow: /g/\n",
            "bad": "User-agent: *\nCrawl-delay: soon\nDisallow: /ok/\n",
            "empty": "",
        },
    )
    assert out["none"] == ([], None, None)  # group for someone else only
    assert out["bad"] == (["/ok/"], None, None)  # try_cast swallows junk
    assert out["empty"] == ([], None, None)


def test_engine_dim_shape_feeds_politeness(spark):
    """The parsed dim slots straight into effective_host_budget."""
    from ospo_ghcrawler_spark.config import CrawlConfig
    from ospo_ghcrawler_spark.operators.politeness import effective_host_budget

    dim = parse_robots_txt(
        spark.createDataFrame(
            [("h", "User-agent: *\nDisallow: /p/\nCrawl-delay: 1\n")],
            "host string, robots_txt string",
        )
    )
    cfg = CrawlConfig(host_budget=100, superstep_window_ms=5_000)
    budgets = {r["host"]: r["host_budget"] for r in effective_host_budget(dim, cfg).collect()}
    assert budgets["h"] == 5  # floor(5000 / 1000)
