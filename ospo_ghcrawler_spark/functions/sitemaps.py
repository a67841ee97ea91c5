"""Sitemap parsing — the discovery-side complement of robots.txt.

A production crawl seeds and re-crawls from sitemaps (sitemaps.org
protocol: ``<urlset>`` leaves and ``<sitemapindex>`` indirection); the
reference discovers urls only by traversal (no sitemap support — this is a
beyond-reference webtext op per SURVEY.md §2.8, alongside
functions/robots.py which covers the exclusion side).

Parsing is **pure JVM column expressions** (regexp over the xml body, one
``explode`` per entry class) — zero shuffle, rides whatever scan delivers
the fetched sitemap bodies; at 10^10-url scale sitemap fetches are ordinary
frontier rows and this parser is a projection on their harvest. The
tolerated-forms contract (documented, test-pinned): whitespace/newlines
anywhere between tags, ``&amp;``/``&lt;``/``&gt;`` entity unescape in
``<loc>``, case-normalized ``<changefreq>``, fractional ``<priority>``,
missing optional fields → null. Full XML (namespaces, CDATA, gzip bodies)
belongs to a fetch-side decode stage, not the relational parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# changefreq → refresh seconds (sitemaps.org vocabulary). "always"/"never"
# get the protocol's conventional bounds (0 = every visit; null = ignore).
CHANGEFREQ_S: dict[str, int] = {
    "always": 0,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,
    "yearly": 31_536_000,
}


def _field(block, tag: str):
    return F.nullif(
        F.trim(F.regexp_extract(block, f"(?s)<{tag}>\\s*(.*?)\\s*</{tag}>", 1)),
        F.lit(""),
    )


def _unescape(col):
    return F.replace(
        F.replace(F.replace(col, F.lit("&lt;"), F.lit("<")), F.lit("&gt;"), F.lit(">")),
        F.lit("&amp;"),
        F.lit("&"),
    )


def parse_sitemap_entries(raw: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """Explode sitemap bodies into one row per entry.

    *raw* must have (host, *xml_col*). Returns
    (host, loc, lastmod, changefreq, changefreq_s, priority, is_index):
    ``is_index`` rows are ``<sitemapindex>`` children (their loc is another
    sitemap to fetch — the crawler feeds them back into the frontier);
    leaf rows carry the page url + recrawl hints. ``lastmod`` stays a
    trimmed string (sitemaps mix date-only and full W3C datetimes; the
    refetch scheduler casts what it needs), ``changefreq_s`` maps the
    vocabulary to seconds for the scheduler, ``priority`` is a double.
    """
    out = []
    for tag, is_index in (("url", False), ("sitemap", True)):
        block = F.explode(
            F.expr(
                f"regexp_extract_all({xml_col}, '(?s)<{tag}>(.*?)</{tag}>', 1)"
            )
        ).alias("block")
        b = raw.select("host", block)
        cf = F.lower(_field(F.col("block"), "changefreq"))
        cf_s = F.lit(None).cast("long")
        for word, secs in CHANGEFREQ_S.items():
            cf_s = F.when(cf == word, F.lit(secs).cast("long")).otherwise(cf_s)
        out.append(
            b.select(
                "host",
                _unescape(_field(F.col("block"), "loc")).alias("loc"),
                _field(F.col("block"), "lastmod").alias("lastmod"),
                cf.alias("changefreq"),
                cf_s.alias("changefreq_s"),
                F.expr(
                    "try_cast(regexp_extract(block,"
                    " '(?s)<priority>\\\\s*(.*?)\\\\s*</priority>', 1) as double)"
                ).alias("priority"),
                F.lit(is_index).alias("is_index"),
            ).filter(F.col("loc").isNotNull())
        )
    return out[0].unionByName(out[1])


def sitemap_entries_sql(raw_cte: str) -> str:
    """DuckDB oracle over the same tolerated forms: *raw_cte* must define a
    relation ``raw(host, sitemap_xml)``."""
    cf_case = " ".join(
        f"WHEN '{w}' THEN CAST({s} AS BIGINT)" for w, s in CHANGEFREQ_S.items()
    )
    parts = []
    for tag, is_index in (("url", "FALSE"), ("sitemap", "TRUE")):
        parts.append(f"""
    SELECT host,
           replace(replace(replace(
             nullif(trim(regexp_extract(block, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1)), ''),
             '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS loc,
           nullif(trim(regexp_extract(block, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)), '') AS lastmod,
           nullif(lower(trim(regexp_extract(block, '(?s)<changefreq>\\s*(.*?)\\s*</changefreq>', 1))), '') AS changefreq,
           CASE nullif(lower(trim(regexp_extract(block, '(?s)<changefreq>\\s*(.*?)\\s*</changefreq>', 1))), '')
                {cf_case} ELSE NULL END AS changefreq_s,
           TRY_CAST(nullif(trim(regexp_extract(block, '(?s)<priority>\\s*(.*?)\\s*</priority>', 1)), '') AS DOUBLE) AS priority,
           {is_index} AS is_index
    FROM (
      SELECT host, unnest(regexp_extract_all(sitemap_xml,
               '(?s)<{tag}>(.*?)</{tag}>', 1)) AS block
      FROM raw
    )
    WHERE nullif(trim(regexp_extract(block, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1)), '') IS NOT NULL""")
    return f"WITH {raw_cte}\n" + "\n    UNION ALL BY NAME\n".join(parts)
