"""robots.txt raw-text parsing as declarative Spark expressions.

The engine consumes a structured robots dim ``(host, disallow_prefixes,
crawl_delay_ms, budget_per_window)`` (schemas.ROBOTS_SCHEMA;
operators/politeness.py applies it). A real crawl starts from the raw
``robots.txt`` bodies it fetched — this module turns a table of
``(host, robots_txt)`` into that dim entirely JVM-side: split/regexp line
parsing, a window for user-agent group assignment, and two per-host
aggregations. No Python UDFs anywhere.

Semantics (RFC 9309 subset, matching what the engine enforces):

- lines are ``Key: value``; ``#`` starts a comment; keys are
  case-insensitive; CRLF tolerated; unknown keys ignored;
- consecutive ``User-agent`` lines open one group sharing the directives
  that follow (until the next UA line run); directives before any UA line
  are ignored;
- a group applies to us if it names our product token exactly
  (case-insensitive) or ``*``; if ANY group names us specifically, only the
  specifically-matching groups apply (RFC 9309 §2.2.1 precedence — the
  ``*`` groups are ignored for agents with their own group);
- ``Disallow``/``Allow`` values are path prefixes (empty Disallow = no
  restriction, dropped); ``Crawl-delay`` (non-standard but ubiquitous) is
  seconds, possibly fractional → milliseconds, max across matched groups.

The engine's filter applies disallow prefixes only (politeness.
robots_allowed_filter — the reference's allow-list scope filter analog,
/root/reference/lib/crawlerFactory.js:633-650); Allow lines are parsed and
exposed for completeness but longest-match Allow-vs-Disallow arbitration is
out of scope (as it is for the reference).

Scale posture: one shuffle for the per-host window + one for the per-host
aggregate, both keyed on host — robots bodies are small (few KB) and the
table has one row per host (~1e7 hosts at 10^10 urls), trivially
partitionable. All expressions are whole-stage-codegen string/array ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: directive keys the parser keeps (lowercased)
_KEYS = ("user-agent", "disallow", "allow", "crawl-delay")


def parse_robots_directives(
    df: DataFrame, agent: str, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, key, val) directive rows from the groups that apply to
    *agent* — the shared front half of the parse (line split, comment
    strip, UA-run grouping, precedence)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\r?\n")).alias("pos", "line"),
    )
    clean = F.trim(F.regexp_replace("line", "#.*", ""))
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias("val"),
    ).filter(F.col("key").isin(*_KEYS))

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    prev_ua = F.lag(is_ua.cast("int"), 1, 0).over(w) == 1
    grouped = parsed.withColumn(
        "grp",
        F.sum(F.when(is_ua & ~prev_ua, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).filter(F.col("grp") > 0)

    ga = grouped.groupBy("host", "grp").agg(
        F.max(is_ua & (F.lower("val") == "*")).alias("has_star"),
        F.max(is_ua & (F.lower("val") == agent.lower())).alias("has_agent"),
    )
    host_specific = ga.groupBy("host").agg(F.max("has_agent").alias("specific"))
    matched = (
        ga.join(host_specific, "host")
        .filter(F.when(F.col("specific"), F.col("has_agent")).otherwise(F.col("has_star")))
        .select("host", "grp")
    )
    return (
        grouped.join(matched, ["host", "grp"])
        .filter(~is_ua)
        .select("host", "key", "val")
    )


def parse_robots_txt(
    df: DataFrame, agent: str = "ospo-crawler", host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """ROBOTS_SCHEMA dim from raw robots.txt bodies: every input host gets a
    row (no matching group → empty prefixes, null delay), ``budget_per_window``
    null (it comes from operator config, not robots), prefixes sorted for
    determinism."""
    dirs = parse_robots_directives(df, agent, host_col, txt_col)
    per_host = dirs.groupBy("host").agg(
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when((F.col("key") == "disallow") & (F.col("val") != ""), F.col("val"))
                )
            )
        ).alias("disallow_prefixes"),
        (F.max(F.when(F.col("key") == "crawl-delay", F.expr("try_cast(val as double)"))) * 1000)
        .cast("long")
        .alias("crawl_delay_ms"),
    )
    hosts = df.select(F.col(host_col).alias("host")).distinct()
    return hosts.join(per_host, "host", "left").select(
        "host",
        F.coalesce("disallow_prefixes", F.array().cast("array<string>")).alias(
            "disallow_prefixes"
        ),
        "crawl_delay_ms",
        F.lit(None).cast("int").alias("budget_per_window"),
    )


def robots_sitemaps(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) from ``Sitemap:`` lines — the sitemaps.org
    extension to robots.txt and the standard discovery hand-off: robots
    names the sitemaps, functions/sitemaps.py parses their bodies, the
    locs seed the frontier. Unlike every directive above, Sitemap lines
    are GROUP-INDEPENDENT (they apply regardless of user-agent and may
    appear anywhere in the file), so this is a pure projection — comment
    strip, key match, absolute-url value — plus a distinct; no UA-group
    window at all."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(txt_col), "\r?\n")).alias("line"),
    )
    clean = F.trim(F.regexp_replace("line", "#.*", ""))
    return (
        lines.select(
            "host",
            F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1))).alias("key"),
            F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias("sitemap_url"),
        )
        .filter((F.col("key") == "sitemap") & (F.col("sitemap_url") != ""))
        .select("host", "sitemap_url")
        .distinct()
    )


# --- RFC 9309 §2.2.2 full matching: wildcards + longest-match arbitration ---
# The engine's hot path keeps the prefix dim (ROBOTS_SCHEMA — prefix checks
# are cheap string ops inside the politeness filter); this is the GENERAL
# decision: Allow/Disallow patterns with `*` (any octets) and a final `$`
# (end anchor), most-specific (longest-pattern) rule wins, tie → Allow.
# Everything stays JVM-side: patterns compile to anchored regexes at
# dim-build time, per-url matching is array lambdas over the (broadcast)
# per-host rule arrays — zero shuffle on the url side.


def robots_pattern_regex(pat: F.Column) -> F.Column:
    """Anchored Java/RE2-safe regex equivalent of an RFC 9309 path pattern:
    escape regex metachars, ``*`` → ``.*``, final ``$`` → end anchor
    (non-final ``$`` is literal per the RFC)."""
    ends = pat.endswith("$")
    body = F.when(ends, F.substring(pat, F.lit(1), F.length(pat) - 1)).otherwise(pat)
    esc = F.regexp_replace(body, r"([.\[\](){}+?^$|\\*])", r"\\$1")
    wild = F.replace(esc, F.lit(r"\*"), F.lit(".*"))
    return F.concat(F.lit("^"), wild, F.when(ends, F.lit("$")).otherwise(F.lit("")))


def robots_rules_dim(rules: DataFrame) -> DataFrame:
    """(host, rules: array<struct<regex, score>>) from rows of
    (host, is_allow, pattern). score = 2·octet-length + is_allow — the
    RFC's (longest pattern, Allow-wins-ties) order as ONE integer, so both
    engines arbitrate with a plain max. O(hosts) rows, broadcastable."""
    r = rules.select(
        "host",
        F.struct(
            robots_pattern_regex(F.col("pattern")).alias("regex"),
            (F.octet_length("pattern") * 2 + F.col("is_allow").cast("int")).alias("score"),
        ).alias("rule"),
    )
    return r.groupBy("host").agg(F.collect_list("rule").alias("rules"))


def robots_decide(
    urls: DataFrame, rules: DataFrame, path_col: str = "path"
) -> DataFrame:
    """Per-url RFC 9309 decision against (host, is_allow, pattern) rules:
    input columns + ``allowed`` (true when no rule matches — default-allow).

    Plan: rules aggregate to O(hosts) arrays (one small shuffle), broadcast
    join onto urls, then matching + arbitration are pure array lambdas in
    the url scan's codegen span — the url side never shuffles.
    """
    dim = robots_rules_dim(rules)
    p = F.col(path_col)
    matched = F.filter(F.col("rules"), lambda r: F.regexp_like(p, r["regex"]))
    best = F.array_max(F.transform(matched, lambda r: r["score"]))
    return (
        urls.join(F.broadcast(dim), "host", "left")
        .withColumn("allowed", F.coalesce(best % 2 == 1, F.lit(True)))
        .drop("rules")
    )
