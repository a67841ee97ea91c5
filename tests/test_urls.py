"""Identity layer: canonicalization must be stable and the JVM/Python
implementations must agree (everything joins on xxhash64(canonical_url))."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.functions.urls import (
    canonicalize_col,
    canonicalize_udf,
    canonicalize_url,
    host_col,
    host_of,
)

CASES = [
    ("http://Example.COM/path", "http://example.com/path"),
    ("HTTPS://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?", "http://example.com/p"),
    ("http://host0.example/p12", "http://host0.example/p12"),
    ("ftp://example.com/x", None),
    ("not a url", None),
    ("", None),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_python(raw, expected):
    assert canonicalize_url(raw) == expected


def test_host_of():
    assert host_of("http://Host3.Example/p1?z=1#f") == "host3.example"
    assert host_of("https://example.com:8443/x") == "example.com"


def test_canonicalize_jvm_matches_python(spark):
    raws = [c for c, e in CASES if e is not None]
    df = spark.createDataFrame([(r,) for r in raws], ["raw"])
    got = df.select(canonicalize_col(F.col("raw")).alias("c")).collect()
    expected = [canonicalize_url(r) for r in raws]
    assert [r["c"] for r in got] == expected


def test_host_col_matches_python(spark):
    urls = ["http://host3.example/p1", "https://example.com:8443/x", "http://a.b.c/"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r["h"] for r in df.select(host_col(F.col("url")).alias("h")).collect()]
    assert got == ["host3.example", "example.com", "a.b.c"]


def test_canonicalize_udf_vectorized(spark):
    df = spark.createDataFrame([(c,) for c, _ in CASES], ["raw"])
    got = [r["c"] for r in df.select(canonicalize_udf("raw").alias("c")).collect()]
    assert got == [e for _, e in CASES]


def test_canonicalize_idempotent():
    for raw, expected in CASES:
        if expected is not None:
            assert canonicalize_url(expected) == expected


def test_surt_col_cdx_convention(spark):
    from ospo_ghcrawler_spark.functions.urls import surt_col

    cases = [
        ("http://www.Example.com/a?b=2&a=1", "com,example)/a?a=1&b=2"),
        ("https://sub.Host7.Example:443/P/Q#frag", "example,host7,sub)/P/Q"),
        ("http://example.com", "com,example)/"),
        ("http://www.example.com/?x=1", "com,example)/?x=1"),
        # only ONE leading www. is stripped, and only as a full label
        ("http://wwwx.example.com/p", "com,example,wwwx)/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["s"] for r in df.select(surt_col(F.col("url")).alias("s")).collect()]
    assert got == [e for _, e in cases]


def test_mine_dust_rules_planted(spark):
    from ospo_ghcrawler_spark.functions.urls import mine_dust_rules

    rows = [
        ("http://a.example/x", "a.example", 1),          # canonical (lexic. min)
        ("http://a.example/x?sid=9", "a.example", 1),    # query alias
        ("http://a.example/x/", "a.example", 1),         # slash alias
        ("http://www.a.example/x", "a.example", 1),      # www alias
        ("http://b.example/y", "b.example", 2),          # lone url: no output row
        ("http://c.example/z/", "c.example", 3),         # no canonical in group:
        ("http://c.example/z?k=1", "c.example", 3),      #   rep = slash variant
    ]
    df = spark.createDataFrame(rows, "url string, host string, content_key long")
    got = {r.url: r for r in mine_dust_rules(df).collect()}
    assert len(got) == 4  # three aliases of group 1 + one unexplained of group 3
    assert got["http://a.example/x?sid=9"].rule == "strip_query"
    assert got["http://a.example/x/"].rule == "strip_slash"
    assert got["http://www.a.example/x"].rule == "strip_www"
    rep = "http://c.example/z/"  # '/' sorts below '?' — slash variant is min
    other = got["http://c.example/z?k=1"]
    assert other.rep_url == rep and other.rule == "other"
    for r in got.values():
        if r.url.startswith("http://a") or r.url.startswith("http://www.a"):
            assert r.rep_url == "http://a.example/x"


def test_dust_generalize_and_apply(spark):
    from ospo_ghcrawler_spark.functions.urls import (
        apply_dust_rules,
        generalize_dust_rules,
        mine_dust_rules,
    )

    # host a witnesses the query rule twice (generalizes) and www once
    # (support 1: does NOT generalize); host b witnesses nothing
    rows = [
        ("http://a.example/x", "a.example", 1),
        ("http://a.example/x?s=1", "a.example", 1),
        ("http://a.example/y", "a.example", 2),
        ("http://a.example/y?s=2", "a.example", 2),
        ("http://a.example/z", "a.example", 3),
        ("http://www.a.example/z", "a.example", 3),
    ]
    mined = mine_dust_rules(
        spark.createDataFrame(rows, "url string, host string, content_key long")
    )
    rules = generalize_dust_rules(mined, min_support=2)
    got = {(r.host, r.rule): r.support for r in rules.collect()}
    assert got == {("a.example", "strip_query"): 2}

    # applied to urls NEVER seen by the miner: query stripped on host a
    # only; un-generalized www and unknown-host urls pass through
    frontier = spark.createDataFrame(
        [
            ("http://a.example/new?k=9", "a.example"),
            ("http://www.a.example/new", "a.example"),
            ("http://b.example/other?k=1", "b.example"),
        ],
        "url string, host string",
    )
    out = {r.url: r.url_rewritten for r in apply_dust_rules(frontier, rules).collect()}
    assert out["http://a.example/new?k=9"] == "http://a.example/new"
    assert out["http://www.a.example/new"] == "http://www.a.example/new"
    assert out["http://b.example/other?k=1"] == "http://b.example/other?k=1"


def test_dust_apply_rule_composition(spark):
    from ospo_ghcrawler_spark.functions.urls import apply_dust_rules

    rules = spark.createDataFrame(
        [
            ("a.example", "strip_query", 5),
            ("a.example", "strip_slash", 5),
            ("a.example", "strip_www", 5),
        ],
        "host string, rule string, support long",
    )
    frontier = spark.createDataFrame(
        [("http://www.a.example/p/?sid=1", "a.example")], "url string, host string"
    )
    out = apply_dust_rules(frontier, rules).collect()[0]
    # precedence: query, then slash, then www — full collapse
    assert out.url_rewritten == "http://a.example/p"
