"""RFC 9309 full matching: wildcards, $ anchor, longest-match, Allow ties."""

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.functions.robots import robots_decide


def test_rfc9309_decision_matrix(spark):
    rules = spark.createDataFrame(
        [
            ("h", False, "/private/"),
            ("h", True, "/private/public"),      # longer allow inside disallow
            ("h", False, "/files/*.pdf$"),        # wildcard + anchor
            ("h", True, "/files/ok.pdf$"),        # longer allow for one file
            ("h", False, "/a"),
            ("h", True, "/a"),                    # same length -> allow wins tie
            ("h", False, "/dot/x.y"),             # '.' must be literal
        ],
        "host string, is_allow boolean, pattern string",
    )
    urls = spark.createDataFrame(
        [
            (0, "h", "/private/secret"),
            (1, "h", "/private/public/x"),
            (2, "h", "/files/doc.pdf"),
            (3, "h", "/files/doc.pdf.html"),      # $ anchor: NOT matched -> allowed
            (4, "h", "/files/ok.pdf"),
            (5, "h", "/a/path"),
            (6, "h", "/dot/xzy"),                 # '.' literal: rule must NOT match
            (7, "h", "/elsewhere"),
            (8, "other", "/private/secret"),      # no rules for host -> allowed
        ],
        "i long, host string, path string",
    )
    out = {r["i"]: r["allowed"] for r in robots_decide(urls, rules).collect()}
    assert out[0] is False
    assert out[1] is True
    assert out[2] is False
    assert out[3] is True
    assert out[4] is True
    assert out[5] is True      # tie at equal length -> allow
    assert out[6] is True      # escaped '.' stays literal
    assert out[7] is True
    assert out[8] is True
