"""Extraction invariant (BASELINE.json input_hint): extracted text is
byte-identical per url to the corpus golden ``text`` column, through the
vectorized pandas UDF path."""

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.functions.extract import (
    extract_links,
    extract_text,
    extract_text_udf,
)
from ospo_ghcrawler_spark.sources.corpus import golden_pages, render_page, synth_pages


def test_extract_text_basic():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>.a{}</style></head><!-- c --><body><h1>H</h1>"
        b"<p>hello   world &amp; more</p><a href='/x'>link text</a></body></html>"
    )
    assert extract_text(html) == "T\nH\nhello world & more\nlink text"


def test_extract_links_resolution_and_dedup():
    html = (
        b'<a href="http://other.example/abs">a</a>'
        b'<a href="/rooted">b</a>'
        b'<a href="rel">c</a>'
        b'<a href="//proto.example/pp">d</a>'
        b'<a href="/rooted">dup</a>'
        b'<a href="javascript:void(0)">skip</a>'
    )
    got = extract_links(html, "http://base.example/dir/page")
    assert got == [
        "http://other.example/abs",
        "http://base.example/rooted",
        "http://base.example/dir/rel",
        "http://proto.example/pp",
    ]


def test_corpus_golden_text_byte_identical_python():
    for pid in range(0, 200, 7):
        url, html, text, lang = render_page(pid, 500, 10, 6, False)
        assert extract_text(html) == text, f"pid={pid}"


def test_corpus_golden_text_byte_identical_spark(spark):
    pages = synth_pages(spark, n_pages=300, n_hosts=10, links_per_page=5)
    mismatches = (
        pages.withColumn("extracted", extract_text_udf("html"))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_golden_pages_extractable(spark):
    rows = golden_pages(spark).collect()
    assert len(rows) == 12
    for r in rows:
        assert extract_text(bytes(r["html"])) == r["text"]
