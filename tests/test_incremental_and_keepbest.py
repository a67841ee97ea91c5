"""Incremental batch-vs-corpus near-dup + keep-best cluster representatives
(unit level — the DuckDB parity layer covers both end-to-end at sf0.01)."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.operators import dedup_docs as DD


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "an entirely different document about spark engines and queues"),
            (2, "der schnelle braune fuchs und die katze ist hier und das war gut"),
        ],
        ["doc_id", "text"],
    ).cache()
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 0
            (11, "the quick brown fox jumps over the lazy cat today"),  # near 0
            (12, "fresh unseen content with no counterpart in the corpus at all"),
        ],
        ["doc_id", "text"],
    ).cache()
    return corpus, batch


def test_incremental_pairs_cross_sided_only(corpus_and_batch):
    corpus, batch = corpus_and_batch
    out = DD.incremental_neardup_pairs(corpus, batch, 0.5).collect()
    pairs = {(r["corpus_id"], r["batch_id"]): r["jaccard"] for r in out}
    assert pairs[(0, 10)] == 1.0
    assert (0, 11) in pairs and pairs[(0, 11)] < 1.0
    # fresh batch doc is admitted (no row), and no corpus×corpus or
    # batch×batch pair can appear by construction
    assert all(c in (0, 1, 2) and b in (10, 11, 12) for c, b in pairs)
    assert not any(b == 12 for _, b in pairs)


def test_incremental_matches_exact_cross_set(corpus_and_batch):
    """Banded candidates + exact verify = the exact cross-set pair set at
    this threshold (recall pinned on the unioned fixture)."""
    corpus, batch = corpus_and_batch
    union = corpus.unionByName(batch)
    exact = {
        (r["a_id"], r["b_id"])
        for r in DD.ngram_jaccard_pairs(union, 0.5).collect()
        if (r["a_id"] < 10) != (r["b_id"] < 10)
    }
    got = {
        (r["corpus_id"], r["batch_id"])
        for r in DD.incremental_neardup_pairs(corpus, batch, 0.5).collect()
    }
    assert got == exact


def test_keep_best_argmax_and_singletons(spark):
    docs = spark.createDataFrame(
        [
            (0, "aa bb cc dd ee ff gg hh", 10),
            (1, "aa bb cc dd ee ff gg hh", 99),  # same cluster, higher quality
            (2, "aa bb cc dd ee ff gg hh", 99),  # tie → min doc_id wins (1)
            (3, "zz yy xx ww vv uu tt ss", 5),  # singleton
        ],
        ["doc_id", "text", "quality"],
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], ["a_id", "b_id"]
    ).withColumn("jaccard", F.lit(1.0))
    out = {r["doc_id"]: (r["cluster_rep"], r["keep"]) for r in
           DD.neardup_keep_best(docs, pairs, "quality").collect()}
    assert out[0] == (0, False)
    assert out[1] == (0, True), "highest quality, smallest id on tie"
    assert out[2] == (0, False)
    assert out[3] == (3, True), "singleton keeps itself"
    assert sum(1 for _, k in out.values() if k) == 2
