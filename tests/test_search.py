"""Retrieval + LM-scoring operators (operators/search.py).

Hand-checkable corpora so every assertion is arithmetic, not a re-run of
the implementation: postings mass conservation, BM25 ranking on a planted
relevant doc, and an exact closed-form unigram log-probability.
"""

from __future__ import annotations

import math

import pytest

from ospo_ghcrawler_spark.operators import search as SR


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
        (4, "apple"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_inverted_index_mass_and_df(docs):
    rows = {(r.term, r.doc_id): (r.tf, r.df) for r in SR.inverted_index(docs).collect()}
    # tf mass: every token accounted for exactly once
    assert sum(tf for tf, _ in rows.values()) == 3 + 2 + 4 + 1
    assert rows[("apple", 1)] == (2, 2)  # tf=2 in doc 1; df=2 (docs 1,4)
    assert rows[("cherry", 3)] == (3, 2)
    # min_df prunes hapax terms
    pruned = SR.inverted_index(docs, min_df=2).collect()
    assert all(r.term != "durian" for r in pruned)
    assert {r.term for r in pruned} == {"apple", "banana", "cherry"}


def test_bm25_ranks_planted_doc_first(spark):
    filler = [(i, "lorem ipsum dolor sit amet") for i in range(10)]
    planted = [(100, "needle needle haystack"), (101, "haystack only here")]
    docs = spark.createDataFrame(filler + planted, "doc_id int, text string")
    got = SR.bm25_topk(docs, ["needle"], topk=3).collect()
    assert [r.doc_id for r in got] == [100]  # only one doc matches
    assert got[0].rk == 1 and got[0].score > 0
    # two-term query: doc with both terms outranks doc with one
    got2 = SR.bm25_topk(docs, ["needle", "haystack"], topk=3).collect()
    assert [r.doc_id for r in got2][:2] == [100, 101]
    assert [r.rk for r in got2] == list(range(1, len(got2) + 1))


def test_bm25_idf_downweights_common_terms(spark):
    # 'common' appears everywhere, 'rare' once; equal tf within the probe doc
    rows = [(i, "common filler") for i in range(9)] + [(9, "common rare")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    score_rare = SR.bm25_topk(docs, ["rare"], topk=1).collect()[0].score
    score_common = [
        r for r in SR.bm25_topk(docs, ["common"], topk=10).collect() if r.doc_id == 9
    ][0].score
    assert score_rare > score_common


def test_unigram_logprob_closed_form(spark):
    # corpus: 4 tokens total — a:2, b:1, c:1
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in SR.unigram_logprob(docs).collect()}
    # doc 1: (2·ln(2/4) + 1·ln(1/4)) / 3 ; doc 2: ln(1/4)
    want1 = (2 * math.log(0.5) + math.log(0.25)) / 3
    assert got[1].n_tokens == 3
    assert got[1].avg_logprob == pytest.approx(want1, abs=2e-6)
    assert got[2].avg_logprob == pytest.approx(math.log(0.25), abs=2e-6)
    # self-scored LM: repeating the corpus doubles counts but not probabilities
    doubled = docs.unionByName(
        spark.createDataFrame([(11, "a a b"), (12, "c")], "doc_id int, text string")
    )
    got2 = {r.doc_id: r for r in SR.unigram_logprob(doubled).collect()}
    assert got2[1].avg_logprob == got2[11].avg_logprob == pytest.approx(want1, abs=2e-6)


def test_ccnet_buckets_tercile_split(spark):
    from ospo_ghcrawler_spark.operators import search as SR

    # 9 docs, one lang: terciles must be 3/3/3 and ordered by score
    rows = [(i, ("common " * (i + 1)).strip() + " rare" + str(i), "en") for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = SR.ccnet_buckets(docs).collect()
    from collections import Counter

    c = Counter(r["bucket"] for r in out)
    assert c == {"head": 3, "middle": 3, "tail": 3}
    # every head doc scores >= every tail doc
    head_min = min(r["avg_logprob"] for r in out if r["bucket"] == "head")
    tail_max = max(r["avg_logprob"] for r in out if r["bucket"] == "tail")
    assert head_min >= tail_max
