"""Text-analysis functions + document dedup operators (unit level — the
DuckDB parity layer covers them end-to-end at sf0.01)."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.functions import text as TXT
from ospo_ghcrawler_spark.operators import dedup_docs as DD


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (3, "der schnelle braune fuchs und die katze ist hier und das war gut"),
        (4, "completely different text about spark engines and queues entirely"),
        (5, "ab"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_duplicates(docs):
    out = {r["keep_id"]: r["n_dups"] for r in DD.exact_duplicates(docs).collect()}
    assert out[0] == 2  # docs 0,1 collapse
    assert 1 not in out
    assert out[2] == 1


def test_shingles_short_doc(docs):
    g = DD.shingles(docs).filter(F.col("doc_id") == 5)
    assert g.count() == 0


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"] for r in
             DD.ngram_jaccard_pairs(docs, 0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert (0, 4) not in pairs


def test_minhash_matches_exact_on_high_threshold(docs):
    exact = {(r["a_id"], r["b_id"]) for r in DD.ngram_jaccard_pairs(docs, 0.5).collect()}
    lsh = {(r["a_id"], r["b_id"]) for r in DD.minhash_lsh_pairs(docs, 0.5).collect()}
    assert lsh == exact


def test_simhash_near_dups(docs):
    pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in
             DD.simhash_pairs(docs, max_hamming=64).collect()}
    assert pairs.get((0, 1)) == 0, "identical docs share the simhash"
    sigs = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs).collect()}
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
    # one-word change stays closer than a completely different doc
    assert ham(0, 2) < ham(0, 4)


def test_lang_id_markers(spark):
    rows = [
        (0, "the cat and the dog is here"),
        (1, "der hund und die katze ist das"),
        (2, "xyzzy qwerty 123"),
    ]
    df = spark.createDataFrame(rows, ["i", "text"])
    got = {r["i"]: r["p"] for r in df.select("i", TXT.lang_id(F.col("text")).alias("p")).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "und"


def test_token_and_quality(spark):
    df = spark.createDataFrame([(0, "The cat, the hat!! 42")], ["i", "text"])
    row = df.select(
        TXT.token_count(F.col("text")).alias("n"),
        TXT.distinct_token_count(F.col("text")).alias("d"),
        TXT.punct_count(F.col("text")).alias("p"),
        TXT.quality_score(F.col("text")).alias("q"),
    ).collect()[0]
    assert row["n"] == 5  # The cat the hat 42
    assert row["d"] == 4  # the counted once
    assert row["p"] == 3  # , ! !
    assert 0.0 <= row["q"] <= 1.0


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(0, "a  b\tc"), (1, "A b C"), (2, "a b d")], ["i", "text"]
    )
    fps = [r["f"] for r in df.select(TXT.fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
