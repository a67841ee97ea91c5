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


def test_simhash_banding_exhaustive_at_radius(spark):
    """Pigeonhole guarantee: with n_chunks = max_hamming + 1 the banding must
    surface a pair at EXACTLY the requested radius. Constructs signature pairs
    at hamming 7 (one bit flipped in 7 different chunks — the banding's worst
    case) and checks simhash_candidates finds them with 8 chunks but the old
    4-chunk scheme provably cannot."""
    base = 0x0123_4567_89AB_CDEF
    # flip the low bit of 7 of the 8 8-bit chunks → hamming 7, and only one
    # chunk (the highest) left untouched: the single pigeonhole survivor
    flipped = base
    for c in range(7):
        flipped ^= 1 << (8 * c)
    sig = spark.createDataFrame(
        [(0, base), (1, flipped)], ["doc_id", "simhash"]
    )
    found8 = {(r["a_id"], r["b_id"]) for r in DD.simhash_candidates(sig, 8).collect()}
    assert (0, 1) in found8, "8-chunk banding must find a hamming-7 pair"
    found4 = {(r["a_id"], r["b_id"]) for r in DD.simhash_candidates(sig, 4).collect()}
    assert (0, 1) not in found4, "fixture sanity: 4 chunks all dirty"


def test_simhash_pairs_default_radius_is_exhaustive(docs):
    """Default radius 3 → 4 chunks; every reported pair is within radius and
    the exhaustive radius-64 sweep finds no radius-3 pair the banding missed."""
    got = {(r["a_id"], r["b_id"]): r["hamming"] for r in DD.simhash_pairs(docs).collect()}
    assert all(h <= 3 for h in got.values())
    wide = {(r["a_id"], r["b_id"]): r["hamming"] for r in
            DD.simhash_pairs(docs, max_hamming=63).collect()}
    assert {p for p, h in wide.items() if h <= 3} == set(got)


def test_jaccard_verify_candidates_restricted(docs):
    """The LSH verify stage computes Jaccard ONLY for candidate pairs."""
    cand = docs.sparkSession.createDataFrame([(0, 1), (0, 4)], ["a_id", "b_id"])
    out = {(r["a_id"], r["b_id"]): r["jaccard"] for r in
           DD.jaccard_verify_candidates(docs, cand, 0.0).collect()}
    assert out[(0, 1)] == 1.0
    assert (0, 2) not in out, "non-candidate pair must not be scored"


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


def test_winnow_fast_machinery_equivalent(spark):
    """The xxhash64 winnowing variant shares gram boundaries + window
    mechanics with the md5 (oracle) variant: running the parameterized
    machinery WITH md5 must reproduce winnow_fingerprints exactly, and the
    fast variant must emit one fingerprint set per doc with plausible size
    (≤ #windows, ≥ 1 for any doc with ≥ k+w-1 chars)."""
    rows = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, "abcdefghijk"), (2, "short")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    md5_default = df.select(
        "doc_id", TXT.winnow_fingerprints(F.col("text")).alias("fp")
    )
    md5_via_param = df.select(
        "doc_id",
        TXT.winnow_fingerprints(
            F.col("text"), gram_hash=lambda g: F.md5(F.encode(g, "UTF-8"))
        ).alias("fp"),
    )
    assert sorted(md5_default.collect()) == sorted(md5_via_param.collect())
    fast = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", TXT.winnow_fingerprints_fast(F.col("text")).alias("fp")
    ).collect()}
    slow = {r["doc_id"]: r["fp"] for r in md5_default.collect()}
    # same selection mechanics ⇒ same per-doc fingerprint-count bounds and
    # the same empty/non-empty classification (doc 2 is under one gram)
    for i in (0, 1, 2):
        assert (len(fast[i]) == 0) == (len(slow[i]) == 0)
    assert len(fast[1]) >= 1 and len(fast[1]) <= len("abcdefghijk") - 8 + 1 - 3


def test_neardup_clusters_transitive(spark):
    """Label propagation must close transitively: a~b and b~c puts a,b,c in
    one cluster even when a~c alone misses the threshold; singletons keep
    themselves as representative."""
    rows = [
        (10, "a b c d e f g h i j k l"),
        (11, "a b c d e f g h i j k x"),   # near 10
        (12, "a b c d e f g h i j y x"),   # near 11, farther from 10
        (13, "totally unrelated text goes right here now ok fine yes"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12)], ["a_id", "b_id"]
    )
    out = {r["doc_id"]: r["cluster_rep"] for r in
           DD.neardup_clusters(docs, pairs).collect()}
    assert out == {10: 10, 11: 10, 12: 10, 13: 13}


def test_neardup_clusters_chain_converges(spark):
    """A long chain exercises multiple propagation rounds (diameter > 1)."""
    n = 12
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(n)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["a_id", "b_id"])
    out = {r["doc_id"]: r["cluster_rep"] for r in
           DD.neardup_clusters(docs, pairs).collect()}
    assert out == {i: 0 for i in range(n)}


def test_winnow_tokens_shared_run_detection(spark):
    """Word-shingle winnowing (the harvest-path fingerprinter): documents
    sharing a k+w-1-word run share a fingerprint; disjoint-vocabulary
    documents share none; whitespace/case variants fingerprint identically."""
    from pyspark.sql import functions as F

    from ospo_ghcrawler_spark.functions import text as TXT

    run = "alpha beta gamma delta epsilon zeta eta"  # 7 words = k+w-1 at (4,4)
    rows = [
        (1, f"intro one two three {run} closing words here"),
        (2, f"completely different opening {run} and another tail"),
        (3, "nothing in common with the others at all whatsoever"),
        (4, f"  INTRO one   two three {run} CLOSING words HERE "),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fp = {
        r["doc_id"]: set(r["f"])
        for r in df.select(
            "doc_id", TXT.winnow_fingerprints_tokens(F.col("text")).alias("f")
        ).collect()
    }
    assert fp[1] & fp[2], "shared 7-word run must share a fingerprint"
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])
    assert fp[1] == fp[4], "normalization: case/whitespace-invariant"
    # short text (< k words) fingerprints to empty, not null/error
    short = spark.createDataFrame([(9, "just three words")], "doc_id int, text string")
    out = short.select(TXT.winnow_fingerprints_tokens(F.col("text")).alias("f")).collect()[0]["f"]
    assert out == []


def test_oph_entries_properties(spark):
    long_a = " ".join(f"w{i}" for i in range(200))
    rows = [(0, long_a), (1, long_a), (2, long_a + " tail extra words here"),
            (3, "too short"), (4, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.e for r in df.select(
        "doc_id", TXT.minhash_oph_entries(F.col("text")).alias("e")).collect()}
    # one entry per occupied bin, bins strictly increasing, pmod consistent
    for e in (got[0], got[2]):
        bins = [x.bin for x in e]
        assert bins == sorted(set(bins))
        assert all(x.h % 64 == x.bin for x in e)  # pmod(h, 64) == bin
    assert got[0] == got[1]                       # deterministic
    # near-identical docs share most per-bin minima
    common = len(set((x.bin, x.h) for x in got[0]) & set((x.bin, x.h) for x in got[2]))
    assert common / len(got[0]) > 0.8
    assert got[3] == [] and got[4] == []          # < k words -> no shingles


def test_oph_lsh_pairs_recall_vs_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {(r.a_id, r.b_id) for r in DD.ngram_jaccard_pairs(docs, 0.8).collect()}
    oph = {(r.a_id, r.b_id) for r in DD.oph_lsh_pairs(docs, 0.8).collect()}
    assert oph <= exact, "exact verify stage must make precision 1.0"
    assert len(oph & exact) / max(len(exact), 1) >= 0.95


def test_oph_entries_col_equivalent_to_text_path(spark):
    """A table carrying stored signatures (the cfg.minhash_at_fetch shape)
    must yield the identical pair set without the text-derived signature
    pass."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    with_sig = docs.withColumn("minhash_oph", TXT.minhash_oph_entries(F.col("text")))
    from_text = {(r.a_id, r.b_id) for r in DD.oph_lsh_pairs(docs, 0.8).collect()}
    from_col = {(r.a_id, r.b_id) for r in
                DD.oph_lsh_pairs(with_sig, 0.8, entries_col="minhash_oph").collect()}
    assert from_text == from_col


def test_ngram_containment_catches_short_in_long(spark):
    from ospo_ghcrawler_spark.operators.dedup_docs import ngram_containment_pairs

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        (0, short),                      # the embedded original
        (1, filler + " " + short),       # wrapper: original + 120 extra words
        (2, "totally unrelated text with nothing shared at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.a_id, r.b_id): r for r in ngram_containment_pairs(docs, 0.9).collect()}
    assert (0, 1) in got and len(got) == 1
    pair = got[(0, 1)]
    # every shingle of the short doc appears in the wrapper...
    assert pair.containment_a_in_b == 1.0
    # ...while Jaccard sits far below any dedup threshold
    assert pair.jaccard < 0.1
