"""Corpus-curation operators: repeated-ngram detect/remove, eval-set
decontamination, PII scrubbing, tf-idf composition — behavior pinned on
planted fixtures (the sf corpus parity is covered by test_oracle_parity)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.operators import curation as CU


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_repeated_ngrams_detects_cross_doc_only(spark):
    # "a b c d e" appears in docs 0 and 1; doc 2 repeats its own gram twice
    # (within-doc repetition alone must NOT flag: min_docs counts documents)
    docs = _docs(spark, [
        "a b c d e x y",
        "z a b c d e",
        "q w e r t q w e r t",
    ])
    out = {r["gram"]: (r["n_docs"], r["n_occ"])
           for r in CU.repeated_ngrams(docs, n=5, min_docs=2).collect()}
    assert out == {"a b c d e": (2, 2)}


def test_repeated_ngram_scrub_removes_covered_tokens(spark):
    docs = _docs(spark, [
        "a b c d e x y",   # tokens 1-5 covered -> keep "x y"
        "z a b c d e",     # tokens 2-6 covered -> keep "z"
        "u v w",           # untouched
    ])
    out = {r["doc_id"]: r for r in
           CU.repeated_ngram_scrub(docs, n=5, min_docs=2).collect()}
    exp = {0: "x y", 1: "z", 2: "u v w"}
    for i, clean in exp.items():
        assert out[i]["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
    assert (out[0]["n_tokens_kept"], out[0]["n_tokens_removed"]) == (2, 5)
    assert (out[1]["n_tokens_kept"], out[1]["n_tokens_removed"]) == (1, 5)
    assert (out[2]["n_tokens_kept"], out[2]["n_tokens_removed"]) == (3, 0)


def test_repeated_ngram_scrub_handles_short_and_empty_docs(spark):
    docs = _docs(spark, ["a b", ""])
    out = {r["doc_id"]: r for r in
           CU.repeated_ngram_scrub(docs, n=5, min_docs=2).collect()}
    assert out[0]["n_tokens_kept"] == 2 and out[0]["n_tokens_removed"] == 0
    assert out[1]["n_tokens_kept"] == 0 and out[1]["n_tokens_removed"] == 0


def test_decontaminate_flags_eval_overlap(spark):
    # doc 0 is eval (0 % 17 == 0); doc 1 shares an 8-gram with it, doc 2
    # doesn't; eval docs themselves are never flagged
    shared = "one two three four five six seven eight"
    docs = _docs(spark, [
        shared + " tail",
        "head " + shared,
        "nothing in common with the eval set at all",
    ])
    out = {r["doc_id"]: r["n_contaminated_grams"]
           for r in CU.decontaminate(docs, n=8, eval_mod=17).collect()}
    assert out == {1: 1}


def test_pii_scrub_redacts_and_counts(spark):
    docs = _docs(spark, [
        "mail bob@example.com or alice.smith@corp.co.uk now",
        "server at 192.168.1.1 port open",
        "call +1 555-867-5309 or 555 123 4567 today",
        "no pii here",
    ])
    out = {r["doc_id"]: r for r in CU.pii_scrub(docs).collect()}
    assert out[0]["n_redactions"] == 2
    assert out[1]["n_redactions"] == 1
    assert out[2]["n_redactions"] == 2
    assert out[3]["n_redactions"] == 0
    assert out[1]["scrubbed_md5"] == hashlib.md5(
        b"server at <IP> port open").hexdigest()
    assert out[3]["scrubbed_md5"] == hashlib.md5(b"no pii here").hexdigest()


def test_tfidf_top_terms_ranks_source_specific_terms_first(spark):
    # 'apple' only in src0, 'banana' only in src1; 'common' everywhere.
    # source-specific terms must outrank the shared one (idf = n_src/df).
    docs = spark.createDataFrame(
        [
            (0, "apple apple common", "en", "src0", 18),
            (1, "banana banana common", "en", "src1", 20),
            (2, "common common cherry", "en", "src2", 20),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = CU.tfidf_top_terms(docs, top_k=1).collect()
    top = {r["source"]: r["term"] for r in out}
    assert top == {"src0": "apple", "src1": "banana", "src2": "cherry"}


def test_scrub_plan_scans_text_once_and_is_jvm_only(spark):
    """pii_scrub is a zero-shuffle pure projection (no Exchange, no
    Python/Arrow eval in the plan)."""
    docs = _docs(spark, ["x"]).select("doc_id", "text")
    plan = CU.pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_shard_pack_boundary_semantics(spark):
    # 4 docs of 3 tokens each, budget 5: prefix sums before each doc are
    # 0,3,6,9 → shards 0,0,1,1 (a doc straddling a boundary stays in the
    # shard its first token falls in)
    docs = _docs(spark, ["a b c", "d e f", "g h i", "j k l"])
    out = {r["doc_id"]: r["shard_id"]
           for r in CU.shard_pack(docs, 5).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1}


def test_shard_pack_invariant_to_bucket_count_and_sparse_ids(spark):
    # sparse, non-dense doc_ids; the assignment must be a pure function of
    # (order, tokens, budget) — identical for every bucketing width,
    # including more buckets than rows and a single bucket (the naive
    # global-window plan it replaces)
    rows = [(i * 97 + 13, "w " * (i % 7 + 1), "en", "s", 1) for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    expected = None
    for nb in (1, 3, 64):
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["shard_id"])
            for r in CU.shard_pack(docs, 10, n_buckets=nb).collect()
        )
        if expected is None:
            expected = got
        assert got == expected, f"n_buckets={nb} changed the packing"
    # cross-check against a driver-side sequential pack
    seq = sorted((r[0], len(r[1].split())) for r in rows)
    acc, want = 0, {}
    for did, nt in seq:
        want[did] = acc // 10
        acc += nt
    assert {d: s for d, _, s in expected} == want


def test_shard_pack_empty_corpus(spark):
    docs = _docs(spark, []).filter(F.lit(False))
    assert CU.shard_pack(docs, 10).count() == 0


def test_corpus_mix_shares_sum_to_one(spark):
    docs = _docs(spark, ["a b c", "d e", "f", "g h i j"])
    out = CU.corpus_mix(docs).collect()
    assert abs(sum(r["doc_share"] for r in out) - 1.0) < 1e-12
    assert sum(r["n_docs"] for r in out) == 4
    assert sum(r["total_tokens"] for r in out) == 10


def test_temperature_mix_flattens_toward_rare_strata(spark):
    # 9 'en' docs vs 1 'fr' doc: α=0.5 must up-weight fr (w>1), down-weight
    # en (w<1), and both share columns must each sum to 1
    rows = [(i, "t", "en" if i < 9 else "fr", "s", 1) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["lang"]: r for r in CU.temperature_mix(docs).collect()}
    assert out["fr"]["samp_weight9"] > 1.0 > out["en"]["samp_weight9"]
    assert abs(out["en"]["raw_share9"] + out["fr"]["raw_share9"] - 1.0) < 1e-8
    assert abs(out["en"]["temp_share9"] + out["fr"]["temp_share9"] - 1.0) < 1e-8
    # closed form: q_fr = 1/(3+1) = 0.25, p_fr = 0.1, w_fr = 2.5
    assert abs(out["fr"]["samp_weight9"] - 2.5) < 1e-8
    # post-weighting mass is conserved: Σ p_s · w_s = Σ q_s = 1
    mass = sum(r["raw_share9"] * r["samp_weight9"] for r in out.values())
    assert abs(mass - 1.0) < 1e-6


def test_paragraph_dedup_keeps_first_occurrence_only(spark):
    # width=2 chunks: doc0 = [a b][c d], doc1 = [a b][e f], doc2 = [c d]
    docs = _docs(spark, ["a b c d", "a b e f", "c d"])
    out = {r["doc_id"]: r for r in CU.paragraph_dedup(docs, width=2).collect()}
    exp = {0: "a b c d", 1: "e f", 2: ""}
    for i, clean in exp.items():
        assert out[i]["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
    assert (out[0]["n_chunks_kept"], out[0]["n_chunks_removed"]) == (2, 0)
    assert (out[1]["n_chunks_kept"], out[1]["n_chunks_removed"]) == (1, 1)
    assert (out[2]["n_chunks_kept"], out[2]["n_chunks_removed"]) == (0, 1)


def test_paragraph_dedup_tail_chunk_and_empty_doc(spark):
    # doc0's tail chunk [c] is shorter than width; doc1 is empty; doc2's
    # single chunk [a b] duplicates doc0's first -> doc2 empties out
    docs = _docs(spark, ["a b c", "", "a b"])
    out = {r["doc_id"]: r for r in CU.paragraph_dedup(docs, width=2).collect()}
    assert out[0]["clean_md5"] == hashlib.md5(b"a b c").hexdigest()
    assert (out[1]["n_chunks_kept"], out[1]["n_chunks_removed"]) == (0, 0)
    assert out[1]["clean_md5"] == hashlib.md5(b"").hexdigest()
    # "a b" as a standalone chunk differs from doc0's "a b" chunk only in
    # text identity -- they ARE the same chunk text, so doc2 loses it
    assert (out[2]["n_chunks_kept"], out[2]["n_chunks_removed"]) == (0, 1)
    assert out[2]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_paragraph_dedup_partition_invariant(spark):
    texts = [f"w{i % 7} w{(i * 3) % 7} w{(i * 5) % 11} pad{i % 4}" for i in range(40)]
    docs = _docs(spark, texts)
    a = sorted(map(tuple, CU.paragraph_dedup(docs, width=3).collect()))
    b = sorted(map(tuple, CU.paragraph_dedup(docs.repartition(13), width=3).collect()))
    assert a == b


def test_decontaminate_bloom_row_identical(spark):
    """The bloom-prefiltered scale path must return exactly the broadcast-
    join operator's rows (no false negatives by construction; bloom FPs
    removed by the verify join) — including under a DELIBERATELY tiny,
    collision-heavy bitmap."""
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [
        " ".join(words[(i + j) % len(words)] for j in range(6)) + f" uniq{i}"
        for i in range(40)
    ]
    docs = _docs(spark, rows)
    exact = {
        (r["doc_id"], r["n_contaminated_grams"])
        for r in CU.decontaminate(docs, n=3, eval_mod=5).collect()
    }
    assert exact, "fixture must actually contain contamination"
    for bits in (1 << 8, 1 << 16):  # high-FP and ordinary regimes
        got = {
            (r["doc_id"], r["n_contaminated_grams"])
            for r in CU.decontaminate_bloom(
                docs, n=3, eval_mod=5, shards=2, bits_per_shard=bits,
                n_hashes=3,
            ).collect()
        }
        assert got == exact, f"bits={bits}"


def test_filter_funnel_hand_counts(spark):
    # 5 docs: one wrong lang, one too short, one duplicate pair
    good = "the cat and the dog of the house went to the park and it is fine " * 2
    rows = [
        (0, good, "en"),
        (1, good, "en"),                      # exact dup of 0
        (2, good + "variant", "en"),
        (3, good, "de"),                      # dropped at language
        (4, "the and of to is", "en"),        # 5 tokens: dropped at length
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.stage: (r.n_in, r.n_kept) for r in
           CU.filter_funnel(docs, "en", min_tokens=10, min_quality=0.4).collect()}
    assert got["language"] == (5, 4)
    assert got["length"] == (4, 3)
    assert got["quality"][0] == 3
    n3 = got["quality"][1]
    assert got["exact_dedup"] == (n3, n3 - 1)  # the dup pair collapses by 1
    # funnel chains: every stage's n_in is the previous stage's n_kept
    order = ["language", "length", "quality", "exact_dedup"]
    for prev, cur in zip(order, order[1:]):
        assert got[cur][0] == got[prev][1]


def test_host_boilerplate_planted(spark):
    # src A: "nav bar home" opens 3 of 4 docs (boilerplate); src B: no repeats
    bp = "nav bar home "
    rows = [
        (0, bp + "alpha beta gamma delta epsilon zeta", "A"),
        (1, bp + "one two three four five six", "A"),
        (2, bp + "red green blue cyan magenta yellow", "A"),
        (3, "unique words only here nothing shared", "A"),
        (4, "b completely distinct text first", "B"),
        (5, "b another unrelated text second", "B"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in CU.host_boilerplate(docs, width=3, min_docs=2).collect()}
    # docs 0-2 each have 3 chunks; exactly the shared "nav bar home" chunk is boilerplate
    for d in (0, 1, 2):
        assert got[d].n_chunks == 3 and got[d].n_boiler_chunks == 1
        assert not got[d].is_mostly_boiler
    assert got[3].n_boiler_chunks == 0
    assert got[4].n_boiler_chunks == 0 and got[5].n_boiler_chunks == 0
    # a doc that is half boilerplate trips the drop flag
    docs2 = spark.createDataFrame(
        [(0, bp + "alpha beta gamma", "A"), (1, bp + "one two three", "A")],
        "doc_id long, text string, source string",
    )
    got2 = {r.doc_id: r for r in CU.host_boilerplate(docs2, width=3, min_docs=2).collect()}
    assert got2[0].is_mostly_boiler and got2[1].is_mostly_boiler


def test_badwords_filter_token_granular(spark):
    docs = spark.createDataFrame(
        [(0, "a slow day"), (1, "slowly is not blocked"), (2, "junk slow junk"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.badwords_filter(docs).collect()}
    assert out[0]["n_bad_tokens"] == 1 and not out[0]["keep"]
    # substring must NOT match: 'slowly' is a different token
    assert out[1]["n_bad_tokens"] == 0 and out[1]["keep"]
    assert out[2]["n_bad_tokens"] == 3 and not out[2]["keep"]
    assert out[3]["n_bad_tokens"] == 0 and out[3]["keep"]


def test_doc_repetition_hand_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),        # top 2-gram "a b" x3 of 5 grams, 6 toks
            (1, "x y z w q r"),        # no repetition
            (2, "p p p p"),            # "p p" x3; dup 3-gram "p p p" x(2-1)
            (3, "a"),                  # shorter than both gram sizes
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.doc_repetition(docs).collect()}
    assert abs(out[0]["top_gram_frac9"] - 3 * 2 / 6) < 1e-9
    # "a b a" x2 and "b a b" x2 -> sum(c-1) = 2 duplicate occurrences
    assert abs(out[0]["dup_gram_frac9"] - 2 * 3 / 6) < 1e-9
    assert abs(out[1]["top_gram_frac9"] - 1 * 2 / 6) < 1e-9
    assert out[1]["dup_gram_frac9"] == 0.0
    assert abs(out[2]["top_gram_frac9"] - 3 * 2 / 4) < 1e-9
    assert abs(out[2]["dup_gram_frac9"] - 1 * 3 / 4) < 1e-9
    assert out[3]["top_gram_frac9"] == 0.0 and out[3]["dup_gram_frac9"] == 0.0


def test_nfc_normalize_planted_unicode(spark):
    import unicodedata

    decomposed = "café olé"          # e + combining acute
    composed = unicodedata.normalize("NFC", decomposed)
    docs = spark.createDataFrame(
        [(0, decomposed), (1, composed), (2, "plain ascii"), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.nfc_normalize(docs).collect()}
    assert out[0]["changed"] and out[0]["n_chars_after"] < out[0]["n_chars_before"]
    assert not out[1]["changed"]
    assert out[0]["norm_md5"] == out[1]["norm_md5"]  # normalize => identical
    assert not out[2]["changed"]
    assert out[3]["changed"] is None and out[3]["norm_md5"] is None


def test_corpus_stats_hand_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a b c", "en", "web"), (1, "d e", "en", "web"), (2, "f", "fr", "books")],
        "doc_id long, text string, lang string, source string",
    )
    r = CU.corpus_stats(docs).collect()[0]
    assert (r["n_docs"], r["n_tokens"], r["n_chars"]) == (3, 6, 9)
    assert (r["n_langs"], r["n_sources"]) == (2, 2)


def test_sentence_dedup_keep_first(spark):
    docs = spark.createDataFrame(
        [
            (0, "The cat sat. It was warm! The cat sat."),   # self-dup sentence
            (1, "The cat sat. Something else entirely?"),     # cross-doc dup
            (2, ""),                                          # empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.sentence_dedup(docs).collect()}
    # doc 0: 3 sentences, third is a repeat of the first
    assert out[0]["n_sents_kept"] == 2 and out[0]["n_sents_removed"] == 1
    # doc 1: first sentence already claimed by doc 0 (min doc_id wins)
    assert out[1]["n_sents_kept"] == 1 and out[1]["n_sents_removed"] == 1
    assert out[2]["n_sents_kept"] == 0 and out[2]["n_sents_removed"] == 0
    assert out[2]["clean_md5"] == "d41d8cd98f00b204e9800998ecf8427e"
