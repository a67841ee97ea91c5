"""Corpus-curation operators for LLM training-data pipelines.

Beyond the reference's crawl surface (the reference stops at fetch/extract —
see SURVEY.md §2), a 100-TB web corpus needs curation passes before
training. These are the standard ones, each expressed as pure
DataFrame plans with exact DuckDB oracles:

- :func:`repeated_ngrams` / :func:`repeated_ngram_scrub` — cross-document
  duplicate n-gram detection and removal (Lee et al. 2022, "Deduplicating
  Training Data Makes Language Models Better": repeated substrings are
  memorized disproportionately; remove every token span that participates
  in an n-gram occurring in >= min_docs distinct documents).
- :func:`decontaminate` — eval-set overlap flagging (GPT-3 appendix C
  style): any training document sharing an n-gram with a held-out
  benchmark document is flagged with its hit count.
- :func:`pii_scrub` — regex redaction of emails / IPv4s / phone numbers,
  entirely JVM-side (``regexp_replace``), with a redaction count.
- :func:`tfidf_top_terms` / :func:`corpus_mix` — corpus-composition
  analysis: per-source salient terms and the (lang, source) doc/token
  share report a data-mixing (domain re-weighting) stage consumes.
- :func:`shard_pack` — cumulative-token-budget shard assignment for data
  loaders, as a two-level prefix sum (never a global single-task window).

Scale posture (100 TB): gram extraction is a zero-shuffle projection
(higher-order array functions inside whole-stage codegen); the gram→count
aggregation is ONE shuffle with map-side combine; the scrub join back to
documents shuffles only the *duplicated* gram positions (dup-rate × corpus,
not corpus); reassembly is again JVM array expressions. ``decontaminate``
broadcasts the benchmark gram set (eval sets are small by construction) so
the training side never shuffles. ``pii_scrub`` is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.functions import text as TXT

# email/IP/phone patterns restricted to the syntax subset shared by Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"
PII_PATTERNS: list[tuple[str, str]] = [
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
]


def _token_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, start, gram): all word-token n-grams with their 1-based
    start position. Zero-shuffle: tokenization + windowing are array
    expressions in one codegen span; the explode multiplies rows but not
    stages."""
    w = TXT.tokens(F.col("text"))
    starts = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda i: F.struct(
            i.cast("int").alias("start"),
            F.array_join(F.slice(w, i, n), " ").alias("gram"),
        ),
    )
    return docs.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.start").alias("start"), F.col("g.gram").alias("gram")
    )


def repeated_ngrams(docs: DataFrame, n: int = 5, min_docs: int = 2) -> DataFrame:
    """Cross-document duplicated n-grams: every word n-gram that occurs in
    at least *min_docs* distinct documents, with its document frequency and
    total occurrence count.

    One shuffle (gram groupBy, map-side combine); the gram space is bounded
    by total corpus tokens, so partitions stay balanced under AQE without
    salting (no gram is hotter than the corpus' most-duplicated sentence).
    """
    g = _token_grams(docs, n)
    return (
        g.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def repeated_ngram_scrub(docs: DataFrame, n: int = 5, min_docs: int = 2) -> DataFrame:
    """Remove every token covered by a cross-document duplicated n-gram
    (Lee et al. 2022 removal semantics at word-token granularity): token
    position p of a document is dropped iff some duplicated n-gram starts
    at s with s <= p < s+n in that document.

    Returns (doc_id, clean_md5, n_tokens_kept, n_tokens_removed) — the md5
    is over the space-joined surviving tokens, so the result is
    hash-comparable without shipping full texts.

    Plan: grams (zero-shuffle projection) → dup-gram aggregate (shuffle 1)
    → join positions of duplicated grams only (shuffle 2, sized by the
    duplicate rate, not the corpus) → collect start lists per doc
    (shuffle 3, same key — AQE coalesces) → reassembly as pure array
    expressions. The full text column is scanned exactly once.
    """
    g = _token_grams(docs, n)
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram")
    )
    dup_starts = (
        g.join(dup, "gram")
        .groupBy("doc_id")
        .agg(F.collect_list("start").alias("starts"))
    )
    w = TXT.tokens(F.col("text"))
    ss = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    # Reassembly is O(L + n·S), not O(L × S) (VERDICT r4 #6: the per-
    # position `exists` probe of the whole start list went quadratic for a
    # doc that is mostly duplicated n-grams). Position p is dropped iff
    # some duplicated gram starts at s with s <= p < s+n — so expand each
    # start to its ≤n covered positions (a BOUNDED n·S elements; n is the
    # small gram order) and subtract with one JVM-native hash-set
    # difference. Deliberately NOT an interval-merge fold: an aggregate()
    # with an array accumulator copies the accumulator per element
    # (O(S²) hidden) and higher-order lambdas are interpreted (§3k of
    # SCALING_NOTES) — an A/B at sf0.1 measured the fold ~2× slower than
    # the exists probe, while transform+flatten+array_except runs at
    # PARITY with exists on typical docs (~9-11 s, within host noise,
    # vs 4.6 s for the same plan with no reassembly) and keeps the
    # worst case linear.
    L = F.size(w)
    # sequence(1, 0) DESCENDS in Spark — guard the empty-token case
    positions = F.when(
        L >= 1, F.sequence(F.lit(1), L)
    ).otherwise(F.array().cast("array<int>"))
    dropped = F.flatten(
        F.transform(
            # defensive: a start beyond L would make sequence() descend
            F.filter(ss, lambda s: s <= L),
            lambda s: F.sequence(s, F.least(s + F.lit(n - 1), L)),
        )
    )
    kept = F.array_except(positions, dropped)
    clean = F.array_join(F.transform(kept, lambda p: F.element_at(w, p)), " ")
    return (
        docs.join(dup_starts, "doc_id", "left")
        .select(
            "doc_id",
            F.md5(F.encode(clean, "UTF-8")).alias("clean_md5"),
            F.size(kept).cast("long").alias("n_tokens_kept"),
            (F.size(w) - F.size(kept)).cast("long").alias("n_tokens_removed"),
        )
    )


def paragraph_dedup(docs: DataFrame, width: int = 3) -> DataFrame:
    """CCNet-style cross-corpus paragraph dedup (Wenzek et al. 2020: hash
    every paragraph, keep ONE copy corpus-wide, drop later duplicates) at
    fixed word-window granularity — the corpus here is a flat word stream,
    so the "paragraph" unit is each non-overlapping *width*-word chunk.

    Keep rule (deterministic, partition-independent): an occurrence of a
    chunk survives iff it is the canonical first occurrence — minimal
    (doc_id, pos) among all occurrences of that exact chunk text. Unlike
    :func:`repeated_ngram_scrub` (removal semantics: ALL copies go), this
    is dedup semantics: exactly one copy of every distinct chunk remains in
    the corpus.

    Returns (doc_id, clean_md5, n_chunks_kept, n_chunks_removed) — md5 of
    the space-rejoined surviving chunks, hash-comparable without shipping
    texts.

    Plan: chunking is a zero-shuffle array projection; the keep decision is
    ONE window shuffle keyed on the chunk text; reassembly is one groupBy
    doc_id (AQE-coalesced). The text column is scanned once. At 100 TB the
    window key should be xxhash64(chunk) rather than the chunk string
    (shuffle bytes ∝ hash width, collisions vanishing at 64 bits); the
    string key is kept here for oracle bit-parity.
    """
    w = TXT.tokens(F.col("text"))
    starts = F.when(
        F.size(w) >= 1,
        F.sequence(F.lit(0), F.floor((F.size(w) - 1) / width).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.array_join(F.slice(w, i * width + 1, width), " ").alias("chunk"),
        ),
    )
    occ = docs.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", F.col("c.pos").alias("pos"), F.col("c.chunk").alias("chunk")
    )
    win = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = occ.withColumn("rk", F.row_number().over(win))
    per_doc = (
        ranked.groupBy("doc_id")
        .agg(
            F.md5(
                F.encode(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.when(
                                        F.col("rk") == 1,
                                        F.struct(F.col("pos"), F.col("chunk")),
                                    )
                                )
                            ),
                            lambda s: s["chunk"],
                        ),
                        " ",
                    ),
                    "UTF-8",
                )
            ).alias("clean_md5"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).cast("long").alias("n_chunks_kept"),
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0)).cast("long").alias(
                "n_chunks_removed"
            ),
        )
    )
    # chunkless (empty-text) docs still get a row: md5(''), 0, 0
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_md5", F.lit(empty_md5)).alias("clean_md5"),
        F.coalesce("n_chunks_kept", F.lit(0).cast("long")).alias("n_chunks_kept"),
        F.coalesce("n_chunks_removed", F.lit(0).cast("long")).alias("n_chunks_removed"),
    )


def paragraph_dedup_sql(width: int = 3) -> str:
    """Exact-replica DuckDB oracle for :func:`paragraph_dedup` (same
    tokenization, chunking, keep rule, and md5 reassembly)."""
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS words
      FROM documents
    ),
    occ AS (
      -- chunk-index bound derived from the data (lateral over the per-doc
      -- chunk count): no silent 4096-chunk cap vs the uncapped Spark operator
      SELECT doc_id, i AS pos,
             array_to_string(list_slice(words, i*{width}+1, i*{width}+{width}), ' ') AS chunk
      FROM toks,
           LATERAL (SELECT unnest(range(0, (len(words) + {width} - 1) // {width})) AS i) u
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rk
      FROM occ
    ),
    per_doc AS (
      SELECT doc_id,
             md5(COALESCE(
                   string_agg(CASE WHEN rk = 1 THEN chunk END, ' ' ORDER BY pos),
                   '')) AS clean_md5,
             CAST(count(*) FILTER (rk = 1) AS BIGINT) AS n_chunks_kept,
             CAST(count(*) FILTER (rk > 1) AS BIGINT) AS n_chunks_removed
      FROM ranked GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.clean_md5, md5('')) AS clean_md5,
           COALESCE(p.n_chunks_kept, 0) AS n_chunks_kept,
           COALESCE(p.n_chunks_removed, 0) AS n_chunks_removed
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """


def decontaminate(
    docs: DataFrame, n: int = 8, eval_mod: int = 17
) -> DataFrame:
    """Benchmark-decontamination flags: documents whose ``doc_id % eval_mod
    == 0`` form the held-out eval set; every *training* document sharing at
    least one word n-gram with any eval document is returned with the count
    of distinct contaminated grams.

    The eval gram set is broadcast (eval sets are orders of magnitude
    smaller than the corpus), so the training side is a map-side semi-join
    — no shuffle of the 100-TB side; only the per-doc hit aggregation
    shuffles, and only for flagged docs.
    """
    is_eval = (F.col("doc_id") % eval_mod) == 0
    g_eval = (
        _token_grams(docs.filter(is_eval), n).select("gram").distinct()
    )
    g_train = _token_grams(docs.filter(~is_eval), n)
    return (
        g_train.join(F.broadcast(g_eval), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_contaminated_grams"))
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Regex PII redaction: emails → <EMAIL>, IPv4s → <IP>, phone numbers →
    <PHONE>, applied in that order. Returns (doc_id, scrubbed_md5,
    n_redactions); n_redactions counts matches of each pattern on the
    ORIGINAL text (deterministic and engine-agnostic — sequential-replace
    counts would depend on intermediate states).

    Pure JVM projection: zero shuffle, codegen end-to-end, scales linearly
    with no coordination."""
    scrubbed = F.col("text")
    n_red = F.lit(0)
    for pat, repl in PII_PATTERNS:
        n_red = n_red + F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(
        "doc_id",
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrubbed_md5"),
        n_red.cast("long").alias("n_redactions"),
    )


def tfidf_top_terms(docs: DataFrame, top_k: int = 5) -> DataFrame:
    """Corpus-composition analysis: per-source top-k terms by a tf-idf-style
    score. idf uses the exact rational n_sources/df (not log) so the score
    is deterministic integer-derived arithmetic, bit-equal across engines.

    Two shuffles: (source, term) counts with map-side combine, then the
    per-source top-k window; the term-df side is an aggregate over the
    first shuffle's output (reuses its partitioning).
    """
    terms = docs.select(
        "source", F.explode(TXT.tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = terms.groupBy("source", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("source").alias("df"))
    n_src = docs.select("source").distinct().count()
    from pyspark.sql import Window

    scored = tf.join(df_, "term").select(
        "source",
        "term",
        (F.col("tf") * F.lit(float(n_src)) / F.col("df")).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("source", "term", "score", "rk")
    )


def shard_pack(
    docs: DataFrame,
    shard_budget_tokens: int,
    order_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Pack documents into fixed-token-budget training shards: walking the
    corpus in *order_col* order, document d lands in shard
    ``floor(prefix_tokens_before_d / budget)`` — the standard cumulative-sum
    packing used to cut a corpus into equal-token shards for data loaders
    (each shard ends at the doc that crosses its budget boundary).

    Returns (order_col, n_tokens, shard_id).

    Scale posture (100 TB): the naive plan is a GLOBAL window cumsum —
    ``Window.orderBy(order_col)`` with no partition key collapses the whole
    corpus into ONE task.  Instead this is a two-level prefix sum:

    1. bucket each row by a coarse range of the (numeric) order key —
       deterministic arithmetic, zero shuffle, no sampling;
    2. per-bucket token totals: one tiny aggregate whose result is
       O(n_buckets) rows, collected and turned into exclusive prefix
       offsets on the driver (a few KB at any corpus size);
    3. within-bucket exclusive cumsum via a window PARTITIONED by bucket
       (one shuffle, n_buckets-way parallel), plus the broadcast offset.

    So the only corpus-sized shuffle is the bucket-partitioned window, and
    parallelism is n_buckets (default: session shuffle partitions) instead
    of 1.  For non-numeric order keys, ``repartitionByRange`` + persist +
    ``spark_partition_id`` is the same construction (not needed here).
    """
    sp = docs.sparkSession
    if n_buckets is None:
        n_buckets = int(sp.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = docs.select(
        F.col(order_col), TXT.token_count(F.col("text")).alias("n_tokens")
    )
    lo, hi = toks.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:  # empty corpus
        return toks.withColumn("shard_id", F.lit(0).cast("int"))
    # Bucket assignment happens in DOUBLE space: full-range int64 keys
    # (e.g. xxhash64 url_hash) overflow `col - lo` under ANSI arithmetic
    # when lo ~ -2^63.  long->double cast is monotone, and shard ids depend
    # only on the global prefix sum (identical under any monotone
    # bucketing), so the precision loss is harmless.
    lo_d, hi_d = float(int(lo)), float(int(hi))
    width_d = max(hi_d - lo_d, 1.0) / n_buckets
    bucket = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(n_buckets - 1).cast("long"),
            F.floor((F.col(order_col).cast("double") - F.lit(lo_d)) / F.lit(width_d)),
        ),
    ).cast("int")
    b = toks.withColumn("_b", bucket)
    totals = {
        r["_b"]: r["t"]
        for r in b.groupBy("_b").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for k in sorted(totals):
        offsets[k] = acc
        acc += totals[k]
    # keys int (bucket ids), values long (token offsets overflow int32 at
    # 100-TB corpus sizes)
    off_expr = F.element_at(
        F.create_map(
            *[
                c
                for k in sorted(offsets)
                for c in (
                    F.lit(k).cast("int"),
                    F.lit(int(offsets[k])).cast("long"),
                )
            ]
        ),
        F.col("_b"),
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + off_expr
    return b.select(
        order_col,
        "n_tokens",
        F.floor(prefix / F.lit(shard_budget_tokens)).cast("int").alias("shard_id"),
    )


def corpus_mix(docs: DataFrame) -> DataFrame:
    """Corpus-composition report for training-mix design: per (lang, source)
    cell, document/token/char totals and the cell's document share of the
    corpus — the numbers a data-mixing stage (e.g. domain re-weighting)
    consumes.

    One shuffle with map-side combine; the share divisor is a scalar
    aggregate (O(1) to the driver).  All doubles derive from integer
    ratios, so the result is bit-equal with the SQL oracle.
    """
    n_total = docs.count()
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(TXT.token_count(F.col("text"))).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        (F.count("*") / F.lit(float(n_total))).alias("doc_share"),
    )


BADWORDS: tuple[str, ...] = ("slow", "junk")
"""Stand-in blocklist. The production list (e.g. the public C4 blocklist)
is a drop-in replacement — the operator takes the list as a parameter and
the plan shape (zero-shuffle array filter) is independent of its size up
to the literal-array limit; beyond that, a broadcast semi-join on the
exploded token column is the same filter with one extra broadcast."""


def badwords_filter(
    docs: DataFrame, words: tuple[str, ...] = BADWORDS
) -> DataFrame:
    """C4-style blocklist filter (Raffel et al. 2020 dropped any page with
    a blocklisted word): per doc, the count of blocklisted token
    OCCURRENCES and the keep verdict (zero occurrences). Token-granular —
    substring false-positives ('classic' vs 'ass') are avoided by matching
    whole word tokens, the documented C4 behavior.

    Zero shuffle: tokenize + array filter ride the corpus scan.
    """
    lst = F.array(*[F.lit(w) for w in words])
    toks = TXT.tokens(F.lower(F.col("text")))
    n_bad = F.size(F.filter(toks, lambda t: F.array_contains(lst, t)))
    return docs.select(
        "doc_id",
        n_bad.cast("long").alias("n_bad_tokens"),
        (n_bad == 0).alias("keep"),
    )


def badwords_sql(words: tuple[str, ...] = BADWORDS) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                t -> list_contains({lit}, t))) AS BIGINT)
             AS n_bad_tokens,
           len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                           t -> list_contains({lit}, t))) = 0 AS keep
    FROM documents
    """


def doc_repetition(docs: DataFrame, n_top: int = 2, n_dup: int = 3) -> DataFrame:
    """Within-document repetition signals (Gopher repetition rules, Rae et
    al. 2021, token-granular re-expression): the token fraction claimed by
    the document's most frequent *n_top*-gram, and the token fraction in
    duplicate (beyond-first) occurrences of *n_dup*-grams. High values mark
    degenerate/boilerplate pages that length/stopword heuristics miss.

    Token fractions instead of Gopher's character fractions: the integer
    token arithmetic is exact under any partitioning (char fractions would
    be too, but tokens already ride the shared gram machinery). Overlapping
    occurrences each count, so a fully degenerate doc ("p p p p") can score
    above 1 — the signal is a repetition SCORE thresholded upward, not a
    coverage fraction. One shuffle — the per-(doc, gram) count groupBy
    (map-side combine); both signals aggregate from the same gram pass;
    fractions are integer-derived.
    """
    toks = TXT.tokens(F.lower(F.col("text")))
    base = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n_toks")
    )

    def grams(n: int) -> DataFrame:
        return base.filter(F.col("n_toks") >= n).select(
            "doc_id",
            "n_toks",
            F.lit(n).alias("n"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_toks") - n + 1),
                    lambda i: F.array_join(F.slice("toks", i, n), " "),
                )
            ).alias("gram"),
        )

    # ONE shared per-(doc, gram-size, gram) count shuffle feeds both signals
    # (gram strings of different sizes can't collide, but `n` keys the group
    # anyway); the two per-doc aggregates downstream are O(docs) rows.
    gc = (
        grams(n_top)
        .unionByName(grams(n_dup))
        .groupBy("doc_id", "n_toks", "n", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = gc.filter(F.col("n") == n_top).groupBy("doc_id").agg(
        F.round(F.max("c") * n_top / F.max("n_toks"), 9).alias("top_gram_frac9")
    )
    dup = gc.filter(F.col("n") == n_dup).groupBy("doc_id").agg(
        F.round(
            F.sum(F.greatest(F.col("c") - 1, F.lit(0))) * n_dup / F.max("n_toks"), 9
        ).alias("dup_gram_frac9")
    )
    return (
        base.select("doc_id")
        .join(top, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top_gram_frac9", F.lit(0.0)).alias("top_gram_frac9"),
            F.coalesce("dup_gram_frac9", F.lit(0.0)).alias("dup_gram_frac9"),
        )
    )


def doc_repetition_sql(n_top: int = 2, n_dup: int = 3) -> str:
    def grams(n: int) -> str:
        return f"""
      SELECT doc_id, n_toks, array_to_string(toks[i:i+{n - 1}], ' ') AS gram
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_toks
            FROM documents),
           UNNEST(range(1, n_toks - {n} + 2)) AS u(i)
      WHERE n_toks >= {n}
        """

    return f"""
    WITH t{n_top} AS (
      SELECT doc_id, n_toks, gram, count(*) AS c
      FROM ({grams(n_top)}) GROUP BY 1, 2, 3
    ),
    t{n_dup}d AS (
      SELECT doc_id, n_toks, gram, count(*) AS c
      FROM ({grams(n_dup)}) GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT doc_id, round(max(c) * {n_top} / max(n_toks), 9) AS top_gram_frac9
      FROM t{n_top} GROUP BY 1
    ),
    dup AS (
      SELECT doc_id,
             round(sum(greatest(c - 1, 0)) * {n_dup} / max(n_toks), 9)
               AS dup_gram_frac9
      FROM t{n_dup}d GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(top.top_gram_frac9, 0.0) AS top_gram_frac9,
           COALESCE(dup.dup_gram_frac9, 0.0) AS dup_gram_frac9
    FROM documents d
    LEFT JOIN top ON d.doc_id = top.doc_id
    LEFT JOIN dup ON d.doc_id = dup.doc_id
    """


def temperature_mix(docs: DataFrame, by: str = "lang") -> DataFrame:
    """Temperature-based sampling weights per corpus stratum (the α-sampling
    of multilingual-corpus construction, Conneau & Lample 2019 / XLM-R,
    α = 0.5): raw share p_s = n_s/N is flattened to q_s ∝ p_s^α, and the
    per-stratum sampling-rate multiplier w_s = q_s/p_s up-weights rare
    strata and down-weights dominant ones. The mixing stage multiplies each
    document's base sampling probability by its stratum's w_s.

    α is fixed at 0.5 so the flattening is ``sqrt`` — IEEE-exactly-rounded
    in both engines (a general ``pow`` is only ~1-ulp and would need the
    same round-9 guard). N cancels inside q_s = sqrt(n_s)/Σ sqrt(n_m), so
    every double here derives from integer counts through exactly-rounded
    ops; the only reassociation-sensitive value is the O(strata)-term
    denominator sum, absorbed by round-9.

    Scale posture: one map-side-combined groupBy over the corpus; the
    denominator is an O(strata) scalar aggregate. Zero per-document state.
    """
    counts = docs.groupBy(by).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("n"), F.sum(F.sqrt(F.col("n_docs"))).alias("denom")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        by,
        "n_docs",
        F.round(F.col("n_docs") / F.col("n"), 9).alias("raw_share9"),
        F.round(F.sqrt(F.col("n_docs")) / F.col("denom"), 9).alias("temp_share9"),
        F.round(
            (F.sqrt(F.col("n_docs")) / F.col("denom"))
            / (F.col("n_docs") / F.col("n")),
            9,
        ).alias("samp_weight9"),
    )


TEMPERATURE_MIX_SQL = """
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
    s AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n, sum(sqrt(n_docs)) AS denom FROM c)
    SELECT lang, n_docs,
           round(n_docs / s.n, 9) AS raw_share9,
           round(sqrt(n_docs) / s.denom, 9) AS temp_share9,
           round((sqrt(n_docs) / s.denom) / (n_docs / s.n), 9) AS samp_weight9
    FROM c, s
"""


def decontaminate_bloom(
    docs: DataFrame,
    n: int = 8,
    eval_mod: int = 17,
    shards: int = 8,
    bits_per_shard: int = 1 << 20,
    n_hashes: int = 7,
) -> DataFrame:
    """:func:`decontaminate` for eval sets too large to broadcast as a gram
    table: the eval grams build a distributed bloom (dedup.py machinery —
    only shards × bits/8 bytes ever reach the driver), the 100-TB training
    side probes the bitmap in one Arrow pass, and ONLY bloom-positive grams
    pay the exact verification join. Bloom false positives cannot leak into
    the output (the verify join removes them) and false negatives do not
    exist, so the result is row-identical to the broadcast-join operator —
    pinned by test and by sharing its SQL oracle.

    Shuffle accounting at scale: the full-corpus gram stream is never
    shuffled (projection + bitmap probe ride the scan); the verify join
    shuffles the flagged subset (≈ true contamination + bloom FP rate) plus
    one pass of eval grams; the per-doc rollup shuffles flagged docs only.
    """
    from pyspark.sql import functions as F

    from ospo_ghcrawler_spark.operators.dedup import (
        bloom_flag_column,
        build_bloom_distributed,
    )

    is_eval = (F.col("doc_id") % eval_mod) == 0
    g_eval = _token_grams(docs.filter(is_eval), n).select("gram").distinct()
    g_eval_h = g_eval.select("gram", F.xxhash64("gram").alias("gram_h"))
    fam = build_bloom_distributed(
        g_eval_h, "gram_h", shards, bits_per_shard, n_hashes
    )
    g_train = _token_grams(docs.filter(~is_eval), n).select(
        "doc_id", "gram", F.xxhash64("gram").alias("gram_h")
    )
    candidates = bloom_flag_column(g_train, "gram_h", fam, "_maybe").filter(
        F.col("_maybe")
    )
    verified = candidates.join(g_eval_h.select("gram"), "gram", "left_semi")
    return verified.groupBy("doc_id").agg(
        F.countDistinct("gram").alias("n_contaminated_grams")
    )


def filter_funnel(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 20,
    min_quality: float = 0.5,
) -> DataFrame:
    """Per-stage attrition report for the cleaning pipeline — the first
    thing anyone debugging a corpus asks for ("where did my documents
    go?"). Stages mirror :func:`ospo_ghcrawler_spark.queries.q_clean_corpus`:
    language → length → quality → exact dedup; each row reports
    (stage, n_in, n_kept) with n_in = the previous stage's n_kept.

    ONE pass over the corpus: per-doc flags are a zero-shuffle projection,
    the funnel is a single O(1)-row aggregate (conjunction sums +
    count-distinct-fingerprint for the dedup stage), and the 4-row report
    is unpivoted from that one row with ``stack`` — no per-stage rescans,
    so at 100 TB the report costs exactly one corpus read.
    """
    t = F.col("text")
    flags = docs.select(
        (F.col("lang") == lang).alias("f_lang"),
        (TXT.token_count(t) >= min_tokens).alias("f_len"),
        (TXT.quality_score(t) >= min_quality).alias("f_q"),
        F.md5(t).alias("fp"),
    )
    agg = flags.agg(
        F.count("*").alias("n0"),
        F.sum(F.col("f_lang").cast("long")).alias("n1"),
        F.sum((F.col("f_lang") & F.col("f_len")).cast("long")).alias("n2"),
        F.sum((F.col("f_lang") & F.col("f_len") & F.col("f_q")).cast("long")).alias("n3"),
        F.countDistinct(
            F.when(F.col("f_lang") & F.col("f_len") & F.col("f_q"), F.col("fp"))
        ).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'language', n0, n1, 'length', n1, n2, "
            "'quality', n2, n3, 'exact_dedup', n3, n4) AS (stage, n_in, n_kept)"
        )
    )


def host_boilerplate(
    docs: DataFrame, width: int = 3, min_docs: int = 2
) -> DataFrame:
    """Per-site boilerplate detection (CCNet/RefinedWeb cleaning stage:
    navigation bars, footers, cookie banners repeat across the pages of one
    site and must not count as content): a chunk is *boilerplate within a
    source* when it occurs in >= *min_docs* distinct documents of that
    source. Production corpora use a document-frequency share (e.g. half
    the site's pages); the absolute floor is kept here because the
    synthetic corpus tops out at df=2.

    Chunking matches :func:`paragraph_dedup` (non-overlapping *width*-word
    windows over the tokenized text) so the two passes see the same units.

    Returns one row per document: (doc_id, source, n_chunks,
    n_boiler_chunks, is_mostly_boiler) — the last flags documents where
    boilerplate is at least half the chunks (the drop rule a cleaning
    funnel applies).

    Plan / 100-TB posture: chunking is a zero-shuffle array projection; the
    exploded occurrences immediately reduce to per-(doc, source, chunk)
    counts (ONE map-side-combined shuffle — text leaves the plan here, so
    the text column is scanned exactly once; plan-pinned); the document
    frequency is a count-only window over (source, chunk) on that already
    doc-distinct set (no array materialization — a sitewide boilerplate
    chunk costs a count over docs-containing-it rows, never a collected
    list); the per-doc rollup is one final AQE-coalesced aggregation.
    """
    w = TXT.tokens(F.col("text"))
    starts = F.when(
        F.size(w) >= 1,
        F.sequence(F.lit(0), F.floor((F.size(w) - 1) / width).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts, lambda i: F.array_join(F.slice(w, i * width + 1, width), " ")
    )
    occ = docs.select(
        "doc_id", "source", F.explode(chunks).alias("chunk")
    )
    occ_counts = occ.groupBy("doc_id", "source", "chunk").agg(
        F.count("*").alias("occ_n")
    )
    df = F.count("*").over(Window.partitionBy("source", "chunk"))
    per_doc = (
        occ_counts.withColumn("df", df)
        .groupBy("doc_id", "source")
        .agg(
            F.sum("occ_n").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("df") >= min_docs, F.col("occ_n")).otherwise(0))
            .cast("long")
            .alias("n_boiler_chunks"),
        )
    )
    # chunkless (empty-text) docs still get a row
    return (
        docs.select("doc_id", "source")
        .join(per_doc, ["doc_id", "source"], "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_chunks", F.lit(0).cast("long")).alias("n_chunks"),
            F.coalesce("n_boiler_chunks", F.lit(0).cast("long")).alias(
                "n_boiler_chunks"
            ),
            (
                (F.coalesce("n_chunks", F.lit(0).cast("long")) > 0)
                & (
                    F.coalesce("n_boiler_chunks", F.lit(0).cast("long")) * 2
                    >= F.coalesce("n_chunks", F.lit(0).cast("long"))
                )
            ).alias("is_mostly_boiler"),
        )
    )


def host_boilerplate_sql(width: int = 3, min_docs: int = 2) -> str:
    """Exact-replica DuckDB oracle for :func:`host_boilerplate` (same
    tokenization, chunk boundaries, df rule, and per-doc rollup)."""
    return f"""
    WITH toks AS (
      SELECT doc_id, source, regexp_extract_all(text, '[A-Za-z0-9]+') AS words
      FROM documents
    ),
    occ AS (
      SELECT doc_id, source,
             array_to_string(
               list_slice(words, i * {width} + 1, i * {width} + {width}), ' '
             ) AS chunk
      FROM (
        SELECT doc_id, source, words,
               unnest(range(0, CAST(floor((len(words) - 1) / {width}) AS BIGINT) + 1))
                 AS i
        FROM toks WHERE len(words) >= 1
      )
    ),
    dfreq AS (
      SELECT source, chunk, count(DISTINCT doc_id) AS df
      FROM occ GROUP BY source, chunk
    ),
    boiler AS (
      SELECT source, chunk, TRUE AS is_boiler FROM dfreq WHERE df >= {min_docs}
    ),
    per_doc AS (
      SELECT o.doc_id, o.source,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(b.is_boiler) AS BIGINT) AS n_boiler_chunks
      FROM occ o LEFT JOIN boiler b
        ON o.source = b.source AND o.chunk = b.chunk
      GROUP BY o.doc_id, o.source
    )
    SELECT d.doc_id, d.source,
           COALESCE(p.n_chunks, 0) AS n_chunks,
           COALESCE(p.n_boiler_chunks, 0) AS n_boiler_chunks,
           COALESCE(p.n_chunks, 0) > 0 AND
             COALESCE(p.n_boiler_chunks, 0) * 2 >= COALESCE(p.n_chunks, 0)
             AS is_mostly_boiler
    FROM documents d LEFT JOIN per_doc p USING (doc_id, source)
    """


def nfc_normalize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization audit (the canonical-composition pass every
    training-text pipeline runs before hashing/dedup — decomposed 'e'+U+0301
    and composed 'é' must fingerprint identically). Arrow-batched pandas UDF
    (the documented slow-path pattern: Python is unavoidable — Spark SQL has
    no unicode-normalize builtin — so it runs vectorized per batch, never
    per-row). Emits the changed flag, before/after char counts, and the md5
    of the normalized text (small, hashable) rather than the text itself.

    Zero shuffle: the UDF projection rides the scan; at 100 TB the only cost
    is the Arrow transfer of the text column, which the operator would pay
    to rewrite the corpus anyway.
    """
    import pandas as pd  # noqa: F401 — type hints resolve via module globals
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd  # future-annotations: hints eval against globals

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    norm = _nfc(F.col(text_col))
    return docs.select(
        "doc_id",
        (norm != F.col(text_col)).alias("changed"),
        F.length(text_col).cast("long").alias("n_chars_before"),
        F.length(norm).cast("long").alias("n_chars_after"),
        F.md5(F.encode(norm, "UTF-8")).alias("norm_md5"),
    )


NFC_NORMALIZE_SQL = """
    SELECT doc_id,
           nfc_normalize(text) <> text AS changed,
           CAST(length(text) AS BIGINT) AS n_chars_before,
           CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars_after,
           md5(nfc_normalize(text)) AS norm_md5
    FROM documents
"""


def corpus_stats(docs: DataFrame) -> DataFrame:
    """One-row corpus rollup (the dashboard numbers every pipeline report
    leads with): docs, tokens, chars, distinct langs/sources. A single
    map-side-combined global aggregate — partial aggregation makes this one
    reduce task regardless of corpus size."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TXT.token_count(F.col("text"))).cast("long").alias("n_tokens"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )


CORPUS_STATS_SQL = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
"""


SENT_RE = "[^.!?]+[.!?]?"
"""Sentence-ish runs (text up to and including one terminator). Chosen for
the Java-regex ∩ RE2 syntax subset — no lookbehind — so the Spark plan and
the DuckDB oracle split identically."""


def sentence_dedup(docs: DataFrame) -> DataFrame:
    """Cross-corpus exact SENTENCE dedup (the sentence-granular variant of
    :func:`paragraph_dedup`; cf. Lee et al. 2022's observation that most
    web duplication is boilerplate sentences): every distinct sentence keeps
    exactly one occurrence corpus-wide — the minimal (doc_id, pos) — and all
    later copies are dropped.

    Returns (doc_id, clean_md5, n_sents_kept, n_sents_removed); md5 over the
    position-ordered surviving sentences joined with one space.

    Plan: sentence split is a zero-shuffle regexp array projection; the keep
    decision is ONE window shuffle keyed on sentence text; reassembly one
    groupBy(doc_id). Same 100-TB note as paragraph_dedup: key the window on
    xxhash64(sentence) at scale; the string key is kept for oracle parity.
    """
    raw = F.regexp_extract_all(F.col("text"), F.lit(SENT_RE), 0)
    sents = F.filter(
        F.transform(raw, lambda s: F.trim(s)), lambda s: s != ""
    )
    occ = docs.select("doc_id", F.posexplode(sents).alias("pos", "sent"))
    win = Window.partitionBy("sent").orderBy("doc_id", "pos")
    ranked = occ.withColumn("rk", F.row_number().over(win))
    per_doc = ranked.groupBy("doc_id").agg(
        F.md5(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("rk") == 1,
                                    F.struct(F.col("pos"), F.col("sent")),
                                )
                            )
                        ),
                        lambda s: s["sent"],
                    ),
                    " ",
                ),
                "UTF-8",
            )
        ).alias("clean_md5"),
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).cast("long").alias("n_sents_kept"),
        F.sum(F.when(F.col("rk") > 1, 1).otherwise(0)).cast("long").alias("n_sents_removed"),
    )
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_md5", F.lit(empty_md5)).alias("clean_md5"),
        F.coalesce("n_sents_kept", F.lit(0).cast("long")).alias("n_sents_kept"),
        F.coalesce("n_sents_removed", F.lit(0).cast("long")).alias("n_sents_removed"),
    )


SENTENCE_DEDUP_SQL = f"""
    WITH sents AS (
      SELECT doc_id,
             list_filter(
               list_transform(regexp_extract_all(text, '{SENT_RE}'), s -> trim(s)),
               s -> s <> '') AS ss
      FROM documents
    ),
    occ AS (
      -- index bound derived from the data (lateral unnest over range(0,
      -- len(ss))): no silent cap on sentences per document, so the oracle
      -- matches the uncapped Spark operator at any document length
      SELECT doc_id, i AS pos, ss[i + 1] AS sent
      FROM sents, LATERAL (SELECT unnest(range(0, len(ss))) AS i) u
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY sent ORDER BY doc_id, pos) AS rk
      FROM occ
    ),
    per_doc AS (
      SELECT doc_id,
             md5(COALESCE(
                   string_agg(CASE WHEN rk = 1 THEN sent END, ' ' ORDER BY pos),
                   '')) AS clean_md5,
             CAST(count(*) FILTER (rk = 1) AS BIGINT) AS n_sents_kept,
             CAST(count(*) FILTER (rk > 1) AS BIGINT) AS n_sents_removed
      FROM ranked GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.clean_md5, md5('')) AS clean_md5,
           COALESCE(p.n_sents_kept, 0) AS n_sents_kept,
           COALESCE(p.n_sents_removed, 0) AS n_sents_removed
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""
