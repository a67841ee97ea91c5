"""Keyword-search and LM-scoring operators over the harvested corpus.

The reference stops at fetch/extract/store (SURVEY.md §2); a web-scale
corpus additionally needs retrieval and model-based quality scoring before
it can serve as training data. Three standard operators, each a pure
DataFrame plan with an exact DuckDB oracle:

- :func:`inverted_index` — term → (doc, tf) postings with per-term document
  frequency, the retrieval building block (and the shape a sharded index
  writer consumes).
- :func:`bm25_topk` — Okapi BM25 (Robertson et al., TREC-3; the Lucene
  ``k1/b`` parameterization with the non-negative ``ln(1 + (N-df+.5)/(df+.5))``
  idf) top-k ranking for a fixed query-term list.
- :func:`unigram_logprob` — per-document mean token log-probability under
  the corpus's own unigram LM — the CCNet-style (Wenzek et al. 2020)
  perplexity proxy used to split a crawl into head/middle/tail quality
  tiers without an external model.

Scale posture (100 TB): tokenization is a zero-shuffle array projection
inside whole-stage codegen; postings need exactly ONE shuffle (term, doc)
with map-side combine; corpus-level scalars (N, avgdl, total token count)
are O(1)-row aggregates broadcast back into the plan; BM25 restricts the
postings to the query's terms FIRST (broadcast hash semi-join on a
literal array — the corpus side never shuffles on anything but the final
per-doc sum), so cost is O(docs containing a query term), not O(corpus).
``unigram_logprob`` joins per-doc *distinct* term counts against the
vocabulary — vocabulary is sublinear in corpus size (Heaps' law), and the
join key is the term, so the heavy side shuffles once and skew lands on
stopwords, which AQE skew-join splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.functions import text as TXT


def _term_tf(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf): lower-cased word-token term frequencies per doc.
    One explode + one map-side-combined groupBy."""
    return (
        docs.select(F.col(id_col), F.explode(TXT.tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Postings list (term, doc_id, tf, df). ``min_df`` prunes hapax terms
    (at web scale most of the vocabulary — typos, ids — is df=1 noise).

    Two bounded shuffles, deliberately: the tf groupBy keeps its map-side
    partial combine against the raw token explode (token stream ≫ tf
    rows — combining first is the scale win), then the df window shuffles
    only the combined (term, doc, tf) rows on term. Collapsing to one
    shuffle (repartition by term before the groupBy) would move the whole
    uncombined token stream across the wire.
    """
    tf = _term_tf(docs, id_col, text_col)
    dfreq = F.count("*").over(Window.partitionBy("term"))
    out = tf.withColumn("df", dfreq)
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out.select("term", F.col(id_col), "tf", "df")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k over the corpus for a fixed term list.

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Ties break on doc_id so the ranking is total. The postings are
    restricted to the query terms *before* any aggregation (array_contains
    on a literal array — a codegen filter, no join), so the plan's cost is
    proportional to the matching postings, not the corpus vocabulary.
    Corpus scalars (N, avgdl) are one O(1)-row aggregate crossed back in
    (broadcast nested loop of a single row).
    """
    q = [t.lower() for t in query_terms]
    dl = docs.select(
        F.col(id_col), TXT.token_count(F.col(text_col)).alias("dl"),
        F.lower(F.col(text_col)).alias("_lt"),
    )
    scalars = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    tf = (
        dl.select(F.col(id_col), "dl", F.explode(TXT.tokens(F.col("_lt"))).alias("term"))
        .filter(F.array_contains(F.array(*[F.lit(t) for t in q]), F.col("term")))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        # sums of doubles are addition-order-sensitive; 6-dp grid (house rule)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    # orderBy().limit() compiles to TakeOrderedAndProject (per-partition
    # top-k + single merge of k rows) — never a global sort of all matching
    # docs; the unpartitioned rank window then runs over <= topk rows only.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(topk)
    rk = F.row_number().over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return top.withColumn("rk", rk)


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc mean token log-probability under the corpus unigram LM.

    p(t) = cf(t) / total_tokens over the SAME corpus (self-scoring, the
    CCNet trick — no external model); returns (id, n_tokens, avg_logprob)
    with avg_logprob = Σ_t tf·ln p(t) / dl, rounded to the 6-dp grid.
    Documents with zero tokens are dropped (undefined mean).
    """
    tf = _term_tf(docs, id_col, text_col)
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total_tokens"))
    per_doc = (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * F.log(F.col("cf") / F.col("total_tokens")))
                / F.sum("tf"),
                6,
            ).alias("avg_logprob"),
        )
    )
    return per_doc


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail quality split (Wenzek et al. 2020): rank each
    document by its LM score WITHIN its language and cut into terciles —
    head = best-scoring third (highest mean logprob / lowest perplexity),
    tail = worst. CCNet keeps head+middle for pretraining; the bucket label
    is the knob.

    Self-scored unigram LM (:func:`unigram_logprob`) stands in for CCNet's
    KenLM — same thresholding machinery, no external model. Deterministic:
    the tercile window orders by (rounded score, id). Shuffle account: the
    LM's term shuffle + ONE per-lang window shuffle; token-less documents
    (no defined score) are excluded like CCNet's empty pages.

    Scale posture: ntile's per-lang window sorts each language in ONE task,
    and web corpora are lang-skewed (en ≫ rest) — at 100 TB keep the exact
    window for the tail langs but cut the head lang by score thresholds
    from a first aggregate pass (approx_percentile(avg_logprob, [1/3, 2/3])
    per lang, broadcast back, bucket by comparison): two scans, zero
    windows, same buckets up to quantile-estimation error at the two cut
    points. The exact ntile is kept here for oracle bit-parity.
    """
    scored = unigram_logprob(docs, id_col=id_col, text_col=text_col)
    lang = docs.select(id_col, lang_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("avg_logprob"), F.col(id_col)
    )
    t = F.ntile(3).over(w)
    return (
        scored.join(lang, id_col)
        .select(
            id_col,
            lang_col,
            "avg_logprob",
            t.alias("tercile"),
        )
        .withColumn(
            "bucket",
            F.element_at(F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), F.col("tercile")),
        )
    )


CCNET_BUCKETS_SQL = """
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS term
        FROM documents
      ) GROUP BY 1, 2
    ),
    cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
    tot AS (SELECT CAST(sum(cf) AS BIGINT) AS total_tokens FROM cf),
    scored AS (
      SELECT doc_id, round(sum(tf * ln(CAST(cf AS DOUBLE) / total_tokens)) / sum(tf), 6)
               AS avg_logprob
      FROM tf JOIN cf USING (term), tot
      GROUP BY doc_id
    )
    SELECT s.doc_id, d.lang, s.avg_logprob,
           ntile(3) OVER (PARTITION BY d.lang ORDER BY s.avg_logprob DESC, s.doc_id)
             AS tercile,
           (['head', 'middle', 'tail'])[
             ntile(3) OVER (PARTITION BY d.lang ORDER BY s.avg_logprob DESC, s.doc_id)
           ] AS bucket
    FROM scored s JOIN documents d USING (doc_id)
"""
