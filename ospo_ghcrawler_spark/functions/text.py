"""Text-analysis column builders for training-data pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM, codegen) chosen to have
exact DuckDB-SQL equivalents so every op is oracle-checkable:

- token counting (regex word tokens — a BPE-ish approximation),
- quality scoring (length / punctuation / stopword ratios),
- n-gram-marker language ID (deterministic argmax over marker-word scores),
- document fingerprinting (md5 over whitespace-normalized text).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9]+"
PUNCT_RE = "[.,;:!?]"

# tiny deterministic marker lists per language (shared with the SQL oracle)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "de", "que", "es"],
    "it": ["il", "la", "di", "che", "non"],
}


def tokens(text: Column) -> Column:
    """Word tokens (letters+digits runs)."""
    return F.regexp_extract_all(text, F.lit(WORD_RE), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(F.lower(text))))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0))


def stopword_count(text: Column, lang: str = "en") -> Column:
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: rewards stopword density and average word
    length in a sane band, penalizes punctuation soup.  Deterministic integer
    arithmetic → double, matching the SQL oracle bit-for-bit."""
    n_tok = token_count(text)
    n_char = F.length(text)
    n_punct = punct_count(text)
    n_stop = stopword_count(text)
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_char, F.lit(1))
    avg_word = n_char / F.greatest(n_tok, F.lit(1))
    return (
        F.least(stop_ratio * 2, F.lit(1.0)) * 0.5
        + F.when((avg_word >= 3) & (avg_word <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language over lowered text."""
    lo = F.lower(text)
    out = {}
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(lo, F.lit(pat), 0))
    return out


def lang_id(text: Column) -> Column:
    """Deterministic argmax over marker scores (ties broken by language-code
    order, 'und' when all scores are zero)."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best = scores[langs[0]]
    for lg in langs[1:]:
        best = F.greatest(best, scores[lg])
    expr = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties → apply last
        expr = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


ALPHA_TOKEN_RE = "[A-Za-z0-9]*[A-Za-z][A-Za-z0-9]*"
SYMBOL_RE = r"(#|\.\.\.)"


def gopher_stats(text: Column) -> dict[str, Column]:
    """The per-document statistics behind Gopher-style document filtering
    (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A.1.1 — the
    published repetition/quality rules used by most public web-corpus
    pipelines). All integer counts plus two single-division ratios, so the
    DuckDB oracle reproduces every value bit-for-bit:

    - ``n_words``       word-token count;
    - ``sum_word_len``  total word-token characters — computed as
      ``length(regexp_replace(text, '[^A-Za-z0-9]', ''))``: stripping
      every non-token character leaves exactly the concatenated tokens, a
      single JVM regex pass instead of a per-token transform+fold;
    - ``mean_word_len`` ``sum_word_len / max(n_words, 1)``;
    - ``n_alpha_words`` tokens containing at least one letter — a maximal
      alnum run matches ``[A-Za-z0-9]*[A-Za-z][A-Za-z0-9]*`` iff it
      contains a letter (greedy + backtrack covers the whole run), so one
      ``regexp_extract_all`` counts them without exploding tokens;
    - ``alpha_frac``    ``n_alpha_words / max(n_words, 1)``;
    - ``n_stop``        stopword hits (shared marker list);
    - ``n_symbols``     hash / ellipsis occurrences (the Gopher
      symbol-to-word numerator).
    """
    n_words = token_count(text)
    denom = F.greatest(n_words, F.lit(1))
    sum_word_len = F.length(F.regexp_replace(text, "[^A-Za-z0-9]", ""))
    n_alpha = F.size(F.regexp_extract_all(text, F.lit(ALPHA_TOKEN_RE), 0))
    return {
        "n_words": n_words,
        "sum_word_len": sum_word_len,
        "mean_word_len": sum_word_len / denom,
        "n_alpha_words": n_alpha,
        "alpha_frac": n_alpha / denom,
        "n_stop": stopword_count(text),
        "n_symbols": F.size(F.regexp_extract_all(text, F.lit(SYMBOL_RE), 0)),
    }


def gopher_passes(
    s: dict[str, Column],
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean: float = 3.0,
    max_mean: float = 10.0,
    min_alpha_frac: float = 0.7,
    min_stop: int = 1,
    max_symbol_ratio: float = 0.1,
) -> Column:
    """Gopher keep/drop verdict over :func:`gopher_stats` output. Defaults
    are scaled to the short synthetic documents; production values from the
    paper: 50..100k words, mean 3..10, alpha 0.8, 2 stopwords."""
    return (
        (s["n_words"] >= min_words)
        & (s["n_words"] <= max_words)
        & (s["mean_word_len"] >= min_mean)
        & (s["mean_word_len"] <= max_mean)
        & (s["alpha_frac"] >= min_alpha_frac)
        & (s["n_stop"] >= min_stop)
        & (s["n_symbols"] / F.greatest(s["n_words"], F.lit(1)) <= max_symbol_ratio)
    )


def normalized(text: Column) -> Column:
    """Whitespace-collapsed, lowered, trimmed — the fingerprint base."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(F.encode(normalized(text), "UTF-8"))


def winnow_fingerprints(
    text: Column, k: int = 8, w: int = 4, gram_hash=None
) -> Column:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    algorithm): rolling char k-gram hashes, then the minimum of every
    w-length hash window, deduplicated. Documents sharing ANY fingerprint
    share a k-gram run — the rolling-hash document-fingerprint primitive for
    near-dup/plagiarism detection at corpus scale.

    Entirely JVM-side array expressions per row (sequence → transform →
    slice/array_min → array_distinct): zero shuffle, zero Python. The
    default per-gram hash is md5 (shared with the DuckDB oracle, which
    checks the op exactly); window minima compare lexicographically on the
    hex, deterministic and engine-independent. *gram_hash* swaps the hash
    column builder — see :func:`winnow_fingerprints_fast` for the
    production-speed xxhash64 variant (same gram boundaries and window
    mechanics, cheaper hash)."""
    if gram_hash is None:
        gram_hash = lambda g: F.md5(F.encode(g, "UTF-8"))  # noqa: E731
    n = F.length(text) - (k - 1)
    empty = F.array().cast("array<int>")
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(empty)
    grams = F.transform(idx, lambda i: gram_hash(text.substr(i, F.lit(k))))

    # Bind the grams array ONCE per row before the window pass. Catalyst
    # does no common-subexpression elimination across a lambda boundary: an
    # expression subtree referenced inside transform()'s lambda is
    # RE-EVALUATED per element, so slice(grams, j, w) inline would recompute
    # all L gram hashes for each of the L windows — O(L^2) hashes/row,
    # measured ~2 s/row on ~2.5 KB texts. Wrapping grams as the single
    # element of transform()'s ARGUMENT evaluates it once; the lambda
    # variable g is a cheap bound reference, giving the intended O(L·w).
    def _windows(g):
        m = F.size(g) - (w - 1)
        widx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(empty)
        return F.array_distinct(
            F.transform(widx, lambda j: F.array_min(F.slice(g, j, w)))
        )

    return F.element_at(F.transform(F.array(grams), _windows), 1)


def winnow_fingerprints_fast(text: Column, k: int = 8, w: int = 4) -> Column:
    """Production-speed winnowing: identical gram boundaries and window
    mechanics to :func:`winnow_fingerprints`, but the per-gram hash is a
    single ``xxhash64`` (one 64-bit mix) instead of md5 (full cryptographic
    digest + hex encode) — measured ~4× cheaper per row at sf0.1. Hash
    values differ from the md5 variant (so it is pinned by the machinery-
    equivalence test, not the DuckDB oracle); collision behavior for
    fingerprint selection is equivalent at 64 bits."""
    return winnow_fingerprints(text, k, w, gram_hash=F.xxhash64)


def winnow_fingerprints_tokens(text: Column, k: int = 4, w: int = 4) -> Column:
    """Winnowing over WORD k-shingles instead of char k-grams — the
    harvest-path document fingerprinter (cfg.winnow_at_fetch).

    Char 8-grams yield ~L hashes per L-char document (~2500 for a web
    page's extracted text), measured ~30 core-ms/page of higher-order-
    function work on a quiet host — 10× the rest of the per-page crawl
    cost. Word shingles yield ~L/6 grams for the same shared-run detection
    power at document granularity (w-shingling, Broder '97 — the same unit
    MinHash uses), cutting the at-fetch cost ~85% while keeping the exact
    MOSS window-min selection: documents sharing any k-word run of length
    ≥ k+w-1 words share a fingerprint. Same one-bind-per-row shape as
    :func:`winnow_fingerprints` (no O(L²) re-evaluation)."""
    toks = F.split(normalized(text), " ")

    def _from_tokens(tk):
        n = F.size(tk) - (k - 1)
        empty = F.array().cast("array<int>")
        idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(empty)
        grams = F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i, k)))
        )

        def _windows(g):
            m = F.size(g) - (w - 1)
            widx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(empty)
            return F.array_distinct(
                F.transform(widx, lambda j: F.array_min(F.slice(g, j, w)))
            )

        return F.element_at(F.transform(F.array(grams), _windows), 1)

    # bind the token array once per row (same lambda-boundary CSE caveat
    # as winnow_fingerprints: an inline `toks` would re-split per shingle)
    return F.element_at(F.transform(F.array(toks), _from_tokens), 1)


def minhash_oph_entries(text: Column, buckets: int = 64, k: int = 3) -> Column:
    """One-permutation-hashing MinHash (Li, Owen & Zhang, NIPS'12): ONE
    xxhash64 per word k-shingle (versus n_perm hashes/shingle for the
    classic family in operators/dedup_docs.py:minhash_signatures), each
    hash binned by ``pmod(h, buckets)``; the signature is the per-bin
    minimum, returned SPARSE as ``array<struct<bin:int, h:bigint>>`` with
    empty bins absent (OPH's empty-bin case — densification is the
    consumer's choice). Duplicate shingles need no dedup: a multiset min
    equals the set min.

    The shingle unit (word 3-grams over the raw whitespace split) is
    IDENTICAL to operators/dedup_docs.py:shingles, so signatures estimate
    the same Jaccard space the exact verification stage measures.

    Cost: O(L) hashes + O(L log L) struct sort + O(L) neighbor-compare
    filter per row, all JVM array expressions — zero shuffle, zero
    Python, cheap enough for the harvest-write pass
    (cfg.minhash_at_fetch). Per the winnowing lesson (SCALING_NOTES §3k)
    every array is bound ONCE per row via the transform-argument trick —
    higher-order lambdas get no CSE, so an unbound reference would
    re-evaluate the whole hash pass per element."""
    toks = F.split(text, r"\s+")
    empty_i = F.array().cast("array<int>")

    def _sig(tk):
        n = F.size(tk) - (k - 1)
        idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(empty_i)
        hashes = F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i, k)))
        )
        entries = F.array_sort(
            F.transform(
                hashes,
                lambda h: F.struct(
                    F.pmod(h, F.lit(buckets)).cast("int").alias("bin"),
                    h.alias("h"),
                ),
            )
        )

        # sorted (bin asc, h asc) → the first entry of each bin run is that
        # bin's minimum; keep positions where bin differs from predecessor
        def _first_per_bin(e):
            return F.filter(
                e,
                lambda x, i: F.when(i == F.lit(0), F.lit(True)).otherwise(
                    F.element_at(e, F.greatest(i, F.lit(1)))["bin"] != x["bin"]
                ),
            )

        return F.element_at(F.transform(F.array(entries), _first_per_bin), 1)

    return F.element_at(F.transform(F.array(toks), _sig), 1)


# ---------------------------------------------------------------------------
# hashed-feature linear quality classifier (fastText-style inference shape)
# ---------------------------------------------------------------------------

CLF_BUCKETS = 1 << 16  # feature-hash space (fastText -bucket analog)
_CLF_MULT = 2654435761  # Knuth multiplicative-hash constant
_CLF_MOD = 104729  # prime: bucket -> pseudo-weight in [0, _CLF_MOD)


def _clf_weight_ints(text: Column, buckets: int = CLF_BUCKETS) -> Column:
    """Per-token INTEGER weights for the hashed linear model: token →
    md5-derived bucket (first 48 bits, cross-engine exact) → deterministic
    pseudo-weight m ∈ [0, _CLF_MOD). Integers end-to-end so the per-doc sum
    is exact under any partitioning / fold order; the float mapping
    m/_CLF_MOD - 0.5 happens once per DOC, not per token.

    The weights here are a deterministic stand-in for a trained model
    (quality classifiers à la fastText — Joulin et al. 2016 — as used for
    corpus filtering in CCNet/DCLM-style pipelines; no trained weights can
    exist in this sandbox). The INFERENCE plumbing is the real thing:
    tokenize → hash to buckets → weight lookup → mean, all JVM array
    expressions riding the corpus scan with zero shuffle. Swapping in real
    weights = replacing the arithmetic with a broadcast bucket→weight map
    (Zipf-bounded, ≪ corpus) — the plan shape is unchanged.
    """
    return F.transform(
        tokens(F.lower(text)),
        lambda t: (
            (F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("bigint") % buckets)
            * _CLF_MULT
            + 101
        )
        % _CLF_MOD,
    )


def classifier_score(text: Column, buckets: int = CLF_BUCKETS) -> Column:
    """Mean hashed-feature weight, centered to [-0.5, 0.5): the linear
    model's document score. NULL for token-less documents. Every double
    derives from exact integers through exactly-rounded ops, so the value
    is bit-identical across engines and partitionings (round-9 is worn as
    a belt, not load-bearing)."""
    ms = _clf_weight_ints(text, buckets)
    n = F.size(ms)
    total = F.aggregate(ms, F.lit(0).cast("bigint"), lambda a, x: a + x)
    return F.when(
        n > 0, F.round((total / n) / F.lit(float(_CLF_MOD)) - 0.5, 9)
    )


def classifier_sql_expr(buckets: int = CLF_BUCKETS) -> str:
    """The identical model in DuckDB SQL (md5-hex → 48-bit int bucket)."""
    m = (
        f"(CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) % {buckets}"
        f" * {_CLF_MULT} + 101) % {_CLF_MOD}"
    )
    return (
        "list_transform(regexp_extract_all(lower(text), '[A-Za-z0-9]+'), "
        f"tok -> {m})"
    )


# --- unicode script mix (writing-system detection) ---------------------------
# Script-granular character counts: the signal language-ID n-grams can't give
# (a page mixing Latin boilerplate with CJK body text, transliteration spam,
# wrong-script injection). Java regex script properties (\p{IsX}) on the
# Spark side; the DuckDB oracle uses the RE2 spellings (\p{X}) of the SAME
# Unicode script properties, so counts agree exactly.
SCRIPTS: tuple[str, ...] = ("Latin", "Cyrillic", "Greek", "Arabic", "Han")


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script character counts + digits + total chars, all zero-shuffle
    JVM regexp_count projections riding the scan."""
    out = {
        f"n_{s.lower()}": F.regexp_count(text, F.lit(rf"\p{{Is{s}}}")) for s in SCRIPTS
    }
    out["n_digit"] = F.regexp_count(text, F.lit("[0-9]"))
    out["n_chars"] = F.length(text)
    return out


def main_script(text: Column) -> Column:
    """Dominant script label: the first script in SCRIPTS order whose count
    equals the max count ('none' when every count is zero) — the exact tie
    rule the oracle SQL restates as an identical CASE chain."""
    counts = [F.regexp_count(text, F.lit(rf"\p{{Is{s}}}")) for s in SCRIPTS]
    mx = F.greatest(*counts)
    expr = F.when(mx == 0, F.lit("none"))
    for s, c in zip(SCRIPTS, counts):
        expr = expr.when(c == mx, F.lit(s.lower()))
    return expr.otherwise(F.lit("none"))
