"""Webtext filtering operators: Gopher-rule quality verdicts, crawler-trap
url detection, and corpus token-rarity scoring — value checks on known rows
plus the plan pins their 100 TB posture relies on (zero-shuffle projections,
broadcast vocab rejoin)."""

from pyspark.sql import functions as F

from ospo_ghcrawler_spark import queries as Q
from ospo_ghcrawler_spark.functions import text as TXT

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# gopher_quality
# ---------------------------------------------------------------------------


def test_gopher_stats_known_values(spark):
    rows = [
        # 6 words, mean (3+3+2+2+3+2)/6=2.5, all alpha, 2 stops, 0 symbols
        (0, "the cat of my dog is"),
        # pure digits: alpha_frac 0, no stopwords
        (1, "111 222 333 444"),
        # symbol soup: '#' twice + '...' once over 2 words
        (2, "the ## page... loading"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s = TXT.gopher_stats(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            s["n_words"].alias("w"),
            s["mean_word_len"].alias("m"),
            s["alpha_frac"].alias("a"),
            s["n_stop"].alias("st"),
            s["n_symbols"].alias("sy"),
        ).collect()
    }
    assert out[0]["w"] == 6 and out[0]["m"] == 2.5 and out[0]["a"] == 1.0
    assert out[0]["st"] == 3  # the, of, is
    assert out[1]["a"] == 0.0 and out[1]["st"] == 0
    assert out[2]["sy"] == 3  # two '#' + one '...'


def test_gopher_quality_mixes_keep_and_drop(spark):
    out = Q.QUERIES["gopher_quality"](spark, SF)
    n = out.count()
    kept = out.filter("keep").count()
    assert 0 < kept < n, "filter must discriminate, not rubber-stamp"


def test_gopher_quality_zero_shuffle_pruned_scan(spark):
    plan = _plan(Q.QUERIES["gopher_quality"](spark, SF))
    assert "Exchange" not in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "lang" not in scan and "source" not in scan


# ---------------------------------------------------------------------------
# url_trap
# ---------------------------------------------------------------------------


def test_url_trap_flags_repeats_only(spark):
    out = Q.QUERIES["url_trap"](spark, SF)
    trap = out.filter("okey % 7 = 0")
    clean = out.filter("okey % 7 != 0")
    # repeated '/pN' x4 -> 3 duplicate segments, depth 6
    assert trap.filter("n_repeated != 3 OR NOT is_trap").count() == 0
    assert clean.filter("n_repeated != 0 OR is_trap").count() == 0
    assert trap.count() > 0 and clean.count() > 0


def test_url_trap_zero_shuffle(spark):
    assert "Exchange" not in _plan(Q.QUERIES["url_trap"](spark, SF))


# ---------------------------------------------------------------------------
# token_rarity
# ---------------------------------------------------------------------------


def test_token_rarity_known_values(spark):
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], ["doc_id", "text"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {
            r["doc_id"]: r
            for r in Q.QUERIES["token_rarity"](spark, d).collect()
        }
    # corpus tf: a=2, b=2, c=1
    assert out[0]["n_tok"] == 3 and out[0]["sum_tf"] == 2 + 2 + 2
    assert out[0]["min_tf"] == 2
    assert out[1]["n_tok"] == 2 and out[1]["sum_tf"] == 3
    assert out[1]["min_tf"] == 1


def test_token_rarity_broadcasts_vocab(spark):
    plan = _plan(Q.QUERIES["token_rarity"](spark, SF))
    assert "BroadcastHashJoin" in plan, "vocab rejoin must broadcast"
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_classifier_score_semantics(spark):
    from pyspark.sql import functions as F

    from ospo_ghcrawler_spark.functions import text as TXT

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, ""), (2, "!!! ..."), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in docs.select(
        "doc_id", TXT.classifier_score(F.col("text")).alias("s")
    ).collect()}
    # token-less docs score NULL; identical text scores identically;
    # scores live in the centered band
    assert out[1]["s"] is None and out[2]["s"] is None
    assert out[0]["s"] == out[3]["s"]
    assert -0.5 <= out[0]["s"] < 0.5
