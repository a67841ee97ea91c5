"""Unicode script-mix signal + starvation-free priority aging."""

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.functions import text as TXT
from ospo_ghcrawler_spark.plans.selection import select_batch
from ospo_ghcrawler_spark.schemas import FRONTIER_SCHEMA


def test_script_mix_planted_rows(spark):
    docs = spark.createDataFrame(
        [
            (0, "hello world 123"),
            (1, "привет мир hello"),          # cyrillic 9 > latin 5
            (2, "漢字漢字 ok"),                # han 4 > latin 2
            (3, "αβγ abc"),                   # greek 3 == latin 3 -> latin (order)
            (4, "مرحبا"),
            (5, "!!! 42 ..."),                # digits only -> none
        ],
        "doc_id long, text string",
    )
    cnts = TXT.script_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            *[cnts[k].alias(k) for k in sorted(cnts)],
            TXT.main_script(F.col("text")).alias("main_script"),
        ).collect()
    }
    assert out[0]["n_latin"] == 10 and out[0]["n_digit"] == 3
    assert out[0]["main_script"] == "latin"
    assert out[1]["n_cyrillic"] == 9 and out[1]["main_script"] == "cyrillic"
    assert out[2]["n_han"] == 4 and out[2]["main_script"] == "han"
    assert out[3]["main_script"] == "latin"  # tie broken by SCRIPTS order
    assert out[4]["main_script"] == "arabic" and out[4]["n_arabic"] == 5
    assert out[5]["main_script"] == "none"


def _frontier(spark, rows):
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def _row(i, host, priority, enqueue_step):
    url = f"http://{host}/p{i}"
    return (url, hash(url), host, 0, priority, 0, 0, enqueue_step, 0, i, "default")


def test_priority_aging_promotes_weight_zero_tier(spark):
    """A weight-0 tier is NEVER popped without aging (reference QueueSet
    semantics); with aging, its requests promote one configured tier per k
    waiting supersteps and get service."""
    rows = [_row(i, "a.example", 0, 0) for i in range(4)] + [
        _row(10 + i, "b.example", 3, 0) for i in range(4)
    ]
    cfg_off = CrawlConfig(batch_size=4, host_budget=100, weights={0: 10, 3: 0})
    f = _frontier(spark, rows)
    budgets = spark.createDataFrame([], "host string, host_budget int")

    sel, n, _, _ = select_batch(f, budgets, cfg_off, step=9, min_host_budget=1000)
    assert {r["priority"] for r in sel.collect()} == {0} and n == 4

    cfg_on = CrawlConfig(
        batch_size=6, host_budget=100, weights={0: 10, 3: 0}, priority_age_every=5
    )
    # step 9: floor(9/5)=1 promotion -> tier 3 rows act as tier 0 (weight-0
    # tier becomes servable); FIFO order still ranks the older tier-0 seqs
    # first, so the batch is 4 native + 2 promoted. The stored priority
    # column is restored on the output.
    sel2, n2, _, _ = select_batch(f, budgets, cfg_on, step=9, min_host_budget=1000)
    got = sel2.collect()
    assert n2 == 6
    assert {r["priority"] for r in got} <= {0, 3}
    assert any(r["priority"] == 3 for r in got), "aged tier must get service"
    # determinism: same call twice -> same set
    sel3, _, _, _ = select_batch(f, budgets, cfg_on, step=9, min_host_budget=1000)
    assert {r["url"] for r in sel3.collect()} == {r["url"] for r in got}


def test_priority_aging_off_is_plan_identical(spark):
    rows = [_row(i, "a.example", 0, 0) for i in range(3)]
    f = _frontier(spark, rows)
    budgets = spark.createDataFrame([], "host string, host_budget int")
    cfg = CrawlConfig(batch_size=2, host_budget=100)
    sel, n, _, _ = select_batch(f, budgets, cfg, step=0, min_host_budget=1000)
    assert "_orig_priority" not in sel.columns and n == 2
