"""Driver-contract queries: every operator as (Spark callable, oracle SQL).

Each entry exercises one engine operator from SURVEY.md §2 on the driver's
fixed parquet tables so DuckDB can validate row-count + schema + value-hash
at sf=0.01 (see ``__spark_entry__.py``). Crawl-domain inputs (frontier,
politeness events, seen-set) are *derived deterministically from the TPC-H-ish
tables with SQL-expressible transforms*, so Spark and DuckDB compute the very
same input — no fixture files needed.

Conventions for oracle parity:
- every computed column aliased identically in both engines;
- doubles only from integer arithmetic or identically-ordered folds;
- ORDER BY is irrelevant (driver hashes order-insensitively) but ties in
  window ranks are always broken by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.functions import text as TXT
from ospo_ghcrawler_spark.functions import urls as U
from ospo_ghcrawler_spark.operators import curation as CU
from ospo_ghcrawler_spark.operators import dedup_docs as DD
from ospo_ghcrawler_spark.operators import events as EV
from ospo_ghcrawler_spark.operators import multimodal as MM
from ospo_ghcrawler_spark.operators import search as SR
from ospo_ghcrawler_spark.operators import similarity as SIM

# ---------------------------------------------------------------------------
# shared derivations
# ---------------------------------------------------------------------------

N_HOSTS = 40  # derived-frontier host fan
HOST_BUDGET = 5  # per-host selection budget (analog of token callCapLimit)
BATCH = 1000
WEIGHTS = {0: 10, 1: 3, 2: 2, 3: 3, 4: 2}  # reference crawlerFactory.js:80
TOTAL_W = sum(WEIGHTS.values())
SKEW_THRESHOLD = 200  # hot-host fanout threshold for the salting query
JACCARD_T = 0.8
HAMMING_K = 8
TOPK = 5
N_QUERIES = 20  # embedding query subset: vec_id < 20
SAMPLE_CAP = 40  # balanced-downsample cap per language stratum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → frontier rows (url, host, priority, enqueue_ts, seq, attempt).

    Mirrors the reference Request shape (routes/requests.js:65-81) with
    deterministic SQL-expressible arithmetic shared with the DuckDB oracle.
    """
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.concat(
            F.lit("http://host"),
            (F.col("o_custkey") % N_HOSTS).cast("string"),
            F.lit(".example/p"),
            F.col("o_orderkey").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("host"), (F.col("o_custkey") % N_HOSTS).cast("string"), F.lit(".example")
        ).alias("host"),
        (F.col("o_orderkey") % 5).cast("int").alias("priority"),
        F.col("o_orderdate").alias("enqueue_ts"),
        F.col("o_orderkey").alias("seq"),
        (F.col("o_orderkey") % 8).cast("int").alias("attempt"),
    )


DERIVED_FRONTIER_SQL = f"""
    SELECT 'http://host' || (o_custkey % {N_HOSTS}) || '.example/p' || o_orderkey AS url,
           'host' || (o_custkey % {N_HOSTS}) || '.example' AS host,
           CAST(o_orderkey % 5 AS INTEGER) AS priority,
           o_orderdate AS enqueue_ts,
           o_orderkey AS seq,
           CAST(o_orderkey % 8 AS INTEGER) AS attempt
    FROM orders
"""

# ---------------------------------------------------------------------------
# Q: crawl-shaped operators over driver tables
# ---------------------------------------------------------------------------


def q_frontier_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.1 Q2/Q10 — per-host politeness rank + weighted priority
    quota selection (fixed proportional quotas: batch*w/Σw)."""
    f = derived_frontier(spark, sf_dir)
    w_host = Window.partitionBy("host").orderBy("priority", "enqueue_ts", "seq")
    w_prio = Window.partitionBy("priority").orderBy("enqueue_ts", "seq")
    quota = F.when(F.col("priority") == 0, BATCH * WEIGHTS[0] // TOTAL_W)
    for p in range(1, 5):
        quota = quota.when(F.col("priority") == p, BATCH * WEIGHTS[p] // TOTAL_W)
    return (
        f.withColumn("host_rank", F.row_number().over(w_host))
        .filter(F.col("host_rank") <= HOST_BUDGET)
        .withColumn("prio_rank", F.row_number().over(w_prio))
        .filter(F.col("prio_rank") <= quota)
        .select("url", "host", "priority", "seq", "host_rank", "prio_rank")
    )


Q_FRONTIER_SELECTION_SQL = f"""
    WITH f AS ({DERIVED_FRONTIER_SQL}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY host ORDER BY priority, enqueue_ts, seq) AS host_rank
      FROM f
    ),
    budgeted AS (SELECT * FROM ranked WHERE host_rank <= {HOST_BUDGET}),
    prio AS (
      SELECT *, row_number() OVER (PARTITION BY priority ORDER BY enqueue_ts, seq) AS prio_rank
      FROM budgeted
    )
    SELECT url, host, priority, seq, host_rank, prio_rank
    FROM prio
    WHERE prio_rank <= CASE priority
        WHEN 0 THEN {BATCH * WEIGHTS[0] // TOTAL_W}
        WHEN 1 THEN {BATCH * WEIGHTS[1] // TOTAL_W}
        WHEN 2 THEN {BATCH * WEIGHTS[2] // TOTAL_W}
        WHEN 3 THEN {BATCH * WEIGHTS[3] // TOTAL_W}
        WHEN 4 THEN {BATCH * WEIGHTS[4] // TOTAL_W}
    END
"""


def q_politeness_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 R1 — fixed-window per-host counter (rate limiter):
    events bucketed into 1h tumbling windows per derived host."""
    e = _t(spark, sf_dir, "events")
    budget = 50
    return (
        e.select(
            F.concat(F.lit("h"), (F.col("user_id") % 16).cast("string")).alias("host"),
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
        )
        .groupBy("host", "window_start")
        .agg(F.count("*").alias("used"))
        .withColumn("budget", F.lit(budget))
        .withColumn("over", F.col("used") > budget)
    )


Q_POLITENESS_WINDOW_SQL = """
    SELECT 'h' || (user_id % 16) AS host,
           date_trunc('hour', ts) AS window_start,
           count(*) AS used,
           50 AS budget,
           count(*) > 50 AS over
    FROM events
    GROUP BY 1, 2
"""


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 R5 — windowed compute-budget accounting: consumed 'cost'
    (event value ≈ fetch latency) per host per day vs budget, with remaining
    and overage (computeLimiter.consume semantics)."""
    e = _t(spark, sf_dir, "events")
    budget = 2000.0
    return (
        e.select(
            F.concat(F.lit("h"), (F.col("user_id") % 16).cast("string")).alias("host"),
            F.date_trunc("day", F.col("ts")).alias("window_start"),
            F.col("value"),
        )
        .groupBy("host", "window_start")
        # sums of doubles are addition-order-sensitive; round to a 6-dp grid
        # so Spark's partial aggregation and DuckDB's sequential sum agree
        .agg(F.round(F.sum("value"), 6).alias("consumed"), F.min("value").alias("baseline"))
        .withColumn("remaining", F.round(F.greatest(F.lit(budget) - F.col("consumed"), F.lit(0.0)), 6))
        .withColumn("overage", F.round(F.greatest(F.col("consumed") - F.lit(budget), F.lit(0.0)), 6))
    )


Q_TOKEN_BUDGET_SQL = """
    SELECT 'h' || (user_id % 16) AS host,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           round(sum(value), 6) AS consumed,
           min(value) AS baseline,
           round(greatest(2000.0 - round(sum(value), 6), 0.0), 6) AS remaining,
           round(greatest(round(sum(value), 6) - 2000.0, 0.0), 6) AS overage
    FROM events
    GROUP BY 1, 2
"""


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.2 D2/D3 — tracker/seen dedup as a left-anti join: candidate
    urls (from lineitem partkeys) minus seen urls (parts with p_partkey%3=0)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cands = li.select(
        F.concat(F.lit("http://parts.example/p"), F.col("l_partkey").cast("string")).alias("url"),
        F.col("l_partkey").alias("key"),
    ).distinct()
    seen = p.filter(F.col("p_partkey") % 3 == 0).select(
        F.concat(F.lit("http://parts.example/p"), F.col("p_partkey").cast("string")).alias("url")
    )
    return cands.join(seen, "url", "left_anti").select("url", "key")


Q_SEEN_ANTIJOIN_SQL = """
    WITH cands AS (
      SELECT DISTINCT 'http://parts.example/p' || l_partkey AS url, l_partkey AS key
      FROM lineitem
    ),
    seen AS (
      SELECT 'http://parts.example/p' || p_partkey AS url FROM part WHERE p_partkey % 3 = 0
    )
    SELECT url, key FROM cands WHERE url NOT IN (SELECT url FROM seen)
"""


def q_attenuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.2 D1 — attenuation (recent-duplicate collapse): duplicate
    pushes of the same url within the window collapse to the first, counting
    the bounced copies (AttenuatedQueue semantics)."""
    li = _t(spark, sf_dir, "lineitem")
    pushes = li.select(
        F.concat(F.lit("http://parts.example/p"), F.col("l_partkey").cast("string")).alias("url"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("push_seq"),
    )
    return pushes.groupBy("url").agg(
        F.min("push_seq").alias("first_push_seq"),
        (F.count("*") - 1).alias("n_bounced"),
    )


Q_ATTENUATION_SQL = """
    SELECT 'http://parts.example/p' || l_partkey AS url,
           min(l_orderkey * 10 + l_linenumber) AS first_push_seq,
           count(*) - 1 AS n_bounced
    FROM lineitem
    GROUP BY 1
"""


def q_queue_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.1 Q8 — queue depth per priority with pop weight + quota."""
    f = derived_frontier(spark, sf_dir)
    w = F.when(F.col("priority") == 0, WEIGHTS[0])
    for p in range(1, 5):
        w = w.when(F.col("priority") == p, WEIGHTS[p])
    return (
        f.groupBy("priority")
        .agg(F.count("*").alias("depth"))
        .withColumn("weight", w.cast("int"))
        .withColumn("quota", (F.lit(BATCH) * F.col("weight") / F.lit(TOTAL_W)).cast("int"))
    )


Q_QUEUE_DEPTH_SQL = f"""
    WITH f AS ({DERIVED_FRONTIER_SQL})
    SELECT priority, count(*) AS depth,
           CAST(CASE priority WHEN 0 THEN 10 WHEN 1 THEN 3 WHEN 2 THEN 2
                              WHEN 3 THEN 3 WHEN 4 THEN 2 END AS INTEGER) AS weight,
           CAST({BATCH} * (CASE priority WHEN 0 THEN 10 WHEN 1 THEN 3 WHEN 2 THEN 2
                              WHEN 3 THEN 3 WHEN 4 THEN 2 END) / {TOTAL_W} AS INTEGER) AS quota
    FROM f GROUP BY priority
"""


def q_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5 S8 — dead-letter scan: requests at/over max attempts."""
    f = derived_frontier(spark, sf_dir)
    return (
        f.filter(F.col("attempt") >= 5)
        .select("url", "host", "attempt", "priority")
    )


Q_DEADLETTER_SQL = f"""
    WITH f AS ({DERIVED_FRONTIER_SQL})
    SELECT url, host, attempt, priority FROM f WHERE attempt >= 5
"""


def q_host_skew_salt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §4 skew-defeat — per-host frontier share and salt fan-out
    (hosts over the threshold get ceil(n/threshold) salts)."""
    f = derived_frontier(spark, sf_dir)
    return (
        f.groupBy("host")
        .agg(F.count("*").alias("n_urls"))
        .withColumn("hot", F.col("n_urls") > SKEW_THRESHOLD)
        .withColumn(
            "salt_fanout",
            F.when(
                F.col("n_urls") > SKEW_THRESHOLD,
                F.ceil(F.col("n_urls") / F.lit(SKEW_THRESHOLD)).cast("int"),
            ).otherwise(F.lit(1)),
        )
    )


Q_HOST_SKEW_SALT_SQL = f"""
    WITH f AS ({DERIVED_FRONTIER_SQL})
    SELECT host, count(*) AS n_urls,
           count(*) > {SKEW_THRESHOLD} AS hot,
           CAST(CASE WHEN count(*) > {SKEW_THRESHOLD}
                THEN ceil(count(*) / {SKEW_THRESHOLD}.0) ELSE 1 END AS INTEGER) AS salt_fanout
    FROM f GROUP BY host
"""


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.7 string fns — canonicalization of messy URLs (case, fragment)
    derived from orders; canonical = lower(strip fragment)."""
    o = _t(spark, sf_dir, "orders")
    messy = F.concat(
        F.lit("HTTP://Host"),
        (F.col("o_custkey") % N_HOSTS).cast("string"),
        F.lit(".Example/P"),
        F.col("o_orderkey").cast("string"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("#section")).otherwise(F.lit("")),
    )
    return o.select(
        F.col("o_orderkey").alias("key"),
        messy.alias("raw_url"),
        F.lower(F.substring_index(messy, "#", 1)).alias("canonical_url"),
    )


Q_URL_CANONICALIZE_SQL = f"""
    SELECT o_orderkey AS key,
           'HTTP://Host' || (o_custkey % {N_HOSTS}) || '.Example/P' || o_orderkey
             || (CASE WHEN o_orderkey % 3 = 0 THEN '#section' ELSE '' END) AS raw_url,
           lower(split_part('HTTP://Host' || (o_custkey % {N_HOSTS}) || '.Example/P' || o_orderkey
             || (CASE WHEN o_orderkey % 3 = 0 THEN '#section' ELSE '' END), '#', 1)) AS canonical_url
    FROM orders
"""


def q_delta_log_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5 S6 — hourly delta-log blob naming with per-hour sequence
    (deltaStore blob naming v1/YYYY/MM/DD/..._HH_seq)."""
    e = _t(spark, sf_dir, "events")
    hour = F.date_format("ts", "yyyy/MM/dd/HH")
    w = Window.partitionBy(hour).orderBy("event_id")
    return e.select(
        F.col("event_id"),
        F.concat(F.lit("v1/"), hour, F.lit("_"), (F.row_number().over(w) - 1).cast("string")).alias(
            "blob_name"
        ),
    )


Q_DELTA_LOG_NAMING_SQL = """
    SELECT event_id,
           'v1/' || strftime(ts, '%Y/%m/%d/%H') || '_' ||
             (row_number() OVER (PARTITION BY strftime(ts, '%Y/%m/%d/%H') ORDER BY event_id) - 1)
             AS blob_name
    FROM events
"""


def q_retry_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.3 — retry queue routing: failed event/immediate work
    re-enters at priority 1 ('immediate', crawlerFactory.js:678), others keep
    their queue; attempt increments; over-max goes to priority -1 (dead)."""
    f = derived_frontier(spark, sf_dir)
    return f.select(
        "url",
        "priority",
        "attempt",
        F.when(F.col("attempt") + 1 >= 5, F.lit(-1))
        .when(F.col("priority") <= 1, F.lit(1))
        .otherwise(F.col("priority"))
        .cast("int")
        .alias("retry_priority"),
        (F.col("attempt") + 1).cast("int").alias("next_attempt"),
    )


Q_RETRY_ROUTING_SQL = f"""
    WITH f AS ({DERIVED_FRONTIER_SQL})
    SELECT url, priority, attempt,
           CAST(CASE WHEN attempt + 1 >= 5 THEN -1
                     WHEN priority <= 1 THEN 1
                     ELSE priority END AS INTEGER) AS retry_priority,
           CAST(attempt + 1 AS INTEGER) AS next_attempt
    FROM f
"""


def q_policy_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 F3 — per-request traversal policy: each request carries a
    policy (reference routes/requests.js:79) whose depth ceiling gates edge
    expansion. Uses the engine's real policy_depth_col against the default
    CrawlConfig policy table ({'self': 0, 'shallow': 2}, max_depth 10)."""
    from ospo_ghcrawler_spark.config import CrawlConfig
    from ospo_ghcrawler_spark.plans.selection import policy_depth_col

    cfg = CrawlConfig()
    f = derived_frontier(spark, sf_dir)
    policy = (
        F.when(F.col("seq") % 3 == 0, F.lit("self"))
        .when(F.col("seq") % 3 == 1, F.lit("shallow"))
        .otherwise(F.lit("default"))
    )
    depth = (F.col("seq") % 7).cast("int")
    out = f.select(
        "url",
        policy.alias("policy"),
        depth.alias("depth"),
        policy_depth_col(policy, cfg).cast("int").alias("effective_max_depth"),
    )
    return out.withColumn(
        "expand_allowed", (F.col("depth") + 1) <= F.col("effective_max_depth")
    )


Q_POLICY_SCOPE_SQL = f"""
    WITH f AS ({DERIVED_FRONTIER_SQL}),
    p AS (
      SELECT url,
             CASE WHEN seq % 3 = 0 THEN 'self'
                  WHEN seq % 3 = 1 THEN 'shallow'
                  ELSE 'default' END AS policy,
             CAST(seq % 7 AS INTEGER) AS depth
      FROM f
    )
    SELECT url, policy, depth,
           CAST(CASE policy WHEN 'self' THEN 0 WHEN 'shallow' THEN 2
                ELSE 10 END AS INTEGER) AS effective_max_depth,
           depth + 1 <= (CASE policy WHEN 'self' THEN 0 WHEN 'shallow' THEN 2
                ELSE 10 END) AS expand_allowed
    FROM p
"""


def q_token_traits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 R3 — trait-matched credential pools (tokenFactory.getToken,
    /root/reference/providers/fetcher/tokenFactory.js:37-67): walk each
    request's desired trait sets in order; the FIRST set with any matching
    token (traits ⊇ desired) wins — unbenched tokens round-robin by request
    key; an all-benched pool yields its soonest restore (and STOPS the walk);
    no matching set at all yields null. Runs the engine's real assign_tokens
    over token/request dims derived from supplier/customer."""
    from ospo_ghcrawler_spark.operators.tokens import assign_tokens

    s = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 12)
    toks = s.select(
        F.concat(F.lit("t"), F.col("s_suppkey").cast("string")).alias("value"),
        F.when(
            F.col("s_suppkey") == 1,
            F.array(F.lit("public"), F.lit("admin"), F.lit("vip")),
        )
        .when(F.col("s_suppkey") % 3 == 0, F.array(F.lit("public")))
        .when(F.col("s_suppkey") % 3 == 1, F.array(F.lit("public"), F.lit("admin")))
        .otherwise(F.array(F.lit("private")))
        .alias("traits"),
        F.when(F.col("s_suppkey") % 4 == 1, F.lit(5)).cast("int").alias("bench_until"),
        F.lit(None).cast("int").alias("cap_per_step"),
    )
    c = _t(spark, sf_dir, "customer")
    m = F.col("c_custkey") % 4

    def _sets(*names: str):
        return F.array(*[F.array(F.lit(n)) for n in names])

    desired = (
        F.when(m == 0, _sets("public"))
        .when(m == 1, _sets("admin"))
        .when(m == 2, _sets("private", "public"))
        .otherwise(_sets("vip", "admin"))  # vip pool = {t1}, benched → wake 5
    )
    reqs = c.select(
        F.col("c_custkey").alias("url_hash"), desired.alias("desired_traits")
    )
    out = assign_tokens(reqs, toks, step=3)
    return out.select(F.col("url_hash").alias("req_id"), "token", "token_wake")


Q_TOKEN_TRAITS_SQL = """
    WITH toks AS (
      SELECT 't' || s_suppkey AS value,
             CASE WHEN s_suppkey = 1 THEN ['public','admin','vip']
                  WHEN s_suppkey % 3 = 0 THEN ['public']
                  WHEN s_suppkey % 3 = 1 THEN ['public','admin']
                  ELSE ['private'] END AS traits,
             CASE WHEN s_suppkey % 4 = 1 THEN 5 END AS bench_until
      FROM supplier WHERE s_suppkey <= 12
    ),
    want AS (
      SELECT c_custkey AS req_id, 0 AS rnk,
             CASE WHEN c_custkey % 4 = 0 THEN ['public']
                  WHEN c_custkey % 4 = 1 THEN ['admin']
                  WHEN c_custkey % 4 = 2 THEN ['private']
                  ELSE ['vip'] END AS want
      FROM customer
      UNION ALL
      SELECT c_custkey, 1,
             CASE WHEN c_custkey % 4 = 2 THEN ['public'] ELSE ['admin'] END
      FROM customer WHERE c_custkey % 4 IN (2, 3)
    ),
    matched AS (
      SELECT w.req_id, w.rnk, t.value, t.bench_until
      FROM want w JOIN toks t
        ON len(list_filter(w.want, x -> NOT list_contains(t.traits, x))) = 0
    ),
    pools AS (
      SELECT req_id, rnk,
             list_sort(coalesce(
               list(value) FILTER (WHERE coalesce(bench_until, -1) <= 3), []
             )) AS cands,
             min(bench_until) FILTER (WHERE bench_until > 3) AS min_bench
      FROM matched GROUP BY 1, 2
    ),
    first_pool AS (
      SELECT req_id, cands, min_bench,
             row_number() OVER (PARTITION BY req_id ORDER BY rnk) AS rn
      FROM pools
    ),
    assigned AS (
      SELECT req_id,
             CASE WHEN len(cands) > 0
                  THEN cands[CAST(req_id % len(cands) AS INT) + 1] END AS token,
             CASE WHEN len(cands) = 0 THEN min_bench END AS token_wake
      FROM first_pool WHERE rn = 1
    )
    SELECT c.c_custkey AS req_id, a.token, a.token_wake
    FROM customer c LEFT JOIN assigned a ON a.req_id = c.c_custkey
"""


def q_urn_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §1.1 — hierarchical URN identity + blob-path rewrite
    (storageDocStore.js:199-215) over derived URLs, via the real
    urn_col/urn_to_blob_path functions."""
    from ospo_ghcrawler_spark.functions.urls import urn_col, urn_to_blob_path

    f = derived_frontier(spark, sf_dir)
    urn = urn_col(F.col("url"))
    return f.select("url", urn.alias("urn"), urn_to_blob_path(urn).alias("blob_path"))


Q_URN_IDENTITY_SQL = f"""
    WITH f AS ({DERIVED_FRONTIER_SQL})
    SELECT url,
           'urn:' || host || ':p' || seq AS urn,
           'urn/' || host || '/p' || seq || '.json' AS blob_path
    FROM f
"""


def q_doc_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5 S3/S7 — doc-store get by url: the url→doc lookup is a
    (broadcastable) join of a small key set against the store."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    store = p.select(
        F.concat(F.lit("http://parts.example/p"), F.col("p_partkey").cast("string")).alias("url"),
        F.col("p_name").alias("doc"),
        F.md5(F.encode(F.col("p_name"), "UTF-8")).alias("etag"),
    )
    keys = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("http://parts.example/p"), F.col("l_partkey").cast("string")).alias("url")
        )
        .distinct()
    )
    return F.broadcast(keys).join(store, "url", "inner").select("url", "doc", "etag")


Q_DOC_LOOKUP_SQL = """
    WITH store AS (
      SELECT 'http://parts.example/p' || p_partkey AS url, p_name AS doc, md5(p_name) AS etag
      FROM part
    ),
    keys AS (
      SELECT DISTINCT 'http://parts.example/p' || l_partkey AS url
      FROM lineitem WHERE l_partkey % 50 = 0
    )
    SELECT k.url AS url, doc, etag FROM keys k JOIN store s ON k.url = s.url
"""


# ---------------------------------------------------------------------------
# D: training-data dedup / text analysis over documents
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.exact_duplicates(docs)


Q_DEDUP_EXACT_SQL = """
    SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY 1
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(docs, JACCARD_T)


_SHINGLE_SQL = """
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents)
      )
"""

Q_NGRAM_JACCARD_SQL = f"""
    WITH g AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY 1),
    common AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_T}
"""


CONTAIN_T = 0.5


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment pairs (Broder 1997): short-in-long
    embeddings that Jaccard structurally misses."""
    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_containment_pairs(docs, CONTAIN_T)


Q_NGRAM_CONTAINMENT_SQL = f"""
    WITH g AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY 1),
    common AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id,
           n_common / sa.n_sh AS containment_a_in_b,
           n_common / sb.n_sh AS containment_b_in_a,
           n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE greatest(n_common / sa.n_sh, n_common / sb.n_sh) >= {CONTAIN_T}
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard — oracle is the exact
    Jaccard pair set (LSH recall at this threshold/band count ≈ 0.9998,
    asserted equal on the fixed sf=0.01 corpus by tests)."""
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, JACCARD_T)


Q_MINHASH_LSH_SQL = Q_NGRAM_JACCARD_SQL


def q_oph_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation-hashing MinHash LSH pairs (operators/dedup_docs.py:
    oph_lsh_pairs — ONE hash per shingle vs 64 for the classic family;
    the fetch-time signature path). Oracle = the exact Jaccard pair set:
    precision 1.0 by the exact verify, recall on this fixed corpus
    measured 1.0 (pinned ≥0.95 by tests/test_text_and_dedup_docs.py)."""
    docs = _t(spark, sf_dir, "documents")
    return DD.oph_lsh_pairs(docs, JACCARD_T)


Q_OPH_MINHASH_LSH_SQL = Q_NGRAM_JACCARD_SQL


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (no SQL oracle — hash-dependent; rows-only).
    Banding uses max_hamming+1 chunks, so recall at HAMMING_K is exhaustive
    (pigeonhole; pinned by tests/test_dedup_docs.py)."""
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_pairs(docs, HAMMING_K)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TXT.token_count(t).alias("n_tokens"),
        TXT.distinct_token_count(t).alias("n_types"),
        TXT.punct_count(t).alias("n_punct"),
        F.length(t).alias("n_chars_actual"),
    )


Q_TOKEN_STATS_SQL = """
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
           len(list_distinct(regexp_extract_all(lower(text), '[A-Za-z0-9]+'))) AS n_types,
           len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
           length(text) AS n_chars_actual
    FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TXT.quality_score(F.col("text")).alias("quality"))


Q_QUALITY_SCORE_SQL = """
    WITH s AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tok,
             length(text) AS n_char,
             len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           least(n_stop / greatest(n_tok, 1) * 2, 1.0) * 0.5
           + (CASE WHEN n_char / greatest(n_tok, 1) BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN n_punct / greatest(n_char, 1) <= 0.1 THEN 0.2 ELSE 0.0 END) AS quality
    FROM s
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.col("lang").alias("label_lang"), TXT.lang_id(F.col("text")).alias("pred_lang")
    )


def _marker_sql(lang: str) -> str:
    pat = r"\b(" + "|".join(TXT.LANG_MARKERS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


Q_LANG_ID_SQL = f"""
    WITH s AS (
      SELECT doc_id, lang AS label_lang,
             {_marker_sql('de')} AS s_de, {_marker_sql('en')} AS s_en,
             {_marker_sql('es')} AS s_es, {_marker_sql('fr')} AS s_fr,
             {_marker_sql('it')} AS s_it
      FROM documents
    ),
    m AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_it) AS best FROM s)
    SELECT doc_id, label_lang,
           CASE WHEN best = 0 THEN 'und'
                WHEN s_de = best THEN 'de'
                WHEN s_en = best THEN 'en'
                WHEN s_es = best THEN 'es'
                WHEN s_fr = best THEN 'fr'
                ELSE 'it' END AS pred_lang
    FROM m
"""


def q_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact sentence dedup, keep-first semantics (sentence-
    granular paragraph_dedup variant; Lee et al. 2022 boilerplate)."""
    return CU.sentence_dedup(_t(spark, sf_dir, "documents"))


Q_SENTENCE_DEDUP_SQL = CU.SENTENCE_DEDUP_SQL


def q_robots_decide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 full matching (functions/robots.py:robots_decide): Allow/
    Disallow patterns with `*` wildcards and `$` anchors, longest-match
    arbitration with Allow winning ties. Rules + urls synthesized
    deterministically from supplier/part keys; the oracle restates the
    regex compilation and the 2·len+is_allow arbitration score in SQL."""
    from ospo_ghcrawler_spark.functions.robots import robots_decide

    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    host = F.concat(F.lit("h"), k.cast("string"))

    def rule(cond, is_allow, pat):
        return s.filter(cond).select(
            host.alias("host"), F.lit(is_allow).alias("is_allow"), F.lit(pat).alias("pattern")
        )

    rules = (
        rule(F.lit(True), False, "/private/")
        .unionByName(rule(k % 2 == 0, True, "/private/public"))
        .unionByName(rule(k % 3 == 0, False, "/files/*.pdf$"))
        .unionByName(rule(k % 3 == 0, True, "/files/ok.pdf$"))
        .unionByName(rule(k % 4 == 0, False, "/*?sid="))
        .unionByName(rule(k % 5 == 0, True, "/a"))
        .unionByName(rule(k % 5 == 0, False, "/a"))
    )
    mx = s.agg(F.max("s_suppkey").alias("mx"))
    p = _t(spark, sf_dir, "part").crossJoin(F.broadcast(mx))
    pk = F.col("p_partkey")
    m = pk % 8
    path = (
        F.when(m == 0, "/private/secret")
        .when(m == 1, "/private/public/x")
        .when(m == 2, "/files/doc.pdf")
        .when(m == 3, "/files/doc.pdf.html")
        .when(m == 4, "/files/ok.pdf")
        .when(m == 5, "/a/b")
        .when(m == 6, "/page?sid=9")
        .otherwise("/open")
    )
    urls = p.select(
        pk.alias("url_id"),
        F.concat(F.lit("h"), (1 + pk % F.col("mx")).cast("string")).alias("host"),
        path.alias("path"),
    )
    return robots_decide(urls, rules).select("url_id", "host", "path", "allowed")


Q_ROBOTS_DECIDE_SQL = r"""
    WITH rules0 AS (
      SELECT 'h' || CAST(s_suppkey AS VARCHAR) AS host, FALSE AS is_allow,
             '/private/' AS pattern FROM supplier
      UNION ALL SELECT 'h' || CAST(s_suppkey AS VARCHAR), TRUE, '/private/public'
        FROM supplier WHERE s_suppkey % 2 = 0
      UNION ALL SELECT 'h' || CAST(s_suppkey AS VARCHAR), FALSE, '/files/*.pdf$'
        FROM supplier WHERE s_suppkey % 3 = 0
      UNION ALL SELECT 'h' || CAST(s_suppkey AS VARCHAR), TRUE, '/files/ok.pdf$'
        FROM supplier WHERE s_suppkey % 3 = 0
      UNION ALL SELECT 'h' || CAST(s_suppkey AS VARCHAR), FALSE, '/*?sid='
        FROM supplier WHERE s_suppkey % 4 = 0
      UNION ALL SELECT 'h' || CAST(s_suppkey AS VARCHAR), TRUE, '/a'
        FROM supplier WHERE s_suppkey % 5 = 0
      UNION ALL SELECT 'h' || CAST(s_suppkey AS VARCHAR), FALSE, '/a'
        FROM supplier WHERE s_suppkey % 5 = 0
    ),
    rules AS (
      SELECT host,
             2 * strlen(pattern) + CAST(is_allow AS INT) AS score,
             '^' || replace(
                      regexp_replace(
                        CASE WHEN pattern LIKE '%$'
                             THEN substr(pattern, 1, length(pattern) - 1)
                             ELSE pattern END,
                        '([.\[\](){}+?^$|\\*])', '\\\1', 'g'),
                      '\*', '.*')
                 || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS regex
      FROM rules0
    ),
    mx AS (SELECT max(s_suppkey) AS mx FROM supplier),
    urls AS (
      SELECT p_partkey AS url_id,
             'h' || CAST(1 + p_partkey % mx AS VARCHAR) AS host,
             CASE p_partkey % 8
               WHEN 0 THEN '/private/secret'
               WHEN 1 THEN '/private/public/x'
               WHEN 2 THEN '/files/doc.pdf'
               WHEN 3 THEN '/files/doc.pdf.html'
               WHEN 4 THEN '/files/ok.pdf'
               WHEN 5 THEN '/a/b'
               WHEN 6 THEN '/page?sid=9'
               ELSE '/open' END AS path
      FROM part, mx
    ),
    sel AS (
      SELECT u.url_id, u.host, u.path,
             max(CASE WHEN regexp_matches(u.path, r.regex) THEN r.score END) AS best
      FROM urls u LEFT JOIN rules r USING (host)
      GROUP BY 1, 2, 3
    )
    SELECT url_id, host, path, COALESCE(best % 2 = 1, TRUE) AS allowed FROM sel
"""


def q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization audit via Arrow-batched pandas UDF (Spark
    SQL has no normalize builtin); DuckDB oracle = nfc_normalize()."""
    return CU.nfc_normalize(_t(spark, sf_dir, "documents"))


Q_NFC_NORMALIZE_SQL = CU.NFC_NORMALIZE_SQL


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus rollup: docs/tokens/chars/langs/sources."""
    return CU.corpus_stats(_t(spark, sf_dir, "documents"))


Q_CORPUS_STATS_SQL = CU.CORPUS_STATS_SQL


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script mix per document: per-script character counts (Java
    \\p{IsX} script properties), digit/total counts, and the dominant-script
    label — zero-shuffle JVM regexp projections riding the scan. The signal
    lang-id n-grams can't give (mixed-script spam, wrong-script injection)."""
    docs = _t(spark, sf_dir, "documents")
    cnts = TXT.script_counts(F.col("text"))
    return docs.select(
        "doc_id",
        *[cnts[k].cast("long").alias(k) for k in sorted(cnts)],
        TXT.main_script(F.col("text")).alias("main_script"),
    )


def _script_cnt_sql(s: str) -> str:
    return f"len(regexp_extract_all(text, '\\p{{{s}}}'))"


Q_SCRIPT_MIX_SQL = f"""
    WITH s AS (
      SELECT doc_id,
             {_script_cnt_sql('Latin')} AS n_latin,
             {_script_cnt_sql('Cyrillic')} AS n_cyrillic,
             {_script_cnt_sql('Greek')} AS n_greek,
             {_script_cnt_sql('Arabic')} AS n_arabic,
             {_script_cnt_sql('Han')} AS n_han,
             len(regexp_extract_all(text, '[0-9]')) AS n_digit,
             length(text) AS n_chars
      FROM documents
    ),
    m AS (SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_han) AS best FROM s)
    SELECT doc_id,
           CAST(n_arabic AS BIGINT) AS n_arabic,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
           CAST(n_digit AS BIGINT) AS n_digit,
           CAST(n_greek AS BIGINT) AS n_greek,
           CAST(n_han AS BIGINT) AS n_han,
           CAST(n_latin AS BIGINT) AS n_latin,
           CASE WHEN best = 0 THEN 'none'
                WHEN n_latin = best THEN 'latin'
                WHEN n_cyrillic = best THEN 'cyrillic'
                WHEN n_greek = best THEN 'greek'
                WHEN n_arabic = best THEN 'arabic'
                ELSE 'han' END AS main_script
    FROM m
"""


def q_badwords_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter: token-granular badword occurrence count +
    keep verdict, zero shuffle (stand-in blocklist; the real C4 list is a
    parameter drop-in)."""
    return CU.badwords_filter(_t(spark, sf_dir, "documents"))


Q_BADWORDS_FILTER_SQL = CU.badwords_sql()


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals per doc: top 2-gram token fraction +
    duplicate 3-gram token fraction, one shared gram shuffle."""
    return CU.doc_repetition(_t(spark, sf_dir, "documents"))


Q_DOC_REPETITION_SQL = CU.doc_repetition_sql()


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail per-language perplexity terciles over the
    self-scored unigram LM."""
    return SR.ccnet_buckets(_t(spark, sf_dir, "documents"))


Q_CCNET_BUCKETS_SQL = SR.CCNET_BUCKETS_SQL


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier (fastText inference shape,
    deterministic stand-in weights): per-doc centered mean weight + the
    keep verdict a model-based filter stage would apply. Zero shuffle —
    tokenize/hash/fold are JVM array expressions riding the scan."""
    docs = _t(spark, sf_dir, "documents")
    score = TXT.classifier_score(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(TXT.tokens(F.lower(F.col("text")))).alias("n_terms"),
        score.alias("score9"),
        F.coalesce(score > 0, F.lit(False)).alias("keep"),
    )


Q_CLASSIFIER_SCORE_SQL = f"""
    WITH t AS (
      SELECT doc_id, {TXT.classifier_sql_expr()} AS ms FROM documents
    )
    SELECT doc_id,
           len(ms) AS n_terms,
           CASE WHEN len(ms) > 0
                THEN round((CAST(list_sum(ms) AS DOUBLE) / len(ms)) / 104729 - 0.5, 9)
           END AS score9,
           COALESCE(CASE WHEN len(ms) > 0
                THEN round((CAST(list_sum(ms) AS DOUBLE) / len(ms)) / 104729 - 0.5, 9)
           END > 0, FALSE) AS keep
    FROM t
"""


# The clusters and keep-best queries share the expensive prefix (LSH
# candidate generation -> verified pairs -> hash-min label propagation):
# materialize it once per sf_dir and feed both, so running the pair of
# queries pays for the iterative loop exactly once (VERDICT r3 #2). The
# pair set is localCheckpoint-pinned so both consumers read the SAME
# materialized pairs; labels come pre-checkpointed from neardup_labels.
_NEARDUP_SHARED: dict[tuple[int, str], tuple[DataFrame, DataFrame]] = {}


def clear_neardup_cache() -> None:
    """Drop the shared neardup prefix. bench.py calls this between timed
    queries (alongside catalog.clearCache) so per-query timings stay
    cold-path honest — localCheckpoint-pinned RDDs survive clearCache and
    would hand the second of clusters/keep-best its expensive LSH+label
    prefix for free (ADVICE r4)."""
    _NEARDUP_SHARED.clear()


def _neardup_shared(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    # keyed by (session, sf_dir): a localCheckpoint-pinned DataFrame is
    # bound to the SparkSession that made it — a new session in the same
    # process (or a regenerated dataset) must not resurrect stale plans
    key = (id(spark), sf_dir)
    hit = _NEARDUP_SHARED.get(key)
    if hit is not None:
        return hit
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(docs, JACCARD_T).localCheckpoint()
    labels = DD.neardup_labels(pairs)
    _NEARDUP_SHARED[key] = (pairs, labels)
    return pairs, labels


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over near-dup pairs: every doc labeled with the
    min doc_id of its component (keep iff cluster_rep == doc_id). Spark side
    runs the scale path (LSH candidates → verified pairs → hash-min label
    propagation); the oracle computes the same from exact Jaccard pairs via a
    recursive transitive closure — tractable only at small SF."""
    docs = _t(spark, sf_dir, "documents")
    pairs, labels = _neardup_shared(spark, sf_dir)
    return DD.neardup_clusters(docs, pairs, labels=labels)


Q_NEARDUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE g AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY 1),
    common AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a_id, b_id FROM common
      JOIN sizes sa ON sa.doc_id = a_id
      JOIN sizes sb ON sb.doc_id = b_id
      WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_T}
    ),
    e AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
    )
    SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_rep
    FROM reach GROUP BY a
"""


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus maintenance: near-dups of a new crawl batch
    (doc_id ≡ 0 mod 7 stands in for the increment) against the existing
    corpus (the rest) — cross-sided band join, never corpus × corpus
    (operators/dedup_docs.py:incremental_neardup_pairs). Oracle = the exact
    cross-set Jaccard pairs; LSH recall at this threshold/band count is
    ≈ 0.9998 per pair and measured 1.0 on this fixed corpus (the pair set
    is a subset of the minhash_lsh oracle's, which is hash-green)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    return DD.incremental_neardup_pairs(corpus, batch, JACCARD_T)


Q_INCREMENTAL_NEARDUP_SQL = f"""
    WITH g AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY 1),
    common AS (
      SELECT a.doc_id AS corpus_id, b.doc_id AS batch_id, count(*) AS n_common
      FROM g a JOIN g b ON a.shingle = b.shingle
      WHERE a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
      GROUP BY 1, 2
    )
    SELECT corpus_id, batch_id,
           n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = corpus_id
    JOIN sizes sb ON sb.doc_id = batch_id
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_T}
"""


def q_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST near-dup pruning: per cluster, keep the longest variant
    (n_chars, tie-break min doc_id) instead of the smallest id — the
    representative choice real pipelines make (keep the richest copy of a
    duplicated source document). Spark side = LSH pairs → hash-min
    components → one window over the paired subgraph; oracle = recursive
    transitive closure + the same argmax."""
    docs = _t(spark, sf_dir, "documents")
    pairs, labels = _neardup_shared(spark, sf_dir)
    return DD.neardup_keep_best(docs, pairs, "n_chars", labels=labels)


Q_NEARDUP_KEEP_BEST_SQL = f"""
    WITH RECURSIVE g AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY 1),
    common AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a_id, b_id FROM common
      JOIN sizes sa ON sa.doc_id = a_id
      JOIN sizes sb ON sb.doc_id = b_id
      WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_T}
    ),
    e AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
    ),
    labels AS (
      SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_rep
      FROM reach GROUP BY a
    )
    SELECT l.doc_id, l.cluster_rep,
           row_number() OVER (
             PARTITION BY l.cluster_rep ORDER BY d.n_chars DESC, l.doc_id
           ) = 1 AS keep
    FROM labels l JOIN documents d ON d.doc_id = l.doc_id
"""


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style corpus-cleaning pipeline composed from the text operators:
    language filter (n-gram lang-id == 'en') → quality-score threshold →
    exact-dedup keeping the lowest doc_id per text. One declarative plan —
    the scan is pruned to (doc_id, text), the only shuffle is the dedup
    window, and every stage is JVM expressions."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        TXT.lang_id(F.col("text")).alias("pred_lang"),
        TXT.quality_score(F.col("text")).alias("quality"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_md5"),
    ).filter((F.col("pred_lang") == "en") & (F.col("quality") >= 0.5))
    w = Window.partitionBy("text_md5").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "quality")
    )


Q_CLEAN_CORPUS_SQL = f"""
    WITH s AS (
      SELECT doc_id, text, md5(text) AS text_md5,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tok,
             length(text) AS n_char,
             len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) AS n_stop,
             {_marker_sql('de')} AS s_de, {_marker_sql('en')} AS s_en,
             {_marker_sql('es')} AS s_es, {_marker_sql('fr')} AS s_fr,
             {_marker_sql('it')} AS s_it
      FROM documents
    ),
    scored AS (
      SELECT doc_id, text_md5,
             least(n_stop / greatest(n_tok, 1) * 2, 1.0) * 0.5
             + (CASE WHEN n_char / greatest(n_tok, 1) BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN n_punct / greatest(n_char, 1) <= 0.1 THEN 0.2 ELSE 0.0 END) AS quality,
             greatest(s_de, s_en, s_es, s_fr, s_it) AS best, s_en, s_de, s_es, s_fr
      FROM s
    ),
    kept AS (
      -- pred_lang = 'en' iff best > 0, s_de loses the tie-break (it precedes
      -- 'en' in the CASE order) and s_en hits the max; es/fr/it come after
      SELECT doc_id, text_md5, quality FROM scored
      WHERE best > 0 AND s_en = best AND s_de <> best
        AND quality >= 0.5
    )
    SELECT doc_id, quality FROM (
      SELECT doc_id, quality,
             row_number() OVER (PARTITION BY text_md5 ORDER BY doc_id) AS rn
      FROM kept
    ) WHERE rn = 1
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced downsample (training-data curation: cap every
    stratum so no language/domain dominates the mix): rank docs inside each
    lang by a stable id hash and keep the first SAMPLE_CAP. No RNG — the
    sample is identical at any parallelism and in the DuckDB oracle. At
    scale this is one shuffle (the per-stratum window)."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_CAP)
        .select("doc_id", "lang", "rk")
    )


Q_SAMPLE_STRATIFIED_SQL = f"""
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {SAMPLE_CAP}
"""


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10): the id hashes to
    a stable bucket, so the split is reproducible at any parallelism, on
    any engine, and STABLE UNDER CORPUS GROWTH — a doc's split never
    changes when neighbors are added/removed (the property random shuffles
    lack and training pipelines need for incremental corpus refreshes).
    Zero shuffle: pure projection riding the scan."""
    docs = _t(spark, sf_dir, "documents")
    b = (
        F.conv(
            F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 4),
            16,
            10,
        ).cast("int")
        % 10
    )
    return docs.select(
        "doc_id",
        b.alias("bucket10"),
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test").alias("split"),
    )


Q_TRAIN_SPLIT_SQL = """
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                % 10 AS INTEGER) AS bucket10,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 10 < 8
                  THEN 'train'
                WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 10 = 8
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TXT.fingerprint(F.col("text")).alias("fp"))


Q_FINGERPRINT_SQL = """
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
"""


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (MOSS), exploded to
    (doc_id, gram_md5) rows for driver hashability — docs sharing a
    fingerprint share a char-8-gram run."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    fps = TXT.winnow_fingerprints(F.col("text"), k=8, w=4)
    return docs.select("doc_id", F.explode(fps).alias("gram_md5"))


def q_winnow_fingerprint_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 winnowing (production variant): same gram boundaries and
    window mechanics as winnow_fingerprint, one 64-bit mix per gram instead
    of an md5 digest. Hash-dependent values → rows-only driver check; the
    machinery equivalence to the md5 variant is pinned by
    tests/test_text_and_dedup_docs.py (fast path run WITH md5 ≡ oracle
    path)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    fps = TXT.winnow_fingerprints_fast(F.col("text"), k=8, w=4)
    return docs.select("doc_id", F.explode(fps).alias("gram_hash"))


Q_WINNOW_FINGERPRINT_SQL = """
    WITH g AS (
      SELECT doc_id,
             [md5(substr(text, CAST(i AS INT), 8)) FOR i IN generate_series(1, length(text) - 7)] AS grams
      FROM documents WHERE doc_id < 64
    ),
    w AS (
      SELECT doc_id,
             list_distinct([
               list_min(grams[CAST(j AS INT):CAST(j + 3 AS INT)])
               FOR j IN generate_series(1, len(grams) - 3)
             ]) AS fps
      FROM g WHERE len(grams) >= 4
    )
    SELECT doc_id, unnest(fps) AS gram_md5 FROM w
"""


# ---------------------------------------------------------------------------
# CU: corpus curation (repeated-ngram dedup, decontamination, PII, tf-idf)
# ---------------------------------------------------------------------------

NGRAM_N = 5  # repeated-ngram window (word tokens)
DECON_N = 8  # decontamination gram width
EVAL_MOD = 17  # doc_id % EVAL_MOD == 0 → held-out eval set

_GRAM_SQL = """
      SELECT doc_id, i AS start,
             array_to_string(list_slice(w, i, i + {last}), ' ') AS gram
      FROM (
        SELECT doc_id, w,
               unnest(range(1, greatest(len(w) - {n} + 2, 1))) AS i
        FROM (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS w
              FROM documents)
      )
"""


def q_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated word n-grams (Lee et al. 2022 detection
    pass): gram → (distinct-doc frequency, total occurrences), kept when it
    appears in ≥2 documents."""
    docs = _t(spark, sf_dir, "documents")
    return CU.repeated_ngrams(docs, n=NGRAM_N, min_docs=2)


Q_REPEATED_NGRAMS_SQL = f"""
    WITH g AS ({_GRAM_SQL.format(n=NGRAM_N, last=NGRAM_N - 1)})
    SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
    FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
"""


def q_repeated_ngram_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-ngram REMOVAL (Lee et al. 2022): drop every token covered
    by a cross-document duplicated n-gram; result is hash-compared via the
    md5 of the surviving token stream."""
    docs = _t(spark, sf_dir, "documents")
    return CU.repeated_ngram_scrub(docs, n=NGRAM_N, min_docs=2)


Q_REPEATED_NGRAM_SCRUB_SQL = f"""
    WITH g AS ({_GRAM_SQL.format(n=NGRAM_N, last=NGRAM_N - 1)}),
    dup AS (
      SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    ),
    ss AS (
      SELECT g.doc_id, list(g.start) AS starts
      FROM g JOIN dup USING (gram) GROUP BY g.doc_id
    ),
    toks AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS w
             FROM documents),
    scrub AS (
      SELECT t.doc_id,
             list_filter(
               range(1, len(w) + 1),
               p -> len(list_filter(coalesce(starts, []),
                                    s -> s <= p AND p < s + {NGRAM_N})) = 0
             ) AS kept,
             w
      FROM toks t LEFT JOIN ss ON ss.doc_id = t.doc_id
    )
    SELECT doc_id,
           -- DuckDB array_to_string(...) is NULL on an empty list; Spark
           -- array_join gives '' — coalesce for the fully-scrubbed case
           md5(coalesce(
             array_to_string(list_transform(kept, p -> w[CAST(p AS INT)]), ' '),
             '')) AS clean_md5,
           len(kept)::BIGINT AS n_tokens_kept,
           (len(w) - len(kept))::BIGINT AS n_tokens_removed
    FROM scrub
"""


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-corpus paragraph dedup (keep first occurrence
    corpus-wide) at 3-word-chunk granularity — the dedup-semantics
    complement to repeated_ngram_scrub's removal semantics."""
    docs = _t(spark, sf_dir, "documents")
    return CU.paragraph_dedup(docs, width=3)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination flags: training docs sharing a word
    {DECON_N}-gram with the held-out set (doc_id % EVAL_MOD == 0), with the
    count of distinct contaminated grams."""
    docs = _t(spark, sf_dir, "documents")
    return CU.decontaminate(docs, n=DECON_N, eval_mod=EVAL_MOD)


Q_DECONTAMINATE_SQL = f"""
    WITH g AS ({_GRAM_SQL.format(n=DECON_N, last=DECON_N - 1)}),
    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = 0),
    tr AS (SELECT doc_id, gram FROM g WHERE doc_id % {EVAL_MOD} != 0)
    SELECT doc_id, count(DISTINCT tr.gram) AS n_contaminated_grams
    FROM tr JOIN ev USING (gram) GROUP BY doc_id
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails/IPv4s/phones → tokens) as a zero-shuffle JVM
    projection; the synthetic corpus contains no PII, so the oracle checks
    regex-dialect parity on the identity path while
    tests/test_curation.py pins the redaction behavior on planted PII."""
    docs = _t(spark, sf_dir, "documents")
    return CU.pii_scrub(docs)


Q_PII_SCRUB_SQL = f"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '{CU.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{CU.PII_IPV4_RE}', '<IP>', 'g'),
                 '{CU.PII_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5,
           (len(regexp_extract_all(text, '{CU.PII_EMAIL_RE}'))
            + len(regexp_extract_all(text, '{CU.PII_IPV4_RE}'))
            + len(regexp_extract_all(text, '{CU.PII_PHONE_RE}')))::BIGINT
             AS n_redactions
    FROM documents
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-5 terms by tf-idf-style score (corpus-composition
    analysis); idf is the exact rational n_sources/df so the score is
    bit-deterministic across engines."""
    docs = _t(spark, sf_dir, "documents")
    return CU.tfidf_top_terms(docs, top_k=TOPK)


Q_TFIDF_TOP_TERMS_SQL = f"""
    WITH terms AS (
      SELECT source, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS term
      FROM documents
    ),
    tf AS (SELECT source, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT source) AS df FROM tf GROUP BY 1),
    nsrc AS (SELECT count(DISTINCT source) AS n FROM documents),
    scored AS (
      SELECT source, term, tf * (SELECT CAST(n AS DOUBLE) FROM nsrc) / df AS score
      FROM tf JOIN dfreq USING (term)
    )
    SELECT source, term, score, rk FROM (
      SELECT source, term, score,
             row_number() OVER (PARTITION BY source ORDER BY score DESC, term ASC) AS rk
      FROM scored
    ) WHERE rk <= {TOPK}
"""


SHARD_BUDGET_TOKENS = 2000  # tokens per training shard (packing query)


def q_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing in doc_id order — the Spark side is a
    two-level prefix sum (bucketed window + broadcast offsets, see
    operators/curation.py:shard_pack); the oracle is the textbook global
    window cumsum, which DuckDB can afford at sf0.01."""
    docs = _t(spark, sf_dir, "documents")
    return CU.shard_pack(docs, SHARD_BUDGET_TOKENS)


Q_SHARD_PACK_SQL = f"""
    SELECT doc_id, n_tokens,
           CAST(FLOOR(
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / {SHARD_BUDGET_TOKENS}.0
           ) AS INTEGER) AS shard_id
    FROM (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens
      FROM documents
    )
"""


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, source) composition report for training-mix design."""
    docs = _t(spark, sf_dir, "documents")
    return CU.corpus_mix(docs)


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language temperature-sampling weights (α=0.5) for training-mix
    construction: rare languages get samp_weight > 1, dominant ones < 1."""
    docs = _t(spark, sf_dir, "documents")
    return CU.temperature_mix(docs, by="lang")


Q_MIX_WEIGHTS_SQL = CU.TEMPERATURE_MIX_SQL


Q_CORPUS_MIX_SQL = """
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS total_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS doc_share
    FROM documents GROUP BY 1, 2
"""


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang doc-length quantile report (p25/p50/p75/p90) — the length
    statistics a filtering stage tunes its thresholds from. One map-side-
    combined groupBy; Spark's exact `percentile` and DuckDB's
    `quantile_cont` share the linear-interpolation definition, rounded to
    6 decimals in both engines."""
    docs = _t(spark, sf_dir, "documents")
    g = docs.select("lang", F.length("text").alias("n_char")).groupBy("lang")
    agg = g.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(n_char, array(0.25D, 0.5D, 0.75D, 0.9D))").alias("q"),
    )
    return agg.select(
        "lang",
        "n_docs",
        F.round(F.col("q").getItem(0), 6).alias("p25"),
        F.round(F.col("q").getItem(1), 6).alias("p50"),
        F.round(F.col("q").getItem(2), 6).alias("p75"),
        F.round(F.col("q").getItem(3), 6).alias("p90"),
    )


Q_LENGTH_QUANTILES_SQL = """
    SELECT lang, count(*) AS n_docs,
           round(quantile_cont(length(text), 0.25), 6) AS p25,
           round(quantile_cont(length(text), 0.50), 6) AS p50,
           round(quantile_cont(length(text), 0.75), 6) AS p75,
           round(quantile_cont(length(text), 0.90), 6) AS p90
    FROM documents GROUP BY lang
"""


def q_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT index keys (functions/urls.py:surt_col) — the Common-Crawl CDX
    sort key, over messy synthesized urls (mixed case, www, :80 ports,
    unsorted queries, fragments)."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    messy = F.concat(
        F.lit("http://www.Host"),
        (F.col("o_custkey") % N_HOSTS).cast("string"),
        F.lit(".Example"),
        F.when(k % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/P"),
        k.cast("string"),
        F.when(
            k % 3 == 0,
            F.concat(F.lit("?z=1&a="), (F.col("o_custkey") % 5).cast("string")),
        )
        .when(k % 3 == 1, F.lit("#frag"))
        .otherwise(F.lit("")),
    )
    return o.select(
        k.alias("key"),
        messy.alias("url"),
        U.surt_col(messy).alias("surt"),
    )


Q_SURT_KEYS_SQL = f"""
    WITH u AS (
      SELECT o_orderkey AS key,
             'http://www.Host' || (o_custkey % {N_HOSTS}) || '.Example'
             || (CASE WHEN o_orderkey % 2 = 0 THEN ':80' ELSE '' END)
             || '/P' || o_orderkey
             || (CASE WHEN o_orderkey % 3 = 0 THEN '?z=1&a=' || (o_custkey % 5)
                      WHEN o_orderkey % 3 = 1 THEN '#frag'
                      ELSE '' END) AS url
      FROM orders
    ),
    t AS (
      SELECT key, url,
             substr(split_part(url, '#', 1), instr(url, '://') + 3) AS after
      FROM u
    ),
    v AS (
      SELECT key, url,
             split_part(after, '/', 1) AS authority,
             substr(after, length(split_part(after, '/', 1)) + 1) AS pathq
      FROM t
    ),
    w AS (
      SELECT key, url, pathq,
             CASE WHEN lower(split_part(authority, ':', 1)) LIKE 'www.%'
                  THEN substr(lower(split_part(authority, ':', 1)), 5)
                  ELSE lower(split_part(authority, ':', 1)) END AS host,
             split_part(pathq, '?', 1) AS rawpath,
             CASE WHEN instr(pathq, '?') > 0
                  THEN substr(pathq, instr(pathq, '?') + 1) END AS query
      FROM v
    )
    SELECT key, url,
           array_to_string(list_reverse(string_split(host, '.')), ',') || ')'
           || (CASE WHEN query IS NOT NULL AND length(query) > 0
                    THEN (CASE WHEN length(rawpath) > 0 THEN rawpath ELSE '/' END)
                         || '?' || array_to_string(list_sort(string_split(query, '&')), '&')
                    ELSE (CASE WHEN length(rawpath) > 0 THEN rawpath ELSE '/' END) END)
             AS surt
    FROM w
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule document filter (Rae et al. 2021 §A.1.1): per-doc word
    count, mean word length, alphabetic-word fraction, stopword hits,
    symbol count, and the keep/drop verdict. Pure JVM projections, zero
    shuffle — the scan is pruned to (doc_id, text) and every stat is one
    regex pass (see functions/text.py:gopher_stats for why sum_word_len and
    n_alpha_words avoid token explosion entirely)."""
    docs = _t(spark, sf_dir, "documents")
    s = TXT.gopher_stats(F.col("text"))
    return docs.select(
        "doc_id",
        s["n_words"].alias("n_words"),
        s["mean_word_len"].alias("mean_word_len"),
        s["alpha_frac"].alias("alpha_frac"),
        s["n_stop"].alias("n_stop"),
        s["n_symbols"].alias("n_symbols"),
        TXT.gopher_passes(s).alias("keep"),
    )


Q_GOPHER_QUALITY_SQL = f"""
    WITH s AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{TXT.WORD_RE}')) AS n_words,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS sum_len,
             len(regexp_extract_all(text, '{TXT.ALPHA_TOKEN_RE}')) AS n_alpha,
             len(regexp_extract_all(lower(text),
                 '\\b(the|and|of|to|is)\\b')) AS n_stop,
             len(regexp_extract_all(text, '(#|\\.\\.\\.)')) AS n_symbols
      FROM documents
    )
    SELECT doc_id, n_words,
           sum_len / greatest(n_words, 1) AS mean_word_len,
           n_alpha / greatest(n_words, 1) AS alpha_frac,
           n_stop, n_symbols,
           (n_words BETWEEN 20 AND 100000)
             AND sum_len / greatest(n_words, 1) BETWEEN 3.0 AND 10.0
             AND n_alpha / greatest(n_words, 1) >= 0.7
             AND n_stop >= 1
             AND n_symbols / greatest(n_words, 1) <= 0.1 AS keep
    FROM s
"""


def q_warc_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/1.0 response-record headers (the Common-Crawl container
    format) for every document — the export shape a downstream archive
    ingests. Record IDs are deterministic (md5 of the target URI — CC uses
    uuid4; determinism is what makes this oracle-able), dates derive from
    doc_id, CRLF line endings per the WARC spec. Pure JVM projection, zero
    shuffle: the formatter rides the corpus scan for free at any scale."""
    docs = _t(spark, sf_dir, "documents")
    uri = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example/doc/"),
        F.col("doc_id").cast("string"),
    )
    warc_date = F.date_format(
        F.expr("timestampadd(SECOND, doc_id, timestamp'2024-01-01 00:00:00')"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    clen = F.octet_length("text")
    rec_id = F.concat(F.lit("<urn:md5:"), F.md5(F.encode(uri, "UTF-8")), F.lit(">"))
    crlf = F.lit("\r\n")
    header = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: response"), crlf,
        F.lit("WARC-Record-ID: "), rec_id, crlf,
        F.lit("WARC-Date: "), warc_date, crlf,
        F.lit("WARC-Target-URI: "), uri, crlf,
        F.lit("Content-Type: text/html"), crlf,
        F.lit("Content-Length: "), clen.cast("string"), crlf,
    )
    return docs.select(
        "doc_id",
        uri.alias("target_uri"),
        warc_date.alias("warc_date"),
        clen.cast("long").alias("content_length"),
        rec_id.alias("record_id"),
        F.md5(F.encode(header, "UTF-8")).alias("header_md5"),
    )


Q_WARC_EXPORT_SQL = """
    WITH r AS (
      SELECT doc_id,
             'http://' || source || '.example/doc/' || doc_id AS target_uri,
             strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id),
                      '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
             octet_length(encode(text)) AS content_length
      FROM documents
    ),
    h AS (
      SELECT *, '<urn:md5:' || md5(target_uri) || '>' AS record_id FROM r
    )
    SELECT doc_id, target_uri, warc_date,
           CAST(content_length AS BIGINT) AS content_length, record_id,
           md5('WARC/1.0' || chr(13) || chr(10)
               || 'WARC-Type: response' || chr(13) || chr(10)
               || 'WARC-Record-ID: ' || record_id || chr(13) || chr(10)
               || 'WARC-Date: ' || warc_date || chr(13) || chr(10)
               || 'WARC-Target-URI: ' || target_uri || chr(13) || chr(10)
               || 'Content-Type: text/html' || chr(13) || chr(10)
               || 'Content-Length: ' || content_length || chr(13) || chr(10)
              ) AS header_md5
    FROM h
"""


def q_wet_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET conversion-record headers (Common Crawl's extracted-text sibling
    of the WARC response record): each document's plain text as a
    ``WARC-Type: conversion`` record whose ``WARC-Refers-To`` points at the
    originating response record (same deterministic id scheme as
    q_warc_export, so the WARC↔WET linkage is verifiable). Completes the CC
    container family (WARC response / CDX index / WET conversion). Pure JVM
    projection, zero shuffle — rides the corpus scan."""
    docs = _t(spark, sf_dir, "documents")
    uri = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example/doc/"),
        F.col("doc_id").cast("string"),
    )
    warc_date = F.date_format(
        F.expr("timestampadd(SECOND, doc_id, timestamp'2024-01-01 00:00:00')"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    clen = F.octet_length("text")
    refers_to = F.concat(F.lit("<urn:md5:"), F.md5(F.encode(uri, "UTF-8")), F.lit(">"))
    rec_id = F.concat(
        F.lit("<urn:md5:"),
        F.md5(F.encode(F.concat(F.lit("wet:"), uri), "UTF-8")),
        F.lit(">"),
    )
    crlf = F.lit("\r\n")
    header = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: conversion"), crlf,
        F.lit("WARC-Record-ID: "), rec_id, crlf,
        F.lit("WARC-Refers-To: "), refers_to, crlf,
        F.lit("WARC-Date: "), warc_date, crlf,
        F.lit("WARC-Target-URI: "), uri, crlf,
        F.lit("Content-Type: text/plain"), crlf,
        F.lit("Content-Length: "), clen.cast("string"), crlf,
    )
    return docs.select(
        "doc_id",
        uri.alias("target_uri"),
        clen.cast("long").alias("content_length"),
        rec_id.alias("record_id"),
        refers_to.alias("refers_to"),
        F.md5(F.encode(header, "UTF-8")).alias("header_md5"),
    )


Q_WET_EXPORT_SQL = """
    WITH r AS (
      SELECT doc_id,
             'http://' || source || '.example/doc/' || doc_id AS target_uri,
             strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id),
                      '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
             octet_length(encode(text)) AS content_length
      FROM documents
    ),
    h AS (
      SELECT *,
             '<urn:md5:' || md5('wet:' || target_uri) || '>' AS record_id,
             '<urn:md5:' || md5(target_uri) || '>' AS refers_to
      FROM r
    )
    SELECT doc_id, target_uri,
           CAST(content_length AS BIGINT) AS content_length, record_id, refers_to,
           md5('WARC/1.0' || chr(13) || chr(10)
               || 'WARC-Type: conversion' || chr(13) || chr(10)
               || 'WARC-Record-ID: ' || record_id || chr(13) || chr(10)
               || 'WARC-Refers-To: ' || refers_to || chr(13) || chr(10)
               || 'WARC-Date: ' || warc_date || chr(13) || chr(10)
               || 'WARC-Target-URI: ' || target_uri || chr(13) || chr(10)
               || 'Content-Type: text/plain' || chr(13) || chr(10)
               || 'Content-Length: ' || content_length || chr(13) || chr(10)
              ) AS header_md5
    FROM h
"""


def q_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation rollup (RefinedWeb-style: curate by SOURCE,
    not only by document): per source, doc count, Gopher keep rate, and
    mean word count — the dim a mixing/reweighting stage joins against.
    One map-side-combined groupBy over zero-shuffle per-doc projections."""
    docs = _t(spark, sf_dir, "documents")
    s = TXT.gopher_stats(F.col("text"))
    per_doc = docs.select(
        "source",
        s["n_words"].alias("n_words"),
        TXT.gopher_passes(s).cast("int").alias("keep"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("keep").cast("long").alias("n_keep"),
        F.round(F.sum("keep") / F.count("*"), 6).alias("keep_frac"),
        F.round(F.avg("n_words"), 6).alias("mean_words"),
    )


Q_SOURCE_QUALITY_SQL = f"""
    WITH s AS (
      SELECT source,
             len(regexp_extract_all(text, '{TXT.WORD_RE}')) AS n_words,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS sum_len,
             len(regexp_extract_all(text, '{TXT.ALPHA_TOKEN_RE}')) AS n_alpha,
             len(regexp_extract_all(lower(text),
                 '\\b(the|and|of|to|is)\\b')) AS n_stop,
             len(regexp_extract_all(text, '(#|\\.\\.\\.)')) AS n_symbols
      FROM documents
    ),
    k AS (
      SELECT source, n_words,
             CASE WHEN (n_words BETWEEN 20 AND 100000)
                   AND sum_len / greatest(n_words, 1) BETWEEN 3.0 AND 10.0
                   AND n_alpha / greatest(n_words, 1) >= 0.7
                   AND n_stop >= 1
                   AND n_symbols / greatest(n_words, 1) <= 0.1
                  THEN 1 ELSE 0 END AS keep
      FROM s
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(keep) AS BIGINT) AS n_keep,
           round(sum(keep) * 1.0 / count(*), 6) AS keep_frac,
           round(avg(n_words), 6) AS mean_words
    FROM k GROUP BY source
"""


def q_url_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap detection over a synthesized frontier: a url whose path
    repeats a segment (calendar/infinite-pagination traps) or exceeds a
    depth ceiling is flagged before it wastes fetch budget. Segment
    repetition is ``size(segs) - size(array_distinct(segs))`` — two array
    expressions per row, zero shuffle, so the check rides the frontier scan
    for free at 10^10 urls."""
    li = _t(spark, sf_dir, "lineitem")
    seg = F.concat(F.lit("/p"), F.col("l_linenumber").cast("string"))
    tail = F.when(
        F.col("l_orderkey") % 7 == 0, F.concat(seg, seg, seg, seg)
    ).otherwise(seg)
    path = F.concat(
        F.lit("/c"),
        (F.col("l_partkey") % 20).cast("string"),
        F.lit("/i"),
        (F.col("l_suppkey") % 10).cast("string"),
        tail,
    )
    segs = F.split(path, "/")
    depth = F.size(segs) - 1  # leading '' from the root slash
    n_rep = F.size(segs) - F.size(F.array_distinct(segs))
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        path.alias("path"),
        depth.alias("depth"),
        n_rep.alias("n_repeated"),
        ((n_rep >= 2) | (depth > 6)).alias("is_trap"),
    )


Q_URL_TRAP_SQL = """
    WITH u AS (
      SELECT l_orderkey AS okey, l_linenumber AS line,
             '/c' || (l_partkey % 20) || '/i' || (l_suppkey % 10) ||
               repeat('/p' || l_linenumber,
                      CASE WHEN l_orderkey % 7 = 0 THEN 4 ELSE 1 END) AS path
      FROM lineitem
    ),
    s AS (
      SELECT *, string_split(path, '/') AS segs FROM u
    )
    SELECT okey, line, path,
           CAST(len(segs) - 1 AS INTEGER) AS depth,
           CAST(len(segs) - len(list_distinct(segs)) AS INTEGER) AS n_repeated,
           (len(segs) - len(list_distinct(segs)) >= 2)
             OR (len(segs) - 1 > 6) AS is_trap
    FROM s
"""


def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity score per document — the DSIR-style
    importance signal: explode word tokens once, count global term
    frequency, join the (small, Zipf-bounded) vocabulary back broadcast,
    and aggregate per doc. All-integer outputs (sum/min of corpus counts),
    so the oracle is exact. At 100 TB the vocab side is the only shuffle;
    the rejoin is a broadcast hash join (vocab ≪ corpus) — plan-pinned in
    tests/test_webtext.py."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TXT.tokens(F.lower(F.col("text")))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("tf").alias("sum_tf"),
            F.min("tf").alias("min_tf"),
        )
    )


Q_TOKEN_RARITY_SQL = """
    WITH t AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS tok
      FROM documents
    ),
    v AS (SELECT tok, count(*) AS tf FROM t GROUP BY tok)
    SELECT doc_id, count(*) AS n_tok,
           CAST(sum(tf) AS BIGINT) AS sum_tf,
           CAST(min(tf) AS BIGINT) AS min_tf
    FROM t JOIN v USING (tok) GROUP BY doc_id
"""


def q_refetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-rate recrawl scheduling (operators/events.py): per-key mean
    inter-arrival predicts the next due time; the telescoping mean needs no
    window pass — one map-side-combined groupBy."""
    return EV.refetch_schedule(_t(spark, sf_dir, "events"))


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank over a deterministic synthetic link
    graph on the documents table (operators/graph.py) — the frontier-
    prioritization / document-weighting signal; integer arithmetic makes the
    ranks bit-exact against the unrolled SQL recurrence."""
    from ospo_ghcrawler_spark.operators import graph as G

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    edges = G.synthetic_link_edges(docs, n)
    return G.pagerank_fixed_point(docs, edges, iterations=3)


def _link_pagerank_sql() -> str:
    from ospo_ghcrawler_spark.operators import graph as G

    return G.pagerank_sql(iterations=3)


# ---------------------------------------------------------------------------
# E: event-stream analytics (sessionization / as-of) over the events table
# ---------------------------------------------------------------------------


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/events.py) — one shuffle on
    user_id, per-partition window scan; parallelism-invariant ids."""
    return EV.sessionize(_t(spark, sf_dir, "events"))


def q_aimd_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-tuning per-host politeness budgets (AIMD) from an observed fetch
    log — the adaptive extension of the reference's static limiter config
    (operators/politeness.py:aimd_host_budgets). The events table stands in
    as the fetch log (user_id → host, value → latency ms). Oracle = the
    same causal recurrence unrolled as a recursive CTE. All-integer
    budgets; floor-halving is engine-identical for positives."""
    from ospo_ghcrawler_spark.operators.politeness import aimd_host_budgets

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("host"), "ts", F.col("value").alias("latency_ms")
    )
    return aimd_host_budgets(log).select(
        F.col("host").cast("long").alias("host"), "win", "breach", "budget"
    )


Q_AIMD_BUDGETS_SQL = """
    WITH RECURSIVE pw0 AS (
      SELECT user_id AS host,
             CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS win,
             sum(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) * 100
               >= count(*) * 10 AS breach
      FROM events GROUP BY 1, 2
    ),
    -- trailing-window tail cap, aligned with aimd_host_budgets(max_windows)
    pw AS (
      SELECT host, win, breach FROM (
        SELECT *, row_number() OVER (PARTITION BY host ORDER BY win DESC) AS rn
        FROM pw0
      ) WHERE rn <= 4096
    ),
    ord AS (
      SELECT *, row_number() OVER (PARTITION BY host ORDER BY win) - 1 AS i
      FROM pw
    ),
    rec(host, i, budget) AS (
      SELECT host, 0, 64 FROM (SELECT DISTINCT host FROM pw)
      UNION ALL
      SELECT r.host, r.i + 1,
             CASE WHEN o.breach
                  THEN greatest(8, CAST(floor(r.budget / 2.0) AS INT))
                  ELSE least(256, r.budget + 16) END
      FROM rec r JOIN ord o ON o.host = r.host AND o.i = r.i
      WHERE r.i < (SELECT max(i) + 1 FROM ord WHERE host = r.host)
    )
    SELECT o.host, o.win, o.breach, r.budget
    FROM ord o JOIN rec r ON r.host = o.host AND r.i = o.i
"""


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup composed on sessionize (two shuffles, algebraic
    aggregates with map-side combine)."""
    return EV.session_stats(_t(spark, sf_dir, "events"))


def q_asof_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (click → latest prior view per user) via the one-shuffle
    union+window form; the oracle is the same recurrence in DuckDB SQL."""
    return EV.asof_match(_t(spark, sf_dir, "events"))


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-only Lloyd k-means over embeddings (operators/clustering.py):
    O(k·dim) driver state, one map-side-combined shuffle per iteration,
    whole-stage-codegen assignment. Oracle: the recurrence unrolled
    relationally (points × k-row centroid CTE per iteration)."""
    from ospo_ghcrawler_spark.operators import clustering as KM

    return KM.kmeans_assign(_t(spark, sf_dir, "embeddings"))


def _kmeans_sql() -> str:
    from ospo_ghcrawler_spark.operators import clustering as KM

    return KM.kmeans_sql()


def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced downsample (operators/clustering.py): k-means
    assignment + per-cluster md5-rank cap — diversity-preserving
    subsampling for the training mix."""
    from ospo_ghcrawler_spark.operators import clustering as KM

    return KM.cluster_sample(_t(spark, sf_dir, "embeddings"))


def _cluster_sample_sql() -> str:
    from ospo_ghcrawler_spark.operators import clustering as KM

    return KM.cluster_sample_sql()


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/clustering.py): k-means cluster, then drop any
    vector whose cluster holds a lower-id vector at cosine ≥ eps — semantic
    near-dup pruning whose pair join never leaves a cluster cell."""
    from ospo_ghcrawler_spark.operators import clustering as KM

    return KM.semdedup(_t(spark, sf_dir, "embeddings"), eps=KM.SEMDEDUP_BENCH_EPS)


def _semdedup_sql() -> str:
    from ospo_ghcrawler_spark.operators import clustering as KM

    return KM.semdedup_sql(eps=KM.SEMDEDUP_BENCH_EPS)


def q_link_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point HITS hubs/authorities over the synthetic link
    graph (operators/graph.py:hits_fixed_point) — the hub side ranks
    directory-like pages for frontier expansion, the authority side weights
    documents for corpus curation; bit-exact vs the unrolled SQL."""
    from ospo_ghcrawler_spark.operators import graph as G

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    edges = G.synthetic_link_edges(docs, n)
    return G.hits_fixed_point(docs, edges, iterations=2)


def _link_hits_sql() -> str:
    from ospo_ghcrawler_spark.operators import graph as G

    return G.hits_sql(iterations=2)


def q_link_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph connected components (operators/graph.py): chain test
    graph of known diameter driven through the hash-min label-propagation
    machinery; oracle is a recursive transitive closure."""
    from ospo_ghcrawler_spark.operators import graph as G

    return G.link_components(_t(spark, sf_dir, "documents"))


def _link_components_sql() -> str:
    from ospo_ghcrawler_spark.operators import graph as G

    return G.link_components_sql()


# ---------------------------------------------------------------------------
# S: similarity search over embeddings
# ---------------------------------------------------------------------------


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    out = SIM.brute_topk(emb, queries, TOPK)
    return out.select("q_id", "rank", "neighbor_id", F.round("cos", 9).alias("cos9"))


Q_EMBEDDING_TOPK_SQL = f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    v AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS n_vec FROM embeddings),
    scored AS (
      SELECT q_id, n_id,
             list_dot_product(q_vec, n_vec)
               / (sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(n_vec, n_vec))) AS cos
      FROM q CROSS JOIN v WHERE n_id != q_id
    ),
    ranked AS (
      SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
      FROM scored
    )
    SELECT q_id, rank, n_id AS neighbor_id, round(cos, 9) AS cos9
    FROM ranked WHERE rank <= {TOPK}
"""


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, the SCALE path: sign-LSH bucket self-join →
    exact cosine verify on candidates only (similarity.lsh_neardup_pairs).
    Driver check is rows-only (LSH recall < 1 by design);
    tests/test_similarity.py pins recall ≥ 0.9 against the exact cartesian
    oracle below at sf0.01."""
    emb = _t(spark, sf_dir, "embeddings")
    out = SIM.lsh_neardup_pairs(emb, threshold=0.4, dim=64)
    return out.select("a_id", "b_id", F.round("cos", 9).alias("cos9"))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over the full table — the exact
    all-pairs ORACLE, quadratic by design (small-SF correctness anchor; the
    first-class operator is q_embedding_neardup_lsh above)."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    t = 0.4
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos", SIM.cosine(F.col("a_vec"), F.col("b_vec")))
        .filter(F.col("cos") >= t)
        .select("a_id", "b_id", F.round("cos", 9).alias("cos9"))
    )


Q_EMBEDDING_NEARDUP_SQL = """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_dot_product(a.vec, b.vec)
             / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 9) AS cos9
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.vec, b.vec)
             / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))) >= 0.4
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (rows-only check; recall vs brute force pinned in
    tests/test_similarity.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id")
    return SIM.lsh_topk(emb, queries, TOPK, dim=64)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (rows-only check; recall pinned in tests)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id")
    return SIM.ivf_topk(emb, queries, TOPK, dim=64)


def q_ann_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe = n_clusters — probing every cluster is exactly brute
    force, so this pins the whole IVF machinery (assignment, probing, re-rank)
    against the exact-cosine SQL oracle, value-hash and all."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id")
    out = SIM.ivf_topk(emb, queries, TOPK, dim=64, n_clusters=16, nprobe=16)
    return out.select("q_id", "rank", "neighbor_id", F.round("cos", 9).alias("cos9"))


# ---------------------------------------------------------------------------
# M: multimodal plumbing
# ---------------------------------------------------------------------------


def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata: byte length + md5 over the blob (the decode
    itself is stubbed; this validates the binary-column plumbing)."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.attach_payload(docs, "doc_id", "text", mime="text/plain")
    return media.select(
        "media_id",
        "mime",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


Q_BINARY_META_SQL = """
    SELECT doc_id AS media_id, 'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake featurizer over binary payloads (16-bin high-nibble
    byte histogram) — exercises the real mapInPandas decode path. The array
    column is exploded to (bin, n) rows so the result is driver-hashable and
    fully oracle-checkable (documents are ASCII, so byte bins == char-class
    counts in the SQL oracle)."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.attach_payload(docs, "doc_id", "text", mime="text/plain")
    feats = MM.feature_extract(media)
    return feats.select(
        "media_id", "mime", "n_bytes", F.posexplode("features").alias("bin", "n")
    )


def _nibble_count_sql(i: int) -> str:
    lo, hi = i * 16, i * 16 + 15
    return f"len(regexp_extract_all(text, '[\\x{lo:02x}-\\x{hi:02x}]'))"


Q_MEDIA_FEATURES_SQL = f"""
    WITH s AS (
      SELECT doc_id AS media_id, 'text/plain' AS mime,
             octet_length(encode(text)) AS n_bytes,
             [{", ".join(_nibble_count_sql(i) for i in range(16))}] AS feats
      FROM documents
    )
    SELECT media_id, mime, n_bytes,
           CAST(unnest(range(16)) AS INTEGER) AS bin,
           CAST(unnest(feats) AS BIGINT) AS n
    FROM s
"""


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw robots.txt parsing (functions/robots.py): deterministic robots
    bodies synthesized from supplier keys — comments, mixed-case keys, a
    ``*`` group, an agent-specific group (RFC 9309 precedence: it must
    SHADOW the ``*`` group), a never-matching third-party group, fractional
    Crawl-delay. Output is exploded to driver-hashable rows
    (host, kind, prefix, crawl_delay_ms)."""
    from ospo_ghcrawler_spark.functions.robots import parse_robots_directives

    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    nl = F.lit("\n")
    txt = F.concat(
        F.lit("# robots for host "), ks, nl,
        F.lit("User-agent: *"), nl,
        F.lit("Disallow: /private/"), nl,
        F.when(k % 3 == 0, F.concat(F.lit("Disallow: /tmp/"), ks, F.lit("/"), nl)).otherwise(F.lit("")),
        F.when(k % 3 == 1, F.concat(F.lit("Crawl-delay: "), (1 + k % 5).cast("string"), nl)).otherwise(F.lit("")),
        F.when(
            k % 2 == 0,
            F.concat(
                nl, F.lit("User-Agent: Ospo-Crawler  # our product token"), nl,
                F.lit("Disallow: /drafts/"), nl,
                F.lit("Allow: /drafts/public/"), nl,
                F.lit("Crawl-delay: 0.5"), nl,
            ),
        ).otherwise(F.lit("")),
        F.when(
            k % 5 == 0,
            F.concat(nl, F.lit("User-agent: BadBot"), nl, F.lit("Disallow: /"), nl),
        ).otherwise(F.lit("")),
    )
    raw = s.select(
        F.concat(F.lit("host"), ks, F.lit(".example")).alias("host"),
        txt.alias("robots_txt"),
    )
    dirs = parse_robots_directives(raw, agent="ospo-crawler")
    prefixes = (
        dirs.filter(F.col("key").isin("disallow", "allow") & (F.col("val") != ""))
        .select("host", F.col("key").alias("kind"), F.col("val").alias("prefix"))
        .distinct()
    )
    delay = dirs.groupBy("host").agg(
        (F.max(F.when(F.col("key") == "crawl-delay", F.expr("try_cast(val as double)"))) * 1000)
        .cast("long")
        .alias("crawl_delay_ms")
    )
    return prefixes.join(delay, "host", "left").select(
        "host", "kind", "prefix", "crawl_delay_ms"
    )


Q_ROBOTS_PARSE_SQL = """
    WITH raw AS (
      SELECT 'host' || s_suppkey || '.example' AS host,
             '# robots for host ' || s_suppkey || chr(10)
             || 'User-agent: *' || chr(10)
             || 'Disallow: /private/' || chr(10)
             || CASE WHEN s_suppkey % 3 = 0
                     THEN 'Disallow: /tmp/' || s_suppkey || '/' || chr(10) ELSE '' END
             || CASE WHEN s_suppkey % 3 = 1
                     THEN 'Crawl-delay: ' || (1 + s_suppkey % 5) || chr(10) ELSE '' END
             || CASE WHEN s_suppkey % 2 = 0
                     THEN chr(10) || 'User-Agent: Ospo-Crawler  # our product token' || chr(10)
                          || 'Disallow: /drafts/' || chr(10)
                          || 'Allow: /drafts/public/' || chr(10)
                          || 'Crawl-delay: 0.5' || chr(10) ELSE '' END
             || CASE WHEN s_suppkey % 5 = 0
                     THEN chr(10) || 'User-agent: BadBot' || chr(10)
                          || 'Disallow: /' || chr(10) ELSE '' END AS robots_txt
      FROM supplier
    ),
    lines AS (
      SELECT host, i AS pos, trim(regexp_replace(l[i], '#.*', '')) AS clean
      FROM (SELECT host, string_split(robots_txt, chr(10)) AS l FROM raw),
           LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) u
    ),
    parsed AS (
      SELECT host, pos,
             lower(trim(regexp_extract(clean, '^([^:]+):', 1))) AS key,
             trim(regexp_extract(clean, '^[^:]+:(.*)$', 1)) AS val
      FROM lines
    ),
    d AS (
      SELECT * FROM parsed
      WHERE key IN ('user-agent', 'disallow', 'allow', 'crawl-delay')
    ),
    g AS (
      SELECT *, SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
                  OVER (PARTITION BY host ORDER BY pos) AS grp
      FROM (
        SELECT *, key = 'user-agent' AS is_ua,
               COALESCE(LAG(key = 'user-agent')
                          OVER (PARTITION BY host ORDER BY pos), FALSE) AS prev_ua
        FROM d
      )
    ),
    ga AS (
      SELECT host, grp,
             MAX(CASE WHEN is_ua AND lower(val) = '*' THEN 1 ELSE 0 END) = 1 AS has_star,
             MAX(CASE WHEN is_ua AND lower(val) = 'ospo-crawler' THEN 1 ELSE 0 END) = 1 AS has_agent
      FROM g WHERE grp > 0 GROUP BY host, grp
    ),
    hostlvl AS (SELECT host, MAX(has_agent) AS specific FROM ga GROUP BY host),
    matched AS (
      SELECT ga.host, ga.grp FROM ga JOIN hostlvl h USING (host)
      WHERE CASE WHEN h.specific THEN ga.has_agent ELSE ga.has_star END
    ),
    dirs AS (
      SELECT g.host, g.key, g.val FROM g
      JOIN matched m ON g.host = m.host AND g.grp = m.grp
      WHERE NOT g.is_ua
    ),
    delay AS (
      SELECT host, CAST(MAX(TRY_CAST(val AS DOUBLE)) * 1000 AS BIGINT) AS crawl_delay_ms
      FROM dirs WHERE key = 'crawl-delay' GROUP BY host
    ),
    prefixes AS (
      SELECT DISTINCT host, key AS kind, val AS prefix
      FROM dirs WHERE key IN ('disallow', 'allow') AND val <> ''
    )
    SELECT p.host, p.kind, p.prefix, d.crawl_delay_ms
    FROM prefixes p LEFT JOIN delay d USING (host)
"""


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (operators/curation.py:
    decontaminate_bloom) — the big-eval-set scale path: eval grams build a
    distributed bloom, the corpus probes the bitmap in one Arrow pass, and
    only bloom-positive grams pay the exact verify join. Row-identical to
    q_decontaminate (no false negatives; FPs removed by the verify), so it
    shares the same oracle."""
    return CU.decontaminate_bloom(
        _t(spark, sf_dir, "documents"), n=DECON_N, eval_mod=EVAL_MOD
    )


def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots.txt (functions/robots.py:
    robots_sitemaps): group-independent ``Sitemap:`` lines — mixed case,
    comments, CRLF, positions before/inside/after UA groups — become
    (host, sitemap_url) rows; the hand-off input to sitemap_parse."""
    from ospo_ghcrawler_spark.functions.robots import robots_sitemaps

    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    nl = F.lit("\n")
    host = F.concat(F.lit("host"), ks, F.lit(".example"))
    txt = F.concat(
        # before any UA group (must still count)
        F.when(
            k % 2 == 0,
            F.concat(F.lit("Sitemap: http://"), host, F.lit("/sitemap.xml  # root"), nl),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *"), nl,
        F.lit("Disallow: /private/"), nl,
        # inside a group, mixed case key, CRLF
        F.when(
            k % 3 == 0,
            F.concat(F.lit("SITEMAP: http://"), host, F.lit("/sitemap-news.xml\r")),
        ).otherwise(F.lit("")),
        nl,
        # duplicate of the first (distinct must collapse it)
        F.when(
            k % 2 == 0,
            F.concat(F.lit("sitemap: http://"), host, F.lit("/sitemap.xml"), nl),
        ).otherwise(F.lit("")),
    )
    raw = s.select(host.alias("host"), txt.alias("robots_txt"))
    return robots_sitemaps(raw)


Q_ROBOTS_SITEMAPS_SQL = """
    WITH raw AS (
      SELECT 'host' || s_suppkey || '.example' AS host,
             (CASE WHEN s_suppkey % 2 = 0
                   THEN 'Sitemap: http://host' || s_suppkey || '.example/sitemap.xml  # root' || chr(10)
                   ELSE '' END)
             || 'User-agent: *' || chr(10)
             || 'Disallow: /private/' || chr(10)
             || (CASE WHEN s_suppkey % 3 = 0
                      THEN 'SITEMAP: http://host' || s_suppkey || '.example/sitemap-news.xml' || chr(13)
                      ELSE '' END)
             || chr(10)
             || (CASE WHEN s_suppkey % 2 = 0
                      THEN 'sitemap: http://host' || s_suppkey || '.example/sitemap.xml' || chr(10)
                      ELSE '' END) AS robots_txt
      FROM supplier
    ),
    lines AS (
      SELECT host, unnest(string_split_regex(robots_txt, '\r?\n')) AS line
      FROM raw
    ),
    kv AS (
      SELECT host,
             lower(trim(regexp_extract(trim(regexp_replace(line, '#.*', '')), '^([^:]+):', 1))) AS key,
             trim(regexp_extract(trim(regexp_replace(line, '#.*', '')), '^[^:]+:(.*)$', 1)) AS sitemap_url
      FROM lines
    )
    SELECT DISTINCT host, sitemap_url
    FROM kv WHERE key = 'sitemap' AND sitemap_url <> ''
"""


def q_registered_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain rollup (functions/urls.py:registered_domain_col —
    public-suffix-lite): the site-identity grouping for domain-level
    curation (RefinedWeb-style per-site weighting, mirror collapse) and
    above-host politeness. Messy synthesized hostnames exercise multi-label
    subdomains, two-level public suffixes, default two-label domains, and
    single-label passthrough. One map-side-combined groupBy."""
    o = _t(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), (F.col("o_custkey") % 50).cast("string")
    host = (
        F.when(k % 5 == 0, F.concat(F.lit("www.shop"), c, F.lit(".co.uk")))
        .when(k % 5 == 1, F.concat(F.lit("a.b.site"), c, F.lit(".com")))
        .when(k % 5 == 2, F.concat(F.lit("cdn"), (k % 3).cast("string"),
                                   F.lit(".media"), c, F.lit(".com.au")))
        .when(k % 5 == 3, F.concat(F.lit("host"), c, F.lit(".example")))
        .otherwise(F.concat(F.lit("intranet"), c))
    )
    h = o.select(host.alias("host"))
    return (
        h.select("host", U.registered_domain_col(F.col("host")).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


def _registered_domain_sql() -> str:
    dom = U.registered_domain_sql_expr("host")
    return f"""
    WITH h AS (
      SELECT CASE
        WHEN o_orderkey % 5 = 0 THEN 'www.shop' || (o_custkey % 50) || '.co.uk'
        WHEN o_orderkey % 5 = 1 THEN 'a.b.site' || (o_custkey % 50) || '.com'
        WHEN o_orderkey % 5 = 2 THEN 'cdn' || (o_orderkey % 3) || '.media' || (o_custkey % 50) || '.com.au'
        WHEN o_orderkey % 5 = 3 THEN 'host' || (o_custkey % 50) || '.example'
        ELSE 'intranet' || (o_custkey % 50)
      END AS host
      FROM orders
    )
    SELECT {dom} AS domain, count(*) AS n_urls, count(DISTINCT host) AS n_hosts
    FROM h GROUP BY 1
    """


# changefreq vocabulary order shared by q_sitemap_parse / q_refetch_priority
_CF_WORDS = ("always", "hourly", "daily", "weekly", "monthly", "yearly")


def q_refetch_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused recrawl scheduling: the OBSERVED change rate
    (events.refetch_schedule — telescoping mean gap) bounded by the
    publisher's sitemap ``changefreq`` hint (functions/sitemaps.py
    vocabulary): ``next_due = last_seen + min(mean_gap, hint)``. A page
    that changes faster than its sitemap claims is recrawled at the
    observed rate; a stale hint never delays a hot page, and a sparse
    observation history defers to the hint. Same single-shuffle shape as
    refetch_schedule; the hint is a pure projection."""
    from ospo_ghcrawler_spark.functions.sitemaps import CHANGEFREQ_S

    base = EV.refetch_schedule(_t(spark, sf_dir, "events"))
    word = F.element_at(
        F.array(*[F.lit(w) for w in _CF_WORDS]),
        (F.col("user_id") % 6 + 1).cast("int"),
    )
    hint_us = F.element_at(
        F.array(*[F.lit(CHANGEFREQ_S[w] * 1_000_000).cast("long") for w in _CF_WORDS]),
        (F.col("user_id") % 6 + 1).cast("int"),
    )
    return base.select(
        "user_id",
        "n_obs",
        "mean_gap_us",
        word.alias("changefreq"),
        (F.col("last_us") + F.least(F.col("mean_gap_us"), hint_us)).alias(
            "next_due_fused_us"
        ),
    )


def _refetch_priority_sql() -> str:
    from ospo_ghcrawler_spark.functions.sitemaps import CHANGEFREQ_S

    words = ", ".join(f"'{w}'" for w in _CF_WORDS)
    hints = ", ".join(str(CHANGEFREQ_S[w] * 1_000_000) for w in _CF_WORDS)
    return f"""
    SELECT user_id, n_obs, mean_gap_us,
           ([{words}])[CAST(user_id % 6 + 1 AS INTEGER)] AS changefreq,
           last_us + least(mean_gap_us,
             ([{hints}])[CAST(user_id % 6 + 1 AS INTEGER)]) AS next_due_fused_us
    FROM ({EV.refetch_schedule_sql()})
    """


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing (functions/sitemaps.py): deterministic sitemap
    bodies synthesized from supplier keys — every 4th host serves a
    ``<sitemapindex>`` (two child sitemaps), the rest a ``<urlset>`` of
    three urls exercising entity-escaped locs, date-only and full-datetime
    lastmod, the whole changefreq vocabulary, fractional priority, and
    missing optional fields."""
    from ospo_ghcrawler_spark.functions.sitemaps import parse_sitemap_entries

    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    host = F.concat(F.lit("host"), ks, F.lit(".example"))
    cf_word = F.element_at(
        F.array(*[F.lit(w) for w in
                  ("always", "hourly", "daily", "weekly", "monthly", "yearly")]),
        (k % 6 + 1).cast("int"),
    )
    urlset = F.concat(
        F.lit("<urlset>\n <url>\n  <loc> http://"), host, F.lit("/a?x=1&amp;y=2 </loc>\n"),
        F.lit("  <lastmod>2026-0"), (k % 9 + 1).cast("string"), F.lit("-15</lastmod>\n"),
        F.lit("  <changefreq>"), F.upper(cf_word), F.lit("</changefreq>\n"),
        F.lit("  <priority>0."), (k % 10).cast("string"), F.lit("</priority>\n </url>\n"),
        F.lit(" <url><loc>http://"), host, F.lit("/b</loc>"),
        F.lit("<lastmod>2026-05-01T12:30:00+00:00</lastmod></url>\n"),
        F.when(
            k % 3 == 0,
            F.concat(F.lit(" <url>\n  <loc>http://"), host, F.lit("/c</loc>\n </url>\n")),
        ).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex>\n <sitemap><loc>http://"), host,
        F.lit("/sitemap-a.xml</loc><lastmod>2026-07-01</lastmod></sitemap>\n"),
        F.lit(" <sitemap>\n  <loc>http://"), host,
        F.lit("/sitemap-b.xml</loc>\n </sitemap>\n</sitemapindex>"),
    )
    raw = s.select(
        host.alias("host"),
        F.when(k % 4 == 0, index).otherwise(urlset).alias("sitemap_xml"),
    )
    return parse_sitemap_entries(raw)


def _sitemap_parse_sql() -> str:
    from ospo_ghcrawler_spark.functions.sitemaps import sitemap_entries_sql

    raw_cte = """raw AS (
      SELECT 'host' || s_suppkey || '.example' AS host,
             CASE WHEN s_suppkey % 4 = 0 THEN
               '<sitemapindex>' || chr(10) ||
               ' <sitemap><loc>http://host' || s_suppkey || '.example/sitemap-a.xml</loc><lastmod>2026-07-01</lastmod></sitemap>' || chr(10) ||
               ' <sitemap>' || chr(10) || '  <loc>http://host' || s_suppkey || '.example/sitemap-b.xml</loc>' || chr(10) || ' </sitemap>' || chr(10) ||
               '</sitemapindex>'
             ELSE
               '<urlset>' || chr(10) ||
               ' <url>' || chr(10) ||
               '  <loc> http://host' || s_suppkey || '.example/a?x=1&amp;y=2 </loc>' || chr(10) ||
               '  <lastmod>2026-0' || (s_suppkey % 9 + 1) || '-15</lastmod>' || chr(10) ||
               '  <changefreq>' || upper(['always','hourly','daily','weekly','monthly','yearly'][(s_suppkey % 6 + 1)]) || '</changefreq>' || chr(10) ||
               '  <priority>0.' || (s_suppkey % 10) || '</priority>' || chr(10) ||
               ' </url>' || chr(10) ||
               ' <url><loc>http://host' || s_suppkey || '.example/b</loc><lastmod>2026-05-01T12:30:00+00:00</lastmod></url>' || chr(10) ||
               (CASE WHEN s_suppkey % 3 = 0 THEN
                 ' <url>' || chr(10) || '  <loc>http://host' || s_suppkey || '.example/c</loc>' || chr(10) || ' </url>' || chr(10)
               ELSE '' END) ||
               '</urlset>'
             END AS sitemap_xml
      FROM supplier
    )"""
    return sitemap_entries_sql(raw_cte)


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (operators/redirects.py) — pointer
    doubling maps every redirecting URL to its terminal target + hop count
    in O(log chain) self-joins of the (small) redirect map; the oracle is
    the identical walk as a recursive CTE."""
    from ospo_ghcrawler_spark.operators import redirects as RD

    docs = _t(spark, sf_dir, "documents")
    return RD.resolve_redirects(RD.synthetic_redirect_edges(docs))


def _redirect_resolve_sql() -> str:
    from ospo_ghcrawler_spark.operators import redirects as RD

    return RD.redirect_resolve_sql()


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target top-k anchor texts (operators/graph.py:anchor_texts) —
    aggregated link context as a page-quality/topic feature; map-side
    combined count + one bounded window shuffle."""
    from ospo_ghcrawler_spark.operators import graph as G

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    return G.anchor_texts(G.synthetic_link_edges(docs, n))


def _anchor_texts_sql() -> str:
    from ospo_ghcrawler_spark.operators import graph as G

    return G.anchor_texts_sql()


# snapshot-diff constants: which docs the simulated re-crawl mutates,
# drops, or adds (plain modular arithmetic so the oracle replicates the
# second snapshot exactly). NEW_OFFSET keeps added ids disjoint from any
# realistic doc_id range at test SFs.
DIFF_DEL_MOD = 13
DIFF_CHG_MOD = 7
DIFF_NEW_MOD = 17
DIFF_NEW_OFFSET = 10_000_000


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl snapshot diff — the corpus-level form of the engine's
    etag/change detection (control.py:requeue_for_refetch uses the md5
    content fingerprint per url; a monthly-crawl pipeline needs the same
    signal across WHOLE snapshots). Snapshot v2 is derived
    deterministically from v1: doc_id % 13 == 0 deleted, % 7 == 0 mutated,
    and a disjoint id range added. One full-outer join on doc_id comparing
    md5 fingerprints — at 100 TB the join shuffles only (id, 32-byte hash)
    pairs, never text (fingerprints come from the fetch-time featurization
    already on the pages table)."""
    docs = _t(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.md5("text").alias("h1"))
    kept = docs.filter(F.col("doc_id") % DIFF_DEL_MOD != 0)
    v2 = kept.select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % DIFF_CHG_MOD == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text"))
        ).alias("h2"),
    ).unionByName(
        docs.filter(F.col("doc_id") % DIFF_NEW_MOD == 0).select(
            (F.col("doc_id") + DIFF_NEW_OFFSET).alias("doc_id"),
            F.md5(F.concat(F.lit("new:"), F.col("text"))).alias("h2"),
        )
    )
    j = v1.join(v2, "doc_id", "full_outer")
    return j.select(
        "doc_id",
        F.when(F.col("h1").isNull(), F.lit("new"))
        .when(F.col("h2").isNull(), F.lit("deleted"))
        .when(F.col("h1") == F.col("h2"), F.lit("same"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


Q_SNAPSHOT_DIFF_SQL = f"""
    WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
    v2 AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % {DIFF_CHG_MOD} = 0
                      THEN text || ' [rev2]' ELSE text END) AS h2
      FROM documents WHERE doc_id % {DIFF_DEL_MOD} <> 0
      UNION ALL
      SELECT doc_id + {DIFF_NEW_OFFSET} AS doc_id, md5('new:' || text) AS h2
      FROM documents WHERE doc_id % {DIFF_NEW_MOD} = 0
    )
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'new'
                WHEN v2.doc_id IS NULL THEN 'deleted'
                WHEN v1.h1 = v2.h2 THEN 'same'
                ELSE 'changed' END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
"""


INDEX_MIN_DF = 5  # hapax/near-hapax pruning for the postings query
BM25_QUERY = ["spark", "merge", "window"]  # fixed retrieval query terms
BM25_K1, BM25_B = 1.2, 0.75


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings list (term → doc, tf, df) — the retrieval building block a
    sharded index writer consumes. One shuffle on term; df rides a window
    over the same partitioning (exchange reuse)."""
    docs = _t(spark, sf_dir, "documents")
    return SR.inverted_index(docs, min_df=INDEX_MIN_DF)


Q_INVERTED_INDEX_SQL = f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS term
        FROM documents
      ) GROUP BY 1, 2
    )
    SELECT term, doc_id, tf, df FROM (
      SELECT term, doc_id, tf, count(*) OVER (PARTITION BY term) AS df FROM tf
    ) WHERE df >= {INDEX_MIN_DF}
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k for a fixed query — postings restricted to the
    query's terms before any shuffle (operators/search.py:bm25_topk)."""
    docs = _t(spark, sf_dir, "documents")
    return SR.bm25_topk(docs, BM25_QUERY, topk=TOPK, k1=BM25_K1, b=BM25_B)


_BM25_TERMS_IN = ", ".join(f"'{t}'" for t in BM25_QUERY)

Q_BM25_SEARCH_SQL = f"""
    WITH dl AS (
      SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS dl,
             lower(text) AS lt
      FROM documents
    ),
    s AS (SELECT count(*) AS n_docs, sum(dl) / count(*) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, dl, unnest(regexp_extract_all(lt, '[A-Za-z0-9]+')) AS term
        FROM dl
      ) WHERE term IN ({_BM25_TERMS_IN})
      GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    w AS (
      SELECT doc_id,
             ln(1 + (s.n_docs - df + 0.5) / (df + 0.5))
             * (tf * {BM25_K1 + 1.0}) / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / s.avgdl)) AS w
      FROM tf JOIN dfreq USING (term), s
    ),
    scored AS (SELECT doc_id, round(sum(w), 6) AS score FROM w GROUP BY 1)
    SELECT doc_id, score, rk FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored
    ) WHERE rk <= {TOPK}
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style self-scored unigram-LM mean log-probability per doc —
    the perplexity proxy a head/middle/tail quality split thresholds on."""
    docs = _t(spark, sf_dir, "documents")
    return SR.unigram_logprob(docs)


Q_UNIGRAM_LOGPROB_SQL = """
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS term
        FROM documents
      ) GROUP BY 1, 2
    ),
    cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
    tot AS (SELECT CAST(sum(cf) AS BIGINT) AS total_tokens FROM cf)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(sum(tf * ln(CAST(cf AS DOUBLE) / total_tokens)) / sum(tf), 6) AS avg_logprob
    FROM tf JOIN cf USING (term), tot
    GROUP BY doc_id
"""


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-JSON index lines — the third piece of the Common-Crawl container
    trio (SURT keys `q_surt_keys`, WARC records `q_warc_export`, CDX index
    here): per capture, the sorted lookup key + 14-digit timestamp + a JSON
    payload (url, content digest, mime, length). URLs are synthesized messy
    (mixed case, :80 ports, unsorted queries) and keyed via
    functions/urls.py:surt_col; the oracle computes the expected SURT in
    CLOSED FORM from the url's known components, cross-checking the
    normalizer against independent arithmetic. Zero shuffle — the index
    line rides the corpus scan; a writer sorts by (surt, ts14), which is
    the table's Iceberg sort order, not a query-time pass."""
    docs = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    url = F.concat(
        F.lit("http://www.Host"), (k % N_HOSTS).cast("string"), F.lit(".Example"),
        F.when(k % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/P"), k.cast("string"),
        F.when(k % 3 == 0, F.concat(F.lit("?z=1&a="), (k % 5).cast("string"))).otherwise(
            F.lit("")
        ),
    )
    surt = U.surt_col(url)
    ts14 = F.lpad((F.lit(20250101000000) + k).cast("string"), 14, "0")
    cdxj = F.concat(
        surt, F.lit(" "), ts14,
        F.lit(' {"url":"'), url,
        F.lit('","digest":"'), F.md5("text"),
        F.lit('","mime":"text/html","length":'),
        F.octet_length("text").cast("string"), F.lit("}"),
    )
    return docs.select(
        k.alias("doc_id"), surt.alias("surt"), ts14.alias("ts14"), cdxj.alias("cdxj")
    )


Q_CDX_INDEX_SQL = f"""
    WITH u AS (
      SELECT doc_id,
             'http://www.Host' || (doc_id % {N_HOSTS}) || '.Example'
             || (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END)
             || '/P' || doc_id
             || (CASE WHEN doc_id % 3 = 0 THEN '?z=1&a=' || (doc_id % 5) ELSE '' END) AS url,
             'example,host' || (doc_id % {N_HOSTS}) || ')/P' || doc_id
             || (CASE WHEN doc_id % 3 = 0 THEN '?a=' || (doc_id % 5) || '&z=1' ELSE '' END) AS surt,
             lpad(CAST(20250101000000 + doc_id AS VARCHAR), 14, '0') AS ts14,
             md5(text) AS digest,
             octet_length(encode(text)) AS clen
      FROM documents
    )
    SELECT doc_id, surt, ts14,
           surt || ' ' || ts14 || ' {{"url":"' || url || '","digest":"' || digest
           || '","mime":"text/html","length":' || clen || '}}' AS cdxj
    FROM u
"""


N_DOMAINS = 25  # domain-graph rollup fan


def q_domain_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level link-graph rollup: page-level edges collapsed to
    (src_domain, dst_domain, n_links) — the grain a domain-reweighting or
    spam-neighborhood analysis consumes (self-pairs = internal links, kept
    so the consumer can compute internal/external ratios). At 100 TB the
    rollup is ONE map-side-combined groupBy over the edge table — counts
    combine before the shuffle, so wire traffic is O(domains²) not
    O(edges)."""
    from ospo_ghcrawler_spark.operators import graph as G

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    edges = G.synthetic_link_edges(docs, n)
    dom = lambda c: F.concat(  # noqa: E731
        F.lit("site"), (F.col(c) % N_DOMAINS).cast("string"), F.lit(".example")
    )
    return (
        edges.select(dom("src").alias("src_domain"), dom("dst").alias("dst_domain"))
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").alias("n_links"))
    )


def _domain_graph_sql() -> str:
    from ospo_ghcrawler_spark.operators import graph as G

    edge_terms = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id*{G.EDGE_A} + {G.EDGE_C} + {j}*{G.EDGE_J}) % "
        f"(SELECT c FROM n) AS dst FROM documents"
        for j in range(G.EDGE_FANOUT)
    )
    return f"""
    WITH n AS (SELECT count(*) AS c FROM documents),
    e AS (SELECT src, dst FROM ({edge_terms}) WHERE src <> dst)
    SELECT 'site' || (src % {N_DOMAINS}) || '.example' AS src_domain,
           'site' || (dst % {N_DOMAINS}) || '.example' AS dst_domain,
           count(*) AS n_links
    FROM e
    GROUP BY 1, 2
"""


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-growth report (Heaps'-law inputs): docs,
    token mass, distinct terms and the type/token ratio — the statistic
    that flags template-stamped or machine-generated sources (abnormally
    low TTR for their size). Token mass combines map-side; distinct terms
    are one (source, term) dedup shuffle."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(TXT.tokens(F.lower(F.col("text")))).alias("term")
    )
    per_term = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    out = per_term.groupBy("source").agg(
        F.count("*").alias("n_terms"),
        F.sum("tf").alias("n_tokens"),
        (F.count("*") / F.sum("tf")).alias("type_token_ratio"),
    )
    n_docs = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return n_docs.join(out, "source").select(
        "source", "n_docs", "n_tokens", "n_terms", "type_token_ratio"
    )


Q_VOCAB_GROWTH_SQL = """
    WITH toks AS (
      SELECT source, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS term
      FROM documents
    ),
    per_term AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(tf) AS BIGINT) AS n_tokens,
             count(*) / CAST(sum(tf) AS DOUBLE) AS type_token_ratio
      FROM per_term GROUP BY 1
    ),
    nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
    SELECT nd.source, n_docs, n_tokens, n_terms, type_token_ratio
    FROM nd JOIN agg ON nd.source = agg.source
"""


FUNNEL_LANG = "en"
FUNNEL_MIN_TOKENS = 20
FUNNEL_MIN_QUALITY = 0.5


def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning-pipeline attrition report (operators/curation.py:
    filter_funnel): stage → (n_in, n_kept) for language → length →
    quality → exact dedup, computed in ONE corpus pass + one O(1)-row
    aggregate."""
    docs = _t(spark, sf_dir, "documents")
    return CU.filter_funnel(
        docs, FUNNEL_LANG, FUNNEL_MIN_TOKENS, FUNNEL_MIN_QUALITY
    )


Q_FILTER_FUNNEL_SQL = f"""
    WITH s AS (
      SELECT lang,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tok,
             length(text) AS n_char,
             len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) AS n_stop,
             md5(text) AS fp
      FROM documents
    ),
    f AS (
      SELECT (lang = '{FUNNEL_LANG}') AS f_lang,
             (n_tok >= {FUNNEL_MIN_TOKENS}) AS f_len,
             ((least(n_stop / greatest(n_tok, 1) * 2, 1.0) * 0.5
               + (CASE WHEN n_char / greatest(n_tok, 1) BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
               + (CASE WHEN n_punct / greatest(n_char, 1) <= 0.1 THEN 0.2 ELSE 0.0 END))
              >= {FUNNEL_MIN_QUALITY}) AS f_q,
             fp
      FROM s
    ),
    a AS (
      SELECT count(*) AS n0,
             CAST(sum(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN f_lang AND f_len THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN f_lang AND f_len AND f_q THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(count(DISTINCT CASE WHEN f_lang AND f_len AND f_q THEN fp END) AS BIGINT) AS n4
      FROM f
    )
    SELECT 'language' AS stage, n0 AS n_in, n1 AS n_kept FROM a
    UNION ALL SELECT 'length', n1, n2 FROM a
    UNION ALL SELECT 'quality', n2, n3 FROM a
    UNION ALL SELECT 'exact_dedup', n3, n4 FROM a
"""


def _dust_pages(o: DataFrame) -> DataFrame:
    """orders → (url, host, content_key) with planted DUST alias families:
    per content group (o_custkey) the four o_orderkey%4 variants are the
    canonical url, a ``?sid=`` query alias, a trailing-slash alias, and a
    ``www.`` host-prefix alias."""
    site = F.concat(
        F.lit("host"), (F.col("o_custkey") % N_HOSTS).cast("string"), F.lit(".example")
    )
    base = F.concat(F.lit("http://"), site, F.lit("/d"), F.col("o_custkey").cast("string"))
    v = F.col("o_orderkey") % 4
    url = (
        F.when(
            v == 3,
            F.concat(
                F.lit("http://www."), site, F.lit("/d"), F.col("o_custkey").cast("string")
            ),
        )
        .when(v == 1, F.concat(base, F.lit("?sid="), F.col("o_orderkey").cast("string")))
        .when(v == 2, F.concat(base, F.lit("/")))
        .otherwise(base)
    )
    return o.select(
        url.alias("url"), site.alias("host"), F.col("o_custkey").alias("content_key")
    )


def q_dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST url-alias rule mining (Bar-Yossef et al. 2007) over a frontier
    synthesized with planted alias families: per content group (o_custkey),
    orders become url variants — canonical, ``?sid=`` query alias, trailing
    slash, ``www.`` host prefix — and the miner recovers which rewrite rule
    maps each alias to its group's canonical url. The resulting rewrite map
    collapses aliases BEFORE fetch (each collapsed alias is a saved fetch —
    the reference can only dedup after fetching, visitedUrlCache)."""
    return U.mine_dust_rules(_dust_pages(_t(spark, sf_dir, "orders")))


Q_DUST_RULES_SQL = f"""
    WITH p AS (
      SELECT CASE WHEN o_orderkey % 4 = 3
               THEN 'http://www.host' || (o_custkey % {N_HOSTS}) || '.example/d' || o_custkey
               ELSE 'http://host' || (o_custkey % {N_HOSTS}) || '.example/d' || o_custkey ||
                 CASE WHEN o_orderkey % 4 = 1 THEN '?sid=' || o_orderkey
                      WHEN o_orderkey % 4 = 2 THEN '/' ELSE '' END
             END AS url,
             'host' || (o_custkey % {N_HOSTS}) || '.example' AS host,
             o_custkey AS content_key
      FROM orders
    ),
    r AS (
      SELECT url, host,
             min(url) OVER (PARTITION BY content_key) AS rep_url
      FROM p
    )
    SELECT url, rep_url, host,
           CASE WHEN url = rep_url || '/' THEN 'strip_slash'
                WHEN split_part(url, '?', 1) = rep_url THEN 'strip_query'
                WHEN replace(url, 'http://www.', 'http://') = rep_url THEN 'strip_www'
                ELSE 'other' END AS rule
    FROM r WHERE url != rep_url
"""


def q_dust_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized DUST rules applied to a NEVER-SEEN frontier: rules are
    mined only from even-custkey orders (so only even-numbered hosts earn
    rules), generalized per (host, rule) at min_support=2, then applied to
    a lineitem-derived frontier spanning ALL hosts — even hosts' aliases
    collapse, odd hosts' urls pass through untouched. The frontier never
    shuffles: the rules dim is broadcast and the rewrites are conditional
    JVM string expressions."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 2 == 0)
    rules = U.generalize_dust_rules(U.mine_dust_rules(_dust_pages(o)), min_support=2)
    li = _t(spark, sf_dir, "lineitem")
    site = F.concat(
        F.lit("host"), (F.col("l_partkey") % N_HOSTS).cast("string"), F.lit(".example")
    )
    path = F.concat(
        F.lit("/q"),
        F.col("l_orderkey").cast("string"),
        F.lit("x"),
        F.col("l_linenumber").cast("string"),
    )
    base = F.concat(F.lit("http://"), site, path)
    v = (F.col("l_orderkey") + F.col("l_linenumber")) % 4
    url = (
        F.when(v == 3, F.concat(F.lit("http://www."), site, path))
        .when(v == 1, F.concat(base, F.lit("?sid="), F.col("l_suppkey").cast("string")))
        .when(v == 2, F.concat(base, F.lit("/")))
        .otherwise(base)
    )
    frontier = li.select(url.alias("url"), site.alias("host"))
    return U.apply_dust_rules(frontier, rules)


Q_DUST_APPLY_SQL = f"""
    WITH src AS (SELECT * FROM orders WHERE o_custkey % 2 = 0),
    p AS (
      SELECT CASE WHEN o_orderkey % 4 = 3
               THEN 'http://www.host' || (o_custkey % {N_HOSTS}) || '.example/d' || o_custkey
               ELSE 'http://host' || (o_custkey % {N_HOSTS}) || '.example/d' || o_custkey ||
                 CASE WHEN o_orderkey % 4 = 1 THEN '?sid=' || o_orderkey
                      WHEN o_orderkey % 4 = 2 THEN '/' ELSE '' END
             END AS url,
             'host' || (o_custkey % {N_HOSTS}) || '.example' AS host,
             o_custkey AS content_key
      FROM src
    ),
    r AS (
      SELECT url, host, min(url) OVER (PARTITION BY content_key) AS rep_url FROM p
    ),
    pairs AS (
      SELECT url, host,
             CASE WHEN url = rep_url || '/' THEN 'strip_slash'
                  WHEN split_part(url, '?', 1) = rep_url THEN 'strip_query'
                  WHEN replace(url, 'http://www.', 'http://') = rep_url THEN 'strip_www'
                  ELSE 'other' END AS rule
      FROM r WHERE url != rep_url
    ),
    rules AS (
      SELECT host, rule FROM pairs WHERE rule != 'other'
      GROUP BY host, rule HAVING count(*) >= 2
    ),
    flags AS (
      SELECT host, bool_or(rule = 'strip_query') AS r_query,
             bool_or(rule = 'strip_slash') AS r_slash,
             bool_or(rule = 'strip_www') AS r_www
      FROM rules GROUP BY host
    ),
    f AS (
      SELECT CASE WHEN (l_orderkey + l_linenumber) % 4 = 3
               THEN 'http://www.host' || (l_partkey % {N_HOSTS}) || '.example/q'
                      || l_orderkey || 'x' || l_linenumber
               ELSE 'http://host' || (l_partkey % {N_HOSTS}) || '.example/q'
                      || l_orderkey || 'x' || l_linenumber ||
                 CASE WHEN (l_orderkey + l_linenumber) % 4 = 1 THEN '?sid=' || l_suppkey
                      WHEN (l_orderkey + l_linenumber) % 4 = 2 THEN '/' ELSE '' END
             END AS url,
             'host' || (l_partkey % {N_HOSTS}) || '.example' AS host
      FROM lineitem
    ),
    j AS (
      SELECT f.url, f.host,
             COALESCE(fl.r_query, FALSE) AS rq,
             COALESCE(fl.r_slash, FALSE) AS rs,
             COALESCE(fl.r_www, FALSE) AS rw
      FROM f LEFT JOIN flags fl ON f.host = fl.host
    ),
    s1 AS (
      SELECT url, host, rs, rw,
             CASE WHEN rq THEN split_part(url, '?', 1) ELSE url END AS u1
      FROM j
    ),
    s2 AS (
      SELECT url, host, rw,
             CASE WHEN rs AND u1 LIKE '%/' THEN substr(u1, 1, len(u1) - 1)
                  ELSE u1 END AS u2
      FROM s1
    )
    SELECT url, host,
           CASE WHEN rw THEN replace(u2, 'http://www.', 'http://') ELSE u2 END
             AS url_rewritten
    FROM s2
"""


def q_host_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate chunk detection (CCNet/RefinedWeb cleaning
    stage): chunks recurring across a source's documents are flagged and
    each document reports its boilerplate fraction."""
    return CU.host_boilerplate(_t(spark, sf_dir, "documents"))


Q_HOST_BOILERPLATE_SQL = CU.host_boilerplate_sql()


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # Ordered so the driver's 50-query correctness cap covers every operator
    # across rounds: the 47 keys with no CORRECTNESS_r03 row lead; the 50
    # r03-driver-green keys follow (VERDICT r3, "Next round" item 1).
    "bm25_search": q_bm25_search,
    "unigram_logprob": q_unigram_logprob,
    "shard_pack": q_shard_pack,
    "corpus_mix": q_corpus_mix,
    "mix_weights": q_mix_weights,
    "link_pagerank": q_link_pagerank,
    "link_hits": q_link_hits,
    "domain_graph": q_domain_graph,
    "vocab_growth": q_vocab_growth,
    "sessionize": q_sessionize,
    "session_stats": q_session_stats,
    "aimd_budgets": q_aimd_budgets,
    "asof_match": q_asof_match,
    "refetch_schedule": q_refetch_schedule,
    "length_quantiles": q_length_quantiles,
    "robots_decide": q_robots_decide,
    "robots_parse": q_robots_parse,
    "surt_keys": q_surt_keys,
    "warc_export": q_warc_export,
    "wet_export": q_wet_export,
    "cdx_index": q_cdx_index,
    "filter_funnel": q_filter_funnel,
    "gopher_quality": q_gopher_quality,
    "source_quality": q_source_quality,
    "url_trap": q_url_trap,
    "dust_rules": q_dust_rules,
    "dust_apply": q_dust_apply,
    "token_rarity": q_token_rarity,
    "robots_sitemaps": q_robots_sitemaps,
    "registered_domain": q_registered_domain,
    "refetch_priority": q_refetch_priority,
    "sitemap_parse": q_sitemap_parse,
    "redirect_resolve": q_redirect_resolve,
    "anchor_texts": q_anchor_texts,
    "snapshot_diff": q_snapshot_diff,
    "kmeans_clusters": q_kmeans_clusters,
    "cluster_sample": q_cluster_sample,
    "semdedup": q_semdedup,
    "link_components": q_link_components,
    "embedding_topk": q_embedding_topk,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_exhaustive": q_ann_ivf_exhaustive,
    "binary_meta": q_binary_meta,
    "media_features": q_media_features,
    # --- r03 driver-green tail ---
    "frontier_selection": q_frontier_selection,
    "politeness_window": q_politeness_window,
    "token_budget": q_token_budget,
    "seen_antijoin": q_seen_antijoin,
    "attenuation": q_attenuation,
    "queue_depth": q_queue_depth,
    "deadletter": q_deadletter,
    "host_skew_salt": q_host_skew_salt,
    "url_canonicalize": q_url_canonicalize,
    "delta_log_naming": q_delta_log_naming,
    "retry_routing": q_retry_routing,
    "policy_scope": q_policy_scope,
    "token_traits": q_token_traits,
    "urn_identity": q_urn_identity,
    "doc_lookup": q_doc_lookup,
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "ngram_containment": q_ngram_containment,
    "minhash_lsh": q_minhash_lsh,
    "oph_minhash_lsh": q_oph_minhash_lsh,
    "neardup_clusters": q_neardup_clusters,
    "neardup_keep_best": q_neardup_keep_best,
    "incremental_neardup": q_incremental_neardup,
    "clean_corpus": q_clean_corpus,
    "simhash_pairs": q_simhash_pairs,
    "token_stats": q_token_stats,
    "quality_score": q_quality_score,
    "classifier_score": q_classifier_score,
    "badwords_filter": q_badwords_filter,
    "doc_repetition": q_doc_repetition,
    "ccnet_buckets": q_ccnet_buckets,
    "lang_id": q_lang_id,
    "script_mix": q_script_mix,
    "nfc_normalize": q_nfc_normalize,
    "corpus_stats": q_corpus_stats,
    "fingerprint": q_fingerprint,
    "winnow_fingerprint": q_winnow_fingerprint,
    "winnow_fingerprint_fast": q_winnow_fingerprint_fast,
    "sample_stratified": q_sample_stratified,
    "train_split": q_train_split,
    "repeated_ngrams": q_repeated_ngrams,
    "repeated_ngram_scrub": q_repeated_ngram_scrub,
    "paragraph_dedup": q_paragraph_dedup,
    "sentence_dedup": q_sentence_dedup,
    "host_boilerplate": q_host_boilerplate,
    "decontaminate": q_decontaminate,
    "decontaminate_bloom": q_decontaminate_bloom,
    "pii_scrub": q_pii_scrub,
    "tfidf_top_terms": q_tfidf_top_terms,
    "inverted_index": q_inverted_index,
}

ORACLES: dict[str, str] = {
    "frontier_selection": Q_FRONTIER_SELECTION_SQL,
    "politeness_window": Q_POLITENESS_WINDOW_SQL,
    "token_budget": Q_TOKEN_BUDGET_SQL,
    "seen_antijoin": Q_SEEN_ANTIJOIN_SQL,
    "attenuation": Q_ATTENUATION_SQL,
    "queue_depth": Q_QUEUE_DEPTH_SQL,
    "deadletter": Q_DEADLETTER_SQL,
    "host_skew_salt": Q_HOST_SKEW_SALT_SQL,
    "url_canonicalize": Q_URL_CANONICALIZE_SQL,
    "delta_log_naming": Q_DELTA_LOG_NAMING_SQL,
    "retry_routing": Q_RETRY_ROUTING_SQL,
    "policy_scope": Q_POLICY_SCOPE_SQL,
    "token_traits": Q_TOKEN_TRAITS_SQL,
    "urn_identity": Q_URN_IDENTITY_SQL,
    "doc_lookup": Q_DOC_LOOKUP_SQL,
    "dedup_exact": Q_DEDUP_EXACT_SQL,
    "ngram_jaccard": Q_NGRAM_JACCARD_SQL,
    "ngram_containment": Q_NGRAM_CONTAINMENT_SQL,
    "minhash_lsh": Q_MINHASH_LSH_SQL,
    "oph_minhash_lsh": Q_OPH_MINHASH_LSH_SQL,
    "neardup_clusters": Q_NEARDUP_CLUSTERS_SQL,
    "neardup_keep_best": Q_NEARDUP_KEEP_BEST_SQL,
    "incremental_neardup": Q_INCREMENTAL_NEARDUP_SQL,
    "clean_corpus": Q_CLEAN_CORPUS_SQL,
    "token_stats": Q_TOKEN_STATS_SQL,
    "quality_score": Q_QUALITY_SCORE_SQL,
    "classifier_score": Q_CLASSIFIER_SCORE_SQL,
    "badwords_filter": Q_BADWORDS_FILTER_SQL,
    "doc_repetition": Q_DOC_REPETITION_SQL,
    "ccnet_buckets": Q_CCNET_BUCKETS_SQL,
    "lang_id": Q_LANG_ID_SQL,
    "script_mix": Q_SCRIPT_MIX_SQL,
    "nfc_normalize": Q_NFC_NORMALIZE_SQL,
    "corpus_stats": Q_CORPUS_STATS_SQL,
    "fingerprint": Q_FINGERPRINT_SQL,
    "winnow_fingerprint": Q_WINNOW_FINGERPRINT_SQL,
    "sample_stratified": Q_SAMPLE_STRATIFIED_SQL,
    "train_split": Q_TRAIN_SPLIT_SQL,
    "repeated_ngrams": Q_REPEATED_NGRAMS_SQL,
    "repeated_ngram_scrub": Q_REPEATED_NGRAM_SCRUB_SQL,
    "paragraph_dedup": CU.paragraph_dedup_sql(width=3),
    "sentence_dedup": Q_SENTENCE_DEDUP_SQL,
    "host_boilerplate": Q_HOST_BOILERPLATE_SQL,
    "dust_rules": Q_DUST_RULES_SQL,
    "dust_apply": Q_DUST_APPLY_SQL,
    "decontaminate": Q_DECONTAMINATE_SQL,
    "decontaminate_bloom": Q_DECONTAMINATE_SQL,  # row-identical scale path
    "pii_scrub": Q_PII_SCRUB_SQL,
    "tfidf_top_terms": Q_TFIDF_TOP_TERMS_SQL,
    "inverted_index": Q_INVERTED_INDEX_SQL,
    "bm25_search": Q_BM25_SEARCH_SQL,
    "unigram_logprob": Q_UNIGRAM_LOGPROB_SQL,
    "shard_pack": Q_SHARD_PACK_SQL,
    "corpus_mix": Q_CORPUS_MIX_SQL,
    "mix_weights": Q_MIX_WEIGHTS_SQL,
    "link_pagerank": _link_pagerank_sql(),
    "link_hits": _link_hits_sql(),
    "domain_graph": _domain_graph_sql(),
    "vocab_growth": Q_VOCAB_GROWTH_SQL,
    "sessionize": EV.sessionize_sql(),
    "session_stats": EV.session_stats_sql(),
    "aimd_budgets": Q_AIMD_BUDGETS_SQL,
    "asof_match": EV.asof_match_sql(),
    "refetch_schedule": EV.refetch_schedule_sql(),
    "length_quantiles": Q_LENGTH_QUANTILES_SQL,
    "robots_decide": Q_ROBOTS_DECIDE_SQL,
    "robots_parse": Q_ROBOTS_PARSE_SQL,
    "surt_keys": Q_SURT_KEYS_SQL,
    "warc_export": Q_WARC_EXPORT_SQL,
    "wet_export": Q_WET_EXPORT_SQL,
    "cdx_index": Q_CDX_INDEX_SQL,
    "filter_funnel": Q_FILTER_FUNNEL_SQL,
    "gopher_quality": Q_GOPHER_QUALITY_SQL,
    "source_quality": Q_SOURCE_QUALITY_SQL,
    "url_trap": Q_URL_TRAP_SQL,
    "token_rarity": Q_TOKEN_RARITY_SQL,
    "robots_sitemaps": Q_ROBOTS_SITEMAPS_SQL,
    "registered_domain": _registered_domain_sql(),
    "refetch_priority": _refetch_priority_sql(),
    "sitemap_parse": _sitemap_parse_sql(),
    "redirect_resolve": _redirect_resolve_sql(),
    "anchor_texts": _anchor_texts_sql(),
    "snapshot_diff": Q_SNAPSHOT_DIFF_SQL,
    "kmeans_clusters": _kmeans_sql(),
    "cluster_sample": _cluster_sample_sql(),
    "semdedup": _semdedup_sql(),
    "link_components": _link_components_sql(),
    "embedding_topk": Q_EMBEDDING_TOPK_SQL,
    "embedding_neardup": Q_EMBEDDING_NEARDUP_SQL,
    "ann_ivf_exhaustive": Q_EMBEDDING_TOPK_SQL,  # nprobe=all ≡ brute force
    "binary_meta": Q_BINARY_META_SQL,
    "media_features": Q_MEDIA_FEATURES_SQL,
    # simhash_pairs / ann_lsh / ann_ivf / winnow_fingerprint_fast: hash- or
    # projection-dependent → rows-only checks (tests pin their
    # quality/recall/equivalence instead)
}
