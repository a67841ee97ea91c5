"""Declared schemas for every engine table.

The reference moves schema-free row JSON (requests serialized at
/root/reference/providers/queuing/amqpQueue.js:69, documents at
/root/reference/providers/storage/storageDocStore.js:36-49); here everything is
a fixed-schema columnar table so Catalyst can prune/pushdown.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The BASELINE.json input_hint table: Common-Crawl-style web pages.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Harvested pages (engine output): input_hint columns + crawl provenance.
# One row per fetch attempt settled in a superstep — content rows have
# status=200 (html/text/links populated); 404/5xx rows are the fetch log
# (the reference's delta log records failures too, deltaStore.js:26-31).
# Everything downstream of extraction derives from THIS table's snapshot, so
# html is materialized exactly once per superstep and column pruning keeps it
# out of every later read.
HARVEST_SCHEMA = T.StructType(
    list(PAGES_SCHEMA.fields)
    + [
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), True),
        T.StructField("attempt", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("enqueue_step", T.IntegerType(), True),
        T.StructField("seq", T.LongType(), True),
        # the request's traversal policy rides the harvest (reference stores
        # request context with the doc) — edges inherit it straight from the
        # harvest log, no join back to the selected batch needed
        T.StructField("policy", T.StringType(), True),
        T.StructField("superstep", T.IntegerType(), False),
        T.StructField("status", T.IntegerType(), False),  # 200 / 404 / 599
        T.StructField("fetch_ms", T.LongType(), True),
        # content fingerprint (md5 of extracted text) — the etag analog for
        # conditional refetch / change detection across recrawl snapshots
        # (reference storageDocStore.etag, providers/storage/
        # storageDocStore.js:79-91)
        T.StructField("etag", T.StringType(), True),
        # 3xx Location (network fetcher only; null otherwise): redirects are
        # settled under the ORIGINAL url and the target re-enters through
        # the normal canonicalize/robots/selection path — never followed
        # in-transport (that would fetch a url the scheduler didn't check)
        T.StructField("redirect_to", T.StringType(), True),
        # the server's ETag response header (network fetcher only; null
        # otherwise) — what conditional refetch sends back as
        # If-None-Match. Distinct from `etag` above, which is OUR content
        # hash (reference payload etag replay, crawlerFactory.js:669-679)
        T.StructField("http_etag", T.StringType(), True),
        # fetch-time document features (cfg.featurize_at_fetch; null when
        # disabled): the text-quality signals a training-data pipeline needs
        # are computed in the SAME single pass that already holds the text,
        # so the corpus never has to be re-scanned to score it — pure JVM
        # expressions inside the harvest-write stage
        T.StructField("n_tokens", T.IntegerType(), True),
        T.StructField("n_types", T.IntegerType(), True),
        T.StructField("n_punct", T.IntegerType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("lang_pred", T.StringType(), True),
        # whitespace-invariant content fingerprint (dedup key; etag above is
        # the exact-bytes change key)
        T.StructField("fp", T.StringType(), True),
        # winnowing fingerprints (MOSS, cfg.winnow_at_fetch; null when
        # disabled): shared-k-gram-run witnesses for near-dup detection,
        # computed in the harvest pass (functions/text.py:
        # winnow_fingerprints_fast — xxhash64 grams, JVM-only)
        T.StructField("winnow_fp", T.ArrayType(T.LongType()), True),
        # sparse OPH MinHash signature (cfg.minhash_at_fetch; null when
        # disabled): per-bin minima of one-hash-per-shingle, the input to
        # Jaccard-LSH banding without re-reading text
        # (functions/text.py:minhash_oph_entries)
        T.StructField(
            "minhash_oph",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("bin", T.IntegerType(), False),
                        T.StructField("h", T.LongType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)

# One row per frontier entry — the reference's Request object
# (/root/reference/routes/requests.js:65-81) as a row.
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_salt", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),  # 0..4
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        # logical clocks: superstep indices, not wall time, for determinism
        T.StructField("enqueue_step", T.IntegerType(), False),
        T.StructField("not_before_step", T.IntegerType(), False),
        # FIFO tie-breaker within (priority, enqueue_step)
        T.StructField("seq", T.LongType(), False),
        # per-request traversal policy (the reference carries `policy` on
        # every Request, routes/requests.js:79; TraversalPolicy controls walk
        # scope per seed) — edges inherit the parent's policy and expansion
        # honors the policy's depth ceiling (CrawlConfig.policy_depths)
        T.StructField("policy", T.StringType(), False),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("first_seen_step", T.IntegerType(), False),
        T.StructField("status", T.IntegerType(), False),
    ]
)

# fetch+extract stage output: frontier row + fetch result + extraction
EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("enqueue_step", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("policy", T.StringType()),
        T.StructField("fetch_salt", T.IntegerType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("fetch_ms", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay_ms", T.LongType(), True),
        T.StructField("budget_per_window", T.IntegerType(), True),
    ]
)

DEADLETTER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("first_seen_step", T.IntegerType(), False),
        T.StructField("last_error_step", T.IntegerType(), False),
    ]
)

# Per-superstep per-host lineage + fetch metrics (north rule requirement).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("superstep", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("selected", T.LongType(), False),
        T.StructField("fetched_ok", T.LongType(), False),
        T.StructField("fetched_404", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("new_edges", T.LongType(), False),
        T.StructField("dedup_bounced", T.LongType(), False),
        T.StructField("fetch_ms_sum", T.LongType(), False),
        # min per-call latency in the window — the compute limiter's adaptive
        # baseline observation (reference computeLimiter.js:30: baseline =
        # min(amount, baseline)); null on the synthetic "__run__" row
        T.StructField("fetch_ms_min", T.LongType(), True),
        T.StructField("bytes", T.LongType(), False),
    ]
)
