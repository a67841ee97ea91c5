"""Structured-Streaming seed ingestion — the event-queue path.

The reference ingests external events two ways: the HMAC-verified webhook
(POST /webhook → Request('event_trigger', ...) on the 'events' queue,
/root/reference/routes/webhook.js:14-45) and an AMQP topic subscription
(lib/crawlerFactory.js:603-612, EventFormatter at :657-681). Event work gets
pop weight 10 — it preempts about half of all pops.

Here the analog is a **file-source stream of seed batches**: JSON-lines files
dropped into a watched directory become priority-0 frontier rows via
``foreachBatch`` (canonicalize → attenuate → anti-join seen/frontier →
append). Each micro-batch is one atomic frontier snapshot append, so the
crawl loop picks new seeds up at its next superstep — exactly the reference's
"events preempt the next pop" semantics, superstep-granular.

Schema of a seed file line: {"url": "...", "priority": 0}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ospo_ghcrawler_spark.config import PRIORITY_EVENTS
from ospo_ghcrawler_spark.functions.urls import canonicalize_udf, host_col
from ospo_ghcrawler_spark.operators.dedup import attenuate
from ospo_ghcrawler_spark.operators.politeness import robots_allowed_filter
from ospo_ghcrawler_spark.plans.catalog import SnapshotTable
from ospo_ghcrawler_spark.schemas import FRONTIER_SCHEMA

SEED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), True),
        T.StructField("policy", T.StringType(), True),
        # hex HMAC-SHA1 of the whole seed row (url+priority+policy+payload,
        # see seed_message_col) under the webhook secret — the reference's
        # whole-body X-Hub-Signature, routes/webhook.js:19-29
        T.StructField("signature", T.StringType(), True),
        T.StructField("payload", T.StringType(), True),
    ]
)

# the reference's queuing messageSize cap (lib/crawlerFactory.js:81: 240 KB)
MAX_MESSAGE_KB = 240


def hmac_sha1_col(key: bytes, msg_col) -> F.Column:
    """HMAC-SHA1 as a pure JVM expression (no Python in the stream path):
    ``sha1(okey ‖ unhex(sha1(ikey ‖ msg)))`` with the standard 64-byte
    ipad/opad key blocks folded in as binary literals."""
    if len(key) > 64:
        import hashlib

        key = hashlib.sha1(key).digest()
    key = key.ljust(64, b"\x00")
    ikey = bytes(b ^ 0x36 for b in key)
    okey = bytes(b ^ 0x5C for b in key)
    inner = F.sha1(F.concat(F.lit(ikey), F.encode(msg_col, "UTF-8")))
    return F.sha1(F.concat(F.lit(okey), F.unhex(inner)))


def seed_message_col() -> F.Column:
    """The canonical signed message of a seed row: every request field the
    engine acts on — url, priority, policy, payload — joined with newlines
    (nulls as empty fields, so the field count is fixed). The reference
    signs the ENTIRE request body (routes/webhook.js:19-29 computes
    X-Hub-Signature over the raw payload); signing only the url would let a
    captured (url, signature) pair be replayed with attacker-chosen
    priority/policy/payload (ADVICE r02)."""
    return F.concat_ws(
        "\n",
        F.coalesce(F.col("url"), F.lit("")),
        F.coalesce(F.col("priority").cast("string"), F.lit("")),
        F.coalesce(F.col("policy"), F.lit("")),
        F.coalesce(F.col("payload"), F.lit("")),
    )


def sign_seed(
    secret: bytes,
    url: str,
    priority: int | None = None,
    policy: str | None = None,
    payload: str | None = None,
) -> str:
    """Producer-side signature for a seed row — the Python mirror of
    :func:`seed_message_col` + :func:`hmac_sha1_col` (what a webhook sender
    puts in X-Hub-Signature)."""
    import hashlib
    import hmac

    msg = "\n".join(
        [url or "", "" if priority is None else str(priority), policy or "", payload or ""]
    )
    return hmac.new(secret, msg.encode(), hashlib.sha1).hexdigest()


def verify_webhook_batch(
    batch: DataFrame, secret: bytes | None, max_message_kb: int = MAX_MESSAGE_KB
) -> DataFrame:
    """Webhook authenticity + size gate (C3): with a secret configured, rows
    whose ``signature`` does not equal the HMAC-SHA1 of the WHOLE seed row
    (:func:`seed_message_col` — url+priority+policy+payload, the reference's
    whole-body X-Hub-Signature) are dropped — the reference 400s on mismatch
    (routes/webhook.js:26-29, timing-safe compare; a batch filter has no
    early-exit timing channel). Oversized payloads are dropped per the
    queuing messageSize cap."""
    out = batch
    if secret is not None:
        out = out.filter(
            F.col("signature").isNotNull()
            & (F.lower("signature") == hmac_sha1_col(secret, seed_message_col()))
        )
    return out.filter(
        F.coalesce(F.octet_length("payload"), F.lit(0)) <= max_message_kb * 1024
    )


def seed_batch_to_frontier_rows(
    batch: DataFrame, step: int, partitions: int, batch_id: int = 0
) -> DataFrame:
    """Raw (url, priority) rows → canonical frontier rows (event priority by
    default; seq namespaced by batch id so stream batches stay FIFO)."""
    return (
        batch.withColumn("url", canonicalize_udf("url"))
        .filter(F.col("url").isNotNull())
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", host_col(F.col("url")))
        .withColumn("host_salt", F.pmod(F.xxhash64("host"), F.lit(partitions)).cast("int"))
        .withColumn(
            "priority", F.coalesce(F.col("priority"), F.lit(PRIORITY_EVENTS)).cast("int")
        )
        .withColumn("attempt", F.lit(0))
        .withColumn("depth", F.lit(0))
        .withColumn("policy", F.coalesce(F.col("policy"), F.lit("default")))
        .withColumn("enqueue_step", F.lit(step).cast("int"))
        .withColumn("not_before_step", F.lit(step).cast("int"))
        .withColumn(
            "seq",
            (F.lit(int(batch_id) << 20) + F.xxhash64("url").bitwiseAND(F.lit((1 << 20) - 1)))
            .cast("long"),
        )
        .select(*[f.name for f in FRONTIER_SCHEMA.fields])
    )


def start_seed_stream(
    spark: SparkSession,
    seeds_dir: str,
    frontier: SnapshotTable,
    seen: SnapshotTable,
    robots: DataFrame,
    checkpoint_dir: str,
    partitions: int = 32,
    step_provider=lambda: 0,
    hmac_secret: bytes | None = None,
    max_message_kb: int = MAX_MESSAGE_KB,
):
    """Watch *seeds_dir* for JSON-lines seed files; every micro-batch lands as
    one deduped frontier snapshot append. Returns the StreamingQuery.
    With *hmac_secret*, each row must carry a valid HMAC-SHA1 ``signature``
    (the reference's webhook authenticity check)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        batch = verify_webhook_batch(batch, hmac_secret, max_message_kb)
        rows = seed_batch_to_frontier_rows(batch, step_provider(), partitions, batch_id)
        rows = attenuate(rows)
        rows = robots_allowed_filter(rows, robots)
        rows = rows.join(seen.read().select("url_hash"), "url_hash", "left_anti")
        rows = rows.join(frontier.read().select("url_hash"), "url_hash", "left_anti")
        frontier.append(rows.select(*[f.name for f in FRONTIER_SCHEMA.fields]))

    stream = (
        spark.readStream.schema(SEED_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(seeds_dir)
    )
    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
