"""Streaming gap-sessionization parity: the applyInPandasWithState
operator must assign bit-identical session_ids to the batch window
operator when fed the same events in event-time order, however they are
split into micro-batches."""

import json
import os

from pyspark.sql import types as T

from ospo_ghcrawler_spark.operators.events import sessionize
from ospo_ghcrawler_spark.streaming.sessions import streaming_sessionize

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _write(d: str, name: str, rows, mtime: int):
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    with open(p, "w") as f:
        for eid, uid, ts in rows:
            f.write(json.dumps({"event_id": eid, "user_id": uid, "ts": ts}) + "\n")
    os.utime(p, (mtime, mtime))


def test_streaming_sessionize_matches_batch_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "ev")
    # user 1: a session spanning the micro-batch boundary (gap 10 min < 30)
    # and a new session opening in batch 2 (gap 45 min); user 2: one event
    # per batch, 2h apart -> two sessions.
    b0 = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:10:00"),
        (3, 2, "2024-01-01 00:00:00"),
    ]
    b1 = [
        (4, 1, "2024-01-01 00:20:00"),  # continues session 1 across batches
        (5, 1, "2024-01-01 01:05:00"),  # 45 min gap -> session 2
        (6, 2, "2024-01-01 02:00:00"),  # 2 h gap -> session 2
    ]
    _write(src, "b0.json", b0, 1_000_000)
    _write(src, "b1.json", b1, 1_000_100)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: r["session_id"]
        for r in spark.table("sess_stream").collect()
    }

    static = spark.createDataFrame(
        [(e, u, t) for e, u, t in b0 + b1], schema="event_id long, user_id long, ts string"
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts")
    want = {
        r["event_id"]: r["session_id"] for r in sessionize(static).collect()
    }
    assert got == want
    # the boundary-spanning session really did span micro-batches
    assert got[1] == got[2] == got[4] and got[5] == got[4] + 1
    assert got[6] == got[3] + 1


def test_streaming_sessionize_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-restart mid-stream: a fresh query object resumed from the
    same checkpoint must restore per-user (last_ts, ordinal) state so a
    session spanning the RESTART boundary keeps its id and a post-restart
    gap still increments — bit-identical to the batch operator over the
    concatenated input."""
    src = str(tmp_path / "ev")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_query():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        return (
            streaming_sessionize(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    b0 = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:10:00"),
        (3, 2, "2024-01-01 00:00:00"),
    ]
    _write(src, "b0.json", b0, 1_000_000)
    q = run_query()
    q.awaitTermination(180)

    # while DOWN: user 1 continues within-gap across the restart AND opens
    # a later session; user 2 gaps out -> new session
    b1 = [
        (4, 1, "2024-01-01 00:20:00"),
        (5, 1, "2024-01-01 01:05:00"),
        (6, 2, "2024-01-01 02:00:00"),
    ]
    _write(src, "b1.json", b1, 1_000_100)
    q = run_query()
    q.awaitTermination(180)

    got = {
        r["event_id"]: r["session_id"]
        for r in spark.read.parquet(sink).collect()
    }
    static = spark.createDataFrame(
        [(e, u, t) for e, u, t in b0 + b1],
        schema="event_id long, user_id long, ts string",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts")
    want = {r["event_id"]: r["session_id"] for r in sessionize(static).collect()}
    assert got == want
    # the restart-spanning session kept its id; the later gap still split
    assert got[1] == got[2] == got[4] and got[5] == got[4] + 1
    assert got[6] == got[3] + 1
