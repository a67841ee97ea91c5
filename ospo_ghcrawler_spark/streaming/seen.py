"""Streaming URL-seen dedup — the stateful analog of the batch engine's
seen-filter (operators/dedup.seen_filter / SURVEY §2.2 D3).

The batch crawl loop deduplicates candidates against the ``seen`` snapshot
once per superstep; a live ingestion path (webhook seeds, event-queue
urls — streaming/seeds.py) wants the same guarantee per MICRO-BATCH:
emit each url's FIRST occurrence exactly once, drop every later arrival,
continuously across batches.

Implemented as a custom stateful operator (``applyInPandasWithState``),
same discipline as streaming/sessions.py:

- grouping key is ``url_hash % shards`` (a power-of-two shard count), so
  the state store holds ``shards`` groups whose per-group state is the
  set of hashes seen in that shard — the streaming twin of the engine's
  sharded bloom layout (operators/dedup.py), but EXACT: the state carries
  the hashes themselves (8 bytes/url; at 10^10 urls shard state is why
  the batch path uses blooms — this operator is the ingest-edge dedup
  for event-rate streams, not a frontier-scale store);
- within a micro-batch, first occurrence wins deterministically by
  ``(seq, url_hash)`` order — the same attenuation tie-break the batch
  seed path applies (operators/dedup.attenuate);
- parity: fed the same rows in any micro-batch split, the emitted set is
  identical to batch ``dropDuplicates`` + anti-join against prior state —
  pinned by tests/test_streaming_seen.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("seen_hashes", T.ArrayType(T.LongType()), False)]
)


def streaming_seen_filter(urls: DataFrame, shards: int = 32) -> DataFrame:
    """urls stream (url, url_hash, seq) → first occurrence of each url_hash
    exactly once, continuously across micro-batches.

    *shards* bounds parallelism of the state store (one group per shard);
    it must stay constant across restarts (state is keyed by shard).
    """

    def dedup(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        added = False
        for pdf in pdfs:
            pdf = pdf.sort_values(["seq", "url_hash"], kind="mergesort")
            keep = ~pdf["url_hash"].duplicated(keep="first") & ~pdf[
                "url_hash"
            ].isin(seen)
            out = pdf.loc[keep, ["url_hash", "url", "seq"]]
            if len(out):
                seen.update(int(h) for h in out["url_hash"])
                added = True
            yield out
        if added or not state.exists:
            state.update((sorted(seen),))

    shard = (F.pmod(F.col("url_hash"), F.lit(shards))).cast("int").alias("_shard")
    return (
        urls.select("url", "url_hash", "seq", shard)
        .groupBy("_shard")
        .applyInPandasWithState(
            dedup,
            outputStructType=SEEN_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
