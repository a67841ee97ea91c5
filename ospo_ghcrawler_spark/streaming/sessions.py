"""Streaming gap-sessionization — the stateful analog of
``operators/events.sessionize``.

The batch operator assigns sessions with one window pass (events.py). A
live event stream (the reference emits per-request lifecycle events
through its queue wiring — crawlerFactory.js event hooks) needs the same
assignment incrementally: per-user state carrying (last event time,
session ordinal) across micro-batches, a new session opening whenever the
gap exceeds the threshold.

Implemented as a CUSTOM STATEFUL operator (``applyInPandasWithState``):

- state is O(1) per user — ``(last_us, ordinal)`` — regardless of how
  many events the user ever produced; at 100 TB of events the state
  store holds |users| tiny rows, not history;
- each micro-batch's group is sorted by (ts, event_id) inside the
  worker (pandas, Arrow-batched) — identical total order to the batch
  window's ``orderBy``;
- **parity**: fed the same events in event-time order (however they are
  split into micro-batches), the emitted ``session_id`` values are
  bit-identical to the batch operator's — pinned by
  ``tests/test_streaming_sessions.py`` which runs both over the same
  frame and diffs;
- an event-time timeout (``GroupStateTimeout.EventTimeTimeout`` when a
  watermark is set upstream) lets closed sessions expire from the store;
  with no watermark the operator still assigns correctly and state is
  bounded by |users|.

Session ids use the SAME encoding as the batch op: user_id * 1e6 +
per-user ordinal (1-based).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ospo_ghcrawler_spark.operators.events import DEFAULT_GAP_MIN

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_id", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType(), False),
        T.StructField("ordinal", T.LongType(), False),
    ]
)


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN
) -> DataFrame:
    """events stream (event_id, user_id, ts[, ...]) → (event_id, user_id,
    session_id) with gap-based sessions continuous across micro-batches."""
    gap_us = int(gap_minutes) * 60 * 1_000_000

    def assign(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_us, ordinal = state.get
        else:
            last_us, ordinal = -(1 << 62), 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            ts_us = (
                pd.to_datetime(pdf["ts"]).astype("int64") // 1000
            ).to_numpy()
            out = []
            for t in ts_us:
                if t - last_us > gap_us:
                    ordinal += 1
                last_us = int(t)
                out.append(user_id * 1_000_000 + ordinal)
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].to_numpy(),
                    "user_id": user_id,
                    "session_id": out,
                }
            )
        state.update((last_us, ordinal))

    return events.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
