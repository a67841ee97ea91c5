"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata struct;
all Spark-side plumbing (schemas, batch shapes, partition-sized Arrow
transfer) is real and tested. The actual media decode is STUBBED — the
sandbox ships no image/audio libraries — behind ``decode_stub`` (raises
``NotImplementedError``) and ``fake_features`` (a deterministic byte-level
featurizer standing in for a real extractor so downstream plumbing is
exercised end-to-end).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Demo payload builder: utf-8 bytes of a text column as the opaque blob
    (real pipelines read bytes from WARC/tar shards the same way)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(mime).alias("mime"),
        F.create_map(
            F.lit("bytes"), F.octet_length(F.col(text_col)).cast("string")
        ).alias("meta"),
    )


def decode_stub(payload: bytes, mime: str):
    """Real decoders (PIL / torchaudio / pyav) are not in this container."""
    raise NotImplementedError(
        f"media decode for {mime!r} requires an image/audio library; "
        "plug a decoder in via feature_extract(decoder=...)"
    )


def _byte_histogram(payload: bytes, bins: int = 16) -> list[int]:
    """Deterministic fake featurizer: 16-bin byte histogram."""
    if payload is None:
        return [0] * bins
    a = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(a >> 4, minlength=bins).astype(np.int64).tolist()


def feature_extract(media: DataFrame, bins: int = 16, decoder=None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``decoder=None`` → the deterministic fake (byte histogram), so the Arrow
    batch shape / schema / partitioning of a real extractor is exercised;
    pass a real decoder callable to swap in actual media features.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("mime", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.LongType()), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, m) if decoder else _byte_histogram(p, bins)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(fn, schema=out_schema)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx) rows for a
    deterministic fake frame count derived from payload size (a real
    implementation would demux with pyav inside the same mapInPandas)."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.octet_length("payload") / 100).cast("int") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )
