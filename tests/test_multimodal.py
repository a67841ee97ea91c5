"""Multimodal binary-column plumbing: schema, batch shape, stubbed decode."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.operators.multimodal import (
    attach_payload,
    decode_stub,
    feature_extract,
    frame_sample_stub,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return attach_payload(docs, "doc_id", "text", mime="text/plain").cache()


def test_payload_schema(media):
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_id"] == "bigint"
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert isinstance(bytes(row["payload"]), bytes)
    assert row["meta"]["bytes"] == str(len(bytes(row["payload"])))


def test_feature_extract_fake(media):
    feats = feature_extract(media).collect()
    assert len(feats) == media.count()
    for r in feats[:10]:
        assert len(r["features"]) == 16
        assert sum(r["features"]) == r["n_bytes"], "histogram mass = byte count"


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG", "image/png")


def test_real_decoder_pluggable(media):
    def fake_decoder(payload, mime):
        return [len(payload), 0, 0]

    rows = feature_extract(media, decoder=fake_decoder).collect()
    assert all(r["features"][0] == r["n_bytes"] for r in rows)


def test_frame_sample_plumbing(media):
    frames = frame_sample_stub(media, every_n=10)
    df = frames.groupBy("media_id").count()
    assert df.count() == media.count()
    assert frames.filter(F.col("frame_idx") % 10 != 0).count() == 0
