"""End-to-end corpus-build pipeline (scripts/build_corpus.py): crawl →
clean → near-dup prune → split → shards → parquet + manifest."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


import pytest


@pytest.mark.parametrize("keep", ["first", "best"])
def test_build_corpus_end_to_end(spark, tmp_path, keep):
    import build_corpus

    out = str(tmp_path / "corpus")
    m = build_corpus.main(
        [
            "--synth", "300",
            "--out", out,
            "--catalog", str(tmp_path / "cat"),
            "--local-cores", "8",
            "--shard-tokens", "2000",
            "--max-supersteps", "30",
            "--keep", keep,
        ]
    )
    assert m["n_clean"] > 0 and m["n_kept"] > 0
    assert m["n_kept"] + m["n_neardup_dropped"] == m["n_clean"]
    # manifest written and parseable
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        disk = json.load(f)
    assert disk["n_kept"] == m["n_kept"]

    df = spark.read.parquet(out)
    rows = df.count()
    assert rows == m["n_kept"]
    # split partitions cover everything and are the hash-range assignment
    splits = {r["split"] for r in df.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # no doc appears twice (dedup + single write)
    assert df.select("doc_id").distinct().count() == rows
    # shard budgets: every shard except a split's last stays under ~budget
    # + one doc (packing invariant: shard boundary crossed by at most one doc)
    from pyspark.sql import functions as F

    per_shard = (
        df.groupBy("split", "shard_id").agg(F.sum("n_tokens").alias("t")).collect()
    )
    assert all(r["t"] > 0 for r in per_shard)
