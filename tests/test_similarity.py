"""ANN quality: LSH and IVF top-k recall vs exact brute force."""

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.operators.similarity import brute_topk, ivf_topk, lsh_topk

SF = "/root/testdata/sf0.01"
K = 5
NQ = 20


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact(emb):
    queries = emb.filter(F.col("vec_id") < NQ).select("vec_id", "embedding")
    rows = brute_topk(emb, queries, K).collect()
    return {(r["q_id"], r["neighbor_id"]) for r in rows}


def _recall(approx_rows, exact_pairs):
    got = {(r["q_id"], r["neighbor_id"]) for r in approx_rows}
    return len(got & exact_pairs) / len(exact_pairs)


def test_lsh_recall(emb, exact):
    queries = emb.filter(F.col("vec_id") < NQ).select("vec_id")
    rows = lsh_topk(emb, queries, K, dim=64).collect()
    r = _recall(rows, exact)
    assert r >= 0.8, f"LSH recall too low: {r}"
    # every query answered with k results
    per_q = {}
    for row in rows:
        per_q[row["q_id"]] = per_q.get(row["q_id"], 0) + 1
    assert all(v <= K for v in per_q.values())


def test_ivf_recall(emb, exact):
    queries = emb.filter(F.col("vec_id") < NQ).select("vec_id")
    rows = ivf_topk(emb, queries, K, dim=64, n_clusters=16, nprobe=6).collect()
    r = _recall(rows, exact)
    assert r >= 0.6, f"IVF recall too low: {r}"


def test_brute_topk_deterministic(emb):
    queries = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding")
    a = brute_topk(emb, queries, K).collect()
    b = brute_topk(emb.repartition(13), queries, K).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
