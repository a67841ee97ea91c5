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


def test_lsh_neardup_pairs_recall_and_precision(spark, emb):
    """The scalable near-dup path must (a) find ≥90% of the exact cos≥0.4
    pairs, (b) report only true pairs (exact verify ⇒ precision 1.0), and
    (c) never enumerate the cartesian (candidate set < N²/2)."""
    from ospo_ghcrawler_spark.operators.similarity import cosine, lsh_neardup_pairs

    t = 0.4
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    exact_pairs = {
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine(F.col("a_vec"), F.col("b_vec")))
        .filter(F.col("cos") >= t)
        .collect()
    }
    got_rows = lsh_neardup_pairs(emb, threshold=t, dim=64).collect()
    got = {(r["a_id"], r["b_id"]) for r in got_rows}
    assert got <= exact_pairs  # exact verify: no false positives
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"neardup LSH recall too low: {recall}"
