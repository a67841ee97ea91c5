"""Similarity search over embedding columns (``array<float>``).

- :func:`brute_topk` — exact cosine top-k via a broadcast join of the (small)
  query set against the full table; the dot product is a JVM-side
  ``zip_with`` + ``aggregate`` fold (no Python, whole-stage codegen). The
  sequential fold order matches DuckDB's ``list_dot_product`` on DOUBLE[] so
  the oracle compares bit-identically.
- :func:`lsh_topk` — random-hyperplane LSH: 16-bit sign signatures from a
  seeded numpy projection (vectorized mapInPandas), Hamming-band candidate
  buckets, exact cosine re-rank on candidates. The scale path: candidates per
  query shrink from N to ~N/2^bits · bucket-fanout.
- :func:`ivf_topk` — IVF: deterministic centroid seeds + one Lloyd step,
  probe the ``nprobe`` nearest clusters, exact re-rank inside.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T



# Cached intermediates (signature / cluster-assignment passes) — same
# registry contract as operators.dedup_docs: results are lazy, so callers
# release cached blocks with clear_caches() after materializing (ADVICE r02).
_CACHED: list[DataFrame] = []


def _cache(df: DataFrame) -> DataFrame:
    _CACHED.append(df)
    return df.cache()


def clear_caches() -> None:
    """Unpersist every intermediate cached by this module's operators."""
    while _CACHED:
        _CACHED.pop().unpersist()


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors (by cosine) of each query against all vectors.

    queries is broadcast (small); rank ties break on neighbor id so the
    result is total-ordered and oracle-comparable.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id"), F.col("rank"), F.col("n_id").alias("neighbor_id"), F.col("cos"))
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)
# ---------------------------------------------------------------------------

def _sign_signature_udf(id_col: str, vec_col: str, dim: int, n_tables: int, n_bits: int, seed: int):
    """mapInPandas stage emitting (id, table, sig) rows: ``n_tables``
    independent sign signatures of ``n_bits`` each under fixed seeded
    projections — deterministic across partitioning/parallelism."""
    planes = np.random.default_rng(seed).standard_normal((n_tables, dim, n_bits))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            out_id, out_t, out_sig = [], [], []
            for t in range(n_tables):
                bits = (M @ planes[t]) > 0
                sig = np.zeros(len(pdf), dtype=np.int64)
                for i in range(n_bits):
                    sig |= bits[:, i].astype(np.int64) << i
                out_id.append(ids)
                out_t.append(np.full(len(pdf), t, dtype=np.int32))
                out_sig.append(sig)
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_id),
                    "table": np.concatenate(out_t),
                    "sig": np.concatenate(out_sig),
                }
            )

    return fn


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH (candidates share any table's
    bucket, with 1-bit multi-probe on the query side), exact cosine re-rank
    on candidates only. With 8 tables × 6 bits + multiprobe, recall ≈0.85+
    even for weak-angle (cos≈0.3) neighbors; candidate volume ~N·L/2^bits."""
    sig_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("sig", T.LongType()),
        ]
    )
    base = vectors.select(F.col(id_col), F.col(vec_col))
    sigs = base.mapInPandas(
        _sign_signature_udf(id_col, vec_col, dim, n_tables, n_bits, seed), schema=sig_schema
    )
    v_sig = sigs.select(F.col(id_col).alias("n_id"), "table", F.col("sig").alias("n_sig"))
    q_sig = sigs.join(queries.select(id_col), id_col).select(
        F.col(id_col).alias("q_id"), "table", F.col("sig").alias("q_sig")
    )
    probes = F.array(
        F.col("q_sig"), *[F.col("q_sig").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
    )
    q_probed = q_sig.withColumn("probe", F.explode(probes))
    cand = (
        q_probed.join(
            v_sig,
            (q_probed["table"] == v_sig["table"]) & (q_probed["probe"] == v_sig["n_sig"]),
        )
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id")
        .distinct()
    )
    q_vec = vectors.join(queries.select(id_col), id_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    n_vec = vectors.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        cand.join(F.broadcast(q_vec), "q_id")
        .join(n_vec, "n_id")
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("n_id").alias("neighbor_id"), "cos")
    )


def lsh_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS, the scale path: sign-LSH bucket
    self-join for candidates, exact cosine verify on candidates only — never
    the full O(N²) cartesian (that stays available as the small-SF oracle,
    ``queries.q_embedding_neardup``).

    Candidates = id pairs sharing any table's bucket, widened by 1-bit
    multiprobe on the lower-id side (collision probability for a cos≈0.4 pair
    rises ~0.41 → ~0.93 at 8×6-bit tables). The self-join shuffles by
    ``(table, sig)`` — bucket sizes are ~N/2^bits on balanced data; buckets
    above *max_bucket* are dropped (documented best-effort, the standard LSH
    skew guard — a bucket that big means the band carries no information).
    Output: (a_id, b_id, cos) with a_id < b_id and cos ≥ threshold.
    """
    sig_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("sig", T.LongType()),
        ]
    )
    base = vectors.select(F.col(id_col), F.col(vec_col))
    sigs = base.mapInPandas(
        _sign_signature_udf(id_col, vec_col, dim, n_tables, n_bits, seed),
        schema=sig_schema,
    )
    sigs = _cache(sigs)
    sizes = sigs.groupBy("table", "sig").agg(F.count("*").alias("_n"))
    ok = sizes.filter(F.col("_n") <= max_bucket).select("table", "sig")
    kept = sigs.join(F.broadcast(ok), ["table", "sig"])
    probes = F.array(
        F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
    )
    a_side = kept.select(
        F.col(id_col).alias("a_id"), "table", F.explode(probes).alias("probe")
    )
    b_side = kept.select(F.col(id_col).alias("b_id"), "table", F.col("sig").alias("b_sig"))
    cand = (
        a_side.join(
            b_side,
            (a_side["table"] == b_side["table"])
            & (a_side["probe"] == b_side["b_sig"])
            & (a_side["a_id"] < b_side["b_id"]),
        )
        .select("a_id", "b_id")
        .distinct()
    )
    a_vec = vectors.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b_vec = vectors.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    return (
        cand.join(a_vec, "a_id")
        .join(b_vec, "b_id")
        .withColumn("cos", cosine(F.col("a_vec"), F.col("b_vec")))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def ivf_assign(
    vectors: DataFrame,
    n_clusters: int,
    dim: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """One-shot IVF clustering: seeded random centroids + one Lloyd update
    (collect = n_clusters × dim floats only), then cluster assignment as a
    vectorized mapInPandas. Returns (assigned df, centroids)."""
    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((n_clusters, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    def assigner(cents: np.ndarray):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
                pdf = pdf.copy()
                pdf["cluster"] = (Mn @ cents.T).argmax(axis=1).astype(np.int32)
                yield pdf

        return fn

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.FloatType())),
            T.StructField("cluster", T.IntegerType()),
        ]
    )
    base = vectors.select(id_col, vec_col)
    first = base.mapInPandas(assigner(centroids), schema=schema)
    # one Lloyd step: mean per cluster (distributed agg), normalized on driver
    sums = (
        first.select("cluster", F.posexplode(vec_col).alias("i", "x"))
        .groupBy("cluster", "i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    updated = centroids.copy()
    acc: dict[int, np.ndarray] = {}
    cnt: dict[int, int] = {}
    for r in sums:
        acc.setdefault(r["cluster"], np.zeros(dim))[r["i"]] = r["s"]
        cnt[r["cluster"]] = r["n"]
    for c, v in acc.items():
        m = v / max(cnt[c], 1)
        n = np.linalg.norm(m)
        if n > 1e-9:
            updated[c] = m / n
    assigned = base.mapInPandas(assigner(updated), schema=schema)
    return assigned, updated


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: exact cosine re-rank within the nprobe nearest clusters."""
    assigned, centroids = ivf_assign(vectors, n_clusters, dim, seed, id_col, vec_col)
    assigned = _cache(assigned)

    def probe_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(Mn @ centroids.T), axis=1, kind="stable")[:, :nprobe]
            pdf = pdf.copy()
            pdf["probe_clusters"] = [row.astype(int).tolist() for row in order]
            yield pdf

    probe_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.FloatType())),
            T.StructField("probe_clusters", T.ArrayType(T.IntegerType())),
        ]
    )
    q = (
        vectors.join(queries.select(id_col), id_col)
        .select(id_col, vec_col)
        .mapInPandas(probe_fn, schema=probe_schema)
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode("probe_clusters").alias("cluster"),
        )
    )
    v = assigned.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), "cluster"
    )
    scored = (
        q.join(v, "cluster")
        .filter(F.col("n_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("n_id").alias("neighbor_id"), "cos")
    )
