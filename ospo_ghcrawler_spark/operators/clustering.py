"""K-means corpus clustering over the embeddings table — JVM-only Lloyd.

Corpus diversification for training-data pipelines (cluster-balanced
sampling, near-dup pruning inside clusters) needs k-means over an
embedding column. This is the DataFrame-native form:

- **state is O(k·dim) on the driver** (k centroids), exactly like the
  IVF probe path (similarity.py): each Lloyd iteration collects k rows
  of (count, 64 sums) — never data rows;
- **assignment is whole-stage-codegen JVM arithmetic**: the distance to
  each centroid is an explicit fixed-order fold over the array elements
  (no Python UDF, no explode — the 100-TB side is scanned once per
  iteration with a map-side-combined groupBy as the only shuffle);
- **determinism**: init centroids are the embeddings of the k smallest
  ids; per-dim centroid updates are round(sum/count, 6), absorbing
  FP summation-order noise so assignments are parallelism-invariant;
  argmin ties break toward the smaller cluster id.

The oracle (:func:`kmeans_sql`) is the same recurrence unrolled
relationally in ANSI SQL: a k-row centroid CTE per iteration, assignment
via a points × centroids join + row_number — O(N·k) at sf0.01, never the
scale path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_DEFAULT = 4
ITER_DEFAULT = 2
DIM_DEFAULT = 64


def _dist2_col(vec_col: str, cent: list[float], dim: int):
    """Σ_d (v[d] - c_d)² as a left-to-right fold over a zip_with of the
    vector against an array LITERAL of the centroid — the same IEEE
    association order as the oracle SQL's explicit `+` chain (the fold
    starts at +0.0, and +0.0 + t ≡ t exactly for the non-negative squared
    terms), but an O(1)-size expression tree instead of the O(dim) literal
    chain a first cut used: per-iteration whole-stage codegen compile
    dominated the wall at dim=64·k=4 (measured 91 s cold → 12.7 s after
    this rewrite at sf0.1, the remainder being the Lloyd collects)."""
    c = F.lit([float(x) for x in cent[:dim]])
    v = F.col(vec_col).cast("array<double>")
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _assign(df: DataFrame, cents: list[list[float]], vec_col: str, dim: int):
    """cluster_id = argmin over centroids, ties to the smaller id —
    array_min over (dist, cid) structs compares fields in order."""
    pairs = F.array(
        *[
            F.struct(
                _dist2_col(vec_col, c, dim).alias("d"),
                F.lit(i).cast("bigint").alias("cid"),
            )
            for i, c in enumerate(cents)
        ]
    )
    return df.withColumn("cluster_id", F.array_min(pairs).getField("cid"))


def kmeans_assign(
    embs: DataFrame,
    k: int = K_DEFAULT,
    iterations: int = ITER_DEFAULT,
    dim: int = DIM_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster_id) after *iterations* Lloyd steps from deterministic
    seeds (the k smallest ids' embeddings)."""
    spark = embs.sparkSession
    # the iteration loop materializes eagerly (one collect per step), so a
    # scoped cache of the projected input pays for itself immediately and
    # can be released before returning — the RETURNED plan reads the
    # original input, so callers never depend on this cache
    work = embs.select(id_col, vec_col).cache()
    init_rows = (
        work.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("v"))
        .collect()
    )
    cents = [[float(x) for x in r["v"]] for r in init_rows]
    for _ in range(iterations):
        assigned = _assign(work, cents, vec_col, dim)
        upd = (
            assigned.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.col(vec_col).getItem(d).cast("double")).alias(f"s{d}")
                    for d in range(dim)
                ],
            )
            .select(
                "cluster_id",
                "n",
                *[
                    F.round(F.col(f"s{d}") / F.col("n"), 6).alias(f"c{d}")
                    for d in range(dim)
                ],
            )
            .collect()
        )
        new = {int(r["cluster_id"]): [r[f"c{d}"] for d in range(dim)] for r in upd}
        # empty cluster keeps its previous centroid (matches the oracle's
        # LEFT JOIN + COALESCE per dim)
        cents = [new.get(i, cents[i]) for i in range(k)]
    work.unpersist()
    return _assign(embs, cents, vec_col, dim).select(
        F.col(id_col), F.col("cluster_id")
    )


def _sql_dist2(vec_expr: str, cent_prefix: str, dim: int) -> str:
    terms = [
        f"(({vec_expr}[{d + 1}]::DOUBLE) - {cent_prefix}c{d}) * "
        f"(({vec_expr}[{d + 1}]::DOUBLE) - {cent_prefix}c{d})"
        for d in range(dim)
    ]
    return " + ".join(terms)


def kmeans_sql(
    k: int = K_DEFAULT,
    iterations: int = ITER_DEFAULT,
    dim: int = DIM_DEFAULT,
) -> str:
    """The identical recurrence unrolled in ANSI SQL (DuckDB 1-indexed
    lists): centroids as a k-row CTE with one column per dim, assignment
    via cross join + row_number, update via round(sum/count, 6), empty
    clusters keeping the prior centroid via LEFT JOIN + COALESCE."""
    init_dims = ", ".join(
        f"embedding[{d + 1}]::DOUBLE AS c{d}" for d in range(dim)
    )
    sql = [
        f"""WITH cent0 AS (
          SELECT (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cluster_id,
                 {init_dims}
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k})
        )"""
    ]
    prev = "cent0"
    for it in range(1, iterations + 1):
        dist = _sql_dist2("e.embedding", "c.", dim)
        upd_dims = ", ".join(
            f"round(sum(embedding[{d + 1}]::DOUBLE) / count(*), 6) AS c{d}"
            for d in range(dim)
        )
        keep_dims = ", ".join(
            f"COALESCE(u.c{d}, p.c{d}) AS c{d}" for d in range(dim)
        )
        sql.append(f""", asg{it} AS (
          SELECT vec_id, embedding, cluster_id FROM (
            SELECT e.vec_id, e.embedding, c.cluster_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {dist}, c.cluster_id
                   ) AS rn
            FROM embeddings e CROSS JOIN {prev} c
          ) WHERE rn = 1
        ), upd{it} AS (
          SELECT cluster_id, {upd_dims}
          FROM asg{it}
          GROUP BY cluster_id
        ), cent{it} AS (
          SELECT p.cluster_id, {keep_dims}
          FROM {prev} p LEFT JOIN upd{it} u USING (cluster_id)
        )""")
        prev = f"cent{it}"
    dist = _sql_dist2("e.embedding", "c.", dim)
    sql.append(f"""
        SELECT vec_id, cluster_id FROM (
          SELECT e.vec_id, c.cluster_id,
                 row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY {dist}, c.cluster_id
                 ) AS rn
          FROM embeddings e CROSS JOIN {prev} c
        ) WHERE rn = 1
    """)
    return "\n".join(sql)


CLUSTER_SAMPLE_CAP = 40


def cluster_sample(
    embs: DataFrame,
    cap: int = CLUSTER_SAMPLE_CAP,
    k: int = K_DEFAULT,
    iterations: int = ITER_DEFAULT,
    dim: int = DIM_DEFAULT,
) -> DataFrame:
    """Cluster-balanced downsample: k-means assignment, then keep the first
    *cap* vectors per cluster by a stable id-hash rank (the same RNG-free
    device as the stratified sampler — identical at any parallelism and in
    the oracle). The curation move this implements: cap every semantic
    cluster so no dominant content mode floods the training mix
    (diversity-preserving subsampling). One extra shuffle (the per-cluster
    window) on top of the assignment scan."""
    from pyspark.sql import Window

    a = kmeans_assign(embs, k=k, iterations=iterations, dim=dim)
    h = F.md5(F.encode(F.col("vec_id").cast("string"), "UTF-8"))
    w = Window.partitionBy("cluster_id").orderBy(h, "vec_id")
    return (
        a.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select("vec_id", "cluster_id", "rk")
    )


def cluster_sample_sql(
    cap: int = CLUSTER_SAMPLE_CAP,
    k: int = K_DEFAULT,
    iterations: int = ITER_DEFAULT,
    dim: int = DIM_DEFAULT,
) -> str:
    """kmeans_sql as a derived table + the same md5-rank window."""
    return f"""
    SELECT vec_id, cluster_id, rk FROM (
      SELECT vec_id, cluster_id,
             row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
             ) AS rk
      FROM ({kmeans_sql(k=k, iterations=iterations, dim=dim)}) a
    ) WHERE rk <= {cap}
    """


# SemDeDup's operating range prunes only NEAR-duplicates: the paper (Abbas
# et al. 2023) sweeps eps with the useful regime at cosine ~0.95+. That is
# the out-of-box default — calling semdedup() on a real corpus must not
# discard merely topically-similar documents. The synthetic bench fixture's
# embeddings are far more dispersed than real sentence embeddings, so the
# bench/oracle query passes SEMDEDUP_BENCH_EPS explicitly to get a non-
# trivial drop set at sf0.01 (ADVICE r3).
SEMDEDUP_EPS = 0.95
SEMDEDUP_BENCH_EPS = 0.4


def semdedup(
    embs: DataFrame,
    eps: float = SEMDEDUP_EPS,
    k: int = K_DEFAULT,
    iterations: int = ITER_DEFAULT,
    dim: int = DIM_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup = k-means cluster the
    embeddings, then prune near-duplicates INSIDE each cluster only. A point
    is dropped when any lower-id point in its cluster has cosine ≥ *eps* —
    the released implementation's upper-triangular rule (point i's max
    similarity over j < i decides i alone; whether j itself survives is not
    re-checked), which this reproduces with keep-lowest-id order.

    Why this shape at 100 TB: all-pairs cosine over the corpus is O(N²);
    SemDeDup's insight is that near-duplicates land in the same k-means
    cell, so the pair join is restricted to cluster_id — with k grown ∝ N
    (the paper uses k in the tens of thousands) the expected cell size is
    constant and the join is linear-ish. Here: one cluster_id shuffle for
    the self-join, cosine verify as JVM fold arithmetic on candidates only,
    assignment itself the O(k·dim)-driver-state Lloyd above.

    Returns every input id with its cluster and a ``kept`` verdict (the
    curation stage filters ``kept`` and keeps lineage for the funnel
    report).
    """
    a = kmeans_assign(embs, k=k, iterations=iterations, dim=dim, id_col=id_col, vec_col=vec_col)
    v = embs.select(id_col, vec_col).join(a, id_col)
    left = v.select(
        F.col("cluster_id"),
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
    )
    right = v.select(
        F.col("cluster_id"),
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
    )
    from ospo_ghcrawler_spark.operators.similarity import cosine

    drops = (
        left.join(right, "cluster_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cosine(F.col("a_vec"), F.col("b_vec")) >= eps)
        .select(F.col("b_id").alias("_drop_id"))
        .distinct()
    )
    return v.join(
        drops, v[id_col] == drops["_drop_id"], "left"
    ).select(
        F.col(id_col),
        F.col("cluster_id"),
        F.col("_drop_id").isNull().alias("kept"),
    )


def semdedup_sql(
    eps: float = SEMDEDUP_EPS,
    k: int = K_DEFAULT,
    iterations: int = ITER_DEFAULT,
    dim: int = DIM_DEFAULT,
) -> str:
    """kmeans_sql as a derived table + intra-cluster cosine pairs + the
    keep-lowest-id anti-join, all in ANSI SQL."""
    cos = (
        "list_dot_product(a.vec, b.vec) / "
        "(sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec)))"
    )
    return f"""
    WITH v AS (
      SELECT a.vec_id, a.cluster_id, e.embedding::DOUBLE[] AS vec
      FROM ({kmeans_sql(k=k, iterations=iterations, dim=dim)}) a
      JOIN embeddings e USING (vec_id)
    ),
    d AS (
      SELECT DISTINCT b.vec_id
      FROM v a JOIN v b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE {cos} >= {eps}
    )
    SELECT v.vec_id, v.cluster_id, d.vec_id IS NULL AS kept
    FROM v LEFT JOIN d ON v.vec_id = d.vec_id
    """
