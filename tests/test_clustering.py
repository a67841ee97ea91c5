"""K-means: recurrence correctness vs a sequential replica, determinism."""

from __future__ import annotations

import pytest

from ospo_ghcrawler_spark.operators import clustering as KM


def _ref_kmeans(vecs: dict[int, list[float]], k: int, iterations: int):
    """Driver-side sequential replica of the Lloyd recurrence (same
    fixed-order distance fold, same round(mean, 6) update)."""

    def dist2(v, c):
        s = 0.0
        for a, b in zip(v, c):
            x = a - b
            s = s + x * x
        return s

    ids = sorted(vecs)
    cents = [list(vecs[i]) for i in ids[:k]]

    def assign():
        out = {}
        for i in ids:
            best = min(
                ((dist2(vecs[i], c), ci) for ci, c in enumerate(cents)),
            )
            out[i] = best[1]
        return out

    for _ in range(iterations):
        a = assign()
        for ci in range(k):
            members = [vecs[i] for i in ids if a[i] == ci]
            if not members:
                continue
            n = len(members)
            cents[ci] = [
                round(sum(m[d] for m in members) / n, 6)
                for d in range(len(cents[ci]))
            ]
    return assign()


@pytest.fixture(scope="module")
def embs(spark):
    # deterministic multimodal blobs: 3 well-separated lobes in 8-dim
    rows = []
    for i in range(90):
        lobe = i % 3
        base = [0.0] * 8
        base[lobe] = 5.0
        # deterministic jitter
        vec = [
            base[d] + (((i * 31 + d * 17) % 97) - 48) / 200.0
            for d in range(8)
        ]
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_matches_sequential_replica(spark, embs):
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in KM.kmeans_assign(embs, k=3, iterations=2, dim=8).collect()
    }
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in embs.collect()
    }
    want = _ref_kmeans(vecs, k=3, iterations=2)
    assert got == want
    # the three lobes must separate perfectly with these seeds
    by_lobe = {}
    for i, c in got.items():
        by_lobe.setdefault(i % 3, set()).add(c)
    assert all(len(s) == 1 for s in by_lobe.values())
    assert len({next(iter(s)) for s in by_lobe.values()}) == 3


def test_kmeans_parallelism_invariant(spark, embs):
    a = sorted(
        map(tuple, KM.kmeans_assign(embs.repartition(1), k=3, iterations=2, dim=8).collect())
    )
    b = sorted(
        map(tuple, KM.kmeans_assign(embs.repartition(16), k=3, iterations=2, dim=8).collect())
    )
    assert a == b


def test_kmeans_no_python_udf_in_plan(spark, embs):
    df = KM.kmeans_assign(embs, k=2, iterations=1, dim=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cluster_sample_cap_and_determinism(spark, embs):
    from ospo_ghcrawler_spark.operators.clustering import cluster_sample

    out = cluster_sample(embs, cap=5, k=3, iterations=2, dim=8).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        assert len(rows) <= 5
        assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))
    # parallelism-invariance: repartitioned input gives the identical sample
    out2 = cluster_sample(embs.repartition(7), cap=5, k=3, iterations=2, dim=8).collect()
    assert sorted((r["vec_id"], r["cluster_id"], r["rk"]) for r in out) == sorted(
        (r["vec_id"], r["cluster_id"], r["rk"]) for r in out2
    )
