"""Redirect-chain resolution (pointer doubling), anchor-text aggregation,
and snapshot diff — sequential-reference parity + shape invariants.

Oracle parity against DuckDB at sf0.01 is covered by test_oracle_parity.py
(queries redirect_resolve / anchor_texts / snapshot_diff); these tests pin
the operators' semantics on small graphs where the expected answer is
computed by a driver-side sequential walk.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.operators import graph as G
from ospo_ghcrawler_spark.operators import redirects as RD


def _docs(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def _seq_resolve(mapping: dict[int, int]) -> dict[int, tuple[int, int]]:
    out = {}
    for s in mapping:
        cur, hops = mapping[s], 1
        while cur in mapping:
            cur = mapping[cur]
            hops += 1
        out[s] = (cur, hops)
    return out


def test_resolve_matches_sequential_walk(spark):
    n = 200
    docs = _docs(spark, n)
    edges = RD.synthetic_redirect_edges(docs)
    mapping = {r["src"]: r["dst"] for r in edges.collect()}
    # the synthetic map must be strictly decreasing (acyclic by descent)
    assert all(d < s for s, d in mapping.items())
    got = {
        r["src"]: (r["terminal"], r["hops"])
        for r in RD.resolve_redirects(edges).collect()
    }
    assert got == _seq_resolve(mapping)
    # terminals never redirect; multi-hop chains genuinely exist
    assert all(t not in mapping for t, _ in got.values())
    assert max(h for _, h in got.values()) >= 2


def test_resolve_long_chain_converges_in_log_rounds(spark):
    # a pure 64-hop chain: 64 -> 63 -> ... -> 0; doubling must resolve it
    # (a per-hop walker capped at 16 rounds would not)
    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 65)], "src long, dst long"
    )
    rows = RD.resolve_redirects(edges).collect()
    assert {r["terminal"] for r in rows} == {0}
    assert {r["src"]: r["hops"] for r in rows} == {i: i for i in range(1, 65)}


def test_resolve_cycle_is_bounded_not_hung(spark):
    # a 3-cycle never converges; max_rounds caps the work and every row
    # reports hops >= the cap's coverage (callers flag these as loops)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    rows = RD.resolve_redirects(edges, max_rounds=4).collect()
    assert len(rows) == 3
    assert all(r["hops"] >= 16 for r in rows)  # 2^4 hops walked, no terminal


def test_anchor_texts_matches_sequential_topk(spark):
    n = 60
    docs = _docs(spark, n)
    edges = G.synthetic_link_edges(docs, n)
    counts: dict[tuple[int, str], int] = defaultdict(int)
    for r in edges.collect():
        counts[(r["dst"], f"w{(r['src'] * 31 + r['dst'] * 7) % G.ANCHOR_VOCAB}")] += 1
    expected = set()
    by_dst: dict[int, list] = defaultdict(list)
    for (dst, anchor), c in counts.items():
        by_dst[dst].append((-c, anchor))
    for dst, lst in by_dst.items():
        for rk, (negc, anchor) in enumerate(sorted(lst)[:3], start=1):
            expected.add((dst, anchor, -negc, rk))
    got = {
        (r["dst"], r["anchor"], r["n_links"], r["rk"])
        for r in G.anchor_texts(edges).collect()
    }
    assert got == expected


def test_anchor_texts_parallelism_invariant(spark):
    n = 80
    docs = _docs(spark, n)
    e = G.synthetic_link_edges(docs, n)
    a1 = {tuple(r) for r in G.anchor_texts(e.repartition(1)).collect()}
    a16 = {tuple(r) for r in G.anchor_texts(e.repartition(16)).collect()}
    assert a1 == a16


def test_snapshot_diff_statuses(spark, tmp_path):
    from ospo_ghcrawler_spark import queries as Q

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 6) for i in range(120)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r["status"]
        for r in Q.q_snapshot_diff(spark, str(tmp_path)).collect()
    }
    for i in range(120):
        if i % Q.DIFF_DEL_MOD == 0:
            assert got[i] == "deleted"
        elif i % Q.DIFF_CHG_MOD == 0:
            assert got[i] == "changed"
        else:
            assert got[i] == "same"
        if i % Q.DIFF_NEW_MOD == 0:
            assert got[i + Q.DIFF_NEW_OFFSET] == "new"
    n_new = sum(1 for s in got.values() if s == "new")
    assert n_new == len([i for i in range(120) if i % Q.DIFF_NEW_MOD == 0])


def test_anchor_texts_explicit_anchor_column(spark):
    # real crawls carry the anchor string on the edge; top-k + ties by
    # anchor string, counts aggregated across duplicate edges
    edges = spark.createDataFrame(
        [(1, 9, "home"), (2, 9, "home"), (3, 9, "news"), (4, 9, "blog"),
         (5, 9, "blog"), (6, 9, "shop"), (7, 8, "only")],
        "src long, dst long, anchor string",
    )
    got = {(r["dst"], r["rk"]): (r["anchor"], r["n_links"])
           for r in G.anchor_texts(edges, top_k=3).collect()}
    assert got == {
        (9, 1): ("blog", 2), (9, 2): ("home", 2), (9, 3): ("news", 1),
        (8, 1): ("only", 1),
    }
