"""Link-graph PageRank: fixed-point determinism and recurrence correctness."""

from __future__ import annotations

from ospo_ghcrawler_spark.operators import graph as G


def _ref_pagerank(n, edges, iterations):
    """Driver-side sequential replica of the fixed-point recurrence."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    rank = {i: G.PR_SCALE for i in range(n)}
    for _ in range(iterations):
        in_sum = defaultdict(int)
        for s, d in edges:
            in_sum[d] += rank[s] // deg[s]
        rank = {
            i: G.PR_TELEPORT + (G.PR_DAMP_NUM * in_sum[i]) // G.PR_DAMP_DEN
            for i in range(n)
        }
    return rank


def _docs(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_pagerank_matches_sequential_reference(spark):
    n = 40
    docs = _docs(spark, n)
    edges_df = G.synthetic_link_edges(docs, n)
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    got = {
        r["doc_id"]: r["rank_fp"]
        for r in G.pagerank_fixed_point(docs, edges_df, iterations=3).collect()
    }
    assert got == _ref_pagerank(n, edges, 3)


def test_pagerank_dangling_and_isolated_nodes(spark):
    # node 3 has no out-links (dangling: contributes nothing); node 4 has no
    # in-links (rank = pure teleport after the first iteration)
    docs = _docs(spark, 5)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (4, 3)], "src long, dst long"
    )
    got = {
        r["doc_id"]: r["rank_fp"]
        for r in G.pagerank_fixed_point(docs, edges, iterations=2).collect()
    }
    assert got[4] == G.PR_TELEPORT  # no in-links
    ref = _ref_pagerank(5, [(0, 1), (1, 2), (2, 0), (4, 3)], 2)
    assert got == ref


def test_pagerank_invariant_to_partitioning(spark):
    n = 60
    docs = _docs(spark, n)
    edges = G.synthetic_link_edges(docs, n)
    base = sorted(
        (r["doc_id"], r["rank_fp"])
        for r in G.pagerank_fixed_point(docs, edges, 3).collect()
    )
    skewed = sorted(
        (r["doc_id"], r["rank_fp"])
        for r in G.pagerank_fixed_point(
            docs.repartition(13), edges.repartition(1), 3
        ).collect()
    )
    assert base == skewed  # integer arithmetic: no reduction-order drift


def test_synthetic_edges_no_self_loops_and_in_range(spark):
    n = 100
    rows = G.synthetic_link_edges(_docs(spark, n), n).collect()
    assert rows, "graph must be non-empty"
    for r in rows:
        assert r["src"] != r["dst"]
        assert 0 <= r["dst"] < n


def _ref_hits(n, edges, iterations):
    """Driver-side sequential replica of the integer HITS recurrence."""
    hub = {i: G.HITS_SCALE for i in range(n)}
    auth = {}
    for _ in range(iterations):
        auth = {i: 0 for i in range(n)}
        for s, d in edges:
            auth[d] += hub[s]
        m = max(max(auth.values()), 1)
        auth = {i: a * G.HITS_SCALE // m for i, a in auth.items()}
        hub = {i: 0 for i in range(n)}
        for s, d in edges:
            hub[s] += auth[d]
        m = max(max(hub.values()), 1)
        hub = {i: h * G.HITS_SCALE // m for i, h in hub.items()}
    return {i: (hub[i], auth[i]) for i in range(n)}


def test_hits_matches_sequential_reference(spark):
    n = 40
    docs = _docs(spark, n)
    edge_rows = G.synthetic_link_edges(docs, n).collect()
    edges = [(r["src"], r["dst"]) for r in edge_rows]
    got = {
        r["doc_id"]: (r["hub_fp"], r["auth_fp"])
        for r in G.hits_fixed_point(docs, G.synthetic_link_edges(docs, n), 2).collect()
    }
    assert got == _ref_hits(n, edges, 2)
    # a directory page (has outlinks) must carry hub mass; the max-normalized
    # scores top out at exactly HITS_SCALE
    assert max(h for h, _ in got.values()) == G.HITS_SCALE
    assert max(a for _, a in got.values()) == G.HITS_SCALE


def test_hits_invariant_to_partitioning(spark):
    n = 60
    docs = _docs(spark, n)
    edges = G.synthetic_link_edges(docs, n)
    base = sorted(
        (r["doc_id"], r["hub_fp"], r["auth_fp"])
        for r in G.hits_fixed_point(docs, edges, 2).collect()
    )
    skewed = sorted(
        (r["doc_id"], r["hub_fp"], r["auth_fp"])
        for r in G.hits_fixed_point(docs.repartition(13), edges.repartition(1), 2).collect()
    )
    assert base == skewed
