"""Link-graph analytics over a crawled corpus.

A production crawler ranks its frontier by link centrality (the reference
ranks by queue tier + attenuation only — `providers/queuing/attenuatedQueue.js`
has no link-graph signal; this is a beyond-reference, first-class engine op
per SURVEY.md §2.8): PageRank over the harvested link graph is the standard
prioritization/quality signal for both recrawl scheduling and
training-corpus document weighting.

Determinism contract: ranks are computed in **fixed-point integer
arithmetic** (scale 1e9, damping 85/100, floor division at every step) so
the result is bit-exact — independent of partitioning, summation order, and
engine — and therefore hash-comparable against a SQL oracle, unlike
float PageRank whose low bits depend on reduction order.

Scale posture (100 TB / 10^10-node web graph): each iteration is
  (1) a per-node share projection (rank div out-degree) — zero shuffle,
  (2) one join edges⋈shares on src — shuffles the EDGE table on src once
      per iteration (or zero times if edges are pre-bucketed by src),
  (3) one groupBy dst sum — map-side combined,
  (4) a left join back onto the node set for dangling nodes.
The node-sized intermediates are K small tables; nothing is ever collected
to the driver except the O(1) node count. For many iterations, callers
should `localCheckpoint` ranks every few rounds to keep the plan
constant-size (same pattern as dedup_docs.neardup label propagation);
the default K=3 keeps the unrolled plan shallow enough without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed-point scale and damping (85/100 ≡ 0.85) — integers only, so every
# engine computes the identical bit pattern.
PR_SCALE = 1_000_000_000
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100
PR_TELEPORT = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # 150e6

# Synthetic-edge constants (LCG-style mix — plain BIGINT arithmetic so the
# SQL oracle can replicate the graph exactly; doc_ids are dense [0, N)).
EDGE_A = 1_103_515_245
EDGE_C = 12_345
EDGE_J = 97_003
EDGE_FANOUT = 4


def synthetic_link_edges(docs: DataFrame, n_docs: int) -> DataFrame:
    """Deterministic pseudo-random link graph over dense doc_ids [0, N):
    each document links to EDGE_FANOUT targets
    ``(doc_id*A + C + j*J) mod N``, self-loops dropped (multi-edges kept —
    both sides of the oracle count them identically).

    The arithmetic stays within int64 for any realistic N (N·A ≈ 1e9·1e9
    would overflow — at that scale a real crawl supplies real edges and this
    synthetic generator is moot). Returns (src, dst)."""
    j = F.explode(F.array(*[F.lit(i) for i in range(EDGE_FANOUT)])).alias("j")
    e = docs.select(F.col("doc_id").alias("src"), j).select(
        "src",
        (
            (F.col("src") * F.lit(EDGE_A) + F.lit(EDGE_C) + F.col("j") * F.lit(EDGE_J))
            % F.lit(n_docs)
        ).alias("dst"),
    )
    return e.filter(F.col("dst") != F.col("src"))


def pagerank_fixed_point(
    nodes: DataFrame, edges: DataFrame, iterations: int = 3
) -> DataFrame:
    """Fixed-point integer PageRank: rank_0 = PR_SCALE for every node;
    rank_{i+1} = TELEPORT + (85 · Σ_in floor(rank_i / outdeg)) div 100.

    *nodes* must have a ``doc_id`` column (the universe — dangling nodes
    keep the teleport mass); *edges* (src, dst) with src ∈ nodes.
    Returns (doc_id, rank_fp) with rank_fp a bigint at scale 1e9.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ids = nodes.select("doc_id")
    ranks = ids.withColumn("rank_fp", F.lit(PR_SCALE).cast("long"))
    for _ in range(iterations):
        shares = ranks.join(deg, ranks.doc_id == deg.src, "inner").select(
            F.col("src"),
            F.expr("rank_fp div outdeg").alias("share"),
        )
        in_sum = (
            edges.join(shares, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        ranks = ids.join(in_sum, ids.doc_id == in_sum.dst, "left").select(
            "doc_id",
            (
                F.lit(PR_TELEPORT)
                + F.expr(f"({PR_DAMP_NUM} * coalesce(s, 0L)) div {PR_DAMP_DEN}")
            ).cast("long").alias("rank_fp"),
        )
    return ranks


def pagerank_sql(iterations: int = 3) -> str:
    """The exact-replica ANSI-SQL oracle (DuckDB dialect: ``//`` floor
    division on positive ints ≡ Spark ``div``) — same graph, same
    fixed-point recurrence, unrolled to *iterations*."""
    edge_terms = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id*{EDGE_A} + {EDGE_C} + {j}*{EDGE_J}) % "
        f"(SELECT c FROM n) AS dst FROM documents"
        for j in range(EDGE_FANOUT)
    )
    sql = f"""
    WITH n AS (SELECT count(*) AS c FROM documents),
    edges AS (SELECT src, dst FROM ({edge_terms}) WHERE src <> dst),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS rank_fp FROM documents)"""
    prev = "r0"
    for i in range(1, iterations + 1):
        sql += f""",
    s{i} AS (SELECT e.dst, SUM(r.rank_fp // g.outdeg) AS s
             FROM edges e JOIN {prev} r ON e.src = r.doc_id
             JOIN deg g ON e.src = g.src GROUP BY e.dst),
    r{i} AS (SELECT d.doc_id,
                    CAST({PR_TELEPORT} + ({PR_DAMP_NUM} * COALESCE(s.s, 0)) // {PR_DAMP_DEN}
                         AS BIGINT) AS rank_fp
             FROM documents d LEFT JOIN s{i} s ON d.doc_id = s.dst)"""
        prev = f"r{i}"
    return sql + f"\n    SELECT doc_id, rank_fp FROM {prev}"


# HITS fixed-point scale: 1e6 (not PR_SCALE's 1e9) so the un-normalized
# sums stay inside int64 — a node's raw score is ≤ degree·SCALE and the
# normalization multiply is raw·SCALE ≤ degree·SCALE² < 2^63 for any
# degree < 9.2e6 (the synthetic LCG graph tops out near its fanout; real
# web graphs need a degree cap or a wider-scale two-pass normalize).
HITS_SCALE = 1_000_000


def hits_fixed_point(
    nodes: DataFrame, edges: DataFrame, iterations: int = 2
) -> DataFrame:
    """Integer fixed-point HITS (hubs & authorities) — the classic
    complement to PageRank for frontier prioritization: authorities are
    link-endorsed content pages, hubs are directory/index pages whose
    outlinks are worth expanding first.

    Per iteration: auth ← Σ_in hub, normalized to max = HITS_SCALE by floor
    division; then hub ← Σ_out auth, normalized the same way. All integer
    arithmetic → bit-exact across engines/partitionings (same determinism
    contract as pagerank_fixed_point). Each iteration is two edge joins +
    two map-side-combined aggs + two O(1) max aggregates broadcast back —
    nothing node-sized ever reaches the driver.

    Returns (doc_id, hub_fp, auth_fp) at scale HITS_SCALE.
    """
    ids = nodes.select("doc_id")
    hub = ids.withColumn("hub_fp", F.lit(HITS_SCALE).cast("long"))
    auth = None
    for _ in range(iterations):
        a_in = (
            edges.join(hub.select(F.col("doc_id").alias("src"), "hub_fp"), "src")
            .groupBy("dst")
            .agg(F.sum("hub_fp").alias("a_raw"))
        )
        auth = ids.join(a_in, ids.doc_id == a_in.dst, "left").select(
            "doc_id", F.coalesce("a_raw", F.lit(0).cast("long")).alias("a_raw")
        )
        a_max = auth.agg(F.greatest(F.max("a_raw"), F.lit(1)).alias("m"))
        auth = auth.crossJoin(F.broadcast(a_max)).select(
            "doc_id", F.expr(f"(a_raw * {HITS_SCALE}) div m").alias("auth_fp")
        )
        h_out = (
            edges.join(auth.select(F.col("doc_id").alias("dst"), "auth_fp"), "dst")
            .groupBy("src")
            .agg(F.sum("auth_fp").alias("h_raw"))
        )
        hub = ids.join(h_out, ids.doc_id == h_out.src, "left").select(
            "doc_id", F.coalesce("h_raw", F.lit(0).cast("long")).alias("h_raw")
        )
        h_max = hub.agg(F.greatest(F.max("h_raw"), F.lit(1)).alias("m"))
        hub = hub.crossJoin(F.broadcast(h_max)).select(
            "doc_id", F.expr(f"(h_raw * {HITS_SCALE}) div m").alias("hub_fp")
        )
    return hub.join(auth, "doc_id").select("doc_id", "hub_fp", "auth_fp")


def hits_sql(iterations: int = 2) -> str:
    """Exact-replica unrolled DuckDB oracle for hits_fixed_point over the
    synthetic_link_edges graph (``//`` ≡ Spark ``div`` on non-negatives)."""
    edge_terms = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id*{EDGE_A} + {EDGE_C} + {j}*{EDGE_J}) % "
        f"(SELECT c FROM n) AS dst FROM documents"
        for j in range(EDGE_FANOUT)
    )
    sql = f"""
    WITH n AS (SELECT count(*) AS c FROM documents),
    edges AS (SELECT src, dst FROM ({edge_terms}) WHERE src <> dst),
    h0 AS (SELECT doc_id, CAST({HITS_SCALE} AS BIGINT) AS hub_fp FROM documents)"""
    prev_h = "h0"
    for i in range(1, iterations + 1):
        sql += f""",
    ar{i} AS (SELECT d.doc_id, COALESCE(s.a, 0) AS a_raw
              FROM documents d LEFT JOIN (
                SELECT e.dst, SUM(h.hub_fp) AS a
                FROM edges e JOIN {prev_h} h ON e.src = h.doc_id GROUP BY e.dst
              ) s ON d.doc_id = s.dst),
    a{i} AS (SELECT doc_id, CAST((a_raw * {HITS_SCALE})
                 // (SELECT GREATEST(MAX(a_raw), 1) FROM ar{i}) AS BIGINT) AS auth_fp
             FROM ar{i}),
    hr{i} AS (SELECT d.doc_id, COALESCE(s.h, 0) AS h_raw
              FROM documents d LEFT JOIN (
                SELECT e.src, SUM(a.auth_fp) AS h
                FROM edges e JOIN a{i} a ON e.dst = a.doc_id GROUP BY e.src
              ) s ON d.doc_id = s.src),
    h{i} AS (SELECT doc_id, CAST((h_raw * {HITS_SCALE})
                 // (SELECT GREATEST(MAX(h_raw), 1) FROM hr{i}) AS BIGINT) AS hub_fp
             FROM hr{i})"""
        prev_h = f"h{i}"
    return sql + f"""
    SELECT h.doc_id, h.hub_fp, a.auth_fp
    FROM {prev_h} h JOIN a{iterations} a ON h.doc_id = a.doc_id"""


# Block-chain CC test graph: undirected edges (i, i+1) inside blocks of
# CC_BLOCK consecutive doc_ids — many components of known diameter
# (CC_BLOCK-1), so the propagation loop is genuinely exercised over
# multiple rounds while the DuckDB recursive-closure oracle stays cheap.
CC_BLOCK = 16


def chain_link_edges(docs: DataFrame, block: int = CC_BLOCK) -> DataFrame:
    """Deterministic chain edges (a_id, b_id) = (i, i+1) within each block
    of *block* consecutive doc_ids. Components are the blocks; diameter is
    block-1, which forces the hash-min loop through O(diameter) rounds —
    the worst component shape for label propagation (a star converges in
    one round; a chain is the slow case worth pinning)."""
    e = docs.select(
        F.col("doc_id").alias("a_id"),
        (F.col("doc_id") + 1).cast("long").alias("b_id"),
    )
    return e.filter(F.col("b_id") % F.lit(block) != 0).join(
        docs.select(F.col("doc_id").alias("b_id")), "b_id", "left_semi"
    )


def link_components(docs: DataFrame, block: int = CC_BLOCK) -> DataFrame:
    """(doc_id, cluster_rep) — connected components of the chain link
    graph via the same hash-min label propagation the near-dup clusterer
    uses (dedup_docs.neardup_clusters: O(diameter) rounds over the paired
    subgraph only, O(1) convergence aggregate, constant-size plans). Link
    CC is the domain-level curation primitive (mirror/spam cluster
    collapse) that complements content-level near-dup CC."""
    from ospo_ghcrawler_spark.operators.dedup_docs import neardup_clusters

    return neardup_clusters(docs, chain_link_edges(docs, block))


def link_components_sql(block: int = CC_BLOCK) -> str:
    """Recursive-closure oracle: min reachable doc_id per node over the
    identical chain edge set."""
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT d.doc_id AS a_id, d.doc_id + 1 AS b_id
      FROM documents d JOIN documents t ON t.doc_id = d.doc_id + 1
      WHERE (d.doc_id + 1) % {block} <> 0
    ),
    e AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
    )
    SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_rep
    FROM reach GROUP BY a
    """


# Anchor-text vocabulary size for the synthetic generator (real crawls
# carry the anchor string on the edge; the generator derives a token from
# the edge endpoints so the SQL oracle replicates it with plain BIGINT
# arithmetic).
ANCHOR_VOCAB = 23


def anchor_texts(edges: DataFrame, top_k: int = 3) -> DataFrame:
    """Per-target top-k anchor texts — the classic link-context signal a
    web corpus attaches to each page (search/training pipelines treat
    aggregated anchor text as a page-quality and topic feature; the
    reference has no link-graph analytics at all — beyond-reference op per
    SURVEY.md §2.8).

    *edges* is (src, dst, anchor) — or (src, dst), in which case a
    deterministic synthetic anchor token ``w{(src·31 + dst·7) mod V}`` is
    derived so the oracle can replicate it.

    Scale posture (10^10-edge graph): the groupBy pre-aggregates with
    map-side combine, so the window stage ranks at most |vocab-per-target|
    rows per dst — never the raw edge multiplicity; two shuffles total
    (count groupBy, top-k window on dst). Ties break on the anchor string,
    so (dst, anchor) uniqueness makes row_number deterministic.

    Returns (dst, anchor, n_links, rk) for rk ≤ top_k.
    """
    from pyspark.sql.window import Window

    if "anchor" not in edges.columns:
        edges = edges.select(
            "dst",
            F.concat(
                F.lit("w"),
                ((F.col("src") * 31 + F.col("dst") * 7) % ANCHOR_VOCAB).cast(
                    "string"
                ),
            ).alias("anchor"),
        )
    counts = edges.groupBy("dst", "anchor").agg(F.count(F.lit(1)).alias("n_links"))
    w = Window.partitionBy("dst").orderBy(F.desc("n_links"), F.asc("anchor"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("dst", "anchor", "n_links", "rk")
    )


def anchor_texts_sql(top_k: int = 3) -> str:
    """Exact-replica oracle over the synthetic_link_edges graph with the
    derived anchor tokens."""
    edge_terms = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id*{EDGE_A} + {EDGE_C} + {j}*{EDGE_J}) % "
        f"(SELECT c FROM n) AS dst FROM documents"
        for j in range(EDGE_FANOUT)
    )
    return f"""
    WITH n AS (SELECT count(*) AS c FROM documents),
    edges AS (SELECT src, dst FROM ({edge_terms}) WHERE src <> dst),
    a AS (
      SELECT dst, 'w' || ((src*31 + dst*7) % {ANCHOR_VOCAB}) AS anchor
      FROM edges
    ),
    counts AS (SELECT dst, anchor, count(*) AS n_links FROM a GROUP BY dst, anchor),
    ranked AS (
      SELECT dst, anchor, n_links,
             row_number() OVER (PARTITION BY dst ORDER BY n_links DESC, anchor ASC)
               AS rk
      FROM counts
    )
    SELECT dst, anchor, n_links, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {top_k}
    """
