"""Redirect-chain resolution over a crawled URL graph.

A web crawl at Common-Crawl scale carries hundreds of millions of
HTTP 3xx edges; canonical corpus construction needs every redirecting URL
mapped to its *terminal* target (and the hop count, for loop/age policies)
before dedup and frontier accounting. The reference follows redirects
inside a single fetch (its request layer hides them — there is no corpus-
level resolve; this is a beyond-reference, first-class engine op per
SURVEY.md §2.8).

Algorithm — **pointer doubling**, not per-hop walking: the redirect map
``src → dst`` is composed with itself each round, so a chain of length L
resolves in ⌈log2 L⌉ joins instead of L. Each round is ONE shuffle join of
the redirect table against itself (redirect rows ≪ corpus rows at any real
scale), a constant-size plan via ``localCheckpoint``, and an O(1)
convergence aggregate — the same distributed-iteration discipline as
``dedup_docs`` label propagation and ``graph.pagerank_fixed_point``.
Nothing row-sized ever reaches the driver.

Determinism contract: the synthetic redirect graph is **strictly
decreasing** (``dst < src`` by construction), hence acyclic with a unique
terminal per chain — the result is a pure function of the input and
hash-comparable against a recursive-CTE SQL oracle. Real crawls contain
redirect *loops*; ``resolve_redirects`` handles them by capping rounds at
``max_rounds`` (a loop simply never converges and keeps its last pointer),
and callers flag rows whose ``hops`` hit the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# LCG mix for the synthetic redirect graph (plain BIGINT arithmetic so the
# SQL oracle replicates it exactly; doc_ids dense [0, N)). src*A stays in
# int64 for src < 8.3e9 — at larger scale a real crawl supplies real
# redirect edges and the generator is moot (same caveat as
# graph.synthetic_link_edges).
RED_A = 1_103_515_245
RED_C = 12_345
RED_M = 2_147_483_648  # 2^31


def synthetic_redirect_edges(docs: DataFrame) -> DataFrame:
    """Deterministic redirect map over dense doc_ids: every doc with
    ``doc_id % 3 != 0`` (and > 0) redirects to
    ``((doc_id·A + C) mod 2^31) mod doc_id`` — strictly below itself, so
    chains descend and terminate at a non-redirecting doc. Expected chain
    length ≈ 3 hops (2/3 continuation probability per hop), max bounded by
    the descent. Returns (src, dst)."""
    r = docs.select(F.col("doc_id").alias("src")).filter(
        (F.col("src") % 3 != 0) & (F.col("src") > 0)
    )
    return r.select(
        "src",
        (
            ((F.col("src") * F.lit(RED_A) + F.lit(RED_C)) % F.lit(RED_M))
            % F.col("src")
        ).alias("dst"),
    )


def resolve_redirects(redirects: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Terminal target + hop count for every redirecting URL.

    *redirects* is the (src, dst) map (each src appears once). Round k
    leaves every row pointing 2^k hops ahead (or at its terminal), so
    convergence takes ⌈log2 L⌉ rounds for the longest chain L; the loop
    stops on an O(1) "no pointer advanced" aggregate. ``max_rounds=16``
    covers chains of 65536 hops — beyond any real redirect policy (crawlers
    cap follow-depth at ~10) — and bounds runaway loops in cyclic inputs.

    Returns (src, terminal, hops).
    """
    cur = redirects.select(
        "src", F.col("dst").alias("cur"), F.lit(1).cast("long").alias("hops")
    )
    for _ in range(max_rounds):
        nxt = cur.select(
            F.col("src").alias("n_src"),
            F.col("cur").alias("n_cur"),
            F.col("hops").alias("n_hops"),
        )
        stepped = (
            cur.join(nxt, cur["cur"] == nxt["n_src"], "left")
            .select(
                "src",
                F.coalesce("n_cur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("n_hops", F.lit(0))).alias("hops"),
                F.col("n_src").isNotNull().alias("_moved"),
            )
            # constant-size plan across rounds (the composed join would
            # otherwise nest exponentially) — same pattern as the near-dup
            # label propagation in dedup_docs.py
            .localCheckpoint(eager=True)
        )
        moved = stepped.agg(F.sum(F.col("_moved").cast("int")).alias("m")).collect()[0]["m"]
        cur = stepped.drop("_moved")
        if not moved:
            break
    return cur.select("src", F.col("cur").alias("terminal"), "hops")


def redirect_resolve_sql() -> str:
    """Recursive-CTE DuckDB oracle: walk the same synthetic map one hop at
    a time until a non-redirecting doc; acyclicity (strict descent)
    guarantees termination."""
    return f"""
    WITH RECURSIVE m AS (
      SELECT doc_id AS src,
             ((doc_id*{RED_A} + {RED_C}) % {RED_M}) % doc_id AS dst
      FROM documents WHERE doc_id % 3 <> 0 AND doc_id > 0
    ),
    walk AS (
      SELECT src, dst AS cur, CAST(1 AS BIGINT) AS hops FROM m
      UNION ALL
      SELECT w.src, m.dst, w.hops + 1 FROM walk w JOIN m ON m.src = w.cur
    )
    SELECT w.src, w.cur AS terminal, w.hops
    FROM walk w
    WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.src = w.cur)
    """
