"""Link-graph connected components: the chain test graph has known
components (blocks of CC_BLOCK consecutive ids), so the propagation result
is verifiable in closed form — every doc's rep must be its block start,
and the chain shape forces the hash-min loop through multiple rounds."""

from pyspark.sql import functions as F

from ospo_ghcrawler_spark.operators.graph import (
    CC_BLOCK,
    chain_link_edges,
    link_components,
)


def test_chain_components_closed_form(spark):
    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    out = {r["doc_id"]: r["cluster_rep"] for r in link_components(docs).collect()}
    assert len(out) == 100
    for i in range(100):
        assert out[i] == (i // CC_BLOCK) * CC_BLOCK


def test_chain_edges_respect_missing_ids(spark):
    # a hole in the id space must break the chain (left-semi on b_id)
    docs = spark.range(0, 10).filter("id != 5").select(
        F.col("id").alias("doc_id")
    )
    pairs = {(r["a_id"], r["b_id"]) for r in chain_link_edges(docs, 16).collect()}
    assert (4, 5) not in pairs and (5, 6) not in pairs
    out = {r["doc_id"]: r["cluster_rep"] for r in link_components(docs, 16).collect()}
    assert out[4] == 0 and out[6] == 6 and out[9] == 6
