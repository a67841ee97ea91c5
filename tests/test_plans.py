"""Physical-plan audits: pin the plan properties the 100 TB posture relies on
(column pruning, broadcast joins, bounded exchanges) so regressions surface
as test failures rather than silent slowdowns."""

import pytest

from ospo_ghcrawler_spark import queries as Q

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = Q.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_doc_lookup_broadcasts(spark):
    plan = _plan(spark, "doc_lookup")
    assert "BroadcastHashJoin" in plan, "small key set must broadcast"
    assert "SortMergeJoin" not in plan


def test_column_pruning_orders_scan(spark):
    """Derived-frontier queries must not read unused orders columns."""
    plan = _plan(spark, "frontier_selection")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "o_totalprice" not in scan and "o_orderstatus" not in scan
    assert "o_orderkey" in scan and "o_custkey" in scan


def test_dedup_exact_single_exchange(spark):
    """hash-groupBy dedup = one shuffle (partial agg map-side)."""
    plan = _plan(spark, "dedup_exact")
    assert plan.count("Exchange") == 1


def test_seen_antijoin_no_cartesian(spark):
    plan = _plan(spark, "seen_antijoin")
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_token_stats_no_exchange(spark):
    """Pure row-wise projection — no shuffle at all."""
    plan = _plan(spark, "token_stats")
    assert "Exchange" not in plan


def test_embedding_topk_broadcasts_queries(spark):
    plan = _plan(spark, "embedding_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_clean_corpus_single_exchange_pruned_scan(spark):
    """C4-style pipeline: lang/quality filters are row-wise projections; the
    only shuffle is the exact-dedup window, and the documents scan reads
    just (doc_id, text)."""
    plan = _plan(spark, "clean_corpus")
    assert plan.count("Exchange") == 1, "expected exactly the dedup-window shuffle"
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "doc_id" in scan and "text" in scan
    assert "lang" not in scan.split("ReadSchema")[-1].replace("lang_pred", "")


def test_winnow_fingerprint_no_exchange(spark):
    """Per-row rolling-hash fingerprints: pure projection + explode, no
    shuffle anywhere."""
    plan = _plan(spark, "winnow_fingerprint")
    assert "Exchange" not in plan


def test_surt_keys_no_exchange(spark):
    """SURT keying is a pure projection — it must ride the scan for free."""
    plan = _plan(spark, "surt_keys")
    assert "Exchange" not in plan


def test_source_quality_single_exchange(spark):
    """Per-source rollup = zero-shuffle stats + ONE map-side-combined agg."""
    plan = _plan(spark, "source_quality")
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()  # map-side combine present


def test_paragraph_dedup_scans_text_once(spark):
    """One text scan; no Python in the path (pure JVM window + aggs)."""
    plan = _plan(spark, "paragraph_dedup")
    text_scans = sum(
        1 for l in plan.splitlines() if "FileScan parquet" in l and "text" in l
    )
    assert text_scans == 1
    assert "Python" not in plan


def test_robots_parse_jvm_only(spark):
    plan = _plan(spark, "robots_parse")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_anchor_texts_bounded_exchanges(spark):
    """count groupBy (map-side combined) + the top-k window on dst — the
    window must rank pre-aggregated (dst, anchor) rows, never raw edges."""
    plan = _plan(spark, "anchor_texts")
    assert plan.count("Exchange") <= 3
    assert "HashAggregate" in plan  # partial agg before the window
    assert "CartesianProduct" not in plan
