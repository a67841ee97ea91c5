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


def test_cdx_index_no_exchange(spark):
    """CDX-JSON line building is a pure projection riding the scan."""
    plan = _plan(spark, "cdx_index")
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_filter_funnel_one_scan_bounded_exchanges(spark):
    """Funnel report: ONE corpus read, no per-stage rescans. Exactly two
    exchanges, both post-combine: the count-distinct-fingerprint key
    shuffle (one row per distinct fp after partial agg) and the final
    single-row merge."""
    plan = _plan(spark, "filter_funnel")
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan  # map-side combine before either shuffle


def test_inverted_index_combines_before_shuffling(spark):
    """tf groupBy must partial-aggregate the token explode map-side; the df
    window adds exactly one more (combined-rows-only) shuffle."""
    plan = _plan(spark, "inverted_index")
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan or "HashAggregate" in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "text" in scan and "lang" not in scan.split("ReadSchema")[-1]


def test_bm25_no_cartesian_pruned_scan(spark):
    """Corpus scalars cross in as a broadcast single row; the corpus scan
    reads only (doc_id, text)."""
    plan = _plan(spark, "bm25_search")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "text" in scan and "source" not in scan.split("ReadSchema")[-1]


def test_unigram_logprob_no_cartesian(spark):
    plan = _plan(spark, "unigram_logprob")
    assert "CartesianProduct" not in plan


def test_dust_rules_single_exchange_pruned_scan(spark):
    """DUST mining = one window shuffle on the content key; the orders scan
    reads only the two synthesis columns."""
    plan = _plan(spark, "dust_rules")
    assert plan.count("Exchange") == 1
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "o_totalprice" not in scan and "o_comment" not in scan


def test_dust_apply_frontier_never_shuffles(spark):
    """Rule application broadcasts the per-host flags; the frontier side
    must not sort-merge or shuffle, and the lineitem scan stays pruned."""
    plan = _plan(spark, "dust_apply")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    li_scan = next(
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "l_orderkey" in l
    )
    assert "l_extendedprice" not in li_scan and "l_comment" not in li_scan


def test_host_boilerplate_scans_text_once(spark):
    """Per-source df via count-window over the reduced (doc, source, chunk)
    set: the documents text column is read by exactly ONE scan."""
    plan = _plan(spark, "host_boilerplate")
    text_scans = [
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "text" in l
    ]
    assert len(text_scans) == 1, text_scans
    assert "CartesianProduct" not in plan


def test_classifier_score_zero_exchange_jvm_only(spark):
    """Hashed linear classifier = pure projection: no shuffle, no Python."""
    plan = _plan(spark, "classifier_score")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mix_weights_single_corpus_exchange(spark):
    """Temperature mix: one map-side-combined groupBy over the corpus; the
    O(strata) scalar agg and its broadcast add no corpus-sized exchange."""
    plan = _plan(spark, "mix_weights")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_badwords_filter_no_exchange(spark):
    """Blocklist filter = tokenize + array filter riding the scan."""
    plan = _plan(spark, "badwords_filter")
    assert "Exchange" not in plan


def test_script_mix_no_exchange_pruned_scan(spark):
    """Script counts are regexp projections; scan reads (doc_id, text)."""
    plan = _plan(spark, "script_mix")
    assert "Exchange" not in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "lang" not in scan and "source" not in scan


def test_train_split_no_exchange(spark):
    plan = _plan(spark, "train_split")
    assert "Exchange" not in plan


def test_nfc_normalize_no_exchange_arrow(spark):
    """NFC audit: one Arrow eval projection, zero shuffle."""
    plan = _plan(spark, "nfc_normalize")
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan, "must run as vectorized Arrow batches"
    assert "BatchEvalPython" not in plan, "never row-at-a-time Python"


def test_doc_repetition_shared_gram_shuffle(spark):
    """Both repetition signals must feed from ONE per-(doc,n,gram) count
    shuffle (plus the two O(docs) per-signal aggregates and the final
    doc-key joins) — the plan must not shuffle raw grams twice."""
    plan = _plan(spark, "doc_repetition")
    # exchanges: gram count (1) + two per-doc aggs (2) + join keying; the
    # pin is an upper bound — a regression to per-signal gram shuffles
    # would add two more full-width exchanges
    assert plan.count("hashpartitioning(doc_id") <= 6
    assert plan.count("hashpartitioning(gram") <= 2


def test_wet_export_no_exchange(spark):
    """WET formatter is a pure JVM projection riding the corpus scan."""
    plan = _plan(spark, "wet_export")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_incremental_neardup_no_cartesian(spark):
    """Batch-vs-corpus dedup must pair through the band join, never a
    cartesian; both the candidate join and the verify stay hash joins."""
    plan = _plan(spark, "incremental_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
