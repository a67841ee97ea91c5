"""Incremental (partition-level) frontier commit + compaction cadence.

The scale-defining storage property: a superstep must not rewrite frontier
partitions it didn't touch (Iceberg overwritePartitions semantics), and long
runs must keep read fan-in bounded via compaction (rewrite_data_files
cadence). Pinned here at both the SnapshotTable level and the engine level
(untouched partition files byte-identical across a superstep)."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.plans.catalog import SnapshotTable
from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("v", T.StringType(), False),
    ]
)


def _rows(spark, triples):
    return spark.createDataFrame(triples, schema=SCHEMA)


def _dir_digest(path: str) -> str:
    """Content digest of every file under a snapshot dir (byte-identity)."""
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(path)):
        for f in sorted(files):
            p = os.path.join(root, f)
            h.update(f.encode())
            with open(p, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


@pytest.fixture(params=["parquet", "iceberg"])
def backend_table(request, spark, tmp_path):
    """The SnapshotTable CONTRACT under both backends: the parquet shim
    (always) and a real Iceberg table (when the runtime jar is present and
    the session was launched with SPARK_GRAFT_ICEBERG=1 — the sandbox has
    neither jar nor network, so the Iceberg leg skips explicitly here and
    goes green unchanged on a real cluster)."""
    from ospo_ghcrawler_spark.plans.catalog import (
        IcebergSnapshotTable,
        iceberg_available,
    )

    if request.param == "parquet":
        return SnapshotTable(spark, str(tmp_path), "t", SCHEMA)
    if not iceberg_available(spark) or not spark.conf.get(
        "spark.sql.extensions", ""
    ).count("Iceberg"):
        pytest.skip(
            "Iceberg runtime absent (no jar/network in sandbox) — run with "
            "--packages org.apache.iceberg:iceberg-spark-runtime and "
            "SPARK_GRAFT_ICEBERG=1"
        )
    import uuid

    return IcebergSnapshotTable(
        spark, "crawl", "t_ns", f"t_{uuid.uuid4().hex[:8]}", SCHEMA, partition_col="salt"
    )


def test_contract_replace_append_rollback(backend_table, spark):
    """Backend-agnostic contract: partition replace leaves other partitions'
    rows intact, appends stack on top, later replaces mask all older layers
    of their partitions, and set_current reproduces any snapshot's state."""
    t = backend_table
    base_sid = t.overwrite(_rows(spark, [(1, 0, "a"), (2, 1, "b"), (3, 2, "c")]))
    rep_sid = t.replace_partitions(_rows(spark, [(20, 1, "B"), (21, 1, "B2")]), [1], "salt")
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(1, "a"), (20, "B"), (21, "B2"), (3, "c")}

    t.append(_rows(spark, [(30, 0, "x")]))
    assert {r["k"] for r in t.read().collect()} == {1, 20, 21, 3, 30}
    t.replace_partitions(_rows(spark, [(40, 0, "y")]), [0], "salt")
    assert {r["k"] for r in t.read().collect()} == {40, 20, 21, 3}

    t.set_current(rep_sid)
    assert {r["k"] for r in t.read().collect()} == {1, 20, 21, 3}
    t.set_current(base_sid)
    assert {r["k"] for r in t.read().collect()} == {1, 2, 3}


def test_contract_compaction_bounds_fanin(backend_table, spark):
    t = backend_table
    t.overwrite(_rows(spark, [(0, 0, "z")]))
    for i in range(1, 6):
        t.append(_rows(spark, [(i, i % 3, "z")]))
    assert t.chain_length() == 6
    t.compact()
    assert t.chain_length() == 1
    assert {r["k"] for r in t.read().collect()} == set(range(6))


def test_replace_partitions_semantics(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t", SCHEMA)
    base_sid = t.overwrite(_rows(spark, [(1, 0, "a"), (2, 1, "b"), (3, 2, "c")]))
    base_dir = os.path.join(t.dir, f"s{base_sid:08d}-overwrite")
    before = _dir_digest(base_dir)

    rep_sid = t.replace_partitions(_rows(spark, [(20, 1, "B"), (21, 1, "B2")]), [1], "salt")
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(1, "a"), (20, "B"), (21, "B2"), (3, "c")}, "salt 1 replaced, others intact"
    assert _dir_digest(base_dir) == before, "untouched partitions' files must be byte-identical"

    # appends stack on top of a partition-replace...
    t.append(_rows(spark, [(30, 0, "x")]))
    got = {r["k"] for r in t.read().collect()}
    assert got == {1, 20, 21, 3, 30}
    # ...and a later replace masks BOTH older layers for its partitions
    t.replace_partitions(_rows(spark, [(40, 0, "y")]), [0], "salt")
    got = {r["k"] for r in t.read().collect()}
    assert got == {40, 20, 21, 3}

    # exact resume: rollback to any snapshot reproduces its state
    t.set_current(rep_sid)
    assert {r["k"] for r in t.read().collect()} == {1, 20, 21, 3}
    t.set_current(base_sid)
    assert {r["k"] for r in t.read().collect()} == {1, 2, 3}


def test_superstep_leaves_untouched_partitions_bytes_alone(spark, tmp_path):
    """Engine-level pin: seeds on one host only (no links) ⇒ the superstep's
    frontier commit replaces just that host's salt partition; the partition
    holding the other host's rows is not rewritten, and those rows stay
    selectable afterwards."""
    N, H = 100, 8
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=0).cache()
    robots = synth_robots(spark, n_hosts=H)
    cfg = CrawlConfig(batch_size=5, host_budget=1000, frontier_partitions=32)
    c = Crawler(spark, str(tmp_path / "cat"), corpus, robots, cfg, run_id="inc")
    from ospo_ghcrawler_spark.sources.corpus import page_host

    by_host: dict[int, list[str]] = {}
    for i in range(N):
        by_host.setdefault(page_host(i, N, H, False), []).append(page_url(i, N, H, False))
    h0, h1 = sorted(by_host)[:2]
    host0_pages, host1_pages = by_host[h0][:6], by_host[h1][:6]
    assert len(host0_pages) == 6 and len(host1_pages) == 6
    c.seed(host0_pages + host1_pages)
    f_t = c.catalog.table("frontier")
    seed_sid = f_t.current_snapshot()
    seed_dir = os.path.join(f_t.dir, f"s{seed_sid:08d}-append")
    before = _dir_digest(seed_dir)

    # batch 5 + FIFO(seq) ⇒ superstep 0 selects host0 seeds only
    s0 = c.superstep()
    assert s0["selected"] == 5
    snaps = f_t.snapshots()
    assert snaps[-1]["op"] == "preplace", "few-salt superstep must commit incrementally"
    assert _dir_digest(seed_dir) == before, "seed layer files must not be rewritten"

    # untouched host1 rows still on the frontier and still crawlable
    hosts_left = {r["host"] for r in f_t.read().select("host").distinct().collect()}
    assert f"host{h1}.example" in hosts_left
    c.run(20)
    pages = c.catalog.table("pages").read().filter(F.col("status") == 200)
    assert pages.count() == len(host0_pages) + len(host1_pages)


def test_frontier_compacts_on_cadence(spark, tmp_path):
    """compact_chain_len forces a periodic full overwrite so read fan-in
    stays bounded on long runs."""
    N, H = 60, 3
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=2).cache()
    robots = synth_robots(spark, n_hosts=H)
    cfg = CrawlConfig(batch_size=4, compact_chain_len=3, frontier_partitions=32)
    c = Crawler(spark, str(tmp_path / "cat2"), corpus, robots, cfg, run_id="cmp")
    c.seed([page_url(i, N, H, False) for i in range(10)])
    c.run(25)
    f_t = c.catalog.table("frontier")
    assert f_t.chain_length() <= cfg.compact_chain_len
    ops = [s["op"] for s in f_t.snapshots()]
    assert "overwrite" in ops, "cadence must fold the chain periodically"
    seen_t = c.catalog.table("seen")
    assert seen_t.chain_length() <= cfg.compact_chain_len


def test_pipelined_frontier_commit_equivalence(spark, tmp_path):
    """cfg.pipelined_frontier_commit moves the frontier write into the
    background commit group (next selection reads the in-memory plan); the
    crawl outcome — seen set, pages, per-step selection counts — must be
    IDENTICAL to the synchronous default."""
    from pyspark.sql import functions as F

    from ospo_ghcrawler_spark.config import CrawlConfig
    from ospo_ghcrawler_spark.operators.engine import Crawler
    from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots

    N, H = 300, 5
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=6).cache()
    robots = synth_robots(spark, n_hosts=H)
    outcomes = {}
    for mode in (False, True):
        cfg = CrawlConfig(batch_size=40, pipelined_frontier_commit=mode, use_bloom=False)
        c = Crawler(spark, str(tmp_path / f"cat_{mode}"), corpus, robots, cfg,
                    run_id=f"p{mode}")
        c.seed([page_url(i, N, H, False) for i in range(5)])
        c.run(40)
        seen = sorted(r["url_hash"] for r in c.catalog.table("seen").read().collect())
        steps = [e["stats"]["selected"] for e in c.manifest.load()]
        outcomes[mode] = (seen, steps)
    assert outcomes[False] == outcomes[True]
