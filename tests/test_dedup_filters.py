"""Bloom family + cuckoo filter + seen_filter semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.operators.dedup import (
    BloomFamily,
    CuckooFilter,
    attenuate,
    bloom_flag_column,
    build_bloom_distributed,
    seen_filter,
)


def test_bloom_no_false_negatives_and_low_fp():
    fam = BloomFamily(shards=8, bits_per_shard=1 << 16, n_hashes=7)
    rng = np.random.default_rng(42)
    present = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    absent = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    absent = np.setdiff1d(absent, present)
    fam.add(present)
    assert fam.might_contain(present).all(), "bloom must have no false negatives"
    fp = fam.might_contain(absent).mean()
    assert fp < 0.02, f"false positive rate too high: {fp}"


def test_bloom_save_load(tmp_path):
    fam = BloomFamily(4, 1 << 12, 5)
    h = np.array([1, -5, 123456789, -(2**60)], dtype=np.int64)
    fam.add(h)
    p = str(tmp_path / "bloom.npz")
    fam.save(p)
    fam2 = BloomFamily.load(p)
    assert fam2.might_contain(h).all()
    assert fam2.shards == 4 and fam2.k == 5


def test_distributed_build_matches_local(spark):
    rng = np.random.default_rng(7)
    hashes = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    df = spark.createDataFrame([(int(h),) for h in hashes], ["url_hash"])
    fam_dist = build_bloom_distributed(df, "url_hash", shards=8, bits_per_shard=1 << 16, n_hashes=5)
    fam_local = BloomFamily(8, 1 << 16, 5)
    fam_local.add(hashes)
    assert (fam_dist.bitmaps == fam_local.bitmaps).all(), "distributed build must equal local"


def test_bloom_flag_column_and_seen_filter(spark):
    seen_hashes = list(range(0, 1000, 2))  # evens seen
    cand_hashes = list(range(0, 1000))
    seen = spark.createDataFrame(
        [(h, f"u{h}", 0, 200) for h in seen_hashes],
        ["url_hash", "url", "first_seen_step", "status"],
    )
    cands = spark.createDataFrame([(h, f"u{h}") for h in cand_hashes], ["url_hash", "url"])
    fam = build_bloom_distributed(seen, "url_hash", 4, 1 << 14, 5)

    flagged = bloom_flag_column(cands, "url_hash", fam, "maybe")
    flags = {r["url_hash"]: r["maybe"] for r in flagged.collect()}
    assert all(flags[h] for h in seen_hashes), "no false negatives"

    survivors = {r["url_hash"] for r in seen_filter(cands, seen, fam=fam).collect()}
    assert survivors == set(range(1, 1000, 2)), "bloom+rescue must equal exact anti-join"

    survivors_exact = {r["url_hash"] for r in seen_filter(cands, seen, fam=None).collect()}
    assert survivors_exact == survivors


def test_seen_filter_recrawl_window(spark):
    """Recrawl-window routing: a url deleted from `seen` (stale bloom
    positive) passes as fresh via the broadcast window check WITHOUT the
    full-seen anti-join deciding it; a cuckoo hit that is NOT in the exact
    pending set (false-positive emulation) falls through to the exact
    rescue and is still correctly dropped when seen."""
    seen_hashes = list(range(0, 100, 2))  # evens seen
    bloom_fam = BloomFamily(4, 1 << 14, 5)
    bloom_fam.add(np.array(seen_hashes + [4, 6], dtype=np.int64))  # bloom is stale-inclusive

    # urls 4 and 6 were requeued: deleted from seen, in the window
    recrawled = [4, 6]
    seen_now = [h for h in seen_hashes if h not in recrawled]
    seen = spark.createDataFrame([(h, f"u{h}") for h in seen_now], ["url_hash", "url"])
    cands = spark.createDataFrame([(h, f"u{h}") for h in range(0, 100)], ["url_hash", "url"])

    cf = CuckooFilter(256)
    cf.add(np.array(recrawled + [8], dtype=np.int64))  # 8 = emulated false positive
    pending = spark.createDataFrame([(h,) for h in recrawled], ["url_hash"])

    got = {r["url_hash"] for r in seen_filter(
        cands, seen, fam=bloom_fam, recrawl_cf=cf, recrawl_pending=pending
    ).collect()}
    odds = set(range(1, 100, 2))
    assert got == odds | {4, 6}, "window urls fresh; fp url 8 stays seen-blocked"

    # equivalence: the same answer as the plain exact path
    exact = {r["url_hash"] for r in seen_filter(cands, seen, fam=None).collect()}
    assert got == exact


def test_attenuate_within_batch(spark):
    df = spark.createDataFrame(
        [(1, "a", 0), (1, "a", 0), (2, "b", 0), (1, "a", 1)],
        ["url_hash", "url", "attempt"],
    )
    assert attenuate(df).count() == 2
    assert attenuate(df, ["url_hash", "attempt"]).count() == 3


class TestCuckoo:
    def test_add_contains_remove(self):
        cf = CuckooFilter(1 << 12)
        rng = np.random.default_rng(3)
        a = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
        b = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
        b = np.setdiff1d(b, a)
        failed = cf.add(a)
        assert failed == 0
        assert cf.contains(a).all(), "no false negatives while resident"
        assert cf.contains(b).mean() < 0.05

        removed = cf.remove(a[:1000])
        assert removed == 1000
        # removed items mostly gone (fingerprint collisions allowed)
        assert cf.contains(a[:1000]).mean() < 0.05
        assert cf.contains(a[1000:]).all(), "remaining items unaffected"

    def test_save_load(self, tmp_path):
        cf = CuckooFilter(256)
        h = np.array([10, -20, 30], dtype=np.int64)
        cf.add(h)
        p = str(tmp_path / "cuckoo.npz")
        cf.save(p)
        cf2 = CuckooFilter.load(p)
        assert cf2.contains(h).all()


def test_partitioned_probe_matches_broadcast(spark, tmp_path):
    """bloom_flag_column_partitioned (per-shard mmap, no broadcast) flags
    exactly the same rows as the broadcast-family probe — the 10^10-regime
    path is bit-equivalent to the small-family path."""
    import numpy as np

    from ospo_ghcrawler_spark.operators.dedup import (
        BloomFamily,
        bloom_flag_column,
        bloom_flag_column_partitioned,
        build_bloom_distributed,
        save_family_sharded,
    )

    rng = np.random.default_rng(7)
    seen_hashes = rng.integers(-(1 << 62), 1 << 62, size=4000, dtype=np.int64)
    seen_df = spark.createDataFrame(
        [(int(h),) for h in seen_hashes], ["url_hash"]
    )
    fam = build_bloom_distributed(seen_df, "url_hash", 8, 1 << 14, 5)
    d = str(tmp_path / "fam")
    save_family_sharded(fam, d)

    # candidates: half seen, half fresh
    fresh = rng.integers(-(1 << 62), 1 << 62, size=4000, dtype=np.int64)
    cand = spark.createDataFrame(
        [(int(h),) for h in np.concatenate([seen_hashes[:2000], fresh])],
        ["url_hash"],
    )
    via_bc = {
        (r["url_hash"], r["f"])
        for r in bloom_flag_column(cand, "url_hash", fam, "f").collect()
    }
    via_part = {
        (r["url_hash"], r["f"])
        for r in bloom_flag_column_partitioned(cand, "url_hash", d, "f").collect()
    }
    assert via_part == via_bc
    # every truly-seen hash must flag (no false negatives on either path)
    flagged = {h for h, f in via_part if f}
    assert set(int(x) for x in seen_hashes[:2000]) <= flagged
