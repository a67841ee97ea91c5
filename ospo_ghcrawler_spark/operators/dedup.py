"""URL-seen deduplication: partitioned bloom + cuckoo filters and anti-joins.

Replaces the reference's Redis seen-set — ``SET prefix:uniqueString now PX ttl
NX`` per request (/root/reference/providers/queuing/redisRequestTracker.js:
106-117) and the 3s attenuation cache (providers/queuing/attenuatedQueue.js:
24-52) — with set machinery that scales to a 10^10-URL frontier:

- **within-batch attenuation** → ``dropDuplicates(['url_hash'])`` (the
  superstep *is* the attenuation window);
- **cross-superstep seen-set** → a family of bloom shards keyed by
  ``url_hash`` range, built distributed (``applyInPandas`` per shard, bitmap
  OR on the driver), broadcast to executors and probed vectorized inside
  ``mapInPandas``. Bloom *negatives* are definitely-new (no false negatives),
  so only the small *maybe-seen* remainder pays the exact anti-join against
  the ``seen`` table — the join input shrinks by ~the new-URL fraction;
- **windowed deletes** (recrawl windows / in-flight tracking) → a cuckoo
  filter, which supports remove (blooms don't).

At 10^10 URLs the same code path holds by raising ``shards``: the family is
sharded by hash range so a probe touches exactly one shard's bitmap, and
when the family outgrows a broadcast (tens of GB at 20+ bits/url) the
PARTITIONED probe (``save_family_sharded`` + ``bloom_flag_column_partitioned``)
repartitions candidates by shard id and memory-maps one shard per task —
no process ever holds the whole family; equivalence with the broadcast
probe is test-pinned. Tests exercise 10^5-10^6 with identical code.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK = np.uint64((1 << 64) - 1)
_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    x = (x + _M1) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * _M2) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * _M3) & _MASK
    return x ^ (x >> np.uint64(31))


def _positions(hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(len(hashes), k) bit positions via double hashing h1 + i*h2."""
    h = hashes.astype(np.uint64)
    h1 = _splitmix(h)
    h2 = _splitmix(h ^ _M1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


class BloomFamily:
    """``shards`` bloom bitmaps, shard = url_hash % shards (as uint64)."""

    def __init__(self, shards: int, bits_per_shard: int, n_hashes: int):
        if shards & (shards - 1):
            raise ValueError("shards must be a power of two (JVM/numpy shard parity)")
        self.shards = shards
        self.bits = bits_per_shard
        self.k = n_hashes
        self.bitmaps = np.zeros((shards, bits_per_shard // 8), dtype=np.uint8)

    def shard_of(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes.astype(np.uint64) % np.uint64(self.shards)).astype(np.int64)

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        hashes = np.asarray(hashes, dtype=np.int64)
        shard = self.shard_of(hashes)
        pos = _positions(hashes, self.bits, self.k)
        for s in np.unique(shard):
            p = pos[shard == s].ravel()
            np.bitwise_or.at(self.bitmaps[s], p >> 3, (1 << (p & 7)).astype(np.uint8))

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        hashes = np.asarray(hashes, dtype=np.int64)
        shard = self.shard_of(hashes)
        pos = _positions(hashes, self.bits, self.k)
        out = np.ones(len(hashes), dtype=bool)
        for s in np.unique(shard):
            mask = shard == s
            p = pos[mask]
            bits = (self.bitmaps[s][(p >> 3)] >> (p & 7).astype(np.uint8)) & 1
            out[mask] = bits.all(axis=1)
        return out

    def or_bitmap(self, shard: int, bitmap: bytes) -> None:
        self.bitmaps[shard] |= np.frombuffer(bitmap, dtype=np.uint8)

    # -- persistence (per-superstep checkpoint sidecar) -----------------------

    def save(self, path: str) -> None:
        # uncompressed: bloom bitmaps are near-incompressible once loaded,
        # and compression stalls the driver between supersteps
        tmp = path + ".tmp"
        np.savez(tmp, bitmaps=self.bitmaps, k=self.k)
        os.replace(tmp + ".npz", path)

    @classmethod
    def load(cls, path: str) -> "BloomFamily":
        z = np.load(path)
        bm = z["bitmaps"]
        fam = cls(bm.shape[0], bm.shape[1] * 8, int(z["k"]))
        fam.bitmaps = bm
        return fam


def build_bloom_distributed(
    df: DataFrame, hash_col: str, shards: int, bits_per_shard: int, n_hashes: int
) -> BloomFamily:
    """Build a BloomFamily from a (possibly huge) DataFrame of hashes without
    ever collecting the hashes: each shard's bitmap is built inside
    ``applyInPandas`` on the executors and only the bitmaps (shards × bits/8
    bytes) come back to the driver, which ORs duplicates."""
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("bitmap", T.BinaryType(), False),
        ]
    )
    bits, k = bits_per_shard, n_hashes

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf[hash_col].to_numpy(dtype=np.int64)
        shard = int(pdf["_shard"].iloc[0])
        bitmap = np.zeros(bits // 8, dtype=np.uint8)
        pos = _positions(h, bits, k).ravel()
        np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"shard": [shard], "bitmap": [bitmap.tobytes()]})

    # shards is a power of two, so int64 & (shards-1) == uint64 % shards —
    # the JVM-side shard assignment matches numpy's exactly
    shard_col = F.col(hash_col).bitwiseAND(F.lit(shards - 1))
    parts = (
        df.select(hash_col)
        .withColumn("_shard", shard_col.cast("int"))
        .groupBy("_shard")
        .applyInPandas(build, schema=out_schema)
        .collect()
    )
    fam = BloomFamily(shards, bits_per_shard, n_hashes)
    for row in parts:
        fam.or_bitmap(row["shard"], bytes(row["bitmap"]))
    return fam


def bloom_flag_column(
    df: DataFrame, hash_col: str, fam: BloomFamily, flag: str, bc=None
) -> DataFrame:
    """Adds boolean *flag* = bloom.might_contain(hash) via one vectorized
    Arrow pass. The bitmap family ships as a Spark broadcast variable (pass a
    prebuilt one via *bc* to reuse across stages) — NOT a task closure, which
    would re-serialize the megabytes of bitmap into every stage binary."""
    bits, k, shards = fam.bits, fam.k, fam.shards
    if bc is None:
        bc = df.sparkSession.sparkContext.broadcast(fam.bitmaps)
    fields = df.schema.fields + [T.StructField(flag, T.BooleanType(), False)]
    out_schema = T.StructType(fields)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = BloomFamily(shards, bits, k)
        local.bitmaps = bc.value
        for pdf in batches:
            pdf = pdf.copy()
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            pdf[flag] = local.might_contain(h)
            yield pdf

    return df.mapInPandas(probe, schema=out_schema)


def save_family_sharded(fam: BloomFamily, dirpath: str) -> None:
    """Checkpoint the family as ONE mmap-able ``.npy`` PER SHARD (plus a
    tiny meta sidecar) — the layout the partitioned probe needs: a task
    probing shard *s* opens only ``shard_{s}.npy`` and the OS pages in just
    the bytes its hashes touch, so no process ever materializes the whole
    family. (The single-file ``save``/``load`` npz stays the right call when
    the family is broadcast-sized.)"""
    os.makedirs(dirpath, exist_ok=True)
    for s in range(fam.shards):
        tmp = os.path.join(dirpath, f"shard_{s}.tmp.npy")
        np.save(tmp, fam.bitmaps[s])
        os.replace(tmp, os.path.join(dirpath, f"shard_{s}.npy"))
    import json as _json

    meta = {"shards": fam.shards, "bits": fam.bits, "k": fam.k}
    with open(os.path.join(dirpath, "meta.json"), "w") as f:
        _json.dump(meta, f)


def bloom_flag_column_partitioned(
    df: DataFrame, hash_col: str, family_dir: str, flag: str
) -> DataFrame:
    """Partition-wise bloom probe for families too big to broadcast — the
    10^10-URL regime where the seen-set bitmaps (tens of GB at ~20+
    bits/url) exceed what a per-executor broadcast should carry.

    Rows repartition by their shard id (power-of-two ``& (shards-1)``, the
    exact JVM twin of BloomFamily.shard_of), so each task's batch touches
    ONE shard; the task memory-maps that single shard's ``.npy`` from the
    checkpoint dir and probes vectorized. Memory per task = the pages its
    hash positions actually hit, independent of family size; the shuffle
    moves only (row, shard) — the family never moves at all. Equivalence
    with the broadcast probe is test-pinned (tests/test_dedup_filters.py).
    """
    import json as _json

    with open(os.path.join(family_dir, "meta.json")) as f:
        meta = _json.load(f)
    shards, bits, k = meta["shards"], meta["bits"], meta["k"]
    fields = df.schema.fields + [T.StructField(flag, T.BooleanType(), False)]
    out_schema = T.StructType(fields)
    sid = F.col(hash_col).bitwiseAND(F.lit(shards - 1)).cast("int")

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        open_shards: dict[int, np.ndarray] = {}
        for pdf in batches:
            pdf = pdf.copy()
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            shard = (h.astype(np.uint64) % np.uint64(shards)).astype(np.int64)
            out = np.ones(len(h), dtype=bool)
            pos = _positions(h, bits, k)
            for s in np.unique(shard):
                bm = open_shards.get(int(s))
                if bm is None:
                    bm = np.load(
                        os.path.join(family_dir, f"shard_{int(s)}.npy"),
                        mmap_mode="r",
                    )
                    open_shards[int(s)] = bm
                m = shard == s
                p = pos[m]
                bits_hit = (bm[(p >> 3)] >> (p & 7).astype(np.uint8)) & 1
                out[m] = bits_hit.all(axis=1)
            pdf[flag] = out
            yield pdf

    return df.repartition(sid).mapInPandas(probe, schema=out_schema)


def seen_filter(
    candidates: DataFrame,
    seen: DataFrame,
    hash_col: str = "url_hash",
    fam: BloomFamily | None = None,
    bc=None,
    recrawl_cf: "CuckooFilter | None" = None,
    recrawl_pending: DataFrame | None = None,
) -> DataFrame:
    """Rows of *candidates* whose hash is NOT in *seen*.

    With a bloom family: bloom-negatives pass immediately; only bloom-maybes
    pay the exact anti-join (false-positive rescue). Without: plain anti-join.

    With a recrawl cuckoo (*recrawl_cf* = the delete-capable filter over the
    in-flight recrawl window, *recrawl_pending* = the window's exact hash
    set as a small DataFrame): bloom-maybe rows the cuckoo flags check
    membership in the BROADCAST pending set — a window hit is definitely
    un-seen (its seen row was deleted at requeue) and skips the full-`seen`
    anti-join; a cuckoo false positive falls through to the exact rescue, so
    correctness never rests on the cuckoo. The cuckoo probe rides the same
    Arrow pass as the bloom probe (one mapInPandas, two flags).
    """
    if fam is None:
        return candidates.join(seen.select(hash_col), on=hash_col, how="left_anti")
    use_cf = recrawl_cf is not None and recrawl_pending is not None
    flagged = _seen_flags_column(
        candidates, hash_col, fam, bc=bc, cf=recrawl_cf if use_cf else None
    )
    flags = ["_maybe_seen"] + (["_in_window"] if use_cf else [])
    fresh = flagged.filter(~F.col("_maybe_seen")).drop(*flags)
    maybe = flagged.filter(F.col("_maybe_seen"))
    if use_cf:
        win = maybe.filter(F.col("_in_window")).drop(*flags)
        confirmed = win.join(
            F.broadcast(recrawl_pending.select(hash_col)), on=hash_col, how="left_semi"
        )
        fallthrough = win.join(
            F.broadcast(recrawl_pending.select(hash_col)), on=hash_col, how="left_anti"
        )
        rest = maybe.filter(~F.col("_in_window")).drop(*flags).unionByName(fallthrough)
        rescue = rest.join(seen.select(hash_col), on=hash_col, how="left_anti")
        return fresh.unionByName(confirmed).unionByName(rescue)
    rescue = maybe.drop(*flags).join(seen.select(hash_col), on=hash_col, how="left_anti")
    return fresh.unionByName(rescue)


def _seen_flags_column(
    df: DataFrame, hash_col: str, fam: BloomFamily, bc=None, cf: "CuckooFilter | None" = None
) -> DataFrame:
    """One vectorized Arrow pass adding ``_maybe_seen`` (bloom probe) and —
    when a recrawl cuckoo is given — ``_in_window`` (cuckoo probe). The bloom
    bitmaps ship as a Spark broadcast; the cuckoo table is small (2 bytes ×
    4 × buckets, window-sized not corpus-sized) and ships in the closure."""
    bits, k, shards = fam.bits, fam.k, fam.shards
    if bc is None:
        bc = df.sparkSession.sparkContext.broadcast(fam.bitmaps)
    fields = list(df.schema.fields) + [T.StructField("_maybe_seen", T.BooleanType(), False)]
    cf_table = cf.table if cf is not None else None
    cf_buckets = cf.n_buckets if cf is not None else 0
    if cf is not None:
        fields.append(T.StructField("_in_window", T.BooleanType(), False))
    out_schema = T.StructType(fields)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = BloomFamily(shards, bits, k)
        local.bitmaps = bc.value
        local_cf = None
        if cf_table is not None:
            local_cf = CuckooFilter(cf_buckets)
            local_cf.table = cf_table
        for pdf in batches:
            pdf = pdf.copy()
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            pdf["_maybe_seen"] = local.might_contain(h)
            if local_cf is not None:
                pdf["_in_window"] = local_cf.contains(h)
            yield pdf

    return df.mapInPandas(probe, schema=out_schema)


def attenuate(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Within-batch duplicate suppression — the reference's AttenuatedQueue
    (3s TTL window, key = attempt:uniqueString) collapses to dropDuplicates
    within the superstep batch."""
    return df.dropDuplicates(keys or ["url_hash"])


class CuckooFilter:
    """Small deterministic cuckoo filter (4-slot buckets, 16-bit fingerprints)
    supporting remove() — used for windowed seen-sets (recrawl windows) where
    blooms can't delete. Vectorized lookup; insertion is driver/executor-side
    per-batch (bounded by superstep batch size, not frontier size)."""

    MAX_KICKS = 500

    def __init__(self, n_buckets: int):
        # power-of-two buckets
        n = 1
        while n < n_buckets:
            n <<= 1
        self.n_buckets = n
        self.table = np.zeros((n, 4), dtype=np.uint16)  # 0 = empty

    def _fp_and_buckets(self, hashes: np.ndarray):
        h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        fp = ((_splitmix(h) & np.uint64(0xFFFF)) | np.uint64(1)).astype(np.uint16)
        nb = np.uint64(self.n_buckets)
        b1 = _splitmix(h ^ _M2) % nb
        b2 = (b1 ^ (_splitmix(fp.astype(np.uint64)) % nb)) % nb
        return fp, b1.astype(np.int64), b2.astype(np.int64)

    def _alt(self, bucket: int, fp: int) -> int:
        return int(
            (np.uint64(bucket) ^ (_splitmix(np.array([fp], dtype=np.uint64))[0] % np.uint64(self.n_buckets)))
            % np.uint64(self.n_buckets)
        )

    def add(self, hashes: np.ndarray) -> int:
        """Insert all; returns number that failed (filter too full)."""
        fp, b1, b2 = self._fp_and_buckets(hashes)
        failed = 0
        for f, x, y in zip(fp, b1, b2):
            if not self._insert_one(int(f), int(x), int(y)):
                failed += 1
        return failed

    def _insert_one(self, f: int, b1: int, b2: int) -> bool:
        for b in (b1, b2):
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                return True
        b = b1
        rng = np.uint64((f * 0x5851F42D4C957F2D + b1) & ((1 << 64) - 1))
        for _ in range(self.MAX_KICKS):
            rng = _splitmix(np.array([rng], dtype=np.uint64))[0]
            slot = int(rng % np.uint64(4))
            f, self.table[b, slot] = int(self.table[b, slot]), f
            b = self._alt(b, f)
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                return True
        return False

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1, b2 = self._fp_and_buckets(hashes)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def remove(self, hashes: np.ndarray) -> int:
        """Delete one copy of each present fingerprint; returns removed count."""
        fp, b1, b2 = self._fp_and_buckets(hashes)
        removed = 0
        for f, x, y in zip(fp, b1, b2):
            for b in (int(x), int(y)):
                row = self.table[b]
                hit = np.where(row == f)[0]
                if len(hit):
                    row[hit[0]] = 0
                    removed += 1
                    break
        return removed

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        np.savez_compressed(tmp, table=self.table)
        os.replace(tmp + ".npz", path)

    @classmethod
    def load(cls, path: str) -> "CuckooFilter":
        z = np.load(path)
        cf = cls(z["table"].shape[0])
        cf.table = z["table"]
        return cf
