"""End-to-end training-corpus build — the full pipeline this engine exists
for, as ONE cluster-deployable script:

    crawl → clean (lang/quality/exact-dedup) → near-dup prune (stored OPH
    signatures, no text rescan) → deterministic train/val/test split →
    token-budget shard packing → partitioned parquet + manifest.

Every stage is the library operator the driver queries pin (control.
export_clean_corpus, dedup_docs.oph_lsh_pairs/neardup_clusters,
curation.shard_pack); the script only sequences them. Deploy like
run_crawl.py:

    spark-submit --py-files /tmp/ospo_ghcrawler_spark_pyfiles.zip \
        scripts/build_corpus.py --corpus /data/pages --catalog /tmp/cat \
        --seeds-auto 1000 --out /data/corpus_v1

    python scripts/build_corpus.py --synth 400 --out /tmp/corpus  # sandbox

Scale notes: the crawl writes features + OPH MinHash signatures in the
harvest pass (featurize_at_fetch / minhash_at_fetch), so cleaning and
near-dup candidate generation never re-scan text; the only text scan after
the crawl is the exact-Jaccard verify on LSH candidates. The final write is
partitioned by (split, shard_id) — the layout data loaders consume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="crawl -> training corpus")
    p.add_argument("--corpus", help="parquet of pages (url, warc_ts, html, text, lang)")
    p.add_argument("--robots", help="parquet robots dim (optional)")
    p.add_argument("--synth", type=int, default=0, help="synthesize N pages instead")
    p.add_argument("--catalog", default="/tmp/build_corpus_catalog")
    p.add_argument("--out", required=True)
    p.add_argument("--seeds-auto", type=int, default=0, help="seed the first K urls")
    p.add_argument("--lang", default="en")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--neardup-threshold", type=float, default=0.8)
    p.add_argument("--keep", choices=("first", "best"), default="first",
                   help="near-dup representative: smallest id | richest copy")
    p.add_argument("--shard-tokens", type=int, default=100_000)
    p.add_argument("--max-supersteps", type=int, default=50)
    p.add_argument("--local-cores", type=int, default=0)
    p.add_argument("--run-id", default="corpus_build")
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    from ospo_ghcrawler_spark.config import CrawlConfig
    from ospo_ghcrawler_spark.operators import control as CT
    from ospo_ghcrawler_spark.operators import curation as CU
    from ospo_ghcrawler_spark.operators import dedup_docs as DD
    from ospo_ghcrawler_spark.operators.engine import Crawler
    from ospo_ghcrawler_spark.session import ensure_shipped, get_spark
    from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots, page_url

    if args.local_cores:
        spark = get_spark("build_corpus", cores=args.local_cores,
                          shuffle_partitions=max(8, 2 * args.local_cores))
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
        ensure_shipped(spark)

    t0 = time.time()
    n_hosts = 12
    if args.synth:
        corpus = synth_pages(spark, n_pages=args.synth, n_hosts=n_hosts, links_per_page=6)
        robots = synth_robots(spark, n_hosts=n_hosts)
        seeds = [page_url(i, args.synth, n_hosts, False)
                 for i in range(max(4, args.seeds_auto or 4))]
    else:
        corpus = spark.read.parquet(args.corpus)
        robots = (spark.read.parquet(args.robots) if args.robots
                  else synth_robots(spark, n_hosts=0).limit(0))
        seeds = [r["url"] for r in corpus.select("url").limit(args.seeds_auto or 100).collect()]

    cfg = CrawlConfig(
        batch_size=max(200, (args.synth or 1000) // 2),
        featurize_at_fetch=True,
        minhash_at_fetch=True,
    )
    crawler = Crawler(spark, args.catalog, corpus, robots, cfg, run_id=args.run_id)
    crawler.seed(seeds)
    stats = crawler.run(args.max_supersteps)

    # ---- clean: latest version, lang/quality gate, exact fp-dedup ----------
    clean = CT.export_clean_corpus(
        crawler, lang=args.lang, min_quality=args.min_quality
    ).select(
        F.col("url_hash").alias("doc_id"), "url", "text", "n_tokens", "minhash_oph"
    ).cache()
    n_clean = clean.count()

    # ---- near-dup prune from the STORED signatures (no text rescan for
    # candidates; exact-Jaccard verify touches candidate pairs only) --------
    pairs = DD.oph_lsh_pairs(
        clean, threshold=args.neardup_threshold, entries_col="minhash_oph"
    )
    if args.keep == "best":
        # keep the richest copy of each duplicated document (argmax tokens)
        # instead of the smallest id — RefinedWeb-style representative choice
        keep_ids = DD.neardup_keep_best(clean, pairs, "n_tokens").filter(
            F.col("keep")
        ).select("doc_id")
    else:
        clusters = DD.neardup_clusters(clean, pairs)
        keep_ids = clusters.filter(
            F.col("cluster_rep") == F.col("doc_id")
        ).select("doc_id")
    kept = clean.join(keep_ids, "doc_id")

    # ---- deterministic split + token-budget shards (per split) ------------
    b = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(10))
    split_col = (
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test").alias("split")
    )
    kept = kept.select("*", split_col)
    out_rows = []
    for split in ("train", "val", "test"):
        part = kept.filter(F.col("split") == split)
        shards = CU.shard_pack(part, args.shard_tokens, order_col="doc_id")
        out_rows.append(
            part.join(shards.select("doc_id", "shard_id"), "doc_id")
            .select("doc_id", "url", "text", "n_tokens", "split", "shard_id")
        )
    final = out_rows[0].unionByName(out_rows[1]).unionByName(out_rows[2])
    final.write.mode("overwrite").partitionBy("split", "shard_id").parquet(args.out)

    written = spark.read.parquet(args.out)
    manifest = {
        "crawl": stats,
        "n_clean": n_clean,
        "n_kept": written.count(),
        "n_neardup_dropped": n_clean - written.count(),
        "tokens": {
            r["split"]: r["t"]
            for r in written.groupBy("split").agg(F.sum("n_tokens").alias("t")).collect()
        },
        "shards": {
            r["split"]: r["s"]
            for r in written.groupBy("split")
            .agg(F.countDistinct("shard_id").alias("s"))
            .collect()
        },
        "wall_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))
    clean.unpersist()
    return manifest


if __name__ == "__main__":
    main()
