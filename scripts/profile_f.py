"""Profile the crawl's fixed per-run cost F at local[1].

Runs a bench-config crawl on a small corpus with SPARK_CRAWL_DEBUG_TIMING
on, printing per-phase marks per superstep plus run-level totals and the
Spark job count — the breakdown that tells us where the ~31 s of fixed
cost (the N->4N efficiency ceiling's denominator) actually goes."""
import os, sys, time, tempfile, shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARK_CRAWL_DEBUG_TIMING"] = "1"

import bench as B
from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.session import get_spark
from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 1
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

spark = get_spark(f"profile_f_{cores}", cores=cores, shuffle_partitions=cores,
                  extra_conf={"spark.sql.adaptive.enabled": "false"})
sc = spark.sparkContext
work = tempfile.mkdtemp(prefix="profile_f_", dir="/dev/shm")
synth_pages(spark, n_pages=n, n_hosts=B.N_HOSTS, links_per_page=B.LINKS,
            partitions=8, sentences=B.SENTENCES).write.parquet(f"{work}/pages")
synth_robots(spark, n_hosts=B.N_HOSTS, default_budget=1 << 30,
             crawl_delay_ms=0).write.parquet(f"{work}/robots")
corpus = spark.read.parquet(f"{work}/pages")
robots = spark.read.parquet(f"{work}/robots")
cfg = CrawlConfig(
    batch_size=4 * n, host_budget=1 << 30, compute_budget_ms=1 << 40,
    max_depth=64, frontier_partitions=2 * cores, bloom_shards=8,
    bloom_bits_per_shard=1 << 17, pipelined_frontier_commit=True,
    collect_stats=False, expect_failures=False,
)
root = tempfile.mkdtemp(prefix="profile_cat_", dir="/dev/shm")
try:
    c = Crawler(spark, root, corpus, robots, cfg, run_id="prof")
    t = time.time(); c.seed(B.cover_seed_urls(n, B.N_HOSTS, B.LINKS))
    print(f"[seed] {time.time()-t:.2f}s", flush=True)
    t = time.time(); c.prewarm()
    print(f"[prewarm] {time.time()-t:.2f}s", flush=True)
    j0 = sc.statusTracker().getJobIdsForGroup(None)
    t0 = time.time()
    totals = c.run(max_supersteps=40)
    wall = time.time() - t0
    print(f"[run] wall={wall:.2f}s totals={totals}", flush=True)
    # estimate F: wall - w*n/cores with w from bench round-2 is unreliable;
    # print wall directly, the caller compares across n
finally:
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
