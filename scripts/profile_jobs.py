"""Per-Spark-job decomposition of a bench-config crawl (event-log based)."""
import json, os, sys, time, tempfile, shutil, glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
from ospo_ghcrawler_spark.config import CrawlConfig
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.session import get_spark
from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 1
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
evdir = tempfile.mkdtemp(prefix="evlog_", dir="/dev/shm")
spark = get_spark(f"profile_jobs_{cores}", cores=cores, shuffle_partitions=cores,
                  extra_conf={"spark.sql.adaptive.enabled": "false",
                              "spark.eventLog.enabled": "true",
                              "spark.eventLog.dir": evdir,
                              "spark.eventLog.compress": "false"})
work = tempfile.mkdtemp(prefix="profile_j_", dir="/dev/shm")
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
    c.seed(B.cover_seed_urls(n, B.N_HOSTS, B.LINKS))
    c.prewarm()
    sc = spark.sparkContext
    marker = sc.parallelize([1]).count()  # job marking the clock start
    t0 = time.time()
    totals = c.run(max_supersteps=40)
    wall = time.time() - t0
    sys.stderr.write(f"\nRUNWALL {wall:.2f} totals={totals}\n")
finally:
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
spark.stop()
cands = [p for p in glob.glob(f"{evdir}/**/*", recursive=True) if os.path.isfile(p)]
ev = max(cands, key=os.path.getsize)
jobs = {}
t_mark = None
for line in open(ev):
    e = json.loads(line)
    if e["Event"] == "SparkListenerJobStart":
        jid = e["Job ID"]
        props = e.get("Properties") or {}
        stages = e.get("Stage Infos") or []
        sname = stages[-1]["Stage Name"][:60] if stages else ""
        jobs[jid] = {"start": e["Submission Time"],
                     "desc": ((props.get("spark.job.description") or props.get("callSite.short") or sname or "?"))[:90]}
    elif e["Event"] == "SparkListenerJobEnd":
        jid = e["Job ID"]
        if jid in jobs:
            jobs[jid]["end"] = e["Completion Time"]
base = None
rows = []
for jid in sorted(jobs):
    j = jobs[jid]
    if "end" not in j: continue
    dur = (j["end"] - j["start"]) / 1000.0
    rows.append((jid, j["start"], dur, j["desc"]))
if rows:
    base = rows[0][1]
    prev_end = None
    for jid, st, dur, desc in rows:
        gap = "" if prev_end is None else f" gap={((st - prev_end)/1000.0):+.2f}"
        print(f"job {jid:3d} t+{(st-base)/1000.0:7.2f}s dur={dur:6.2f}s{gap}  {desc}")
        prev_end = st + dur * 1000
shutil.rmtree(evdir, ignore_errors=True)
