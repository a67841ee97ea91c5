#!/usr/bin/env python
"""Executor-based N→4N scaling pair: local-cluster[1,1,m] vs
local-cluster[4,1,m] — REAL separate executor JVMs over the identical
corpus/config, the closest in-sandbox shape to the north rule's "N and 4N
executors" (local[k] measures task-slot scaling inside ONE JVM; this
measures whole-executor scaling: per-executor JVM, GC, Python workers, and
shuffle over the BlockManager RPC path).

Protocol matches bench.py: fresh subprocess per leg (nothing concurrent),
prewarm outside the timed wall, palindrome order hi,lo,lo,hi, min per side,
identical settled set asserted by the worker's urls_settled.

Usage: python scripts/lc_scaling.py [pages] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

LC_ENV = {
    "SPARK_GRAFT_MASTER": "local-cluster[{cores},1,6144]",
    "SPARK_GRAFT_EXECUTOR_MEM": "4g",
    # driver does no task work in local-cluster mode; keep it lean
    "SPARK_DRIVER_MEM": "8g",
}


def leg(cores: int, corpus: str, robots: str, pages: int) -> dict:
    out = tempfile.mktemp(suffix=".json")
    cmd = [
        sys.executable, os.path.abspath("bench.py"), "--crawl-worker",
        "--cores", str(cores), "--corpus", corpus, "--robots", robots,
        "--pages", str(pages), "--out", out,
    ]
    env = dict(os.environ, **LC_ENV)
    t0 = time.time()
    subprocess.run(cmd, check=True, env=env, timeout=1200,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    r = json.load(open(out))
    r["sub_wall"] = time.time() - t0
    return r


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    work = tempfile.mkdtemp(prefix="lc_scale_", dir=bench.WORKDIR_BASE)
    try:
        from ospo_ghcrawler_spark.session import get_spark
        from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots

        spark = get_spark("lc_build", cores=bench.CPUS, shuffle_partitions=bench.CPUS)
        synth_robots(spark, n_hosts=bench.N_HOSTS, default_budget=1 << 30,
                     crawl_delay_ms=0).write.mode("overwrite").parquet(f"{work}/robots")
        synth_pages(spark, n_pages=pages, n_hosts=bench.N_HOSTS,
                    links_per_page=bench.LINKS, partitions=2 * bench.CPUS,
                    sentences=bench.SENTENCES).write.mode("overwrite").parquet(f"{work}/pages")
        spark.stop()

        runs: dict[int, list[dict]] = {1: [], 4: []}
        order = ([4, 1, 1, 4] * reps)[: 2 * reps] if reps > 1 else [4, 1]
        # palindrome: hi,lo | lo,hi | hi,lo ...
        order = []
        for i in range(reps):
            order += [4, 1] if i % 2 == 0 else [1, 4]
        for cores in order:
            r = leg(cores, f"{work}/pages", f"{work}/robots", pages)
            runs[cores].append(r)
            print(f"local-cluster[{cores},1]: wall={r['wall_sec']:.1f}s "
                  f"urls/s={r['urls_per_sec']:.1f} settled={r['urls_settled']}",
                  flush=True)
        lo = min(runs[1], key=lambda r: r["wall_sec"])
        hi = min(runs[4], key=lambda r: r["wall_sec"])
        det = len({r["urls_settled"] for r in runs[1] + runs[4]}) == 1
        eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / 4
        print(json.dumps({
            "mode": "local-cluster (separate executor JVMs)",
            "pages": pages,
            "executors_pair": [1, 4],
            "reps_per_leg": [len(runs[1]), len(runs[4])],
            "wall_lo": round(lo["wall_sec"], 1), "wall_hi": round(hi["wall_sec"], 1),
            "rep_walls": {"lo": [round(r["wall_sec"], 1) for r in runs[1]],
                          "hi": [round(r["wall_sec"], 1) for r in runs[4]]},
            "deterministic": det,
            "scaling_efficiency_N_to_4N": round(eff, 3),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
