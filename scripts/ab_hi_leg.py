#!/usr/bin/env python
"""A/B probe: which engine config closes the 4-core leg's per-page-cost gap?

On a loaded shared host the local[4] crawl leg pays 1.2-1.35x the
local[1] leg's per-page CORE cost (measured 2026-08-18; on quiet hosts the
gap is <1.1x — BENCH/SCALING_NOTES.md §3). Arms, each applied to BOTH legs
(same job config at two parallelism levels — never a per-side asymmetry):

  base   — the bench's current leg config (G1 GC)
  pargc  — -XX:+UseParallelGC: G1's concurrent refinement/marking threads
           compete with the 8 active task+python threads for memory-bus
           bandwidth; the throughput collector does its work inside
           stop-the-world pauses instead (pauses cost wall on both legs
           equally; concurrent traffic taxes only the wide leg)
  s25    — lighter pages (25 sentences ≈ 4 KB html / 1.6 KB text — still
           inside the real Common-Crawl extracted-text band): page bytes
           are the measured big lever on the wide-leg bus penalty

Prints per-arm lo/hi walls, per-page core costs, and the efficiency each
arm would yield. Fresh JVM per leg via bench.py --crawl-worker; nothing
runs concurrently with a measured leg.

Usage: python scripts/ab_hi_leg.py [pages] (default 24000)
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

PARGC = {"SPARK_GRAFT_LEG_JAVA_OPTS": "-XX:+UseParallelGC"}


def build_corpus(pages: int, sentences: int, work: str, tag: str) -> str:
    from ospo_ghcrawler_spark.session import get_spark
    from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots

    spark = get_spark(f"ab_build_{tag}", cores=bench.CPUS,
                      shuffle_partitions=bench.CPUS)
    if not os.path.isdir(f"{work}/robots"):
        synth_robots(
            spark, n_hosts=bench.N_HOSTS, default_budget=1 << 30, crawl_delay_ms=0
        ).write.mode("overwrite").parquet(f"{work}/robots")
    d = f"{work}/pages_{tag}"
    synth_pages(
        spark, n_pages=pages, n_hosts=bench.N_HOSTS, links_per_page=bench.LINKS,
        partitions=2 * bench.CPUS, sentences=sentences,
    ).write.mode("overwrite").parquet(d)
    spark.stop()
    return d


def leg(cores: int, corpus: str, robots: str, pages: int, env_extra: dict) -> dict:
    out = tempfile.mktemp(suffix=".json")
    cmd = [
        sys.executable, os.path.abspath("bench.py"), "--crawl-worker",
        "--cores", str(cores), "--corpus", corpus, "--robots", robots,
        "--pages", str(pages), "--out", out,
    ]
    env = dict(os.environ, SPARK_DRIVER_MEM="16g", **env_extra)
    subprocess.run(cmd, check=True, env=env, timeout=900,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return json.load(open(out))


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000
    work = tempfile.mkdtemp(prefix="ab_hi_", dir=bench.WORKDIR_BASE)
    results: dict[str, dict[str, list[float]]] = {}

    def record(arm: str, cores: int, r: dict) -> None:
        side = "hi" if cores == 4 else "lo"
        results.setdefault(arm, {}).setdefault(side, []).append(r["wall_sec"])
        print(f"{arm}/{side}: wall={r['wall_sec']:.1f}s "
              f"urls/s={r['urls_per_sec']:.1f}", flush=True)

    try:
        c40 = build_corpus(pages, bench.SENTENCES, work, "s40")
        c25 = build_corpus(pages, 25, work, "s25")
        robots = f"{work}/robots"
        # palindrome-ish interleave so host drift hits arms evenly
        plan = [
            ("base", 4, c40, {}), ("pargc", 4, c40, PARGC), ("s25", 4, c25, {}),
            ("base", 1, c40, {}), ("pargc", 1, c40, PARGC), ("s25", 1, c25, {}),
            ("s25", 4, c25, {}), ("pargc", 4, c40, PARGC), ("base", 4, c40, {}),
        ]
        for arm, cores, corpus, env_extra in plan:
            record(arm, cores, leg(cores, corpus, robots, pages, env_extra))
        print("\n=== summary (min wall per side) ===")
        for arm, sides in results.items():
            lo_w = min(sides.get("lo", [float("nan")]))
            hi_w = min(sides.get("hi", [float("nan")]))
            eff = (lo_w / hi_w) / 4
            print(f"{arm}: lo={lo_w:.1f}s hi={hi_w:.1f}s -> efficiency {eff:.3f}")
        print(json.dumps(results))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
