#!/usr/bin/env python
"""Scaling decomposition harness (dev tool, not part of the bench):

builds one corpus, then runs the bench crawl at the given core counts with
SPARK_CRAWL_DEBUG_TIMING so each superstep prints per-stage walls — the
stage deltas between parallelism levels expose exactly which stages carry
fixed (non-scaling) time. Usage:

    python scripts/measure_scaling.py [n_pages] [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOSTS = 200
LINKS = 25
SENTENCES = 60  # keep in sync with bench.py
SEED_FRACTION = 4


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores_list = [int(c) for c in sys.argv[2:]] or [2, 8]

    from ospo_ghcrawler_spark.session import get_spark
    from ospo_ghcrawler_spark.sources.corpus import synth_pages, synth_robots

    work = tempfile.mkdtemp(prefix="measure_", dir="/dev/shm")
    corpus_dir, robots_dir = f"{work}/pages", f"{work}/robots"
    spark = get_spark("measure_build", cores=32, shuffle_partitions=32)
    synth_pages(
        spark, n_pages=n_pages, n_hosts=N_HOSTS, links_per_page=LINKS,
        partitions=64, sentences=SENTENCES,
    ).write.mode("overwrite").parquet(corpus_dir)
    synth_robots(spark, n_hosts=N_HOSTS, default_budget=1 << 30).write.mode(
        "overwrite"
    ).parquet(robots_dir)
    spark.stop()

    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    for cores in cores_list:
        out = tempfile.mktemp(suffix=".json")
        env = dict(os.environ, SPARK_CRAWL_DEBUG_TIMING="1")
        t0 = time.time()
        subprocess.run(
            [sys.executable, bench, "--crawl-worker", "--cores", str(cores),
             "--corpus", corpus_dir, "--robots", robots_dir,
             "--pages", str(n_pages), "--out", out],
            env=env, check=True,
        )
        with open(out) as f:
            r = json.load(f)
        print(f"== cores={cores} wall={r['wall_sec']:.1f}s settled={r['urls_settled']} "
              f"urls/s={r['urls_per_sec']:.0f} (subproc total {time.time()-t0:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
