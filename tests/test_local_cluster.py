"""Multi-executor topology pin: the engine must run UNCHANGED on real
separate executor JVMs (north rule: spark-submit across multi-executor
clusters). Spark sessions are JVM singletons, so the local-cluster run
happens in a subprocess (scripts/lc_probe.py) — same pattern as the bench
legs."""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_crawl_on_local_cluster_executors():
    """2 executor JVMs, 400 pages: the crawl must complete and settle the
    deterministic full set (seeds cover the graph at this size: 400 pages +
    dead-pool 404s are all discovered)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "lc_probe.py"),
         "2", "1", "400"],
        capture_output=True, text=True, timeout=420, cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "crawl ok" in proc.stdout
    # the probe prints the settled count; 400 live pages + discovered 404
    # urls — the exact set is pinned by determinism across runs/modes, the
    # floor here by the corpus size
    seen = int(proc.stdout.split("seen=")[1].split()[0])
    assert seen >= 400
