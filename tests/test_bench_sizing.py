"""Pins for bench.py's noise-adaptive pair sizing (pure arithmetic — no
Spark): the reps-vs-size ladder must prefer repetitions on loud hosts and
W/F headroom on quiet ones, and never emit a ratio-invalid size."""

import importlib.util
from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", Path(__file__).resolve().parents[1] / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quiet_host_prefers_size_over_reps(bench):
    budget, w, f, ov = 1360.0, 0.0044, 12.0, 30.0
    _, w_quiet = bench._size_pages(budget, w, f, ov, slowdown=1.3)
    _, w_loud = bench._size_pages(budget, w, f, ov, slowdown=2.8)
    assert w_quiet > w_loud
    # quiet sizing prefers TWO pairs at the 36F cap when the budget allows
    # (r5: k=2 up front beats a k=3 whose third rep gets budget-trimmed)
    assert w_quiet == pytest.approx(min(36 * f, (budget / 2 - 2 * f - 2 * ov) / 1.25))


def test_loud_and_unknown_hosts_keep_rep_first_ladder(bench):
    budget, w, f, ov = 1360.0, 0.006, 12.0, 30.0
    _, w_none = bench._size_pages(budget, w, f, ov, slowdown=None)
    _, w_loud = bench._size_pages(budget, w, f, ov, slowdown=2.5)
    assert w_none == w_loud  # unknown slowdown treated as loud


def test_moderate_host_targets_24f_floor(bench):
    # round-4 verdict #1: the W/F-headroom ladder must also fire on
    # moderately loud (<=2.2x) hours — the host rarely reads <=1.7x, so
    # the quiet-only gate never triggered across two rounds. At the r04
    # driver budget (1650 s, f=12.7, ov=30) a 3-pair 24F-floor corpus fits
    # and predicts ~0.9.
    budget, w, f, ov = 1530.0, 0.009255, 12.7, 30.0
    _, w_mod = bench._size_pages(budget, w, f, ov, slowdown=2.1)
    assert w_mod >= 24 * f  # clears the headroom floor
    _, w_loud = bench._size_pages(budget, w, f, ov, slowdown=2.5)
    assert w_mod > w_loud  # loud hours keep the rep-first 14F ladder
    # 2.2 is inclusive; 2.21 is not
    _, w_edge = bench._size_pages(budget, w, f, ov, slowdown=2.2)
    assert w_edge == w_mod


def test_sizes_never_ratio_invalid(bench):
    # every emitted W clears the single-pair fallback floor in time units
    for budget in (400.0, 900.0, 1650.0, 3000.0):
        for slow in (None, 1.2, 1.7, 2.0, 2.2, 3.0):
            f = 13.0
            pages, W = bench._size_pages(budget, 0.006, f, 30.0, slowdown=slow)
            assert pages >= 2000
            cap = 36 * f if (slow is not None and slow <= 2.2) else 24 * f
            assert W <= cap + 1e-9
