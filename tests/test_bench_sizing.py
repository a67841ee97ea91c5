"""Pins for bench.py's pair sizing (pure arithmetic — no Spark): the
ladder is W/F-headroom-first at EVERY measured slowdown (SCALING_NOTES
§3r — the rep-first 14F path never cleared the 0.8 gate across 16 runs
while W-first cleared it three times in one night, including on a 2.17×
hour), and it must never emit a ratio-invalid size."""

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


def test_slowdown_no_longer_gates_sizing(bench):
    # §3r: both r3 and r4 driver runs calibrated ~2.4× and were routed to
    # the structurally-capped 14F ladder by the old tiering. The W-first
    # ladder now fires identically at any slowdown, including unknown.
    budget, w, f, ov = 1360.0, 0.0044, 12.0, 30.0
    sizes = {
        slow: bench._size_pages(budget, w, f, ov, slowdown=slow)
        for slow in (None, 1.3, 2.1, 2.43, 2.8)
    }
    vals = set(sizes.values())
    assert len(vals) == 1, sizes
    # and that one size is the k=2 / 36F-capped headroom choice
    _, W = vals.pop()
    assert W == pytest.approx(
        min(36 * max(f, 20.0), (budget / 2 - 2 * f - 2 * ov) / 1.25)
    )


def test_driver_budget_at_loud_hour_clears_headroom_floor(bench):
    # the r04 driver scenario (1650 s budget, f≈12.7, 2.43× host) must now
    # size ≥24F — the posture that predicts ~0.9 instead of ceiling 0.836
    budget, w, f, ov = 1530.0, 0.009255, 12.7, 30.0
    _, W = bench._size_pages(budget, w, f, ov, slowdown=2.43)
    assert W >= 24 * f


def test_single_pair_rung_fires_in_the_driver_budget_regime(bench):
    # clean driver run: legs_budget ≈ 1340 s with measured f ≈ 21 s.
    # fit(2)=454 < the 24F floor (506), so pre-§3r the ladder fell to
    # (2,16F) → target 454 and the overshoot degraded it to min-of-1 at
    # SMALL W — worst of both regimes. The k=1 rung sizes against the
    # overshot budget (legs_budget/1.45) and must pick ~31F here.
    budget, w, f, ov = 1340.0, 0.004314, 21.1, 30.0
    _, W = bench._size_pages(budget, w, f, ov, slowdown=2.0)
    expect = (budget / 1.45 - 2 * f - 2 * ov) / 1.25
    assert W == pytest.approx(min(36 * max(f, 20.0), expect))
    assert W >= 24 * f


def test_starved_budget_degrades_to_rep_first_then_fallback(bench):
    # a budget that cannot fit 2 pairs at 16F falls through to the
    # rep-first rungs / single-pair fallback instead of erroring
    f = 13.0
    pages, W = bench._size_pages(400.0, 0.006, f, 30.0, slowdown=2.0)
    assert pages >= 2000
    assert W <= 16 * f + 1e-9


def test_sizes_never_ratio_invalid(bench):
    # every emitted W respects the 36F cap and the page floor
    for budget in (400.0, 900.0, 1650.0, 3000.0):
        for slow in (None, 1.2, 1.7, 2.0, 2.2, 3.0):
            f = 13.0
            pages, W = bench._size_pages(budget, 0.006, f, 30.0, slowdown=slow)
            assert pages >= 2000
            assert W <= 36 * max(f, 20.0) + 1e-9
