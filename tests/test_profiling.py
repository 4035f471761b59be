"""Observability utilities."""

import logging
import time

from radarml_tpu.utils import RateMeter, StageTimer, device_trace


def test_stage_timer_accumulates():
    t = StageTimer()
    for _ in range(3):
        with t("fast"):
            pass
    with t("slow"):
        time.sleep(0.01)
    s = t.summary()
    assert s["fast"]["count"] == 3
    assert s["slow"]["mean_ms"] >= 10.0
    t.log_summary(logging.DEBUG)
    t.reset()
    assert t.summary() == {}


def test_rate_meter_converges():
    m = RateMeter(alpha=0.5)
    m.tick()
    for _ in range(5):
        time.sleep(0.005)
        r = m.tick()
    assert 50 < r < 400
    assert m.count == 6


def test_device_trace_noop():
    with device_trace(None):
        x = 1
    assert x == 1


def test_device_trace_writes(tmp_path):
    import jax.numpy as jnp

    with device_trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert any(tmp_path.rglob("*"))


def test_slope_time_positive_under_phase_drift():
    """Drift robustness: a slowdown episode that hits only the K_lo
    phase must not produce a negative (or absurd) per-call estimate —
    BENCH_r03/r04 raw rounds recorded -16M scans/s from exactly this."""
    from radarml_tpu.utils.slopetime import slope_time

    state = {"calls": 0}

    def call():
        state["calls"] += 1
        time.sleep(0.001)
        return 1

    # Fetch jitter: the first fetch (K_lo of pair 1) eats a 40 ms
    # episode, later fetches are fast — the naive two-point slope
    # would be negative.
    episode = {"n": 0}

    def fetch(out):
        episode["n"] += 1
        if episode["n"] == 1:
            time.sleep(0.04)

    t = slope_time(call, fetch)
    assert t > 0
    assert 0.0005 < t < 0.002


def test_slope_time_cheap_for_slow_programs():
    """K_hi must not escalate when one call already dominates jitter
    (the exact-mode probe would otherwise cost minutes)."""
    from radarml_tpu.utils.slopetime import slope_time

    state = {"calls": 0}

    def call():
        state["calls"] += 1
        time.sleep(0.01)
        return 1

    t = slope_time(call, lambda out: None)
    assert 0.008 < t < 0.015
    # default reps=3 pairs at k_lo=2,k_hi=12 → 42 calls, no escalation
    assert state["calls"] <= 42
