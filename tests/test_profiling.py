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
