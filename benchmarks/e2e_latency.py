"""End-to-end single-scan latency WITHOUT the dev tunnel.

bench.py's `p50_single_scan_ms` (~26-30 ms on the dev TPU) is the
HTTP-tunnel round trip, not the chip: `p50_device_scan_ms` is ~3-6 µs.
The reference's Pi pays 8-10 ms per target end to end (BASELINE.md).
This bench closes the argument by running the IDENTICAL end-to-end
path — host numpy cube in, detections out, one process-visible call —
on a directly-attached backend (this host's single CPU core, the
weakest direct-attach case imaginable): if even that beats the Pi,
any directly-attached TPU does too.

Run: python benchmarks/e2e_latency.py   (forces the CPU backend)
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# Runnable as `python benchmarks/e2e_latency.py` from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/radarml_jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from radarml_tpu.core.arena import DEFAULT_ARENA
    from radarml_tpu.models.linear import LinearModel, SigmoidCalibration
    from radarml_tpu.models.pipeline import RadarPredictor, pad_targets

    rng = np.random.default_rng(0)
    C, F = 3, DEFAULT_ARENA.feature_length
    model = LinearModel(
        coef=jnp.asarray(rng.normal(size=(C, F)) * 0.01, jnp.float32),
        intercept=jnp.zeros((C,), jnp.float32),
    )
    calib = SigmoidCalibration(
        a=-jnp.ones((C,), jnp.float32), b=jnp.zeros((C,), jnp.float32)
    )
    results = {}
    for mode, dtype in (
        ("exact", "float32"), ("fast", "uint8"), ("fast", "int8"),
    ):
        predictor = RadarPredictor(
            train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
            model=model, calibration=calib, mode=mode,
            cube_dtype=dtype, min_proba=0.0,
        )
        cube = np.rint(
            rng.random(DEFAULT_ARENA.grid_shape) * 255
        ).astype(np.float32)
        xyz, valid = pad_targets([[(5.0, 5.0, 100.0)]], max_targets=4)
        # Warm (compile) then time the full host->detections round trip.
        np.asarray(predictor(cube[None], xyz, valid)[2])
        lats = []
        for _ in range(50):
            t0 = time.perf_counter()
            pred, best_p, proba = predictor(cube[None], xyz, valid)
            np.asarray(proba)  # force completion + host fetch
            lats.append((time.perf_counter() - t0) * 1e3)
        results[f"{mode}_{dtype}"] = {
            "p50_ms": round(float(np.percentile(lats, 50)), 3),
            "p95_ms": round(float(np.percentile(lats, 95)), 3),
        }

    best = min(v["p50_ms"] for v in results.values())
    print(json.dumps({
        "metric": "e2e_single_scan_p50_ms_direct_attach_cpu",
        "value": best,
        "unit": "ms",
        "vs_baseline": round(9.0 / best, 1),  # Pi: 8-10 ms/target
        **results,
    }))


if __name__ == "__main__":
    main()
